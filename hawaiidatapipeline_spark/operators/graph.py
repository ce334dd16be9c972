"""Iterative graph analytics: fixed-point PageRank.

Complements connected_components (operators/dedup.py) with the other
canonical iterative-join algorithm. Everything runs in integer
micro-units (rank × 1e6, floor division) — deliberately: float PageRank
sums contributions in partition order and no two engines (or two runs on
different partitionings) agree bit-for-bit, but integer fixed-point is
exactly reproducible anywhere, which turns an "iterative algorithms
can't be oracle-checked" weak spot into a hash-verified query.

Scale shape per iteration: one join (ranks × out-edges) + one groupBy
sum — the same linear shuffle pair as hash-min label propagation. Ranks
re-materialize each round via localCheckpoint so the plan stays flat at
any iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def pagerank_fixed_point(
    edges: DataFrame,
    nodes: DataFrame,
    n_iter: int = 3,
    damping_pct: int = 85,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, rank_micro) after ``n_iter`` synchronous updates.

    rank₀ = 1e6 for every node; each round:
        contrib(u) = rank(u) div outdeg(u)            (integer floor)
        rank'(v)   = (1−d)·1e6 + d·Σ contrib(u→v)     (d as integer %)
    Nodes with no in-edges keep the teleport term (left join + coalesce);
    with an undirected edge set every connected node has outdeg ≥ 1, so
    no dangling-mass correction is needed here (document it if edges are
    directed)."""
    teleport = (100 - damping_pct) * MICRO // 100
    deg = edges.groupBy(src_col).agg(F.count(F.lit(1)).alias("_deg"))
    ranks = nodes.select(F.col(node_col), F.lit(MICRO).cast("long").alias("rank_micro"))
    for _ in range(n_iter):
        contribs = (
            ranks.join(edges, ranks[node_col] == edges[src_col])
            .join(deg, src_col)
            .select(
                F.col(dst_col).alias("_dst"),
                F.expr("div(rank_micro, _deg)").alias("_c"),
            )
            .groupBy("_dst")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            nodes.select(node_col)
            .join(contribs, nodes[node_col] == contribs["_dst"], "left")
            .select(
                node_col,
                (
                    F.lit(teleport)
                    + F.expr(f"div({damping_pct} * coalesce(_in, 0L), 100)")
                ).cast("long").alias("rank_micro"),
            )
            .localCheckpoint()
        )
    return ranks
