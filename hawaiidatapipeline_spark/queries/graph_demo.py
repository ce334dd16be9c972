"""Iterative graph analytics over the part co-purchase graph.

The oracle unrolls the iterations as chained CTEs — possible only
because the operator runs in integer fixed-point (operators/graph.py):
float PageRank can never hash-match across engines, integer PageRank
always does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.graph import pagerank_fixed_point
from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()

_N_ITER = 3


def _pagerank_sql() -> str:
    step = """r{i} AS (
       SELECT n.node, (150000 + (85 * coalesce(s.inn, 0)) // 100)::BIGINT AS r
       FROM nodes n LEFT JOIN (
         SELECT e.dst AS node, sum(r{p}.r // d.deg) AS inn
         FROM r{p} JOIN cop e ON r{p}.node = e.src
                   JOIN deg d ON d.src = e.src
         GROUP BY e.dst
       ) s ON s.node = n.node)"""
    steps = ",\n       ".join(step.format(i=i, p=i - 1) for i in range(1, _N_ITER + 1))
    return f"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       cop AS (
         SELECT a.l_partkey AS src, b.l_partkey AS dst
         FROM items a JOIN items b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
         GROUP BY 1, 2 HAVING count(*) >= 2
       ),
       nodes AS (SELECT DISTINCT src AS node FROM cop),
       deg AS (SELECT src, count(*) AS deg FROM cop GROUP BY src),
       r0 AS (SELECT node, 1000000::BIGINT AS r FROM nodes),
       {steps}
       SELECT node, r AS rank_micro FROM r{_N_ITER}"""


@q("graph_pagerank_copurchase", _pagerank_sql())
def graph_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 synchronous rounds, damping 0.85) over the undirected
    part co-purchase graph (edges: parts sharing ≥2 orders). Integer
    fixed-point micro-units make the iterative algorithm hash-verifiable —
    the oracle unrolls the rounds as CTEs and reproduces every rank
    exactly. Per round: one join + one partial-aggregated groupBy, ranks
    localCheckpoint-materialized so the plan never deepens — the same
    O(iterations) linear-shuffle budget as connected components."""
    from hawaiidatapipeline_spark.operators.graph import copurchase_edges

    li = load_table(spark, sf_dir, "lineitem")
    # directed edge list via the collect+expand build + mirror (ONE
    # orderkey shuffle and half the pair aggregation vs the items
    # self-join — operators/graph.py)
    edges = copurchase_edges(li, directed=True)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    return pagerank_fixed_point(edges, nodes, n_iter=_N_ITER)
