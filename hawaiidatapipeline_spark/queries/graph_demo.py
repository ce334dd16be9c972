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
    return f"""WITH items AS (SELECT l_orderkey, l_partkey FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) QUALIFY count(*) OVER (PARTITION BY l_orderkey) <= 64),
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


_LP_HUB_CAP = 40  # max center degree contributing wedges (see docstring)


@q(
    "graph_link_prediction",
    f"""WITH items AS (SELECT l_orderkey, l_partkey FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) QUALIFY count(*) OVER (PARTITION BY l_orderkey) <= 64),
       e AS (SELECT a.l_partkey AS u, b.l_partkey AS v
             FROM items a JOIN items b
               ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             GROUP BY 1, 2 HAVING count(*) >= 2),
       adj AS (SELECT u AS node, v AS nbr FROM e
               UNION ALL SELECT v AS node, u AS nbr FROM e),
       deg AS (SELECT node, count(*) AS deg FROM adj GROUP BY node),
       centers AS (SELECT node FROM deg WHERE deg <= {_LP_HUB_CAP}),
       w AS (SELECT a.node AS na, b.node AS nb, count(*) AS cn
             FROM adj a JOIN adj b ON a.nbr = b.nbr AND a.node < b.node
             JOIN centers c ON c.node = a.nbr
             GROUP BY 1, 2),
       nonadj AS (SELECT w.* FROM w LEFT JOIN e
                  ON e.u = w.na AND e.v = w.nb WHERE e.u IS NULL)
       SELECT na AS part_a, nb AS part_b, cn AS common_neighbors,
              round(cn * 1.0 / (da.deg + db.deg - cn), 6) AS jaccard
       FROM nonadj JOIN deg da ON da.node = nonadj.na
                   JOIN deg db ON db.node = nonadj.nb
       ORDER BY common_neighbors DESC, part_a, part_b LIMIT 50""",
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the part co-purchase graph: top-50 NON-adjacent
    part pairs ranked by common-neighbor count, with the Jaccard neighbor
    similarity (cn / |N(a) ∪ N(b)|) — the "customers who bought these also
    bought" recommender primitive.

    Wedge enumeration through a center node is inherently deg(center)²
    (the wedges ARE the output), so the scale control is not orientation
    but a STOP-HUB cap: centers with degree > _LP_HUB_CAP contribute none
    (mirrored exactly in the oracle). This is the same move as the
    stop-shingle cap in llm_containment_pairs, and principled here —
    ubiquitous hub neighbors carry ~no link signal (Adamic-Adar weights
    them 1/log(deg) → ≈0), while the quadratic cost they would add is the
    whole skew problem. Plan: one symmetrized adjacency (reused three
    times off a single materialization), an equi-join on the center key,
    one (a,b) partial-agg count, a broadcast-able anti-join against the
    edge set, and two broadcast degree lookups. Ties broken (cn desc,
    part_a, part_b) for a deterministic top-50."""
    from hawaiidatapipeline_spark.operators.graph import copurchase_edges
    from hawaiidatapipeline_spark.operators.materialize import materialize

    li = load_table(spark, sf_dir, "lineitem")
    edges = materialize(copurchase_edges(li))  # (u, v), u < v
    adj = materialize(
        edges.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
            edges.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
        )
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    centers = deg.filter(F.col("deg") <= _LP_HUB_CAP).select("node")
    a, b = adj.alias("a"), adj.alias("b")
    wedges = (
        a.join(b, (F.col("a.nbr") == F.col("b.nbr")) & (F.col("a.node") < F.col("b.node")))
        .join(centers.withColumnRenamed("node", "nbr"), "nbr")
        .groupBy(F.col("a.node").alias("na"), F.col("b.node").alias("nb"))
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    nonadj = wedges.join(
        edges,
        (wedges["na"] == edges["u"]) & (wedges["nb"] == edges["v"]),
        "left_anti",
    )
    da = deg.withColumnRenamed("node", "na").withColumnRenamed("deg", "da")
    db = deg.withColumnRenamed("node", "nb").withColumnRenamed("deg", "db")
    return (
        nonadj.join(F.broadcast(da), "na")
        .join(F.broadcast(db), "nb")
        .select(
            F.col("na").alias("part_a"),
            F.col("nb").alias("part_b"),
            F.col("cn").alias("common_neighbors"),
            F.round(
                F.col("cn") / (F.col("da") + F.col("db") - F.col("cn")), 6
            ).alias("jaccard"),
        )
        .orderBy(F.col("common_neighbors").desc(), "part_a", "part_b")
        .limit(50)
    )


# Shared SQL fragment: the co-purchase edge set + symmetric adjacency +
# degrees, with the mega-order cap mirrored (operators/graph.copurchase_edges).
_ADJ_SQL = """items AS (SELECT l_orderkey, l_partkey FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) QUALIFY count(*) OVER (PARTITION BY l_orderkey) <= 64),
       e AS (SELECT a.l_partkey AS u, b.l_partkey AS v
             FROM items a JOIN items b
               ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             GROUP BY 1, 2 HAVING count(*) >= 2),
       adj AS (SELECT u AS node, v AS nbr FROM e
               UNION ALL SELECT v AS node, u AS nbr FROM e),
       deg AS (SELECT node, count(*) AS deg FROM adj GROUP BY node)"""


@q(
    "graph_adamic_adar",
    f"""WITH {_ADJ_SQL},
       w AS (SELECT a.node AS na, b.node AS nb, count(*) AS cn,
                    sum(round(1.0 / ln(d.deg), 9)) AS aa
             FROM adj a JOIN adj b ON a.nbr = b.nbr AND a.node < b.node
             JOIN deg d ON d.node = a.nbr
             WHERE d.deg <= {_LP_HUB_CAP}
             GROUP BY 1, 2),
       nonadj AS (SELECT w.* FROM w LEFT JOIN e
                  ON e.u = w.na AND e.v = w.nb WHERE e.u IS NULL)
       SELECT na AS part_a, nb AS part_b, cn AS common_neighbors,
              round(aa, 6) AS adamic_adar
       FROM nonadj
       ORDER BY adamic_adar DESC, part_a, part_b LIMIT 50""",
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the part co-purchase graph — the
    degree-weighted refinement of graph_link_prediction's common-neighbor
    count: each shared neighbor contributes 1/ln(deg), so a rare center
    (two parts co-bought only with one specialty part) outvotes a
    ubiquitous one. Same wedge plan and STOP-HUB cap as link prediction —
    and here the cap is exactly the measure's own logic made structural:
    beyond-cap hubs contribute ~1/ln(40+) ≈ 0 signal for quadratic cost.
    Determinism: per-center weights are rounded to 9 dp BEFORE summing
    (one libm ln ULP can't survive the grid), the score re-rounds to
    6 dp, and the top-50 orders by the ROUNDED score with (a, b)
    tie-breaks — identical ranks on both engines."""
    from hawaiidatapipeline_spark.operators.graph import copurchase_edges
    from hawaiidatapipeline_spark.operators.materialize import materialize

    li = load_table(spark, sf_dir, "lineitem")
    edges = materialize(copurchase_edges(li))  # (u, v), u < v
    adj = materialize(
        edges.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
            edges.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
        )
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    centers = deg.filter(F.col("deg") <= _LP_HUB_CAP).select(
        F.col("node").alias("nbr"),
        F.round(1.0 / F.log("deg"), 9).alias("w"),
    )
    a, b = adj.alias("a"), adj.alias("b")
    wedges = (
        a.join(b, (F.col("a.nbr") == F.col("b.nbr")) & (F.col("a.node") < F.col("b.node")))
        .join(F.broadcast(centers), "nbr")
        .groupBy(F.col("a.node").alias("na"), F.col("b.node").alias("nb"))
        .agg(F.count(F.lit(1)).alias("cn"), F.sum("w").alias("aa"))
    )
    nonadj = wedges.join(
        edges,
        (wedges["na"] == edges["u"]) & (wedges["nb"] == edges["v"]),
        "left_anti",
    )
    return (
        nonadj.select(
            F.col("na").alias("part_a"),
            F.col("nb").alias("part_b"),
            F.col("cn").alias("common_neighbors"),
            F.round("aa", 6).alias("adamic_adar"),
        )
        .orderBy(F.col("adamic_adar").desc(), "part_a", "part_b")
        .limit(50)
    )


@q(
    "graph_clustering_coefficient",
    f"""WITH {_ADJ_SQL},
       adjc AS (SELECT a.node, a.nbr FROM adj a
                JOIN deg d ON d.node = a.node
                WHERE d.deg BETWEEN 2 AND {_LP_HUB_CAP}),
       tri AS (SELECT a.node, count(*) AS closed
               FROM adjc a JOIN adjc b
                 ON a.node = b.node AND a.nbr < b.nbr
               JOIN e ON e.u = a.nbr AND e.v = b.nbr
               GROUP BY 1)
       SELECT d.node AS part, d.deg,
              coalesce(t.closed, 0)::BIGINT AS triangles,
              round(2.0 * coalesce(t.closed, 0)
                    / (d.deg * (d.deg - 1)), 6) AS clustering_coeff
       FROM deg d LEFT JOIN tri t ON t.node = d.node
       WHERE d.deg BETWEEN 2 AND {_LP_HUB_CAP}
       ORDER BY part""",
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per part: closed neighbor pairs /
    C(deg, 2) — how clique-like each part's co-purchase neighborhood is
    (graph_triangle_count totals triangles globally; this attributes them
    to nodes, the community-tightness signal). Plan: neighbor-pair wedges
    enumerated per center from the symmetric adjacency, closed by an
    equi-join against the (u < v) edge set. Wedge volume is deg² per
    center, so the STOP-HUB cap bounds the blowup exactly as in
    link prediction; beyond-cap hubs are EXCLUDED (declared, mirrored in
    the oracle) rather than silently truncated. The ratio is one float
    division from exact integer counts."""
    from hawaiidatapipeline_spark.operators.graph import copurchase_edges
    from hawaiidatapipeline_spark.operators.materialize import materialize

    li = load_table(spark, sf_dir, "lineitem")
    edges = materialize(copurchase_edges(li))  # (u, v), u < v
    adj = materialize(
        edges.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
            edges.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
        )
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    capped = deg.filter(
        (F.col("deg") >= 2) & (F.col("deg") <= _LP_HUB_CAP)
    )
    adjc = materialize(adj.join(capped.select("node"), "node"))
    a, b = adjc.alias("a"), adjc.alias("b")
    tri = (
        a.join(
            b,
            (F.col("a.node") == F.col("b.node"))
            & (F.col("a.nbr") < F.col("b.nbr")),
        )
        .join(
            edges,
            (F.col("a.nbr") == edges["u"]) & (F.col("b.nbr") == edges["v"]),
        )
        .groupBy(F.col("a.node").alias("node"))
        .agg(F.count(F.lit(1)).alias("closed"))
    )
    return (
        capped.join(tri, "node", "left")
        .select(
            F.col("node").alias("part"),
            "deg",
            F.coalesce(F.col("closed"), F.lit(0)).alias("triangles"),
            F.round(
                2.0 * F.coalesce(F.col("closed"), F.lit(0))
                / (F.col("deg") * (F.col("deg") - 1)),
                6,
            ).alias("clustering_coeff"),
        )
        .orderBy("part")
    )


@q(
    "graph_two_hop_reach",
    f"""WITH {_ADJ_SQL},
       mid AS (SELECT a.node, a.nbr FROM adj a
               JOIN deg d ON d.node = a.nbr
               WHERE d.deg <= {_LP_HUB_CAP}),
       hops AS (SELECT m.node, b.nbr AS w
                FROM mid m JOIN adj b ON b.node = m.nbr
                UNION
                SELECT node, nbr AS w FROM adj)
       SELECT h.node AS part, d.deg,
              count(DISTINCT h.w)::BIGINT AS two_hop_reach
       FROM hops h JOIN deg d ON d.node = h.node
       WHERE h.w <> h.node
       GROUP BY 1, 2 ORDER BY part""",
)
def graph_two_hop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop neighborhood size per part over the co-purchase graph — the
    influence-radius metric (how much of the catalog is 'two co-purchases
    away'?), the counting companion to graph_link_prediction's wedge
    scores. Direct neighbors always count; two-hop paths are admitted only
    through middle nodes under the STOP-HUB cap (one ubiquitous hub would
    otherwise make every node 2-reach the whole graph while exploding the
    join — same declared exclusion as the wedge queries, mirrored in the
    oracle). Plan: one adjacency self-join through the capped middle, a
    UNION with the 1-hop set, one distinct count."""
    from hawaiidatapipeline_spark.operators.graph import copurchase_edges
    from hawaiidatapipeline_spark.operators.materialize import materialize

    li = load_table(spark, sf_dir, "lineitem")
    edges = materialize(copurchase_edges(li))  # (u, v), u < v
    adj = materialize(
        edges.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
            edges.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
        )
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    mid = adj.join(
        deg.filter(F.col("deg") <= _LP_HUB_CAP)
        .select(F.col("node").alias("nbr")),
        "nbr",
    )
    two = mid.alias("m").join(
        adj.alias("b"), F.col("b.node") == F.col("m.nbr")
    ).select(F.col("m.node").alias("node"), F.col("b.nbr").alias("w"))
    hops = two.union(
        adj.select(F.col("node"), F.col("nbr").alias("w"))
    ).distinct()
    return (
        hops.filter(F.col("w") != F.col("node"))
        .groupBy("node")
        .agg(F.countDistinct("w").alias("two_hop_reach"))
        .join(deg, "node")
        .select(
            F.col("node").alias("part"), "deg", "two_hop_reach"
        )
        .orderBy("part")
    )


_BFS_SEED_MOD = 200  # seed-set floor: partkeys divisible by 200
_BFS_MAX_HOPS = 3
# VERDICT r12 #5: seeds were ∝ nodes (node % 200 = 0), so the seeded-BFS
# family did seeds×frontier work — superlinear at the 10× lane (harmonic
# alpha10 0.48). The modulus now corpus-scales to cap the seed set at
# ~_BFS_TARGET_SEEDS at ANY graph size (the triplet-stride pattern):
# mod = max(200, ceil(n_nodes / 100)). The clamp floor keeps sf0.01/sf0.1
# at mod = 200 exactly (2k/20k parts → ceil ≤ 200), so checked hashes are
# unchanged; both engines compute the modulus from the same distinct-node
# count in pure integer arithmetic.
_BFS_TARGET_SEEDS = 100
_BFS_SEED_MOD_SQL = (
    f"(SELECT greatest({_BFS_SEED_MOD}, (count(DISTINCT node) + "
    f"{_BFS_TARGET_SEEDS - 1}) // {_BFS_TARGET_SEEDS}) FROM adj)"
)


def _bfs_seeds(adj: DataFrame) -> DataFrame:
    """Corpus-scaled seed set (node column): ONE materialized distinct-node
    frame serves both the modulus count and the seed filter — Spark twin
    of the seeds CTE with _BFS_SEED_MOD_SQL."""
    from hawaiidatapipeline_spark.operators.materialize import materialize

    nodes = materialize(adj.select("node").distinct())
    n = nodes.count()
    mod = max(_BFS_SEED_MOD, (n + _BFS_TARGET_SEEDS - 1) // _BFS_TARGET_SEEDS)
    return nodes.filter(F.col("node") % mod == 0)


@q(
    "graph_bfs_hops",
    f"""WITH RECURSIVE {_ADJ_SQL},
       seeds AS (
         SELECT DISTINCT node FROM adj WHERE node % {_BFS_SEED_MOD_SQL} = 0),
       bfs (node, dist) AS (
         SELECT node, 0 FROM seeds
         UNION
         SELECT adj.nbr, bfs.dist + 1
         FROM bfs JOIN adj ON adj.node = bfs.node
         WHERE bfs.dist < {_BFS_MAX_HOPS})
       SELECT node AS part, min(dist)::BIGINT AS dist
       FROM bfs GROUP BY node ORDER BY part""",
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded multi-source BFS: minimum hop distance (≤ 3) from the
    seed parts (partkey % 200 = 0) over the co-purchase graph — the
    blast-radius / related-products primitive (recall expansion from a
    seed set, contamination spread, feature propagation). Spark runs
    the FRONTIER form: per hop, join the current best-distance table to
    the adjacency on the frontier side only and fold with min — each
    round is one equi-join + one partial-agg min, materialized to
    truncate lineage, O(edges touched by the frontier) per hop with NO
    path enumeration (the recursive oracle's UNION dedup is what Spark
    does eagerly every round). Hop count is a constant, so the whole
    plan is a fixed chain of hash joins; at 100 TB each round shuffles
    on node id — the same shape as ``graph_connected_components``'s
    hash-min rounds but with a hard iteration bound and a seed-side
    frontier that usually shrinks the join's build side to a fraction
    of the graph."""
    from hawaiidatapipeline_spark.operators.graph import copurchase_edges
    from hawaiidatapipeline_spark.operators.materialize import materialize

    li = load_table(spark, sf_dir, "lineitem")
    edges = materialize(copurchase_edges(li))  # (u, v), u < v
    # adj/dist0 derive from checkpoints with one cheap map each — their
    # own materialize() passes were pure overhead (r14, guide §1.2: fewer
    # passes; the expensive edge build above stays checkpointed once)
    adj = edges.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
        edges.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    dist = _bfs_seeds(adj).withColumn("dist", F.lit(0))
    for hop in range(1, _BFS_MAX_HOPS + 1):
        frontier = dist.filter(F.col("dist") == hop - 1)
        reached = frontier.join(adj, "node").select(
            F.col("nbr").alias("node"), F.lit(hop).alias("dist")
        )
        dist = materialize(
            dist.unionByName(reached).groupBy("node").agg(
                F.min("dist").alias("dist")
            )
        )
    return dist.select(
        F.col("node").alias("part"), F.col("dist").cast("long").alias("dist")
    ).orderBy("part")


_RICH_CLUB_KS = (5, 10, 20, 40)


@q(
    "graph_rich_club",
    f"""WITH {_ADJ_SQL},
       k AS (SELECT unnest(ARRAY{list(_RICH_CLUB_KS)}) AS k),
       club AS (
         SELECT k.k, count(*)::BIGINT AS n_nodes
         FROM k JOIN deg ON deg.deg > k.k GROUP BY k.k),
       club_edges AS (
         SELECT k.k, count(*)::BIGINT AS n_edges
         FROM k JOIN e ON TRUE
         JOIN deg du ON du.node = e.u
         JOIN deg dv ON dv.node = e.v
         WHERE du.deg > k.k AND dv.deg > k.k
         GROUP BY k.k)
       SELECT c.k AS degree_threshold, c.n_nodes,
              coalesce(ce.n_edges, 0)::BIGINT AS n_edges,
              CASE WHEN c.n_nodes >= 2
                   THEN round(2.0 * coalesce(ce.n_edges, 0)
                              / (c.n_nodes * (c.n_nodes - 1.0)), 6)
              END AS phi
       FROM club c LEFT JOIN club_edges ce ON ce.k = c.k
       ORDER BY degree_threshold""",
)
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient φ(k) = 2·E_k / (N_k·(N_k−1)) over the
    co-purchase graph: do high-degree parts preferentially co-occur
    with each other? (The hub-interconnection diagnostic that decides
    whether the stop-hub caps used across the graph family discard
    redundant or structural edges.) Exact integer node/edge counts per
    threshold; φ is one closed-form division. Shape: the edge list
    joins the degree table on BOTH endpoints (two broadcast-sized hash
    joins — degrees are a node-grain table, far smaller than edges),
    then a |K|-row conditional aggregate; nothing quadratic — the
    N_k·(N_k−1) denominator is arithmetic, not a pair join. At 100 TB
    the degree table partial-aggregates map-side and the threshold
    sweep shares ONE scan of the edge list."""
    from hawaiidatapipeline_spark.operators.graph import copurchase_edges
    from hawaiidatapipeline_spark.operators.materialize import materialize

    li = load_table(spark, sf_dir, "lineitem")
    edges = materialize(copurchase_edges(li))  # (u, v), u < v
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    ks = spark.range(0).sparkSession.createDataFrame(
        [(k,) for k in _RICH_CLUB_KS], "k bigint"
    )
    club = (
        F.broadcast(ks)
        .join(deg, deg["deg"] > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    )
    ej = (
        edges.join(
            deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u"
        )
        .join(
            deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v"
        )
    )
    club_edges = (
        F.broadcast(ks.withColumnRenamed("k", "ke"))
        .join(ej, (F.col("du") > F.col("ke")) & (F.col("dv") > F.col("ke")))
        .groupBy("ke")
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    )
    out = club.join(
        club_edges, club["k"] == club_edges["ke"], "left"
    ).select(
        F.col("k").alias("degree_threshold"),
        "n_nodes",
        F.coalesce(F.col("n_edges"), F.lit(0)).cast("long").alias("n_edges"),
        F.when(
            F.col("n_nodes") >= 2,
            F.round(
                2.0
                * F.coalesce(F.col("n_edges"), F.lit(0))
                / (F.col("n_nodes") * (F.col("n_nodes") - F.lit(1.0))),
                6,
            ),
        ).alias("phi"),
    )
    return out.orderBy("degree_threshold")


@q(
    "graph_lpa_modularity",
    f"""WITH {_ADJ_SQL},
       l1 AS (
         SELECT node, least(node, min(nbr))::BIGINT AS l
         FROM adj GROUP BY node),
       l2 AS (
         SELECT a.node,
                least(min(s.l), min(n.l))::BIGINT AS l
         FROM adj a
         JOIN l1 s ON s.node = a.node
         JOIN l1 n ON n.node = a.nbr
         GROUP BY a.node),
       m AS (SELECT count(*)::BIGINT AS m FROM e),
       intra AS (
         SELECT count(*)::BIGINT AS intra
         FROM e JOIN l2 lu ON lu.node = e.u
                JOIN l2 lv ON lv.node = e.v
         WHERE lu.l = lv.l),
       dsum AS (
         SELECT sum(dc * dc)::BIGINT AS sum_d2,
                count(*)::BIGINT AS n_communities
         FROM (SELECT l2.l, sum(deg.deg)::BIGINT AS dc
               FROM l2 JOIN deg ON deg.node = l2.node GROUP BY l2.l))
       SELECT dsum.n_communities, m.m AS n_edges, intra.intra AS intra_edges,
              round(intra.intra::DOUBLE / m.m
                    - dsum.sum_d2::DOUBLE / (4.0 * m.m * m.m), 6)
                AS modularity
       FROM m CROSS JOIN intra CROSS JOIN dsum""",
)
def graph_lpa_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modularity of the TWO-ROUND min-label propagation partition over
    the co-purchase graph — the cheap-community diagnostic: two
    synchronous hash-min rounds (the prefix of what
    graph_connected_components runs to convergence) produce a real,
    non-trivial partition, and Q = Σ_c (e_c/m − (D_c/2m)²) says whether
    those cheap labels already capture the graph's block structure
    (Q ≈ 0 ⇒ keep iterating or use a better method; Q materially > 0 ⇒
    the two-round labels are usable for prepartitioning). Rewritten as
    Q = intra/m − ΣD_c²/(4m²): both aggregates are exact int64, Q is
    ONE closed-form double expression — no per-community float
    summation to order. Shape: two rounds of node-keyed join+min (the
    CC step shape, hard-bounded at 2), then an edge×label join and a
    label-grain degree sum. At 100 TB each round is one hash-join
    shuffle on node id; the modularity arithmetic is label-grain."""
    from hawaiidatapipeline_spark.operators.graph import copurchase_edges
    from hawaiidatapipeline_spark.operators.materialize import materialize

    li = load_table(spark, sf_dir, "lineitem")
    edges = materialize(copurchase_edges(li))
    adj = materialize(
        edges.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
            edges.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
        )
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    l1 = materialize(
        adj.groupBy("node").agg(
            F.least(F.col("node"), F.min("nbr")).cast("long").alias("l")
        )
    )
    # least(min(ls), min(ln)) with ls constant per node is
    # least(l1[node], min over nbrs of l1[nbr]) — so the node's own label
    # joins AFTER the aggregate at node grain instead of riding every
    # edge row through the nbr join (guide §2.3: one fewer edge-sized
    # shuffle, identical values).
    l2 = materialize(
        adj.join(
            l1.select(F.col("node").alias("nbr"), F.col("l").alias("ln")),
            "nbr",
        )
        .groupBy("node")
        .agg(F.min("ln").alias("_mn"))
        .join(l1, "node")
        .select(
            "node",
            F.least(F.col("l"), F.col("_mn")).cast("long").alias("l"),
        )
    )
    m = edges.agg(F.count(F.lit(1)).cast("long").alias("m"))
    intra = (
        edges.join(
            l2.select(F.col("node").alias("u"), F.col("l").alias("lu")), "u"
        )
        .join(
            l2.select(F.col("node").alias("v"), F.col("l").alias("lv")), "v"
        )
        .filter(F.col("lu") == F.col("lv"))
        .agg(F.count(F.lit(1)).cast("long").alias("intra"))
    )
    dsum = (
        l2.join(deg, "node")
        .groupBy("l")
        .agg(F.sum("deg").cast("long").alias("dc"))
        .agg(
            F.sum(F.col("dc") * F.col("dc")).cast("long").alias("sum_d2"),
            F.count(F.lit(1)).cast("long").alias("n_communities"),
        )
    )
    mm = F.col("m").cast("double")
    return (
        m.crossJoin(F.broadcast(intra))
        .crossJoin(F.broadcast(dsum))
        .select(
            "n_communities",
            F.col("m").alias("n_edges"),
            F.col("intra").alias("intra_edges"),
            F.round(
                F.col("intra").cast("double") / mm
                - F.col("sum_d2").cast("double") / (4.0 * mm * mm),
                6,
            ).alias("modularity"),
        )
    )


@q(
    "graph_harmonic_centrality",
    f"""WITH RECURSIVE {_ADJ_SQL},
       seeds AS (
         SELECT DISTINCT node FROM adj WHERE node % {_BFS_SEED_MOD_SQL} = 0),
       bfs (seed, node, dist) AS (
         SELECT node, node, 0 FROM seeds
         UNION
         SELECT bfs.seed, adj.nbr, bfs.dist + 1
         FROM bfs JOIN adj ON adj.node = bfs.node
         WHERE bfs.dist < {_BFS_MAX_HOPS}),
       best AS (SELECT seed, node, min(dist) AS dist
                FROM bfs GROUP BY 1, 2),
       agg AS (
         SELECT seed,
                sum(CASE WHEN dist = 1 THEN 1 ELSE 0 END)::BIGINT AS n_1hop,
                sum(CASE WHEN dist = 2 THEN 1 ELSE 0 END)::BIGINT AS n_2hop,
                sum(CASE WHEN dist = 3 THEN 1 ELSE 0 END)::BIGINT AS n_3hop
         FROM best WHERE dist > 0 GROUP BY 1)
       SELECT seed AS part, n_1hop, n_2hop, n_3hop,
              (1000 * n_1hop + 500 * n_2hop + 333 * n_3hop)::BIGINT
                AS harmonic_milli
       FROM agg ORDER BY part""",
)
def graph_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded harmonic centrality Σ 1/d(s, v) for the sampled seed set
    (d ≤ 3 hops on the co-purchase graph) — the closeness-family
    centrality that handles disconnected graphs (unreachable nodes
    contribute 0, no infinite distances). Reuses graph_bfs_hops'
    frontier rounds but keyed (seed, node) so every seed's distance
    field rides one shuffle family; the discount 1/d for d in {{1,2,3}}
    is the exact integer milli-table 1000/500/333, so the centrality is
    a pure integer sum — no float anywhere. Scale: per hop the join
    touches frontier-adjacent edges only; seeds are the audit-slice
    sample (the all-pairs version is quadratic by definition — sampled
    seeds is how production estimates centralities, Eppstein-Wang
    style)."""
    from hawaiidatapipeline_spark.operators.graph import copurchase_edges
    from hawaiidatapipeline_spark.operators.materialize import materialize

    li = load_table(spark, sf_dir, "lineitem")
    edges = materialize(copurchase_edges(li))
    adj = materialize(
        edges.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
            edges.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
        )
    )
    dist = materialize(
        _bfs_seeds(adj).select(
            F.col("node").alias("seed"), "node", F.lit(0).alias("dist")
        )
    )
    for hop in range(1, _BFS_MAX_HOPS + 1):
        frontier = dist.filter(F.col("dist") == hop - 1)
        reached = frontier.join(adj, "node").select(
            "seed", F.col("nbr").alias("node"), F.lit(hop).alias("dist")
        )
        dist = materialize(
            dist.unionByName(reached)
            .groupBy("seed", "node")
            .agg(F.min("dist").alias("dist"))
        )
    agg = (
        dist.filter(F.col("dist") > 0)
        .groupBy("seed")
        .agg(
            F.sum(F.when(F.col("dist") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_1hop"),
            F.sum(F.when(F.col("dist") == 2, 1).otherwise(0))
            .cast("long")
            .alias("n_2hop"),
            F.sum(F.when(F.col("dist") == 3, 1).otherwise(0))
            .cast("long")
            .alias("n_3hop"),
        )
    )
    return agg.select(
        F.col("seed").alias("part"),
        "n_1hop",
        "n_2hop",
        "n_3hop",
        (1000 * F.col("n_1hop") + 500 * F.col("n_2hop") + 333 * F.col("n_3hop"))
        .cast("long")
        .alias("harmonic_milli"),
    ).orderBy("part")


_PPR_ITER = 3
_PPR_TELEPORT = 150000  # (1-d)·1e6 per seed, unnormalized convention
_PPR_TOPK = 100


def _ppr_sql() -> str:
    step = """p{i} AS (
       SELECT n.node,
              (CASE WHEN n.node % 200 = 0 THEN 150000 ELSE 0 END
               + (85 * coalesce(s.inn, 0)) // 100)::BIGINT AS r
       FROM nodes n LEFT JOIN (
         SELECT e.dst AS node, sum(p{p}.r // d.deg) AS inn
         FROM p{p} JOIN cop e ON p{p}.node = e.src
                   JOIN deg d ON d.src = e.src
         WHERE p{p}.r > 0
         GROUP BY e.dst
       ) s ON s.node = n.node)"""
    steps = ",\n       ".join(
        step.format(i=i, p=i - 1) for i in range(1, _PPR_ITER + 1)
    )
    return f"""WITH items AS (SELECT l_orderkey, l_partkey FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) QUALIFY count(*) OVER (PARTITION BY l_orderkey) <= 64),
       cop AS (
         SELECT a.l_partkey AS src, b.l_partkey AS dst
         FROM items a JOIN items b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
         GROUP BY 1, 2 HAVING count(*) >= 2
       ),
       nodes AS (SELECT DISTINCT src AS node FROM cop),
       deg AS (SELECT src, count(*) AS deg FROM cop GROUP BY src),
       p0 AS (SELECT node,
                     CASE WHEN node % 200 = 0 THEN 1000000 ELSE 0 END::BIGINT
                       AS r
              FROM nodes),
       {steps}
       SELECT node AS part,
              CASE WHEN node % 200 = 0 THEN 1 ELSE 0 END AS is_seed,
              r AS ppr_micro
       FROM p{_PPR_ITER} WHERE r > 0
       ORDER BY r DESC, node LIMIT {_PPR_TOPK}"""


@q("graph_ppr_seeded", _ppr_sql())
def graph_ppr_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from the sampled seed set (parts divisible
    by 200, the BFS/harmonic seed idiom) over the co-purchase graph —
    THE related-items / graph-similarity primitive: teleport mass
    returns only to the SEEDS (unnormalized per-seed convention,
    (1−d)·1e6 each, documented), so rank concentrates in the seeds'
    neighborhoods instead of global hubs. Same integer fixed-point
    contract as graph_pagerank_copurchase (micro-unit ranks, integer
    floor-div contributions, d = 85%), so the oracle unrolls the three
    rounds as CTEs and hash-matches. The r > 0 guard keeps each round's
    join frontier-sized (only touched nodes propagate) — at 100 TB a
    seeded PPR touches the seeds' k-hop ball, never the full graph,
    which is exactly how production related-items pipelines run it.
    Top-100 under a total (rank, node) order."""
    from hawaiidatapipeline_spark.operators.graph import copurchase_edges
    from hawaiidatapipeline_spark.operators.materialize import materialize

    li = load_table(spark, sf_dir, "lineitem")
    edges = materialize(copurchase_edges(li, directed=True))
    nodes = materialize(edges.select(F.col("src").alias("node")).distinct())
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    is_seed = F.col("node") % 200 == 0
    ranks = materialize(
        nodes.select(
            "node",
            F.when(is_seed, 1000000).otherwise(0).cast("long").alias("r"),
        )
    )
    for _ in range(_PPR_ITER):
        contribs = (
            ranks.filter(F.col("r") > 0)
            .join(edges, ranks["node"] == edges["src"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("_dst"),
                F.expr("div(r, deg)").alias("_c"),
            )
            .groupBy("_dst")
            .agg(F.sum("_c").alias("inn"))
        )
        ranks = materialize(
            nodes.join(contribs, nodes["node"] == contribs["_dst"], "left")
            .select(
                "node",
                (
                    F.when(is_seed, _PPR_TELEPORT).otherwise(0).cast("long")
                    + F.expr("div(85 * coalesce(inn, 0), 100)").cast("long")
                ).alias("r"),
            )
        )
    return (
        ranks.filter(F.col("r") > 0)
        .select(
            F.col("node").alias("part"),
            F.when(is_seed, 1).otherwise(0).alias("is_seed"),
            F.col("r").alias("ppr_micro"),
        )
        .orderBy(F.col("ppr_micro").desc(), "part")
        .limit(_PPR_TOPK)
    )
