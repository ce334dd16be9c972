"""Round-13 batch 6: privacy audit, theta-sketch set operations,
weighted-reservoir mergeability, and Katz centrality (SURVEY.md §2).

Four more gaps a production deployment hits:

- **k-anonymity / l-diversity audit** (Sweeney 2002; Machanavajjhala
  et al. 2006): before releasing a table, report every quasi-identifier
  equivalence class with its k (class size) and l (distinct sensitive
  values), plus whether one generalization step (nation → region)
  rescues the at-risk classes — the privacy twin of `dq_column_masking`.
- **Theta-sketch set operations** (Dasgupta et al. 2016, the
  DataSketches theta family): KMV synopses support not just distinct
  counts (`agg_distinct_kmv`) but set ALGEBRA — union / intersection /
  a-not-b estimates from the k smallest hashes under a common theta.
  That is the sketch a 100 TB audience-overlap query actually ships.
- **Weighted-reservoir mergeability proof** (Efraimidis & Spirakis
  2006, A-ES): weighted sampling without replacement via top-k by
  u^(1/w) keys is a MERGEABLE sampler — per-shard top-k synopses union
  + re-take-k to exactly the direct sample. The sampling twin of
  `agg_kmv_merge_proof`.
- **Katz centrality** (Katz 1953): attenuated walk-count centrality
  over the part co-purchase graph — the damping-free complement of
  `graph_pagerank_copurchase`, unrolled to 3 rounds in integer milli
  fixed point so the oracle reproduces every score exactly.

House determinism rules throughout: portable 60-bit md5 hashes, floor
immediately after every transcendental, integer division for every
rescale, identical aliases both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.materialize import materialize
from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()

# ------------------------------------------------- k-anonymity audit

_KANON_K = 5  # release threshold: every QI class must have >= K rows


@q(
    "dq_k_anonymity",
    f"""WITH sens AS (
  SELECT c_custkey, c_nationkey, c_mktsegment,
         floor(c_acctbal / 1000.0)::BIGINT AS sbucket
  FROM customer),
cls AS (
  SELECT c_nationkey, c_mktsegment,
         count(*)::BIGINT AS k,
         count(DISTINCT sbucket)::BIGINT AS l_div
  FROM sens GROUP BY 1, 2),
gen AS (
  SELECT n.n_regionkey, s.c_mktsegment, count(*)::BIGINT AS region_k
  FROM sens s JOIN nation n ON n.n_nationkey = s.c_nationkey
  GROUP BY 1, 2)
SELECT c.c_nationkey, c.c_mktsegment, c.k, c.l_div,
       CASE WHEN c.k < {_KANON_K} THEN 1 ELSE 0 END AS at_risk,
       g.region_k,
       CASE WHEN c.k >= {_KANON_K} OR g.region_k >= {_KANON_K}
            THEN 1 ELSE 0 END AS releasable
FROM cls c
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN gen g ON g.n_regionkey = n.n_regionkey
          AND g.c_mktsegment = c.c_mktsegment
ORDER BY c.c_nationkey, c.c_mktsegment""",
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity release audit (Sweeney 2002;
    Machanavajjhala et al. 2006). Quasi-identifier = (nation, market
    segment); sensitive attribute = account-balance k$-bucket. Per QI
    equivalence class: k (rows sharing the QI tuple — an attacker's
    ambiguity set), l (distinct sensitive values — protection against
    homogeneity attacks), the k < 5 at-risk flag, and whether ONE
    generalization step up the nation → region hierarchy lifts the
    class over the threshold (the first move of a Mondrian-style
    generalizer). Scale: two partial-aggregated groupBys at QI grain
    plus broadcast joins against the 25-row nation dim — class count is
    bounded by the QI domain, never the row count."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    sens = c.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("sbucket"),
    )
    cls = sens.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.countDistinct("sbucket").cast("long").alias("l_div"),
    )
    gen = (
        sens.join(F.broadcast(n), sens.c_nationkey == n.n_nationkey)
        .groupBy("n_regionkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).cast("long").alias("region_k"))
    )
    return (
        cls.join(F.broadcast(n), cls.c_nationkey == n.n_nationkey)
        .join(F.broadcast(gen), ["n_regionkey", "c_mktsegment"])
        .select(
            "c_nationkey",
            "c_mktsegment",
            "k",
            "l_div",
            F.when(F.col("k") < _KANON_K, 1).otherwise(0).alias("at_risk"),
            "region_k",
            F.when(
                (F.col("k") >= _KANON_K) | (F.col("region_k") >= _KANON_K), 1
            )
            .otherwise(0)
            .alias("releasable"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


# ---------------------------------------- theta-sketch set operations

_THETA_K = 64
_THETA_SEED = 11
_H_SPACE = 1152921504606846976  # 2^60, the portable-hash range


def _theta_hash_sql(col: str, seed: int) -> str:
    return (
        f"('0x' || substring(md5('{seed}:' || {col}::VARCHAR), 1, 15))::BIGINT"
    )


@q(
    "agg_theta_sketch_setops",
    f"""WITH a_raw AS (
  SELECT DISTINCT {_theta_hash_sql('o_custkey', _THETA_SEED)} AS h
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
b_raw AS (
  SELECT DISTINCT {_theta_hash_sql('o_custkey', _THETA_SEED)} AS h
  FROM orders WHERE o_totalprice > 250000),
a_syn AS (SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn FROM a_raw)
  WHERE rn <= {_THETA_K}),
b_syn AS (SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn FROM b_raw)
  WHERE rn <= {_THETA_K}),
th AS (SELECT least(
    (SELECT CASE WHEN count(*) < {_THETA_K} THEN {_H_SPACE}
                 ELSE max(h) END FROM a_syn),
    (SELECT CASE WHEN count(*) < {_THETA_K} THEN {_H_SPACE}
                 ELSE max(h) END FROM b_syn)) AS theta),
ra AS (SELECT h FROM a_syn, th WHERE h < theta),
rb AS (SELECT h FROM b_syn, th WHERE h < theta),
ops AS (
  SELECT 'union' AS op, count(*)::BIGINT AS retained
  FROM (SELECT h FROM ra UNION SELECT h FROM rb)
  UNION ALL
  SELECT 'intersect', count(*)::BIGINT
  FROM (SELECT h FROM ra INTERSECT SELECT h FROM rb)
  UNION ALL
  SELECT 'a_not_b', count(*)::BIGINT
  FROM (SELECT h FROM ra EXCEPT SELECT h FROM rb)),
exact AS (
  SELECT 'union' AS op, count(*)::BIGINT AS exact_distinct
  FROM (SELECT h FROM a_raw UNION SELECT h FROM b_raw)
  UNION ALL
  SELECT 'intersect', count(*)::BIGINT
  FROM (SELECT h FROM a_raw INTERSECT SELECT h FROM b_raw)
  UNION ALL
  SELECT 'a_not_b', count(*)::BIGINT
  FROM (SELECT h FROM a_raw EXCEPT SELECT h FROM b_raw))
SELECT o.op, o.retained, th.theta,
       round(o.retained * {_H_SPACE}.0 / th.theta, 6) AS est_distinct,
       e.exact_distinct
FROM ops o JOIN exact e ON e.op = o.op CROSS JOIN th
ORDER BY o.op""",
)
def agg_theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra (Dasgupta et al. 2016 — the Apache
    DataSketches theta family): two audiences (customers with an
    urgent/high-priority order; customers with a >250k order) are each
    summarized by a k=64 KMV synopsis over the portable 60-bit hash;
    theta = min of the two k-th hash values (2^60 when a set is exact);
    every synopsis hash below theta is a uniform sample of the union
    stream, so |union| ≈ retained·2^60/θ and the SAME retained sets
    answer intersection and a-not-b — set algebra no single-pass distinct
    count can do. Output per op: retained count, theta, the estimate, and
    the exact cardinality (audit leg). Scale: per-set synopses are
    bounded (k hashes) partial aggregates — the only thing that would
    cross the wire at 100 TB; the exact leg is the fixture-side audit,
    shed first at scale. Window tops run over distinct hashes only."""
    o = load_table(spark, sf_dir, "orders")
    from hawaiidatapipeline_spark.operators.dedup import portable_hash64

    def synopsis(raw: DataFrame) -> DataFrame:
        w = Window.orderBy("h")
        return (
            raw.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _THETA_K)
            .select("h")
        )

    a_raw = materialize(
        o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(
            portable_hash64(
                F.col("o_custkey").cast("string"), _THETA_SEED
            ).alias("h")
        )
        .distinct()
    )
    b_raw = materialize(
        o.filter(F.col("o_totalprice") > 250000)
        .select(
            portable_hash64(
                F.col("o_custkey").cast("string"), _THETA_SEED
            ).alias("h")
        )
        .distinct()
    )
    a_syn, b_syn = materialize(synopsis(a_raw)), materialize(synopsis(b_raw))

    def kth(syn: DataFrame) -> DataFrame:
        return syn.agg(
            F.when(F.count(F.lit(1)) < _THETA_K, F.lit(_H_SPACE))
            .otherwise(F.max("h"))
            .cast("long")
            .alias("t")
        )

    theta = materialize(
        kth(a_syn)
        .crossJoin(F.broadcast(kth(b_syn).withColumnRenamed("t", "t2")))
        .select(F.least("t", "t2").alias("theta"))
    )
    ra = a_syn.crossJoin(F.broadcast(theta)).filter(
        F.col("h") < F.col("theta")
    ).select("h")
    rb = b_syn.crossJoin(F.broadcast(theta)).filter(
        F.col("h") < F.col("theta")
    ).select("h")

    def cnt(df: DataFrame, op: str) -> DataFrame:
        return df.agg(
            F.lit(op).alias("op"),
            F.count(F.lit(1)).cast("long").alias("retained"),
        ).select("op", "retained")

    ops = (
        cnt(ra.union(rb).distinct(), "union")
        .unionByName(cnt(ra.intersect(rb), "intersect"))
        .unionByName(cnt(ra.exceptAll(rb).distinct(), "a_not_b"))
    )
    exact = (
        cnt(a_raw.union(b_raw).distinct(), "union")
        .unionByName(cnt(a_raw.intersect(b_raw), "intersect"))
        .unionByName(cnt(a_raw.exceptAll(b_raw).distinct(), "a_not_b"))
    ).withColumnRenamed("retained", "exact_distinct")
    return (
        ops.join(exact, "op")
        .crossJoin(F.broadcast(theta))
        .select(
            "op",
            "retained",
            "theta",
            F.round(
                F.col("retained") * float(_H_SPACE) / F.col("theta"), 6
            ).alias("est_distinct"),
            "exact_distinct",
        )
        .orderBy("op")
    )


# ------------------------------- weighted-reservoir mergeability proof

_RES_K = 32
_RES_SHARDS = 32
_RES_SEED = 13


@q(
    "sample_reservoir_merge_proof",
    f"""WITH keyed AS (
  SELECT o_orderkey,
         o_orderkey % {_RES_SHARDS} AS shard,
         (floor(-ln(({_theta_hash_sql('o_orderkey', _RES_SEED)} + 1)
                    / {_H_SPACE}.0) * 1000000)::BIGINT * 1000000)
           // greatest(1, floor(o_totalprice)::BIGINT) AS kv
  FROM orders),
shard_syn AS (
  SELECT o_orderkey, kv FROM (
    SELECT o_orderkey, kv,
           row_number() OVER (PARTITION BY shard
                              ORDER BY kv, o_orderkey) AS rn
    FROM keyed)
  WHERE rn <= {_RES_K}),
merged AS (
  SELECT o_orderkey, kv,
         row_number() OVER (ORDER BY kv, o_orderkey) AS rn
  FROM shard_syn QUALIFY rn <= {_RES_K}),
direct AS (
  SELECT o_orderkey, kv,
         row_number() OVER (ORDER BY kv, o_orderkey) AS rn
  FROM keyed QUALIFY rn <= {_RES_K})
SELECT m.rn, m.o_orderkey, m.kv AS key_val,
       CASE WHEN m.o_orderkey = d.o_orderkey
             AND m.kv = d.kv THEN 1 ELSE 0 END AS match_direct
FROM merged m JOIN direct d ON d.rn = m.rn
ORDER BY m.rn""",
)
def sample_reservoir_merge_proof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-reservoir MERGEABILITY proof (Efraimidis & Spirakis
    2006, A-ES): sampling k orders without replacement with probability
    ∝ o_totalprice is top-k by the key −ln(u)/w (u = uniform from the
    portable hash, w = the weight) — and because top-k is a mergeable
    synopsis, per-shard reservoirs (orderkey mod 32 — stand-in for
    executor partials) union + re-take-k to EXACTLY the direct sample.
    Key arithmetic is the house integer lane: floor(−ln(u)·1e6) then an
    exact integer rescale-divide by w, ties broken by orderkey, so both
    engines rank identically. Output: the merged reservoir's 32 rows
    with a per-position match flag against the direct sample. Scale:
    the per-shard top-k window partitions by shard (production swaps in
    a bounded per-executor heap); the merge and the direct leg rank
    ≤ shards·k and k rows — only synopses cross the wire."""
    o = load_table(spark, sf_dir, "orders")
    from hawaiidatapipeline_spark.operators.dedup import portable_hash64

    u = (
        portable_hash64(F.col("o_orderkey").cast("string"), _RES_SEED)
        + F.lit(1)
    ) / F.lit(float(_H_SPACE))
    keyed = materialize(
        o.select(
            "o_orderkey",
            F.pmod(F.col("o_orderkey"), F.lit(_RES_SHARDS)).alias("shard"),
            F.floor(-F.log(u) * 1000000).cast("long").alias("lkey"),
            F.greatest(
                F.lit(1), F.floor("o_totalprice").cast("long")
            ).alias("w"),
        ).select(
            "o_orderkey",
            "shard",
            F.expr("(lkey * 1000000) div w").alias("kv"),
        )
    )
    w_shard = Window.partitionBy("shard").orderBy("kv", "o_orderkey")
    shard_syn = (
        keyed.withColumn("rn", F.row_number().over(w_shard))
        .filter(F.col("rn") <= _RES_K)
        .select("o_orderkey", "kv")
    )
    w_all = Window.orderBy("kv", "o_orderkey")
    merged = (
        shard_syn.withColumn("rn", F.row_number().over(w_all))
        .filter(F.col("rn") <= _RES_K)
    )
    # direct leg: sort+limit (TakeOrdered — no global window over the
    # corpus), then rank the 32 survivors
    direct = (
        keyed.select("o_orderkey", "kv")
        .orderBy("kv", "o_orderkey")
        .limit(_RES_K)
        .withColumn("rn", F.row_number().over(w_all))
        .withColumnRenamed("o_orderkey", "d_orderkey")
        .withColumnRenamed("kv", "d_kv")
    )
    return (
        merged.join(direct, "rn")
        .select(
            "rn",
            "o_orderkey",
            F.col("kv").alias("key_val"),
            F.when(
                (F.col("o_orderkey") == F.col("d_orderkey"))
                & (F.col("kv") == F.col("d_kv")),
                1,
            )
            .otherwise(0)
            .alias("match_direct"),
        )
        .orderBy("rn")
    )


# ---------------------------------------------------- Katz centrality

_KATZ_ROUNDS = 3  # walk lengths 1..3, attenuation alpha = 1/4


def _katz_sql() -> str:
    step = """x{i} AS (
       SELECT n.node, (coalesce(s.t, 0) // 4)::BIGINT AS x
       FROM nodes n LEFT JOIN (
         SELECT e.dst AS node, sum(x{p}.x)::BIGINT AS t
         FROM x{p} JOIN cop e ON x{p}.node = e.src
         GROUP BY e.dst) s ON s.node = n.node)"""
    steps = ",\n       ".join(
        step.format(i=i, p=i - 1) for i in range(1, _KATZ_ROUNDS + 1)
    )
    parts = " + ".join(f"x{i}.x" for i in range(1, _KATZ_ROUNDS + 1))
    joins = " ".join(
        f"JOIN x{i} ON x{i}.node = x1.node"
        for i in range(2, _KATZ_ROUNDS + 1)
    )
    return f"""WITH items AS (SELECT l_orderkey, l_partkey FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) QUALIFY count(*) OVER (PARTITION BY l_orderkey) <= 64),
       cop AS (
         SELECT a.l_partkey AS src, b.l_partkey AS dst
         FROM items a JOIN items b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
         GROUP BY 1, 2 HAVING count(*) >= 2),
       nodes AS (SELECT DISTINCT src AS node FROM cop),
       x0 AS (SELECT node, 1000::BIGINT AS x FROM nodes),
       {steps}
       SELECT x1.node, ({parts})::BIGINT AS katz_milli
       FROM x1 {joins}
       ORDER BY x1.node"""


@q("graph_katz_centrality", _katz_sql())
def graph_katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Katz centrality (Katz 1953): Σ_{l=1..3} α^l · (walks of length l
    ending at the node), α = 1/4, over the part co-purchase graph — the
    attenuated-walk complement of `graph_pagerank_copurchase` (no degree
    normalization, no damping mass) and of `graph_harmonic_centrality`
    (walks, not shortest paths). Integer milli fixed point: x0 = 1000,
    each round x_i(n) = (Σ_{src→n} x_{i−1}(src)) // 4 — floor-divide is
    the attenuation, so the oracle unrolls the rounds as CTEs and
    reproduces every score exactly. Per round: one join + one
    partial-aggregated groupBy at edge grain, materialized so the plan
    never deepens — the same O(rounds) linear-shuffle budget as
    PageRank. Scale: edge-grain shuffles only; no global state."""
    from hawaiidatapipeline_spark.operators.graph import copurchase_edges

    li = load_table(spark, sf_dir, "lineitem")
    edges = materialize(copurchase_edges(li, directed=True))
    nodes = materialize(
        edges.select(F.col("src").alias("node")).distinct()
    )
    x = nodes.select("node", F.lit(1000).cast("long").alias("x"))
    acc = None
    for _ in range(_KATZ_ROUNDS):
        inn = (
            x.join(edges, x.node == edges.src)
            .groupBy("dst")
            .agg(F.sum("x").cast("long").alias("t"))
        )
        x = materialize(
            nodes.join(inn, nodes.node == inn.dst, "left").select(
                "node",
                F.expr("coalesce(t, 0) div 4").cast("long").alias("x"),
            )
        )
        acc = x if acc is None else materialize(
            acc.withColumnRenamed("x", "a")
            .join(x, "node")
            .select("node", (F.col("a") + F.col("x")).alias("x"))
        )
    return acc.select(
        "node", F.col("x").cast("long").alias("katz_milli")
    ).orderBy("node")


# ------------------------------------- gradient-alignment influence

_INFL_VAL_MOD = 7  # doc_id % 7 == 0 is the held-out validation slice
_INFL_SCALE = 1000000000000  # output = raw influence // 1e12
_INFL_TOPK = 20


def _influence_sql() -> str:
    from hawaiidatapipeline_spark.queries.round12_extra import (
        _QC_ROUNDS,
        _qc_sql_parts,
    )

    r = _QC_ROUNDS
    return f"""WITH {_qc_sql_parts()},
sfin AS (SELECT d.doc_id, sum(d.v * w.w)::BIGINT AS s
         FROM dense d JOIN w{r} w ON w.f = d.f GROUP BY 1),
rfin AS (SELECT s.doc_id,
                (l.y * 1000000
                 - floor(1000000.0
                         / (1.0 + exp(-(s.s / 1000000000.0)))))::BIGINT
                  AS resid
         FROM sfin s JOIN lab l ON l.doc_id = s.doc_id),
gv AS (SELECT d.f, sum(r.resid::HUGEINT * d.v) AS g
       FROM dense d JOIN rfin r ON r.doc_id = d.doc_id
       WHERE d.doc_id % {_INFL_VAL_MOD} = 0 GROUP BY 1),
dot AS (SELECT d.doc_id, sum(d.v::HUGEINT * g.g) AS dp
        FROM dense d JOIN gv g ON g.f = d.f
        WHERE d.doc_id % {_INFL_VAL_MOD} <> 0 GROUP BY 1),
infl AS (SELECT t.doc_id,
                ((r.resid::HUGEINT * t.dp) // {_INFL_SCALE})::BIGINT
                  AS influence_e12
         FROM dot t JOIN rfin r ON r.doc_id = t.doc_id)
SELECT doc_id, influence_e12 FROM infl
ORDER BY influence_e12 DESC, doc_id LIMIT {_INFL_TOPK}"""


@q("llm_influence_proxy", _influence_sql())
def llm_influence_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gradient-alignment data attribution (TracIn / TRAK-lite — Pruthi
    et al. 2020): after the quality classifier trains
    (``llm_quality_classifier_train``'s exact GD arithmetic, reused),
    each training document's influence on a held-out validation slice is
    the dot product of its per-example logistic gradient resid_i·x_i
    with the validation-set gradient Σ_{v∈V} resid_v·x_v. Positive
    influence = this document pushes the model the way the validation
    slice wants — the ranking that drives gradient-based data selection
    and poisoned-example triage. Arithmetic: residuals in micro units,
    features in centered milli units, all products in
    DECIMAL(38,0)/HUGEINT (int64 wraps at corpus scale), truncating
    divide (both engines round toward zero) down to e12 units. Output:
    top-20 training docs by influence. Scale: the val gradient is a
    B+1-row broadcast; influence is ONE linear pass over the docs×B
    dense frame — same economics as a GD round."""
    from hawaiidatapipeline_spark.queries.round12_extra import _qc_train

    d = load_table(spark, sf_dir, "documents")
    dense, lab, n, w, _scores = _qc_train(spark, d)
    sfin = dense.join(F.broadcast(w), "f").groupBy("doc_id").agg(
        F.sum(F.col("v") * F.col("w")).cast("long").alias("s")
    )
    rfin = materialize(
        sfin.join(lab, "doc_id").select(
            "doc_id",
            (
                F.col("y") * 1000000
                - F.floor(
                    1000000.0 / (1.0 + F.exp(-(F.col("s") / 1000000000.0)))
                )
            )
            .cast("long")
            .alias("resid"),
        )
    )
    wide = "decimal(38,0)"
    gv = (
        dense.filter(F.col("doc_id") % _INFL_VAL_MOD == 0)
        .join(rfin, "doc_id")
        .groupBy("f")
        .agg(
            F.sum(F.col("resid").cast(wide) * F.col("v")).alias("g")
        )
    )
    dot = (
        dense.filter(F.col("doc_id") % _INFL_VAL_MOD != 0)
        .join(F.broadcast(gv), "f")
        .groupBy("doc_id")
        .agg(F.sum(F.col("v").cast(wide) * F.col("g")).alias("dp"))
    )
    return (
        dot.join(rfin, "doc_id")
        .select(
            "doc_id",
            F.expr(f"cast(resid as {wide}) * dp div {_INFL_SCALE}")
            .cast("long")
            .alias("influence_e12"),
        )
        .orderBy(F.desc("influence_e12"), "doc_id")
        .limit(_INFL_TOPK)
    )


# --------------------------------------- JL projection distortion audit

_JL_M = 16  # projected dimensionality
_JL_SEED = 17


@q(
    "emb_jl_distortion",
    f"""WITH qv AS (
  SELECT vec_id, unnest(generate_series(0, len(embedding) - 1)) AS d,
         round(unnest(embedding) * 1000)::BIGINT AS q
  FROM embeddings),
dims AS (SELECT DISTINCT d FROM qv),
signs AS (
  SELECT j.j, dims.d,
         CASE WHEN ('0x' || substring(md5('{_JL_SEED}:' || j.j || '|' || dims.d), 1, 15))::BIGINT % 2 = 0
              THEN 1 ELSE -1 END AS s
  FROM (SELECT unnest(generate_series(0, {_JL_M - 1})) AS j) j
  CROSS JOIN dims),
proj AS (
  SELECT qv.vec_id, signs.j, sum(signs.s * qv.q)::BIGINT AS y
  FROM qv JOIN signs ON signs.d = qv.d
  GROUP BY 1, 2),
probes AS (SELECT DISTINCT vec_id FROM qv
           WHERE vec_id % (SELECT greatest(31, ceil(count(*) / 65.0))::BIGINT
                           FROM embeddings) = 0),
od AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         sum((a.q - b.q) * (a.q - b.q))::BIGINT AS d2
  FROM qv a JOIN qv b ON b.d = a.d AND a.vec_id < b.vec_id
  JOIN probes pa ON pa.vec_id = a.vec_id
  JOIN probes pb ON pb.vec_id = b.vec_id
  GROUP BY 1, 2),
pd AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         sum((a.y - b.y) * (a.y - b.y))::BIGINT AS p2
  FROM proj a JOIN proj b ON b.j = a.j AND a.vec_id < b.vec_id
  JOIN probes pa ON pa.vec_id = a.vec_id
  JOIN probes pb ON pb.vec_id = b.vec_id
  GROUP BY 1, 2),
dist AS (
  SELECT od.va, od.vb,
         ((pd.p2 * 1000) // ({_JL_M} * od.d2))::BIGINT AS distortion_milli
  FROM od JOIN pd ON pd.va = od.va AND pd.vb = od.vb
  WHERE od.d2 > 0)
SELECT (distortion_milli // 250)::BIGINT AS bucket,
       count(*)::BIGINT AS n_pairs,
       min(distortion_milli)::BIGINT AS min_milli,
       max(distortion_milli)::BIGINT AS max_milli,
       (sum(distortion_milli) // count(*))::BIGINT AS mean_milli
FROM dist GROUP BY 1 ORDER BY 1""",
)
def emb_jl_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss distortion audit: project the milli-unit
    vectors to m=16 dims with a Rademacher ±1 matrix (signs from the
    portable hash of (j, d) — both engines rebuild the identical
    matrix), then compare projected vs original squared distances on
    the corpus-scaled probe pairs: distortion = ‖Pa−Pb‖²·1000 //
    (m·‖a−b‖²), expectation 1000 by E[‖Px‖²] = m‖x‖². The histogram
    (quarter-width buckets) is the go/no-go audit before shipping a
    JL-compressed index — the dimensionality-reduction twin of
    `emb_srp_buckets` (signs only) and `emb_pq_recall_report` (trained
    codebooks, this key's untrained baseline). Integer-only: quantized
    coordinates, exact int64 sums, one truncating divide. Scale: the
    projection is a 16×d broadcast + per-vector fold (map-only);
    distance legs are probe-pair grain (~2k pairs at ANY corpus size
    via the stride)."""
    e = load_table(spark, sf_dir, "embeddings")
    from hawaiidatapipeline_spark.operators.dedup import portable_hash64
    from hawaiidatapipeline_spark.queries.emb_extra import _adc_stride

    qv = materialize(
        e.select(
            "vec_id", F.posexplode("embedding").alias("d", "x")
        ).select(
            "vec_id",
            "d",
            F.round(F.col("x") * 1000).cast("long").alias("q"),
        )
    )
    dims = qv.select("d").distinct()
    signs = (
        spark.range(_JL_M)
        .select(F.col("id").cast("int").alias("j"))
        .crossJoin(F.broadcast(dims))
        .select(
            "j",
            "d",
            F.when(
                F.pmod(
                    portable_hash64(
                        F.concat_ws(
                            "|",
                            F.col("j").cast("string"),
                            F.col("d").cast("string"),
                        ),
                        _JL_SEED,
                    ),
                    F.lit(2),
                )
                == 0,
                1,
            )
            .otherwise(-1)
            .alias("s"),
        )
    )
    proj = materialize(
        qv.join(F.broadcast(signs), "d")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("s") * F.col("q")).cast("long").alias("y"))
    )
    stride = _adc_stride(spark, sf_dir)
    probes = materialize(
        qv.select("vec_id").distinct().filter(F.col("vec_id") % stride == 0)
    )

    def pair_d2(df: DataFrame, dim: str, val: str, out: str) -> DataFrame:
        a = df.join(probes, "vec_id").select(
            F.col("vec_id").alias("va"), F.col(dim).alias("k"),
            F.col(val).alias("xa"),
        )
        b = df.join(probes, "vec_id").select(
            F.col("vec_id").alias("vb"), F.col(dim).alias("k"),
            F.col(val).alias("xb"),
        )
        return (
            a.join(b, "k")
            .filter(F.col("va") < F.col("vb"))
            .groupBy("va", "vb")
            .agg(
                F.sum(
                    (F.col("xa") - F.col("xb"))
                    * (F.col("xa") - F.col("xb"))
                )
                .cast("long")
                .alias(out)
            )
        )

    od = pair_d2(qv, "d", "q", "d2")
    pd_ = pair_d2(proj, "j", "y", "p2")
    dist = (
        od.join(pd_, ["va", "vb"])
        .filter(F.col("d2") > 0)
        .select(
            F.expr(f"(p2 * 1000) div ({_JL_M} * d2)")
            .cast("long")
            .alias("distortion_milli")
        )
    )
    return (
        dist.groupBy(
            F.expr("distortion_milli div 250").cast("long").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.min("distortion_milli").cast("long").alias("min_milli"),
            F.max("distortion_milli").cast("long").alias("max_milli"),
            F.expr("sum(distortion_milli) div count(*)")
            .cast("long")
            .alias("mean_milli"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------- bitemporal corrections

_BT_ASOF = "1998-01-01"  # transaction-time horizon for the as-of leg
_BT_CORR_MOD = 10  # orders with key % 10 == 0 receive a late correction


@q(
    "etl_bitemporal_correction",
    f"""WITH v1 AS (
  SELECT o_orderkey, o_orderdate AS valid_ts, o_orderdate AS txn_ts,
         floor(o_totalprice * 100)::BIGINT AS cents
  FROM orders),
v2 AS (
  SELECT o_orderkey, o_orderdate AS valid_ts,
         o_orderdate + INTERVAL 30 DAY AS txn_ts,
         (floor(o_totalprice * 100)::BIGINT * 9) // 10 AS cents
  FROM orders WHERE o_orderkey % {_BT_CORR_MOD} = 0),
versions AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2),
asofv AS (
  SELECT o_orderkey, valid_ts, cents FROM (
    SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                 ORDER BY txn_ts DESC) AS rn
    FROM versions WHERE txn_ts <= TIMESTAMP '{_BT_ASOF}')
  WHERE rn = 1),
now_v AS (
  SELECT o_orderkey, valid_ts, cents FROM (
    SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                 ORDER BY txn_ts DESC) AS rn
    FROM versions)
  WHERE rn = 1)
SELECT date_trunc('month', a.valid_ts) AS order_month,
       count(*)::BIGINT AS n_orders,
       sum(a.cents)::BIGINT AS total_asof_cents,
       sum(n.cents)::BIGINT AS total_now_cents,
       sum(CASE WHEN a.cents <> n.cents THEN 1 ELSE 0 END)::BIGINT
         AS n_restated
FROM asofv a JOIN now_v n ON n.o_orderkey = a.o_orderkey
GROUP BY 1 ORDER BY 1""",
)
def etl_bitemporal_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal restatement report (valid time × transaction time —
    the Kimball/SQL:2011 bitemporal pattern `etl_scd2` covers only half
    of): every order is a version at txn = order date; every tenth
    order receives a −10% correction posted 30 days later. The report
    answers the auditor's question 'what did we BELIEVE each month's
    revenue was on 1998-01-01, and what do we believe NOW?' — as-of leg
    filters versions to txn_ts ≤ horizon then takes the latest per
    order; current leg takes the overall latest; restated = the rows
    where the two disagree (corrections posted after the horizon).
    Cents are exact integers (floor(price·100), −10% as ·9//10). Scale:
    per-order version windows rank ≤ 2 rows per key (orderkey
    partitioned); month rollup is a partial agg — the SCD2 shuffle
    family."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    v1 = o.select(
        "o_orderkey",
        F.col("o_orderdate").alias("valid_ts"),
        F.col("o_orderdate").alias("txn_ts"),
        cents.alias("cents"),
    )
    v2 = o.filter(F.col("o_orderkey") % _BT_CORR_MOD == 0).select(
        "o_orderkey",
        F.col("o_orderdate").alias("valid_ts"),
        F.expr("o_orderdate + INTERVAL 30 DAYS").alias("txn_ts"),
        F.expr(
            "(cast(floor(o_totalprice * 100) as bigint) * 9) div 10"
        ).alias("cents"),
    )
    versions = v1.unionByName(v2)
    wv = Window.partitionBy("o_orderkey").orderBy(F.desc("txn_ts"))
    asof = (
        versions.filter(F.col("txn_ts") <= F.lit(_BT_ASOF).cast("timestamp"))
        .withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select("o_orderkey", "valid_ts", F.col("cents").alias("a_cents"))
    )
    now_v = (
        versions.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select("o_orderkey", F.col("cents").alias("n_cents"))
    )
    return (
        asof.join(now_v, "o_orderkey")
        .groupBy(F.date_trunc("month", "valid_ts").alias("order_month"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("a_cents").cast("long").alias("total_asof_cents"),
            F.sum("n_cents").cast("long").alias("total_now_cents"),
            F.sum(
                F.when(F.col("a_cents") != F.col("n_cents"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_restated"),
        )
        .orderBy("order_month")
    )


# -------------------------------------------------- IPW treatment effect

_IPW_STRATA = 4
_IPW_CLIP_LO = 25  # propensity clip (milli): [0.025, 0.975]
_IPW_CLIP_HI = 975


@q(
    "events_ipw_ate",
    f"""WITH per_user AS (
  SELECT user_id, count(*)::BIGINT AS n_ev,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT
           AS n_err,
         sum(CASE WHEN event_type = 'purchase'
                  THEN floor(value * 1000)::BIGINT ELSE 0 END)::BIGINT AS y
  FROM events GROUP BY user_id),
tot AS (SELECT count(*)::BIGINT AS nu, sum(n_err)::BIGINT AS te
        FROM per_user),
assigned AS (
  SELECT p.*, CASE WHEN p.n_err * t.nu > t.te THEN 1 ELSE 0 END AS treat
  FROM per_user p CROSS JOIN tot t),
vals AS (SELECT n_ev, count(*)::BIGINT AS c FROM assigned GROUP BY n_ev),
cum AS (SELECT n_ev,
               sum(c) OVER (ORDER BY n_ev
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 ::BIGINT AS cum_c,
               sum(c) OVER ()::BIGINT AS n
        FROM vals),
strata AS (SELECT n_ev,
                  least({_IPW_STRATA},
                        ceil({_IPW_STRATA}.0 * cum_c / n))::BIGINT AS stratum
           FROM cum),
prop AS (
  SELECT s.stratum,
         greatest({_IPW_CLIP_LO},
                  least({_IPW_CLIP_HI},
                        (1000 * sum(a.treat)) // count(*)))::BIGINT AS p_milli
  FROM assigned a JOIN strata s ON s.n_ev = a.n_ev
  GROUP BY s.stratum),
wtd AS (
  SELECT a.treat, a.y,
         CASE WHEN a.treat = 1 THEN 1000000 // p.p_milli
              ELSE 1000000 // (1000 - p.p_milli) END AS w
  FROM assigned a JOIN strata s ON s.n_ev = a.n_ev
  JOIN prop p ON p.stratum = s.stratum)
SELECT sum(CASE WHEN treat = 1 THEN 1 ELSE 0 END)::BIGINT AS n_treated,
       sum(CASE WHEN treat = 0 THEN 1 ELSE 0 END)::BIGINT AS n_control,
       (sum(CASE WHEN treat = 1 THEN w * y ELSE 0 END)
        // sum(CASE WHEN treat = 1 THEN w ELSE 0 END))::BIGINT AS mu1_milli,
       (sum(CASE WHEN treat = 0 THEN w * y ELSE 0 END)
        // sum(CASE WHEN treat = 0 THEN w ELSE 0 END))::BIGINT AS mu0_milli,
       (sum(CASE WHEN treat = 1 THEN w * y ELSE 0 END)
        // sum(CASE WHEN treat = 1 THEN w ELSE 0 END)
        - sum(CASE WHEN treat = 0 THEN w * y ELSE 0 END)
        // sum(CASE WHEN treat = 0 THEN w ELSE 0 END))::BIGINT AS ate_milli
FROM wtd""",
)
def events_ipw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-weighted ATE (Horvitz–Thompson with Hájek
    normalization): OBSERVATIONAL treatment (above-mean error count —
    confounded with activity, unlike `events_stratified_ate`'s
    hash-randomized variant), propensity estimated nonparametrically
    per activity quartile (value-grain quantile assignment, ties
    whole-bucket), clipped to [2.5%, 97.5%] (the standard positivity
    trim), weights 1/p and 1/(1−p) in integer micro units, and the
    Hájek ratio Σwy/Σw per arm in milli. One row: arm sizes, weighted
    means, ATE. Scale: user-grain aggregation then constant-grain
    stratum frames — the CUPED shuffle family; the quantile windows run
    on the distinct-value frame, never the corpus."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_ev"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("n_err"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 1000).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("y"),
    )
    tot = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("nu"),
        F.sum("n_err").cast("long").alias("te"),
    )
    assigned = per_user.crossJoin(F.broadcast(tot)).select(
        "*",
        F.when(F.col("n_err") * F.col("nu") > F.col("te"), 1)
        .otherwise(0)
        .alias("treat"),
    )
    assigned = materialize(assigned)
    vals = assigned.groupBy("n_ev").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wcum = Window.orderBy("n_ev").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = vals.select(
        "n_ev",
        F.sum("c").over(wcum).cast("long").alias("cum_c"),
        F.sum("c")
        .over(
            Window.orderBy("n_ev").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .cast("long")
        .alias("n"),
    )
    strata = cum.select(
        "n_ev",
        F.least(
            F.lit(_IPW_STRATA),
            F.ceil(_IPW_STRATA * F.col("cum_c") / F.col("n")),
        )
        .cast("long")
        .alias("stratum"),
    )
    prop = (
        assigned.join(F.broadcast(strata), "n_ev")
        .groupBy("stratum")
        .agg(
            F.greatest(
                F.lit(_IPW_CLIP_LO),
                F.least(
                    F.lit(_IPW_CLIP_HI),
                    F.expr("(1000 * sum(treat)) div count(*)"),
                ),
            )
            .cast("long")
            .alias("p_milli")
        )
    )
    wtd = (
        assigned.join(F.broadcast(strata), "n_ev")
        .join(F.broadcast(prop), "stratum")
        .select(
            "treat",
            "y",
            F.when(
                F.col("treat") == 1,
                F.expr("1000000 div p_milli"),
            )
            .otherwise(F.expr("1000000 div (1000 - p_milli)"))
            .alias("w"),
        )
    )
    t1 = F.when(F.col("treat") == 1, F.col("w") * F.col("y")).otherwise(0)
    t0 = F.when(F.col("treat") == 0, F.col("w") * F.col("y")).otherwise(0)
    w1 = F.when(F.col("treat") == 1, F.col("w")).otherwise(0)
    w0 = F.when(F.col("treat") == 0, F.col("w")).otherwise(0)
    return wtd.agg(
        F.sum(F.when(F.col("treat") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_treated"),
        F.sum(F.when(F.col("treat") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_control"),
        F.expr(
            "sum(CASE WHEN treat = 1 THEN w * y ELSE 0 END)"
            " div sum(CASE WHEN treat = 1 THEN w ELSE 0 END)"
        )
        .cast("long")
        .alias("mu1_milli"),
        F.expr(
            "sum(CASE WHEN treat = 0 THEN w * y ELSE 0 END)"
            " div sum(CASE WHEN treat = 0 THEN w ELSE 0 END)"
        )
        .cast("long")
        .alias("mu0_milli"),
        (
            F.expr(
                "sum(CASE WHEN treat = 1 THEN w * y ELSE 0 END)"
                " div sum(CASE WHEN treat = 1 THEN w ELSE 0 END)"
            )
            - F.expr(
                "sum(CASE WHEN treat = 0 THEN w * y ELSE 0 END)"
                " div sum(CASE WHEN treat = 0 THEN w ELSE 0 END)"
            )
        )
        .cast("long")
        .alias("ate_milli"),
    )


# ------------------------------------------------------ HITS hubs/auth

_HITS_ROUNDS = 2


def _hits_sql() -> str:
    step = """a{i} AS (
       SELECT n.node, coalesce(s.t, 0)::BIGINT AS raw
       FROM nodes n LEFT JOIN (
         SELECT e.dst AS node, sum(h{p}.x)::BIGINT AS t
         FROM h{p} JOIN cop e ON h{p}.node = e.src GROUP BY e.dst) s
         ON s.node = n.node),
an{i} AS (SELECT node, (raw * 1000 // (SELECT max(raw) FROM a{i}))::BIGINT
            AS x FROM a{i}),
hr{i} AS (
       SELECT n.node, coalesce(s.t, 0)::BIGINT AS raw
       FROM nodes n LEFT JOIN (
         SELECT e.src AS node, sum(an{i}.x)::BIGINT AS t
         FROM an{i} JOIN cop e ON an{i}.node = e.dst GROUP BY e.src) s
         ON s.node = n.node),
h{i} AS (SELECT node, (raw * 1000 // (SELECT max(raw) FROM hr{i}))::BIGINT
            AS x FROM hr{i})"""
    steps = ",\n".join(
        step.format(i=i, p=i - 1) for i in range(1, _HITS_ROUNDS + 1)
    )
    return f"""WITH items AS (SELECT l_orderkey, l_partkey FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) QUALIFY count(*) OVER (PARTITION BY l_orderkey) <= 64),
       cop AS (
         SELECT a.l_partkey AS src, b.l_partkey AS dst
         FROM items a JOIN items b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
         GROUP BY 1, 2 HAVING count(*) >= 2),
       nodes AS (SELECT DISTINCT src AS node FROM cop),
       h0 AS (SELECT node, 1000::BIGINT AS x FROM nodes),
       {steps}
       SELECT h.node, h.x AS hub_milli, a.x AS auth_milli
       FROM h{_HITS_ROUNDS} h JOIN an{_HITS_ROUNDS} a ON a.node = h.node
       ORDER BY h.node"""


@q("graph_hits_hubs_auth", _hits_sql())
def graph_hits_hubs_auth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999), 2 synchronous rounds
    over the part co-purchase graph: authority = Σ hub(in-neighbors),
    hub = Σ authority(out-neighbors), each max-normalized to milli units
    with an integer floor-divide — the mutual-reinforcement complement
    of `graph_pagerank_copurchase` (one score) and
    `graph_katz_centrality` (walk counts). Every score is oracle-exact:
    normalization is raw·1000 // max(raw), a 1-row global agg broadcast
    per half-round, so the CTE unroll reproduces the fixture bit for
    bit. Scale: per half-round one edge-grain join + partial agg + a
    1-row max — the PageRank shuffle family with one extra scalar
    reduce."""
    from hawaiidatapipeline_spark.operators.graph import copurchase_edges

    li = load_table(spark, sf_dir, "lineitem")
    edges = materialize(copurchase_edges(li, directed=True))
    nodes = materialize(edges.select(F.col("src").alias("node")).distinct())

    def normalize(raw: DataFrame) -> DataFrame:
        mx = raw.agg(F.max("raw").alias("mx"))
        return materialize(
            raw.crossJoin(F.broadcast(mx)).select(
                "node", F.expr("raw * 1000 div mx").cast("long").alias("x")
            )
        )

    h = nodes.select("node", F.lit(1000).cast("long").alias("x"))
    a = None
    for _ in range(_HITS_ROUNDS):
        a_raw = nodes.join(
            h.join(edges, h.node == edges.src)
            .groupBy("dst")
            .agg(F.sum("x").cast("long").alias("t")),
            nodes.node == F.col("dst"),
            "left",
        ).select("node", F.coalesce("t", F.lit(0)).cast("long").alias("raw"))
        a = normalize(a_raw)
        h_raw = nodes.join(
            a.join(edges, a.node == edges.dst)
            .groupBy("src")
            .agg(F.sum("x").cast("long").alias("t")),
            nodes.node == F.col("src"),
            "left",
        ).select("node", F.coalesce("t", F.lit(0)).cast("long").alias("raw"))
        h = normalize(h_raw)
    return (
        h.withColumnRenamed("x", "hub_milli")
        .join(a.withColumnRenamed("x", "auth_milli"), "node")
        .select("node", "hub_milli", "auth_milli")
        .orderBy("node")
    )


# ------------------------------------------- functional-dependency audit

# candidate FDs: (table, determinant, dependent)
_FD_CANDIDATES = (
    ("orders", "o_custkey", "o_orderpriority"),
    ("orders", "o_custkey", "o_orderstatus"),
    ("orders", "o_orderpriority", "o_orderstatus"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("customer", "c_custkey", "c_mktsegment"),
)


def _fd_sql() -> str:
    legs = []
    for tbl, a, b in _FD_CANDIDATES:
        legs.append(f"""
SELECT '{a}->{b}' AS fd,
       sum(cnt)::BIGINT AS n_rows,
       count(*)::BIGINT AS n_groups,
       sum(CASE WHEN cnt > mx THEN 1 ELSE 0 END)::BIGINT AS violating_groups,
       sum(cnt - mx)::BIGINT AS violation_rows,
       ((sum(cnt - mx) * 1000) // sum(cnt))::BIGINT AS g3_milli,
       CASE WHEN sum(cnt - mx) = 0 THEN 1 ELSE 0 END AS holds
FROM (
  SELECT {a}, sum(c)::BIGINT AS cnt, max(c)::BIGINT AS mx
  FROM (SELECT {a}, {b}, count(*)::BIGINT AS c
        FROM {tbl} GROUP BY 1, 2)
  GROUP BY 1)""")
    return " UNION ALL ".join(legs) + " ORDER BY fd"


@q("dq_fd_discovery", _fd_sql())
def dq_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit (Metanome/TANE-style g3 error,
    Huhtala et al. 1999): for each candidate FD A→B, the g3 measure is
    the fraction of rows that must be deleted for the dependency to
    hold — per determinant value, every row outside the PLURALITY
    dependent value is a violation. Reports row/group counts, violating
    groups, exact violation rows, g3 in milli, and a holds flag — the
    schema-discovery companion to `dq_candidate_keys` (single-column
    uniqueness) and `dq_inclusion_dependencies` (cross-table
    containment). Scale: per FD one (A,B)-grain partial-agg count, one
    A-grain fold, one scalar reduce — three shuffles of strictly
    shrinking grain, embarrassingly parallel across candidates."""
    frames = []
    for tbl, a, b in _FD_CANDIDATES:
        t = load_table(spark, sf_dir, tbl)
        ab = t.groupBy(a, b).agg(F.count(F.lit(1)).cast("long").alias("c"))
        grp = ab.groupBy(a).agg(
            F.sum("c").cast("long").alias("cnt"),
            F.max("c").cast("long").alias("mx"),
        )
        frames.append(
            grp.agg(
                F.lit(f"{a}->{b}").alias("fd"),
                F.sum("cnt").cast("long").alias("n_rows"),
                F.count(F.lit(1)).cast("long").alias("n_groups"),
                F.sum(F.when(F.col("cnt") > F.col("mx"), 1).otherwise(0))
                .cast("long")
                .alias("violating_groups"),
                F.sum(F.col("cnt") - F.col("mx"))
                .cast("long")
                .alias("violation_rows"),
                F.expr("(sum(cnt - mx) * 1000) div sum(cnt)")
                .cast("long")
                .alias("g3_milli"),
                F.when(F.sum(F.col("cnt") - F.col("mx")) == 0, 1)
                .otherwise(0)
                .alias("holds"),
            ).select(
                "fd", "n_rows", "n_groups", "violating_groups",
                "violation_rows", "g3_milli", "holds",
            )
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.orderBy("fd")


# ------------------------------------------- sequential pattern pairs

@q(
    "mine_sequential_pairs",
    """WITH ut AS (
  SELECT user_id, event_type, min(ts) AS first_ts, max(ts) AS last_ts
  FROM events GROUP BY 1, 2),
base AS (SELECT event_type, count(*)::BIGINT AS users_with
         FROM ut GROUP BY 1),
pairs AS (
  SELECT a.event_type AS antecedent, b.event_type AS consequent,
         count(*)::BIGINT AS support_users
  FROM ut a JOIN ut b
    ON b.user_id = a.user_id AND b.event_type <> a.event_type
  WHERE a.first_ts < b.last_ts
  GROUP BY 1, 2)
SELECT p.antecedent, p.consequent, p.support_users,
       ba.users_with AS users_with_a,
       ((p.support_users * 1000) // ba.users_with)::BIGINT
         AS confidence_milli,
       bc.users_with AS users_with_b
FROM pairs p
JOIN base ba ON ba.event_type = p.antecedent
JOIN base bc ON bc.event_type = p.consequent
ORDER BY p.antecedent, p.consequent""",
)
def mine_sequential_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern pairs (the length-2 core of GSP/PrefixSpan —
    Srikant & Agrawal 1996): for every ordered event-type pair A→B,
    the users for whom SOME A event precedes SOME B event (min ts of A
    < max ts of B — 'eventually followed', any gap), with sequence
    confidence support/users(A). Distinct from `events_top_sequences`
    (consecutive n-grams) and `events_transition_matrix` (Markov
    next-step): this is the order-constrained co-occurrence miners run
    before promoting a funnel hypothesis. Scale: one (user, type)-grain
    partial agg (the only pass over raw events), then a per-user
    type×type expansion bounded by |types|² per user, then type-grain
    folds — the association-rules shuffle family with a time
    constraint."""
    ev = load_table(spark, sf_dir, "events")
    ut = materialize(
        ev.groupBy("user_id", "event_type").agg(
            F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
        )
    )
    base = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("users_with")
    )
    a = ut.select(
        "user_id",
        F.col("event_type").alias("antecedent"),
        "first_ts",
    )
    b = ut.select(
        "user_id",
        F.col("event_type").alias("consequent"),
        "last_ts",
    )
    pairs = (
        a.join(b, "user_id")
        .filter(
            (F.col("antecedent") != F.col("consequent"))
            & (F.col("first_ts") < F.col("last_ts"))
        )
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).cast("long").alias("support_users"))
    )
    ba = base.select(
        F.col("event_type").alias("antecedent"),
        F.col("users_with").alias("users_with_a"),
    )
    bc = base.select(
        F.col("event_type").alias("consequent"),
        F.col("users_with").alias("users_with_b"),
    )
    return (
        pairs.join(F.broadcast(ba), "antecedent")
        .join(F.broadcast(bc), "consequent")
        .select(
            "antecedent",
            "consequent",
            "support_users",
            "users_with_a",
            F.expr("(support_users * 1000) div users_with_a")
            .cast("long")
            .alias("confidence_milli"),
            "users_with_b",
        )
        .orderBy("antecedent", "consequent")
    )


# ------------------------------------------ STL-residual anomaly gate

_STL_MAD_K = 29652  # 2 * 1.4826 in e4 units: |r|·1e4 > K·MAD flags


@q(
    "ts_stl_anomaly",
    f"""WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         sum(round(value * 100)::BIGINT) AS cents
  FROM events GROUP BY 1),
tr AS (SELECT day, cents,
              (epoch(day)::BIGINT // 86400) % 7 AS dow,
              CASE WHEN count(*) OVER w = 7
                   THEN round(sum(cents) OVER w / 700.0, 6) END AS trend
       FROM daily
       WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING
                    AND 3 FOLLOWING)),
se AS (SELECT dow, round(avg(cents / 100.0 - trend), 6) AS seasonal
       FROM tr WHERE trend IS NOT NULL GROUP BY dow),
resid AS (
  SELECT t.day,
         round(t.cents / 100.0 - t.trend - s.seasonal, 6) AS residual,
         abs(round((t.cents / 100.0 - t.trend - s.seasonal) * 1000000))
           ::BIGINT AS r_micro
  FROM tr t JOIN se s ON s.dow = t.dow
  WHERE t.trend IS NOT NULL),
mad AS (
  SELECT r_micro AS mad_micro FROM (
    SELECT r_micro, row_number() OVER (ORDER BY r_micro, day) AS rn,
           count(*) OVER () AS n
    FROM resid)
  WHERE rn = (n + 1) // 2)
SELECT r.day, r.residual,
       ((r.r_micro * 1000) // greatest(1, m.mad_micro))::BIGINT
         AS score_milli
FROM resid r CROSS JOIN mad m
WHERE r.r_micro * 10000 > {_STL_MAD_K} * m.mad_micro
ORDER BY r.day""",
)
def ts_stl_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decomposition-residual anomaly gate: the `ts_seasonal_decompose`
    residuals (daily value minus centered 7-day trend minus day-of-week
    seasonal) screened by the robust MAD rule — flag days where
    |residual| > 2·1.4826·MAD (robust z > 2; the fixture history is ~30
    days, so the stricter 3σ gate fires on nothing — a real deployment
    tunes K; MAD here
    is the lower median of |residual| under a (value, day) total
    order — an exact integer selection, not a percentile estimate).
    The comparison runs entirely in integer micro units
    (|r|·1e4 > 29652·MAD), so the flag set is hash-exact — no float
    boundary ambiguity. Output: flagged days with residual and the
    robust score in milli-MADs. Scale: day-grain pre-aggregation is
    the only pass over raw events; the decomposition, the median rank,
    and the gate all run on the bounded calendar-grain frame."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "cents",
        (F.floor(F.unix_timestamp("day") / 86400) % 7).alias("dow"),
        F.when(
            F.count(F.lit(1)).over(w) == 7,
            F.round(F.sum("cents").over(w) / 700.0, 6),
        ).alias("trend"),
    )
    se = (
        tr.filter(F.col("trend").isNotNull())
        .groupBy("dow")
        .agg(
            F.round(F.avg(F.col("cents") / 100.0 - F.col("trend")), 6).alias(
                "seasonal"
            )
        )
    )
    resid = materialize(
        tr.filter(F.col("trend").isNotNull())
        .join(F.broadcast(se), "dow")
        .select(
            "day",
            F.round(
                F.col("cents") / 100.0 - F.col("trend") - F.col("seasonal"), 6
            ).alias("residual"),
            F.abs(
                F.round(
                    (
                        F.col("cents") / 100.0
                        - F.col("trend")
                        - F.col("seasonal")
                    )
                    * 1000000
                )
            )
            .cast("long")
            .alias("r_micro"),
        )
    )
    wr = Window.orderBy("r_micro", "day")
    wn = Window.orderBy("r_micro", "day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    mad = (
        resid.select(
            "r_micro",
            F.row_number().over(wr).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select(F.col("r_micro").alias("mad_micro"))
    )
    return (
        resid.crossJoin(F.broadcast(mad))
        .filter(
            F.col("r_micro") * 10000 > F.lit(_STL_MAD_K) * F.col("mad_micro")
        )
        .select(
            "day",
            "residual",
            F.expr("(r_micro * 1000) div greatest(1, mad_micro)")
            .cast("long")
            .alias("score_milli"),
        )
        .orderBy("day")
    )


# ---------------------------------------------- audio fingerprinting

_AFP_FRAME = 160  # 20 ms at 8 kHz — shared with multimodal_audio_vad


@q(
    "multimodal_audio_fingerprint",
    f"""WITH dims AS (
  SELECT doc_id AS id, 800 + 8 * (doc_id % 100) AS n FROM documents),
samples AS (
  SELECT id, unnest(generate_series(0, n - 1)) AS i FROM dims),
frames AS (
  SELECT id, (i // {_AFP_FRAME})::INT AS f,
         count(*)::BIGINT AS n_samples,
         sum(((id + i) % 200 - 100) * ((id + i) % 200 - 100))::BIGINT
           AS sum_sq
  FROM samples GROUP BY 1, 2),
full_f AS (SELECT * FROM frames WHERE n_samples = {_AFP_FRAME}),
bits AS (
  SELECT id, f - 1 AS k,
         CASE WHEN sum_sq > lag(sum_sq) OVER (PARTITION BY id ORDER BY f)
              THEN 1 ELSE 0 END AS bit
  FROM full_f QUALIFY f > 0),
fp AS (
  SELECT id, count(*)::BIGINT AS n_bits,
         sum(bit::BIGINT << k)::BIGINT AS fingerprint
  FROM bits GROUP BY id),
cl AS (SELECT fingerprint, count(*)::BIGINT AS cluster_n
       FROM fp GROUP BY 1)
SELECT f.id, f.n_bits, f.fingerprint, c.cluster_n
FROM fp f JOIN cl c ON c.fingerprint = f.fingerprint
ORDER BY f.id""",
)
def multimodal_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio fingerprinting (Chromaprint/Shazam-style energy-delta hash,
    time-domain variant — spectral bands need an FFT library this
    container lacks, and the docstring says so): REAL WAV decode →
    20 ms frame energies (the `multimodal_audio_vad` front-end reused)
    → one bit per consecutive FULL-frame pair (energy rose = 1) → the
    bit vector packed into an integer fingerprint, then a
    fingerprint-grain cluster count — the near-duplicate audio dedup
    key (same pipeline position as `multimodal_image_dhash` for
    images). Trailing partial frames are excluded so padding bugs
    change n_bits and fail the hash. The closed-form synthetic corpus
    lets the oracle recompute every frame energy. Shape: map-only
    decode+energy, per-clip lag window over ≤10 frame rows, one
    fingerprint-grain count — samples never shuffle."""
    from hawaiidatapipeline_spark.sources.multimodal import (
        audio_frame_energies,
        synthetic_audio_blobs,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    frames = audio_frame_energies(synthetic_audio_blobs(d), frame=_AFP_FRAME)
    full_f = frames.filter(F.col("n_samples") == _AFP_FRAME)
    wf = Window.partitionBy("id").orderBy("f")
    bits = (
        full_f.withColumn("prev", F.lag("sum_sq").over(wf))
        .filter(F.col("f") > 0)
        .select(
            "id",
            (F.col("f") - 1).alias("k"),
            F.when(F.col("sum_sq") > F.col("prev"), 1).otherwise(0).alias("bit"),
        )
    )
    fp = bits.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bits"),
        F.sum(F.expr("shiftleft(cast(bit as bigint), cast(k as int))"))
        .cast("long")
        .alias("fingerprint"),
    )
    cl = fp.groupBy("fingerprint").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_n")
    )
    return (
        fp.join(F.broadcast(cl), "fingerprint")
        .select("id", "n_bits", "fingerprint", "cluster_n")
        .orderBy("id")
    )


# ------------------------------------------- Kneser-Ney bigram LM

_KN_TOPK = 30  # report the 30 most frequent bigrams


@q(
    "llm_kneser_ney_bigram",
    f"""WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w,
         generate_subscripts(string_split(lower(text), ' '), 1) AS pos
  FROM documents),
bg AS (
  SELECT a.w AS w1, b.w AS w2, count(*)::BIGINT AS c
  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  GROUP BY 1, 2),
pre AS (SELECT w1, sum(c)::BIGINT AS cp,
               count(*)::BIGINT AS n_after
        FROM bg GROUP BY 1),
cont AS (SELECT w2, count(*)::BIGINT AS n_before FROM bg GROUP BY 1),
tt AS (SELECT count(*)::BIGINT AS t FROM bg)
SELECT bg.w1, bg.w2, bg.c,
       ((4 * bg.c - 3) * 1000000 // (4 * pre.cp))::BIGINT AS pmain_micro,
       (3 * pre.n_after * 1000000 // (4 * pre.cp))::BIGINT AS lambda_micro,
       (cont.n_before * 1000000 // tt.t)::BIGINT AS pcont_micro,
       ((4 * bg.c - 3) * 1000000 // (4 * pre.cp)
        + (3 * pre.n_after * 1000000 // (4 * pre.cp))
          * (cont.n_before * 1000000 // tt.t) // 1000000)::BIGINT
         AS p_kn_micro
FROM bg JOIN pre ON pre.w1 = bg.w1
        JOIN cont ON cont.w2 = bg.w2
        CROSS JOIN tt
ORDER BY bg.c DESC, bg.w1, bg.w2 LIMIT {_KN_TOPK}""",
)
def llm_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram LM (Kneser & Ney 1995; Chen &
    Goodman 1998 — the smoothing every n-gram-LM data-quality scorer
    ships): P(w2|w1) = max(c−D,0)/c(w1·) + λ(w1)·Pcont(w2) with
    absolute discount D = 0.75 and the CONTINUATION probability
    Pcont(w2) = |distinct predecessors of w2| / |bigram types| — the
    part `llm_trigram_backoff`'s count backoff misses (frequent-but-
    predictable words get LOW continuation mass). All probabilities in
    exact integer micro units: D = 3/4 enters as (4c−3)/(4·cp), λ as
    3·n_after/(4·cp), one truncating divide per term. Output: the 30
    most frequent bigrams with the full decomposition. Scale: one
    token-grain self-join (the bigram-logprob shuffle family), then
    three bigram-type-grain folds and a TakeOrdered top-k — model size
    is type-grain, never corpus-grain."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos0", "w"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")
    a = toks.select("doc_id", "pos", F.col("w").alias("w1"))
    b = toks.select(
        "doc_id", (F.col("pos") - 1).alias("pos"), F.col("w").alias("w2")
    )
    bg = materialize(
        a.join(b, ["doc_id", "pos"])
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    pre = bg.groupBy("w1").agg(
        F.sum("c").cast("long").alias("cp"),
        F.count(F.lit(1)).cast("long").alias("n_after"),
    )
    cont = bg.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n_before")
    )
    tt = bg.agg(F.count(F.lit(1)).cast("long").alias("t"))
    return (
        bg.join(pre, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tt))
        .select(
            "w1",
            "w2",
            "c",
            F.expr("(4 * c - 3) * 1000000 div (4 * cp)")
            .cast("long")
            .alias("pmain_micro"),
            F.expr("3 * n_after * 1000000 div (4 * cp)")
            .cast("long")
            .alias("lambda_micro"),
            F.expr("n_before * 1000000 div t")
            .cast("long")
            .alias("pcont_micro"),
            F.expr(
                "(4 * c - 3) * 1000000 div (4 * cp)"
                " + (3 * n_after * 1000000 div (4 * cp))"
                "   * (n_before * 1000000 div t) div 1000000"
            )
            .cast("long")
            .alias("p_kn_micro"),
        )
        .orderBy(F.desc("c"), "w1", "w2")
        .limit(_KN_TOPK)
    )


# --------------------------------------------- bitext mining margin

_BITEXT_SRC = "en"
_BITEXT_TGT = "de"
_BITEXT_NN = 3
_BITEXT_TOPK = 20


def _bitext_sql() -> str:
    from hawaiidatapipeline_spark.queries.emb_extra import (
        _adc_stride_subquery,
    )

    return f"""WITH qv AS (
  SELECT vec_id, unnest(generate_series(0, len(embedding) - 1)) AS d,
         round(unnest(embedding) * 1000)::BIGINT AS q
  FROM embeddings),
lv AS (SELECT e.vec_id, d.lang, qv.d, qv.q
       FROM embeddings e
       JOIN documents d ON d.doc_id = e.vec_id
       JOIN qv ON qv.vec_id = e.vec_id),
probes AS (SELECT DISTINCT vec_id FROM lv
           WHERE lang = '{_BITEXT_SRC}'
             AND vec_id % {_adc_stride_subquery()} = 0),
dots AS (
  SELECT a.vec_id AS va, b.vec_id AS vb, sum(a.q * b.q)::BIGINT AS dp
  FROM lv a JOIN probes p ON p.vec_id = a.vec_id
  JOIN lv b ON b.d = a.d AND b.lang = '{_BITEXT_TGT}'
  GROUP BY 1, 2),
top3 AS (
  SELECT va, dp, row_number() OVER (PARTITION BY va
                                    ORDER BY dp DESC, vb) AS rn
  FROM dots),
denom AS (SELECT va, (sum(dp) // {_BITEXT_NN})::BIGINT AS avg3
          FROM top3 WHERE rn <= {_BITEXT_NN} GROUP BY va),
margin AS (
  SELECT d.va, d.vb, d.dp,
         ((d.dp * 1000) // greatest(1, dn.avg3))::BIGINT AS margin_milli
  FROM dots d JOIN denom dn ON dn.va = d.va)
SELECT va, vb, dp, margin_milli FROM margin
ORDER BY margin_milli DESC, va, vb LIMIT {_BITEXT_TOPK}"""


@q("llm_bitext_mining_margin", _bitext_sql())
def llm_bitext_mining_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk 2019, the
    LASER/CCMatrix parallel-corpus miner, adapted to the house integer
    lane): for each corpus-scaled English probe vector, score every
    German candidate by the RATIO of its dot product to the mean of the
    probe's top-3 German dots — the margin criterion that suppresses
    hubness (a candidate near everything scores ≈1000 milli, a true
    translation stands out above it). Quantized milli coordinates,
    exact int64 dots, truncating divides; top-20 mined pairs. The
    forward-direction margin only (the full criterion averages both
    directions — same shuffle shape twice). Scale: probes are held ~65
    by the shared `_adc_stride`; candidates are one language shard; the
    per-probe top-3 window ranks probe×candidate rows — the ADC search
    economics."""
    e = load_table(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    from hawaiidatapipeline_spark.queries.emb_extra import _adc_stride

    qv = (
        e.join(d, e.vec_id == d.doc_id)
        .select(
            "vec_id", "lang", F.posexplode("embedding").alias("dd", "x")
        )
        .select(
            "vec_id",
            "lang",
            F.col("dd").alias("d"),
            F.round(F.col("x") * 1000).cast("long").alias("q"),
        )
    )
    qv = materialize(qv)
    stride = _adc_stride(spark, sf_dir)
    pa = qv.filter(
        (F.col("lang") == _BITEXT_SRC) & (F.col("vec_id") % stride == 0)
    ).select(F.col("vec_id").alias("va"), "d", F.col("q").alias("qa"))
    pb = qv.filter(F.col("lang") == _BITEXT_TGT).select(
        F.col("vec_id").alias("vb"), "d", F.col("q").alias("qb")
    )
    dots = materialize(
        pa.join(pb, "d")
        .groupBy("va", "vb")
        .agg(F.sum(F.col("qa") * F.col("qb")).cast("long").alias("dp"))
    )
    w3 = Window.partitionBy("va").orderBy(F.desc("dp"), "vb")
    denom = (
        dots.withColumn("rn", F.row_number().over(w3))
        .filter(F.col("rn") <= _BITEXT_NN)
        .groupBy("va")
        .agg(F.expr(f"sum(dp) div {_BITEXT_NN}").cast("long").alias("avg3"))
    )
    return (
        dots.join(F.broadcast(denom), "va")
        .select(
            "va",
            "vb",
            "dp",
            F.expr("(dp * 1000) div greatest(1, avg3)")
            .cast("long")
            .alias("margin_milli"),
        )
        .orderBy(F.desc("margin_milli"), "va", "vb")
        .limit(_BITEXT_TOPK)
    )


# ------------------------------------------- split-leakage audit

def _split_leakage_sql() -> str:
    ph = "('0x' || substring(md5('42:' || doc_id::VARCHAR), 1, 15))::BIGINT"
    return f"""WITH fp AS (
  SELECT doc_id,
         md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS f
  FROM documents),
cl AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY f) AS cluster_id,
         count(*) OVER (PARTITION BY f) AS cn
  FROM fp),
splits AS (
  SELECT doc_id,
         CASE WHEN {ph} % 100 < 90 THEN 'train'
              WHEN {ph} % 100 < 95 THEN 'val'
              ELSE 'test' END AS split
  FROM documents),
mem AS (
  SELECT c.cluster_id, c.doc_id, s.split
  FROM cl c JOIN splits s ON s.doc_id = c.doc_id
  WHERE c.cn > 1),
canon AS (
  SELECT cluster_id, split AS reassign_to FROM mem
  WHERE doc_id = cluster_id),
agg AS (
  SELECT m.cluster_id,
         count(*)::BIGINT AS n_docs,
         count(DISTINCT m.split)::BIGINT AS n_splits,
         string_agg(DISTINCT m.split, ',' ORDER BY m.split) AS split_list
  FROM mem m GROUP BY 1)
SELECT a.cluster_id, a.n_docs, a.n_splits, a.split_list, c.reassign_to,
       (SELECT count(*) FROM mem m
        WHERE m.cluster_id = a.cluster_id
          AND m.split <> c.reassign_to)::BIGINT AS n_moved
FROM agg a JOIN canon c ON c.cluster_id = a.cluster_id
WHERE a.n_splits > 1
ORDER BY a.cluster_id"""


@q("llm_split_leakage_audit", _split_leakage_sql())
def llm_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split-leakage audit — the check every eval
    pipeline needs and most skip: a duplicate CLUSTER (8-token-prefix
    fingerprint groups, the `llm_prefix_clusters` /
    `llm_cross_lang_contamination` boilerplate-dup family) whose
    members land in DIFFERENT splits of `llm_train_val_split`'s hash
    assignment leaks training text into evaluation, inflating every
    metric. Reports each straddling cluster with its split list and
    the fix plan: reassign the whole cluster to its CANONICAL (min
    doc_id) member's split — deterministic, so incremental appends
    converge to the same assignment — with the move count. Scale: one
    md5 per doc + one fingerprint-grain window + cluster-grain folds,
    all map-side-combinable; swap in the MinHash-LSH cluster labels
    for near-dup (vs prefix-dup) coverage, same audit shape."""
    from hawaiidatapipeline_spark.operators.dedup import portable_hash64

    d = load_table(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id",
        F.md5(
            F.array_join(F.slice(F.split("text", " "), 1, 8), " ")
        ).alias("f"),
    )
    wf = Window.partitionBy("f")
    labels = (
        fp.select(
            "doc_id",
            F.min("doc_id").over(wf).alias("cluster_id"),
            F.count(F.lit(1)).over(wf).alias("cn"),
        )
        .filter(F.col("cn") > 1)
        .select("doc_id", "cluster_id")
    )
    bucket = F.pmod(
        portable_hash64(F.col("doc_id").cast("string"), 42), F.lit(100)
    )
    splits = d.select(
        "doc_id",
        F.when(bucket < 90, "train")
        .when(bucket < 95, "val")
        .otherwise("test")
        .alias("split"),
    )
    mem = materialize(labels.join(splits, "doc_id"))
    canon = mem.filter(F.col("doc_id") == F.col("cluster_id")).select(
        "cluster_id", F.col("split").alias("reassign_to")
    )
    agg = mem.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("split").cast("long").alias("n_splits"),
        F.array_join(F.array_sort(F.collect_set("split")), ",").alias(
            "split_list"
        ),
    )
    moved = (
        mem.join(F.broadcast(canon), "cluster_id")
        .filter(F.col("split") != F.col("reassign_to"))
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_moved"))
    )
    return (
        agg.filter(F.col("n_splits") > 1)
        .join(F.broadcast(canon), "cluster_id")
        .join(F.broadcast(moved), "cluster_id")
        .select(
            "cluster_id", "n_docs", "n_splits", "split_list",
            "reassign_to", "n_moved",
        )
        .orderBy("cluster_id")
    )


# --------------------------------------- manifest-based file pruning

_MANIFEST_FILE_ROWS = 1000  # ingestion-batch file size (orderkeys per file)
_MANIFEST_LO = "1997-01-01"
_MANIFEST_HI = "1997-04-01"  # exclusive


@q(
    "layout_manifest_prune",
    f"""WITH base AS (
  SELECT o_orderkey, o_orderdate,
         floor(o_totalprice * 100)::BIGINT AS cents,
         o_orderkey // {_MANIFEST_FILE_ROWS} AS file_ing,
         (row_number() OVER (ORDER BY o_orderdate, o_orderkey) - 1)
           // {_MANIFEST_FILE_ROWS} AS file_sorted
  FROM orders),
layouts AS (
  SELECT 'ingestion_order' AS layout, file_ing AS file_id, o_orderdate,
         cents FROM base
  UNION ALL
  SELECT 'date_sorted', file_sorted, o_orderdate, cents FROM base),
manifest AS (
  SELECT layout, file_id, min(o_orderdate) AS lo, max(o_orderdate) AS hi,
         count(*)::BIGINT AS rows_in_file
  FROM layouts GROUP BY 1, 2),
pruned AS (
  SELECT layout,
         count(*)::BIGINT AS total_files,
         sum(CASE WHEN hi >= TIMESTAMP '{_MANIFEST_LO}'
                   AND lo < TIMESTAMP '{_MANIFEST_HI}'
                  THEN 1 ELSE 0 END)::BIGINT AS candidate_files,
         sum(CASE WHEN hi >= TIMESTAMP '{_MANIFEST_LO}'
                   AND lo < TIMESTAMP '{_MANIFEST_HI}'
                  THEN rows_in_file ELSE 0 END)::BIGINT AS rows_scanned
  FROM manifest GROUP BY 1),
truth AS (
  SELECT layout,
         count(*)::BIGINT AS rows_matched,
         sum(cents)::BIGINT AS revenue_cents
  FROM layouts
  WHERE o_orderdate >= TIMESTAMP '{_MANIFEST_LO}'
    AND o_orderdate < TIMESTAMP '{_MANIFEST_HI}'
  GROUP BY 1)
SELECT p.layout, p.total_files, p.candidate_files, p.rows_scanned,
       t.rows_matched, t.revenue_cents,
       ((p.candidate_files * 1000) // p.total_files)::BIGINT
         AS files_scanned_milli
FROM pruned p JOIN truth t ON t.layout = p.layout
ORDER BY p.layout""",
)
def layout_manifest_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-based file pruning report (the Iceberg/Delta metadata
    economics, measured — no table format ships in this container, so
    the manifest is modeled as the per-file min/max stats table those
    formats maintain; MIGRATION.md carries the environment note): files
    are 1000-order ingestion batches; the manifest stores per-file
    (min, max) order date; a Q1-1997 range query may skip every file
    whose interval misses the range. Reported per LAYOUT — raw
    ingestion order (dates scattered ⇒ ~every file is a candidate) vs
    date-sorted rewrite (`layout_zorder_key`'s 1-D special case ⇒
    candidates collapse to the range's share) — with identical
    rows_matched/revenue in both (pruning is lossless; only
    rows_scanned differs). The 100 TB lesson in one row pair: metadata
    pruning is worth nothing without a clustering layout. Scale: the
    manifest is file-grain; the sorted leg's rank is the one full
    shuffle (a one-time layout rewrite in production)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_orderdate", "o_orderkey")
    base = materialize(
        o.select(
            "o_orderkey",
            "o_orderdate",
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            F.expr(f"o_orderkey div {_MANIFEST_FILE_ROWS}").alias("file_ing"),
        ).withColumn(
            "file_sorted",
            F.expr(
                f"(row_number() OVER (ORDER BY o_orderdate, o_orderkey) - 1)"
                f" div {_MANIFEST_FILE_ROWS}"
            ),
        )
    )
    layouts = base.select(
        F.lit("ingestion_order").alias("layout"),
        F.col("file_ing").alias("file_id"),
        "o_orderdate",
        "cents",
    ).unionByName(
        base.select(
            F.lit("date_sorted").alias("layout"),
            F.col("file_sorted").alias("file_id"),
            "o_orderdate",
            "cents",
        )
    )
    lo = F.lit(_MANIFEST_LO).cast("timestamp")
    hi = F.lit(_MANIFEST_HI).cast("timestamp")
    manifest = layouts.groupBy("layout", "file_id").agg(
        F.min("o_orderdate").alias("lo"),
        F.max("o_orderdate").alias("hi"),
        F.count(F.lit(1)).cast("long").alias("rows_in_file"),
    )
    cand = (F.col("hi") >= lo) & (F.col("lo") < hi)
    pruned = manifest.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("total_files"),
        F.sum(F.when(cand, 1).otherwise(0))
        .cast("long")
        .alias("candidate_files"),
        F.sum(F.when(cand, F.col("rows_in_file")).otherwise(0))
        .cast("long")
        .alias("rows_scanned"),
    )
    truth = (
        layouts.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("long").alias("rows_matched"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )
    return (
        pruned.join(truth, "layout")
        .select(
            "layout", "total_files", "candidate_files", "rows_scanned",
            "rows_matched", "revenue_cents",
            F.expr("(candidate_files * 1000) div total_files")
            .cast("long")
            .alias("files_scanned_milli"),
        )
        .orderBy("layout")
    )


# ------------------------------------- char-entropy compressibility

@q(
    "llm_char_entropy_compressibility",
    """WITH docs AS (
  SELECT doc_id, source, lower(text) AS s FROM documents),
grams AS (
  SELECT doc_id, substring(s, CAST(i AS INT), 2) AS g
  FROM (SELECT doc_id, s, unnest(generate_series(1, len(s) - 1)) AS i
        FROM docs WHERE len(s) >= 2)),
gc AS (SELECT doc_id, g, count(*)::BIGINT AS c FROM grams GROUP BY 1, 2),
ent AS (
  SELECT doc_id, sum(c)::BIGINT AS n,
         (floor(ln(sum(c)) * 1000000)::BIGINT
          - sum(c * floor(ln(c) * 1000000)::BIGINT)::BIGINT // sum(c))
           ::BIGINT AS h_micro
  FROM gc GROUP BY doc_id)
SELECT d.source,
       (e.h_micro // 250000)::BIGINT AS bucket,
       count(*)::BIGINT AS n_docs,
       min(e.h_micro)::BIGINT AS min_h_micro,
       max(e.h_micro)::BIGINT AS max_h_micro,
       (sum(e.h_micro) // count(*))::BIGINT AS mean_h_micro
FROM ent e JOIN docs d ON d.doc_id = e.doc_id
GROUP BY 1, 2 ORDER BY source, bucket""",
)
def llm_char_entropy_compressibility(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Character-bigram entropy as a compressibility quality signal (the
    Shannon bound a gzip-ratio filter approximates — Gopher-style
    pipelines drop both tails: near-zero entropy is boilerplate/repeated
    padding, near-max is encrypted/binary junk): per document,
    H = ln n − (Σ c·ln c)/n over char-bigram counts, floored to micro
    nats after each ln (house transcendental rule), then a per-source
    histogram in quarter-nat buckets with min/max/mean. Complements
    `llm_repetition_filter` (token-level loops) and `llm_quality_score`
    (surface ratios) with an encoding-level signal. Scale: one char-
    bigram explode (the widest but purely map-side stage), one
    (doc, gram) partial agg, doc-grain entropy, source-grain rollup —
    strictly shrinking grains."""
    d = load_table(spark, sf_dir, "documents")
    docs = d.select("doc_id", "source", F.lower("text").alias("s"))
    # length(s) < 2 would make sequence(1, 0) DESCEND ([1, 0]) in Spark
    # while DuckDB's generate_series(1, 0) is empty — guard both sides
    # (ADVICE r13) so degenerate documents emit no bigrams anywhere.
    grams = docs.filter(F.length("s") >= 2).select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, length(s) - 1),"
                   " i -> substring(s, i, 2))")
        ).alias("g"),
    )
    gc = grams.groupBy("doc_id", "g").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    ent = gc.groupBy("doc_id").agg(
        (
            F.floor(F.log(F.sum("c")) * 1000000)
            - F.expr(
                "sum(c * cast(floor(ln(c) * 1000000) as bigint)) div sum(c)"
            )
        )
        .cast("long")
        .alias("h_micro")
    )
    return (
        ent.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy(
            "source",
            F.expr("h_micro div 250000").cast("long").alias("bucket"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("h_micro").cast("long").alias("min_h_micro"),
            F.max("h_micro").cast("long").alias("max_h_micro"),
            F.expr("sum(h_micro) div count(*)")
            .cast("long")
            .alias("mean_h_micro"),
        )
        .orderBy("source", "bucket")
    )


# --------------------------------------------- video keyframe select

from hawaiidatapipeline_spark.queries.round13_extra import (  # noqa: E402
    _SCENE_CUT_PER_PX,
)


@q(
    "multimodal_video_keyframes",
    f"""WITH dims AS (
  SELECT doc_id AS id, 3 + doc_id % 4 AS n FROM documents),
pairs AS (
  SELECT id, unnest(generate_series(1, n - 1)) AS f FROM dims),
deltas AS (
  SELECT id, f, 20::BIGINT AS n_pixels,
         (20 * (abs((id + 11 * f) % 256 - (id + 11 * (f - 1)) % 256)
              + abs((3 * id + 5 * f) % 256 - (3 * id + 5 * (f - 1)) % 256)
              + abs((7 * id + f) % 256 - (7 * id + (f - 1)) % 256)))::BIGINT
           AS delta_sum
  FROM pairs),
nf AS (SELECT id, count(*) + 1 AS n_frames FROM deltas GROUP BY id),
starts AS (
  SELECT id, 0 AS start FROM nf
  UNION ALL
  SELECT id, f FROM deltas
  WHERE delta_sum > {_SCENE_CUT_PER_PX} * n_pixels),
scenes AS (
  SELECT s.id,
         row_number() OVER (PARTITION BY s.id ORDER BY s.start) - 1
           AS scene_no,
         s.start AS keyframe_frame,
         coalesce(lead(s.start) OVER (PARTITION BY s.id ORDER BY s.start),
                  nf.n_frames) - s.start AS scene_len_frames
  FROM starts s JOIN nf ON nf.id = s.id)
SELECT id, scene_no, keyframe_frame, scene_len_frames::BIGINT
         AS scene_len_frames
FROM scenes ORDER BY id, scene_no""",
)
def multimodal_video_keyframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe selection manifest — the artifact a video curation
    pipeline hands to captioning/training after shot segmentation: each
    scene (bounded by `multimodal_scene_cuts`' threshold on REAL
    decoded frame deltas) contributes its FIRST frame as the keyframe,
    with the scene length for coverage accounting. Frame counts come
    from the decoded delta rows (n_pairs + 1), not trusted metadata, so
    a truncated decode changes scene lengths and fails the hash. Shape:
    map-only decode+delta, then per-video windows over ≤ n_frames
    bounded rows (scene starts), one manifest row per scene — pixels
    never shuffle; the policy threshold lives in the plan."""
    from hawaiidatapipeline_spark.sources.multimodal import (
        synthetic_video_blobs,
        video_scene_deltas,
    )
    from hawaiidatapipeline_spark.queries.round13_extra import (
        _SCENE_CUT_PER_PX as _CUT,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    deltas = materialize(video_scene_deltas(synthetic_video_blobs(d)))
    nf = deltas.groupBy("id").agg(
        (F.count(F.lit(1)) + 1).cast("long").alias("n_frames")
    )
    starts = nf.select("id", F.lit(0).cast("long").alias("start")).unionByName(
        deltas.filter(
            F.col("delta_sum") > F.lit(_CUT) * F.col("n_pixels")
        ).select("id", F.col("f").cast("long").alias("start"))
    )
    ws = Window.partitionBy("id").orderBy("start")
    return (
        starts.join(nf, "id")
        .select(
            "id",
            (F.row_number().over(ws) - 1).cast("long").alias("scene_no"),
            F.col("start").alias("keyframe_frame"),
            (
                F.coalesce(F.lead("start").over(ws), F.col("n_frames"))
                - F.col("start")
            )
            .cast("long")
            .alias("scene_len_frames"),
        )
        .orderBy("id", "scene_no")
    )


# ----------------------------------------------- Gopher rules gate

_GO_MIN_WORDS = 20
_GO_MAX_WORDS = 100000
_GO_MWL_LO = 3000   # mean word length bounds, milli chars
_GO_MWL_HI = 10000
_GO_STOPS = ("the", "a", "of", "and", "to", "in", "is", "with")
_GO_DOM_MILLI = 200   # top-token share cap
_GO_DUP2_MILLI = 300  # repeated-bigram share cap


def _gopher_sql() -> str:
    stops = ", ".join(f"'{s}'" for s in _GO_STOPS)
    return f"""WITH toks AS (
  SELECT d.doc_id, d.source, t.w, t.i
  FROM documents d,
       LATERAL (SELECT unnest(string_split(d.text, ' ')) AS w,
                       generate_subscripts(string_split(d.text, ' '), 1)
                         AS i) t),
per_tok AS (
  SELECT doc_id, source, count(*)::BIGINT AS n,
         sum(len(w))::BIGINT AS chars,
         count(DISTINCT CASE WHEN w IN ({stops}) THEN w END)::BIGINT
           AS n_stops
  FROM toks GROUP BY 1, 2),
dom AS (
  SELECT doc_id, max(c)::BIGINT AS mx FROM (
    SELECT doc_id, w, count(*)::BIGINT AS c FROM toks GROUP BY 1, 2)
  GROUP BY 1),
bg AS (
  SELECT a.doc_id, count(*)::BIGINT AS nb,
         count(DISTINCT a.w || ' ' || b.w)::BIGINT AS db
  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
  GROUP BY 1),
flags AS (
  SELECT p.source,
         CASE WHEN p.n BETWEEN {_GO_MIN_WORDS} AND {_GO_MAX_WORDS}
              THEN 1 ELSE 0 END AS r1,
         CASE WHEN (p.chars * 1000) // p.n
                   BETWEEN {_GO_MWL_LO} AND {_GO_MWL_HI}
              THEN 1 ELSE 0 END AS r2,
         CASE WHEN p.n_stops >= 2 THEN 1 ELSE 0 END AS r3,
         CASE WHEN (d.mx * 1000) // p.n <= {_GO_DOM_MILLI}
              THEN 1 ELSE 0 END AS r4,
         CASE WHEN ((g.nb - g.db) * 1000) // g.nb <= {_GO_DUP2_MILLI}
              THEN 1 ELSE 0 END AS r5
  FROM per_tok p JOIN dom d ON d.doc_id = p.doc_id
       JOIN bg g ON g.doc_id = p.doc_id)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(r1)::BIGINT AS pass_wordcount,
       sum(r2)::BIGINT AS pass_mean_word_len,
       sum(r3)::BIGINT AS pass_stopwords,
       sum(r4)::BIGINT AS pass_dominance,
       sum(r5)::BIGINT AS pass_dup_bigram,
       sum(r1 * r2 * r3 * r4 * r5)::BIGINT AS pass_all,
       ((sum(r1 * r2 * r3 * r4 * r5) * 1000) // count(*))::BIGINT
         AS retention_milli
FROM flags GROUP BY source ORDER BY source"""


@q("llm_gopher_rules_gate", _gopher_sql())
def llm_gopher_rules_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021, Appendix A — the rule set
    MassiveText shipped and most crawl pipelines copied), the five that
    discriminate on a whitespace corpus: word count in [20, 100k], mean
    word length in [3, 10] (milli), ≥2 distinct function words present,
    top-token share ≤ 20% (the repetition dominance rule), repeated-
    bigram share ≤ 30% (the dup-n-gram rule). Per source: independent
    per-rule pass counts AND the conjunction with retention — the
    breakdown that tells a curator WHICH rule is eating a source
    (`llm_quality_gate_report` reports the funnel; this reports the
    rules). All ratios exact integer milli. Scale: one token explode
    feeding three doc-grain partial aggs (token stats, dominance,
    bigram dup) + one source-grain rollup — the quality-score shuffle
    family."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.posexplode(F.split("text", " ")).alias("i0", "w"),
    ).select("doc_id", "source", (F.col("i0") + 1).alias("i"), "w")
    toks = materialize(toks)
    per_tok = toks.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.length("w")).cast("long").alias("chars"),
        F.countDistinct(
            F.when(F.col("w").isin(*_GO_STOPS), F.col("w"))
        )
        .cast("long")
        .alias("n_stops"),
    )
    dom = (
        toks.groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").cast("long").alias("mx"))
    )
    a = toks.select("doc_id", "i", F.col("w").alias("w1"))
    b = toks.select("doc_id", (F.col("i") - 1).alias("i"), F.col("w").alias("w2"))
    bg = (
        a.join(b, ["doc_id", "i"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("nb"),
            F.countDistinct(F.concat_ws(" ", "w1", "w2"))
            .cast("long")
            .alias("db"),
        )
    )
    flags = (
        per_tok.join(dom, "doc_id")
        .join(bg, "doc_id")
        .select(
            "source",
            F.when(
                F.col("n").between(_GO_MIN_WORDS, _GO_MAX_WORDS), 1
            ).otherwise(0).alias("r1"),
            F.when(
                F.expr("(chars * 1000) div n").between(_GO_MWL_LO, _GO_MWL_HI),
                1,
            ).otherwise(0).alias("r2"),
            F.when(F.col("n_stops") >= 2, 1).otherwise(0).alias("r3"),
            F.when(
                F.expr("(mx * 1000) div n") <= _GO_DOM_MILLI, 1
            ).otherwise(0).alias("r4"),
            F.when(
                F.expr("((nb - db) * 1000) div nb") <= _GO_DUP2_MILLI, 1
            ).otherwise(0).alias("r5"),
        )
    )
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("r1").cast("long").alias("pass_wordcount"),
            F.sum("r2").cast("long").alias("pass_mean_word_len"),
            F.sum("r3").cast("long").alias("pass_stopwords"),
            F.sum("r4").cast("long").alias("pass_dominance"),
            F.sum("r5").cast("long").alias("pass_dup_bigram"),
            F.sum(
                F.col("r1") * F.col("r2") * F.col("r3") * F.col("r4")
                * F.col("r5")
            )
            .cast("long")
            .alias("pass_all"),
            F.expr(
                "(sum(r1 * r2 * r3 * r4 * r5) * 1000) div count(*)"
            )
            .cast("long")
            .alias("retention_milli"),
        )
        .orderBy("source")
    )


# ------------------------------------------- time-decayed counters

_DECAY_HALVES = (7, 30)  # half-lives in days


@q(
    "agg_decay_counters",
    f"""WITH ev AS (
  SELECT event_type,
         (epoch(date_trunc('day', ts))::BIGINT // 86400) AS day
  FROM events),
mx AS (SELECT max(day)::BIGINT AS t FROM ev)
SELECT ev.event_type,
       count(*)::BIGINT AS n_events,
       sum(1000000 >> CAST((mx.t - ev.day) // {_DECAY_HALVES[0]} AS INT))
         ::BIGINT AS decayed_h7_micro,
       sum(1000000 >> CAST((mx.t - ev.day) // {_DECAY_HALVES[1]} AS INT))
         ::BIGINT AS decayed_h30_micro,
       (sum(1000000 >> CAST((mx.t - ev.day) // {_DECAY_HALVES[0]} AS INT))
        // count(*))::BIGINT AS mean_weight_h7_micro
FROM ev CROSS JOIN mx
GROUP BY ev.event_type ORDER BY ev.event_type""",
)
def agg_decay_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed counters (the freshness-weighted
    count behind trending/decayed-heavy-hitter features): weight =
    2^(−age/h) with half-lives 7 and 30 days, in DYADIC integer form —
    1e6 >> (age_days // h) — so both engines decay identically (the
    `ts_ewma_dyadic` discipline applied to counters). Per event type:
    raw count, decayed counts, mean freshness weight. MERGEABLE: the
    weight depends only on the event and the anchor T (max day), so
    per-shard partial sums add — a streaming maintenance sink rescales
    stored sums by one shift per epoch advance, the classic decayed-
    counter trick. Scale: one map-side weight + type-grain partial agg
    — sketch-family economics (state = type count, never event
    count)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "cast(unix_timestamp(date_trunc('day', ts)) as bigint)"
            " div 86400"
        ).alias("day"),
    )
    mx = ev.agg(F.max("day").cast("long").alias("t"))
    h7, h30 = _DECAY_HALVES
    return (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(
                F.expr(f"shiftright(1000000, cast((t - day) div {h7} as int))")
            )
            .cast("long")
            .alias("decayed_h7_micro"),
            F.sum(
                F.expr(f"shiftright(1000000, cast((t - day) div {h30} as int))")
            )
            .cast("long")
            .alias("decayed_h30_micro"),
            F.expr(
                f"sum(shiftright(1000000, cast((t - day) div {h7} as int)))"
                " div count(*)"
            )
            .cast("long")
            .alias("mean_weight_h7_micro"),
        )
        .orderBy("event_type")
    )


# ----------------------------------------------- image patch manifest

_PATCH = 4


@q(
    "multimodal_image_patches",
    f"""WITH dims AS (
  SELECT doc_id AS id, 8 + doc_id % 5 AS h, 16 + doc_id % 8 AS w
  FROM documents),
tiles AS (
  SELECT id, h, w, py.py, px.px
  FROM dims,
       LATERAL (SELECT unnest(generate_series(0, h // {_PATCH} - 1)) AS py) py,
       LATERAL (SELECT unnest(generate_series(0, w // {_PATCH} - 1)) AS px) px),
sums AS (
  SELECT t.id, t.py, t.px,
         ({_PATCH} * {_PATCH})::BIGINT AS n_px,
         ({_PATCH} * sum((t.id + r.row) % 256))::BIGINT AS sum_r,
         ({_PATCH} * {_PATCH} * ((3 * t.id) % 256))::BIGINT AS sum_g,
         ({_PATCH} * {_PATCH} * ((7 * t.id) % 256))::BIGINT AS sum_b
  FROM tiles t,
       LATERAL (SELECT unnest(generate_series(t.py * {_PATCH},
                                              t.py * {_PATCH} + {_PATCH} - 1))
                  AS row) r
  GROUP BY 1, 2, 3)
SELECT id, py, px, n_px, sum_r, sum_g, sum_b,
       ((sum_r * 1000) // n_px)::BIGINT AS mean_r_milli
FROM sums ORDER BY id, py, px""",
)
def multimodal_image_patches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style image patchify manifest: REAL BMP decode → 4×4
    non-overlapping tiles (edge remainders cropped, the patchifier
    convention) → exact integer per-channel pixel sums + milli mean,
    one manifest row per tile — the tensorization step between a
    multimodal lake and a vision encoder, with the tile grid (not the
    pixels) as the unit that crosses the wire. Closed-form synthetic
    images (row-varying red, flat green/blue) let the oracle recompute
    every tile sum, and the row-order-sensitive red sum catches
    bottom-up BMP decode bugs tile by tile. Shape: map-only
    decode+patchify (patch² compression before the first shuffle),
    SQL-side means — the multimodal discipline."""
    from hawaiidatapipeline_spark.sources.multimodal import (
        image_patch_stats,
        synthetic_image_blobs,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    tiles = image_patch_stats(synthetic_image_blobs(d), patch=_PATCH)
    return tiles.select(
        "id",
        "py",
        "px",
        "n_px",
        "sum_r",
        "sum_g",
        "sum_b",
        F.expr("(sum_r * 1000) div n_px").cast("long").alias("mean_r_milli"),
    ).orderBy("id", "py", "px")


# --------------------------------- group-sequential guardrail (OBF)

_OBF_C_MILLI = 2040  # O'Brien-Fleming constant: reject when z^2*t >= C^2


def _obf_sql() -> str:
    c2 = _OBF_C_MILLI * _OBF_C_MILLI  # micro-scaled boundary constant
    return f"""WITH pu AS (
  SELECT user_id,
         CASE WHEN ('0x' || substring(md5('7:' || user_id::VARCHAR), 1, 15))
                   ::BIGINT % 2 = 0 THEN 0 ELSE 1 END AS variant
  FROM (SELECT DISTINCT user_id FROM events)),
obs AS (
  SELECT (epoch(date_trunc('day', e.ts))::BIGINT // 86400) AS day,
         p.variant, floor(e.value * 100)::BIGINT AS cents
  FROM events e JOIN pu p ON p.user_id = e.user_id
  WHERE e.event_type = 'purchase'),
sig AS (
  SELECT count(*)::BIGINT AS n, sum(cents)::BIGINT AS s,
         sum(cents * cents)::BIGINT AS q
  FROM obs),
var AS (SELECT ((q * n - s * s) // (n * (n - 1)))::BIGINT AS v FROM sig),
daily AS (
  SELECT day,
         sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END)::BIGINT AS dn1,
         sum(CASE WHEN variant = 1 THEN cents ELSE 0 END)::BIGINT AS ds1,
         sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)::BIGINT AS dn0,
         sum(CASE WHEN variant = 0 THEN cents ELSE 0 END)::BIGINT AS ds0
  FROM obs GROUP BY 1),
cum AS (
  SELECT day,
         sum(dn1) OVER w::BIGINT AS n1, sum(ds1) OVER w::BIGINT AS s1,
         sum(dn0) OVER w::BIGINT AS n0, sum(ds0) OVER w::BIGINT AS s0
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)),
tot AS (SELECT max(n1 + n0) AS nf FROM cum),
z AS (
  SELECT c.day, c.n1, c.n0,
         ((1000000::HUGEINT * (c.s1 * c.n0 - c.s0 * c.n1)
           * (c.s1 * c.n0 - c.s0 * c.n1))
          // (c.n1::HUGEINT * c.n0 * (c.n1 + c.n0) * v.v))::BIGINT
           AS z2_micro,
         ((1000000::HUGEINT * {c2} * t.nf) // ((c.n1 + c.n0) * 1000000))
           ::BIGINT AS bound2_micro
  FROM cum c CROSS JOIN var v CROSS JOIN tot t
  WHERE c.n1 > 0 AND c.n0 > 0)
SELECT day, n1, n0, z2_micro, bound2_micro,
       CASE WHEN z2_micro >= bound2_micro THEN 1 ELSE 0 END AS reject
FROM z ORDER BY day"""


@q("events_sequential_obf_guardrail", _obf_sql())
def events_sequential_obf_guardrail(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Group-sequential A/B guardrail with O'Brien–Fleming spending
    (Pocock 1977 / O'Brien & Fleming 1979 — the peeking-safe monitor
    `events_ab_lift`'s fixed-horizon z cannot be): each day, the
    CUMULATIVE two-sample z² is compared to the OBF boundary
    C²/t (t = information fraction), spending almost no alpha early.
    Everything stays rational so both engines agree exactly: z² =
    (S₁n₀−S₀n₁)² / (n₁n₀(n₁+n₀)σ̂²) in micro units (one HUGEINT/
    DECIMAL(38,0) product chain), boundary² = C²·n_final/n_d, reject =
    integer compare — no sqrt anywhere (the emb-distance discipline
    applied to sequential testing). σ̂² is the pooled all-data variance
    (integer n·Q−S² form). Output: the daily monitoring table with
    reject flags. Scale: one purchase-grain pass → day-grain daily
    sums → windows on the bounded calendar frame."""
    from hawaiidatapipeline_spark.operators.dedup import portable_hash64

    ev = load_table(spark, sf_dir, "events")
    pu = ev.select("user_id").distinct().select(
        "user_id",
        F.pmod(
            portable_hash64(F.col("user_id").cast("string"), 7), F.lit(2)
        ).alias("variant"),
    )
    obs = materialize(
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(pu), "user_id")
        .select(
            F.expr(
                "cast(unix_timestamp(date_trunc('day', ts)) as bigint)"
                " div 86400"
            ).alias("day"),
            "variant",
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    sig = obs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).cast("long").alias("q"),
    )
    var = sig.select(
        F.expr("(q * n - s * s) div (n * (n - 1))").cast("long").alias("v")
    )
    daily = obs.groupBy("day").agg(
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long")
        .alias("dn1"),
        F.sum(F.when(F.col("variant") == 1, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("ds1"),
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long")
        .alias("dn0"),
        F.sum(F.when(F.col("variant") == 0, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("ds0"),
    )
    wc = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = daily.select(
        "day",
        F.sum("dn1").over(wc).cast("long").alias("n1"),
        F.sum("ds1").over(wc).cast("long").alias("s1"),
        F.sum("dn0").over(wc).cast("long").alias("n0"),
        F.sum("ds0").over(wc).cast("long").alias("s0"),
    )
    tot = cum.agg(F.max(F.col("n1") + F.col("n0")).alias("nf"))
    c2 = _OBF_C_MILLI * _OBF_C_MILLI
    wide = "decimal(38,0)"
    return (
        cum.crossJoin(F.broadcast(var))
        .crossJoin(F.broadcast(tot))
        .filter((F.col("n1") > 0) & (F.col("n0") > 0))
        .select(
            "day",
            "n1",
            "n0",
            F.expr(
                f"cast(1000000 as {wide}) * (s1 * n0 - s0 * n1)"
                f" * (s1 * n0 - s0 * n1)"
                f" div (cast(n1 as {wide}) * n0 * (n1 + n0) * v)"
            )
            .cast("long")
            .alias("z2_micro"),
            F.expr(
                f"cast(1000000 as {wide}) * {c2} * nf"
                f" div ((n1 + n0) * 1000000)"
            )
            .cast("long")
            .alias("bound2_micro"),
        )
        .withColumn(
            "reject",
            F.when(F.col("z2_micro") >= F.col("bound2_micro"), 1).otherwise(0),
        )
        .orderBy("day")
    )


# ------------------------------------------ RRF hybrid retrieval

_RRF_K = 60
_RRF_LEG_N = 50
_RRF_TOPK = 20
_RRF_TERMS = ("merge", "window", "hash")  # the fulltext_bm25 query
_RRF_PROBE_VEC = 0


def _rrf_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in _RRF_TERMS)
    return f"""WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
lex_score AS (
  SELECT doc_id, count(*)::BIGINT AS tf
  FROM toks WHERE tok IN ({terms}) GROUP BY 1),
lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY tf DESC, doc_id) AS r
  FROM lex_score QUALIFY r <= {_RRF_LEG_N}),
qv AS (
  SELECT vec_id, unnest(generate_series(0, len(embedding) - 1)) AS d,
         round(unnest(embedding) * 1000)::BIGINT AS q
  FROM embeddings),
pv AS (SELECT d, q FROM qv WHERE vec_id = {_RRF_PROBE_VEC}),
dots AS (
  SELECT v.vec_id AS doc_id, sum(v.q * p.q)::BIGINT AS dp
  FROM qv v JOIN pv p ON p.d = v.d
  WHERE v.vec_id <> {_RRF_PROBE_VEC}
  GROUP BY 1),
sem AS (
  SELECT doc_id, row_number() OVER (ORDER BY dp DESC, doc_id) AS r
  FROM dots QUALIFY r <= {_RRF_LEG_N}),
fused AS (
  SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
         l.r AS lex_rank, s.r AS sem_rank,
         (coalesce(1000000 // ({_RRF_K} + l.r), 0)
          + coalesce(1000000 // ({_RRF_K} + s.r), 0))::BIGINT AS rrf_micro
  FROM lex l FULL OUTER JOIN sem s ON s.doc_id = l.doc_id)
SELECT doc_id, lex_rank, sem_rank, rrf_micro
FROM fused ORDER BY rrf_micro DESC, doc_id LIMIT {_RRF_TOPK}"""


@q("llm_rrf_hybrid_retrieval", _rrf_sql())
def llm_rrf_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of lexical and semantic retrieval
    (Cormack et al. 2009 — the hybrid-search default every RAG stack
    ships): the lexical leg ranks documents by term frequency for the
    `fulltext_bm25` query terms, the semantic leg by exact integer dot
    product to the probe embedding; RRF = Σ 1e6/(60+rank) over the
    legs (integer truncating divides), a method that needs NO score
    calibration between legs — only ranks. Top-20 fused with each
    leg's rank exposed (NULL = leg missed it — the complementarity
    evidence). Scale: each leg is a bounded top-N (posting-list grain
    / one probe×corpus dot pass); fusion joins two ≤N-row frames —
    fused state never exceeds 2N rows."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    lex_score = (
        toks.filter(F.col("tok").isin(*_RRF_TERMS))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    # top-N FIRST via orderBy+limit (distributed TakeOrderedAndProject),
    # THEN rank the N-row slice — the leg window never sees the full
    # matching-doc set (plan_smell global-window audit)
    wl = Window.orderBy(F.desc("tf"), "doc_id")
    lex = (
        lex_score.orderBy(F.desc("tf"), "doc_id")
        .limit(_RRF_LEG_N)
        .withColumn("r", F.row_number().over(wl))
        .select("doc_id", F.col("r").alias("lex_rank"))
    )
    qv = e.select(
        "vec_id", F.posexplode("embedding").alias("d", "x")
    ).select(
        "vec_id", "d", F.round(F.col("x") * 1000).cast("long").alias("q")
    )
    pv = qv.filter(F.col("vec_id") == _RRF_PROBE_VEC).select(
        "d", F.col("q").alias("pq")
    )
    dots = (
        qv.filter(F.col("vec_id") != _RRF_PROBE_VEC)
        .join(F.broadcast(pv), "d")
        .groupBy("vec_id")
        .agg(F.sum(F.col("q") * F.col("pq")).cast("long").alias("dp"))
    )
    ws = Window.orderBy(F.desc("dp"), "vec_id")
    sem = (
        dots.orderBy(F.desc("dp"), "vec_id")
        .limit(_RRF_LEG_N)
        .withColumn("r", F.row_number().over(ws))
        .select(F.col("vec_id").alias("doc_id"), F.col("r").alias("sem_rank"))
    )
    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rank",
        "sem_rank",
        (
            F.coalesce(
                F.expr(f"1000000 div ({_RRF_K} + lex_rank)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"1000000 div ({_RRF_K} + sem_rank)"), F.lit(0)
            )
        )
        .cast("long")
        .alias("rrf_micro"),
    )
    return fused.orderBy(F.desc("rrf_micro"), "doc_id").limit(_RRF_TOPK)


# ------------------------------------------- audio downsample audit

@q(
    "multimodal_audio_downsample",
    """WITH dims AS (
  SELECT doc_id AS id, 800 + 8 * (doc_id % 100) AS n FROM documents),
inn AS (
  SELECT id, count(*)::BIGINT AS n_in,
         sum(((id + i) % 200 - 100) * ((id + i) % 200 - 100))::BIGINT
           AS energy_in
  FROM (SELECT id, unnest(generate_series(0, n - 1)) AS i FROM dims)
  GROUP BY id),
outt AS (
  SELECT id, count(*)::BIGINT AS n_out,
         sum(((id + i) % 200 - 100) * ((id + i) % 200 - 100))::BIGINT
           AS energy_out,
         min(CASE WHEN i = 0 THEN (id + i) % 200 - 100 END)::BIGINT
           AS first_sample_out
  FROM (SELECT id, unnest(generate_series(0, n - 1)) AS i FROM dims)
  WHERE i % 2 = 0
  GROUP BY id)
SELECT i.id, i.n_in, o.n_out, i.energy_in, o.energy_out,
       o.first_sample_out,
       ((o.energy_out * 1000) // i.energy_in)::BIGINT AS energy_ratio_milli
FROM inn i JOIN outt o ON o.id = i.id ORDER BY i.id""",
)
def multimodal_audio_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decimation audit (8 kHz → 4 kHz by stride-2 sample drop —
    the rate-normalization step before batching clips into a training
    shard; a real resampler low-pass-filters first, which needs an FFT
    library this container lacks and the docstring says so): REAL WAV
    decode → keep every 2nd sample → exact integer in/out sample
    counts, energies, the first output sample (offset bugs move it),
    and the energy-retention ratio in milli. The closed-form synthetic
    corpus lets the oracle recompute both legs. Shape: map-only
    decode+decimate stats (one row per clip out of the Arrow batch),
    one join at clip grain — samples never shuffle."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterable, Iterator

    from hawaiidatapipeline_spark.sources.multimodal import (
        decode_wav,
        synthetic_audio_blobs,
    )

    def run(batches: "Iterable[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {
                k: []
                for k in (
                    "id", "n_in", "n_out", "energy_in", "energy_out",
                    "first_sample_out",
                )
            }
            for i, payload in zip(pdf["id"], pdf["payload"]):
                samples, _rate = decode_wav(bytes(payload))
                s64 = samples.astype("int64")
                dec = s64[::2]
                out["id"].append(int(i))
                out["n_in"].append(len(s64))
                out["n_out"].append(len(dec))
                out["energy_in"].append(int((s64 * s64).sum()))
                out["energy_out"].append(int((dec * dec).sum()))
                out["first_sample_out"].append(int(dec[0]))
            yield pd.DataFrame(out)

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    blobs = synthetic_audio_blobs(d)
    stats = blobs.select("id", "payload").mapInPandas(
        run,
        "id bigint, n_in bigint, n_out bigint, energy_in bigint,"
        " energy_out bigint, first_sample_out bigint",
    )
    return stats.select(
        "*",
        F.expr("(energy_out * 1000) div energy_in")
        .cast("long")
        .alias("energy_ratio_milli"),
    ).orderBy("id")


# ------------------------------------------------- Granger-lite test

def _granger_sql() -> str:
    return """WITH daily AS (
  SELECT (epoch(date_trunc('day', ts))::BIGINT // 86400) AS day,
         floor(sum(CASE WHEN event_type = 'purchase'
                        THEN floor(value * 100) ELSE 0 END) / 1000)
           ::BIGINT AS y,
         count(*)::BIGINT AS x
  FROM events GROUP BY 1),
lagged AS (
  SELECT day, y,
         lag(y) OVER (ORDER BY day) AS y1,
         lag(x) OVER (ORDER BY day) AS x1
  FROM daily QUALIFY y1 IS NOT NULL),
m AS (
  SELECT count(*)::HUGEINT AS n,
         sum(y)::HUGEINT AS sy, sum(y1)::HUGEINT AS sa,
         sum(x1)::HUGEINT AS sb,
         sum(y * y)::HUGEINT AS syy, sum(y1 * y1)::HUGEINT AS saa,
         sum(x1 * x1)::HUGEINT AS sbb, sum(y1 * y)::HUGEINT AS say,
         sum(x1 * y)::HUGEINT AS sby, sum(y1 * x1)::HUGEINT AS sab
  FROM lagged),
c AS (
  SELECT n,
         n * syy - sy * sy AS cyy,
         n * saa - sa * sa AS caa,
         n * sbb - sb * sb AS cbb,
         n * say - sa * sy AS cay,
         n * sby - sb * sy AS cby,
         n * sab - sa * sb AS cab
  FROM m)
SELECT n::BIGINT AS n,
       ((cay * 1000000) // caa)::BIGINT AS b_micro,
       ((cyy * caa - cay * cay) // caa)::BIGINT AS sse_r_scaled,
       (((cyy * (caa * cbb - cab * cab)
          - cay * (cay * cbb - cab * cby)
          + cby * (cay * cab - caa * cby)))
        // (caa * cbb - cab * cab))::BIGINT AS sse_f_scaled,
       ((((cyy * caa - cay * cay)
          - (cyy * (caa * cbb - cab * cab)
             - cay * (cay * cbb - cab * cby)
             + cby * (cay * cab - caa * cby))
            // (caa * cbb - cab * cab) * caa) * 1000)
        // (cyy * caa - cay * cay))::BIGINT AS lr_gain_milli
FROM c"""


@q("ts_granger_lite", _granger_sql())
def ts_granger_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 Granger-causality screen (Granger 1969): does yesterday's
    EVENT VOLUME improve today's REVENUE forecast beyond yesterday's
    revenue? Restricted model y ~ y₋₁ vs full y ~ y₋₁ + x₋₁, both
    solved exactly via centered Gram determinants (the `ts_pacf`
    Cramer's-rule discipline): SSE·n² = (C_yy·C_aa − C_ay²)/C_aa for
    the restricted leg and the 3×3/2×2 determinant ratio for the full
    leg — HUGEINT/DECIMAL(38,0) throughout, one truncating divide per
    reported number, no matrix inversion. Revenue is pre-scaled to
    kilo-cents so the determinant chain stays inside 38 digits to
    ~10× the bench lane (documented envelope). Output: n, restricted
    slope, both scaled SSEs, and the explained-variance gain (milli) —
    the screen's decision number. Scale: one day-grain pre-agg is the
    only pass over raw events; the lag frame and moment sums live on
    the bounded calendar grain."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr(
            "cast(unix_timestamp(date_trunc('day', ts)) as bigint) div 86400"
        ).alias("day")
    ).agg(
        F.floor(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * 100),
                ).otherwise(0)
            )
            / 1000
        )
        .cast("long")
        .alias("y"),
        F.count(F.lit(1)).cast("long").alias("x"),
    )
    wd = Window.orderBy("day")
    lagged = (
        daily.select(
            "day",
            "y",
            F.lag("y").over(wd).alias("y1"),
            F.lag("x").over(wd).alias("x1"),
        )
        .filter(F.col("y1").isNotNull())
    )
    wide = "decimal(38,0)"
    m = lagged.agg(
        F.count(F.lit(1)).cast(wide).alias("n"),
        F.sum("y").cast(wide).alias("sy"),
        F.sum("y1").cast(wide).alias("sa"),
        F.sum("x1").cast(wide).alias("sb"),
        F.sum(F.col("y") * F.col("y")).cast(wide).alias("syy"),
        F.sum(F.col("y1") * F.col("y1")).cast(wide).alias("saa"),
        F.sum(F.col("x1") * F.col("x1")).cast(wide).alias("sbb"),
        F.sum(F.col("y1") * F.col("y")).cast(wide).alias("say"),
        F.sum(F.col("x1") * F.col("y")).cast(wide).alias("sby"),
        F.sum(F.col("y1") * F.col("x1")).cast(wide).alias("sab"),
    )
    c = m.select(
        "n",
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).alias("cyy"),
        (F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")).alias("caa"),
        (F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")).alias("cbb"),
        (F.col("n") * F.col("say") - F.col("sa") * F.col("sy")).alias("cay"),
        (F.col("n") * F.col("sby") - F.col("sb") * F.col("sy")).alias("cby"),
        (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")).alias("cab"),
    )
    return c.select(
        F.col("n").cast("long").alias("n"),
        F.expr("cay * 1000000 div caa").cast("long").alias("b_micro"),
        F.expr("(cyy * caa - cay * cay) div caa")
        .cast("long")
        .alias("sse_r_scaled"),
        F.expr(
            "(cyy * (caa * cbb - cab * cab)"
            " - cay * (cay * cbb - cab * cby)"
            " + cby * (cay * cab - caa * cby))"
            " div (caa * cbb - cab * cab)"
        )
        .cast("long")
        .alias("sse_f_scaled"),
        F.expr(
            "(((cyy * caa - cay * cay)"
            "  - (cyy * (caa * cbb - cab * cab)"
            "     - cay * (cay * cbb - cab * cby)"
            "     + cby * (cay * cab - caa * cby))"
            "    div (caa * cbb - cab * cab) * caa) * 1000)"
            " div (cyy * caa - cay * cay)"
        )
        .cast("long")
        .alias("lr_gain_milli"),
    )


# ------------------------------------------------ rolling median

@q(
    "ts_rolling_median",
    """WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         sum(round(value * 100)::BIGINT)::BIGINT AS cents
  FROM events GROUP BY 1)
SELECT day, cents,
       round(median(cents) OVER (ORDER BY day
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING), 6)
         AS med7,
       count(*) OVER (ORDER BY day
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)::BIGINT AS frame_n
FROM daily ORDER BY day""",
)
def ts_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day MEDIAN of daily revenue — the robust smoother the
    7-day moving AVERAGE (`ts_seasonal_decompose`'s trend) is not: one
    spike day drags a mean for a week but never moves the median. Both
    engines compute the exact frame median of integer cents (odd frames
    are a cent value, even edge frames the midpoint — rounded to 6 dp
    on both sides per the float contract), with the frame size exposed
    so edge frames are honest. Scale: day-grain pre-agg is the only
    pass over raw rows; the median window runs on the bounded calendar
    frame (the `ts_stl_anomaly` discipline)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    return daily.select(
        "day",
        "cents",
        F.round(F.expr("percentile(cents, 0.5)").over(w), 6).alias("med7"),
        F.count(F.lit(1)).over(w).cast("long").alias("frame_n"),
    ).orderBy("day")


# ---------------------------------------- domain diversity (Hill)

@q(
    "llm_domain_balance_hill",
    """WITH st AS (
  SELECT source, sum(len(string_split(text, ' ')))::BIGINT AS tokens
  FROM documents GROUP BY 1),
tot AS (SELECT sum(tokens)::BIGINT AS t, count(*)::BIGINT AS k FROM st),
h AS (
  SELECT tot.k AS n0,
         (floor(ln(tot.t) * 1000000)::BIGINT
          - sum(st.tokens * floor(ln(st.tokens) * 1000000)::BIGINT)::BIGINT
            // tot.t)::BIGINT AS h_micro,
         ((tot.t::HUGEINT * tot.t * 1000000)
          // sum(st.tokens::HUGEINT * st.tokens))::BIGINT AS n2_micro
  FROM st CROSS JOIN tot
  GROUP BY tot.k, tot.t)
SELECT n0, h_micro,
       floor(exp(h_micro / 1000000.0) * 1000)::BIGINT AS n1_milli,
       n2_micro
FROM h""",
)
def llm_domain_balance_hill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-balance diversity profile as Hill numbers (Hill 1973 —
    the ecology diversity ladder data-mixture papers borrowed): N0 =
    source count, N1 = exp(Shannon entropy of token shares) = the
    'effective number of equally-sized domains', N2 = 1/Simpson =
    the effective count weighted toward the big domains. N1 ≪ N0 is
    the one-number summary that a mixture is dominated by a few
    sources — the audit `llm_mixture_temperature` reweights FROM.
    Entropy in floored micro nats (ln-with-floor), N2 fully rational
    (t²/Σtokens² in HUGEINT/DECIMAL), the single exp floored to milli.
    Scale: one linear token-count agg; everything after is K rows."""
    d = load_table(spark, sf_dir, "documents")
    st = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("tokens")
    )
    tot = st.agg(
        F.sum("tokens").cast("long").alias("t"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    wide = "decimal(38,0)"
    h = (
        st.crossJoin(F.broadcast(tot))
        .groupBy("k", "t")
        .agg(
            (
                F.floor(F.log(F.max("t")) * 1000000)
                - F.expr(
                    "sum(tokens * cast(floor(ln(tokens) * 1000000) as bigint))"
                    " div max(t)"
                )
            )
            .cast("long")
            .alias("h_micro"),
            F.expr(
                f"cast(max(t) as {wide}) * max(t) * 1000000"
                f" div sum(cast(tokens as {wide}) * tokens)"
            )
            .cast("long")
            .alias("n2_micro"),
        )
    )
    return h.select(
        F.col("k").cast("long").alias("n0"),
        "h_micro",
        F.floor(F.exp(F.col("h_micro") / 1000000.0) * 1000)
        .cast("long")
        .alias("n1_milli"),
        "n2_micro",
    )


# ------------------------------------------- random-walk sampler

_WALK_LEN = 3
_WALK_SEED = 23


def _walks_sql() -> str:
    ph = "('0x' || substring(md5('{seed}:' || {expr}), 1, 15))::BIGINT"
    step = """s{i} AS (
  SELECT w.walk_id, w.n{p}, e.dst AS n{i},
         row_number() OVER (
           PARTITION BY w.walk_id
           ORDER BY """ + ph.format(
        seed=_WALK_SEED, expr="w.walk_id || '|' || {i} || '|' || e.dst"
    ) + """, e.dst) AS rn
  FROM w{p} w JOIN cop e ON e.src = w.n{p}
  QUALIFY rn = 1),
w{i} AS (SELECT walk_id, n{i} FROM s{i})"""
    steps = ",\n".join(
        step.replace("{i}", str(i)).replace("{p}", str(i - 1))
        for i in range(1, _WALK_LEN + 1)
    )
    joins = " ".join(
        f"JOIN s{i} ON s{i}.walk_id = seeds.walk_id"
        for i in range(1, _WALK_LEN + 1)
    )
    cols = ", ".join(f"s{i}.n{i} AS hop{i}" for i in range(1, _WALK_LEN + 1))
    return f"""WITH items AS (SELECT l_orderkey, l_partkey FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) QUALIFY count(*) OVER (PARTITION BY l_orderkey) <= 64),
cop AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2),
nodes AS (SELECT DISTINCT src AS node FROM cop),
seeds AS (
  SELECT node AS walk_id, node AS n0 FROM nodes
  WHERE node % (SELECT greatest(1, ceil(count(*) / 200.0))::BIGINT
                FROM nodes) = 0),
w0 AS (SELECT walk_id, n0 FROM seeds),
{steps}
SELECT seeds.walk_id, seeds.n0 AS seed, {cols}
FROM seeds {joins}
ORDER BY seeds.walk_id"""


@q("graph_random_walks", _walks_sql())
def graph_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeepWalk-style random-walk corpus sampler (Perozzi et al. 2014
    — the walk generator graph-embedding training feeds on), made
    hash-deterministic so the oracle replays every step: from ~200
    corpus-scaled seed nodes, 3 hops; at each hop the walker moves to
    the neighbor with the MINIMUM portable hash of (walk, step,
    neighbor) — a uniform-at-random choice under the hash's uniformity
    that both engines reproduce exactly (the house substitute for an
    RNG, same trick as the Gumbel-top-k sampler). Output: one training
    sequence (seed, hop1..hop3) per seed — the skip-gram input. Dead
    ends are impossible on the mirrored co-purchase graph. Scale: per
    hop one frontier×edges join + per-walk min-hash rank (neighbor-
    grain, never graph-grain); seeds capped corpus-scaled like the
    BFS/Brandes family."""
    from hawaiidatapipeline_spark.operators.dedup import portable_hash64
    from hawaiidatapipeline_spark.operators.graph import copurchase_edges

    li = load_table(spark, sf_dir, "lineitem")
    edges = materialize(copurchase_edges(li, directed=True))
    nodes = materialize(edges.select(F.col("src").alias("node")).distinct())
    n_nodes = nodes.count()
    mod = max(1, -(-n_nodes // 200))
    seeds = nodes.filter(F.col("node") % mod == 0).select(
        F.col("node").alias("walk_id"), F.col("node").alias("n0")
    )
    cur = seeds.select("walk_id", F.col("n0").alias("cur"))
    hops = []
    for i in range(1, _WALK_LEN + 1):
        cand = cur.join(edges, cur.cur == edges.src).select(
            "walk_id",
            F.col("dst"),
            portable_hash64(
                F.concat_ws(
                    "|",
                    F.col("walk_id").cast("string"),
                    F.lit(str(i)),
                    F.col("dst").cast("string"),
                ),
                _WALK_SEED,
            ).alias("h"),
        )
        wk = Window.partitionBy("walk_id").orderBy("h", "dst")
        nxt = materialize(
            cand.withColumn("rn", F.row_number().over(wk))
            .filter(F.col("rn") == 1)
            .select("walk_id", F.col("dst").alias(f"hop{i}"))
        )
        hops.append(nxt)
        cur = nxt.select("walk_id", F.col(f"hop{i}").alias("cur"))
    out = seeds.select("walk_id", F.col("n0").alias("seed"))
    for nxt in hops:
        out = out.join(nxt, "walk_id")
    return out.orderBy("walk_id")


# ------------------------------------------- Good-Turing spectrum

_GT_MAX_R = 10  # report the 10 lowest count classes present


@q(
    "llm_good_turing_spectrum",
    f"""WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w,
         generate_subscripts(string_split(lower(text), ' '), 1) AS i
  FROM documents),
bg AS (
  SELECT a.w || ' ' || b.w AS t
  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
tc AS (SELECT t, count(*)::BIGINT AS r FROM bg GROUP BY 1),
nn AS (SELECT sum(r)::BIGINT AS n FROM tc),
spec AS (SELECT r, count(*)::BIGINT AS n_r FROM tc GROUP BY r),
gt AS (
  SELECT s.r, s.n_r,
         lead(s.n_r) OVER (ORDER BY s.r) AS n_r1,
         lead(s.r) OVER (ORDER BY s.r) AS r_next,
         row_number() OVER (ORDER BY s.r) AS rn
  FROM spec s)
SELECT g.r, g.n_r,
       CASE WHEN g.r_next = g.r + 1
            THEN ((g.r + 1) * g.n_r1 * 1000) // g.n_r END AS r_star_milli,
       (g.r * g.n_r * 1000000 // nn.n)::BIGINT AS mass_micro
FROM gt g CROSS JOIN nn
WHERE g.rn <= {_GT_MAX_R}
ORDER BY g.r""",
)
def llm_good_turing_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good–Turing frequency spectrum (Good 1953 — the count-of-counts
    table every held-out LM smoother starts from): N_r = how many token
    types occur exactly r times, the adjusted count r* = (r+1)·N_{r+1}
    / N_r (milli; NULL where the spectrum has a gap, the standard
    signal to switch to a fitted smoother), and each count class's
    probability mass (micro), over BIGRAM types (the fixture's unigram
    vocabulary is saturated — every word frequent — so the informative
    tail lives at the bigram grain; the 10 lowest count classes present
    are reported). The lowest-r row's mass is the unseen-mass estimate.
    Complements `llm_kneser_ney_bigram` (parametric discount) with the
    nonparametric one. Scale: one bigram self-join → type-grain count →
    COUNT-grain spectrum (strictly shrinking; tiny at any corpus size)
    → lead window on the bounded spectrum frame."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("i0", "w"),
    ).select("doc_id", (F.col("i0") + 1).alias("i"), "w")
    a = toks.select("doc_id", "i", F.col("w").alias("w1"))
    b = toks.select(
        "doc_id", (F.col("i") - 1).alias("i"), F.col("w").alias("w2")
    )
    bg = a.join(b, ["doc_id", "i"]).select(
        F.concat_ws(" ", "w1", "w2").alias("t")
    )
    tc = bg.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("r"))
    nn = tc.agg(F.sum("r").cast("long").alias("n"))
    spec = tc.groupBy("r").agg(F.count(F.lit(1)).cast("long").alias("n_r"))
    wr = Window.orderBy("r")
    gt = spec.select(
        "r",
        "n_r",
        F.lead("n_r").over(wr).alias("n_r1"),
        F.lead("r").over(wr).alias("r_next"),
        F.row_number().over(wr).alias("rn"),
    )
    return (
        gt.crossJoin(F.broadcast(nn))
        .filter(F.col("rn") <= _GT_MAX_R)
        .select(
            "r",
            "n_r",
            F.when(
                F.col("r_next") == F.col("r") + 1,
                F.expr("((r + 1) * n_r1 * 1000) div n_r"),
            )
            .cast("long")
            .alias("r_star_milli"),
            F.expr("r * n_r * 1000000 div n").cast("long").alias("mass_micro"),
        )
        .orderBy("r")
    )


# --------------------------------------- image channel histograms

_HIST_BINS = 16  # 256 / 16 levels per bin


@q(
    "multimodal_image_channel_hist",
    f"""WITH dims AS (
  SELECT doc_id AS id, 8 + doc_id % 5 AS h, 16 + doc_id % 8 AS w
  FROM documents),
rows_ AS (
  SELECT id, h, w, unnest(generate_series(0, h - 1)) AS row FROM dims),
px AS (
  SELECT id, 'r' AS channel, ((id + row) % 256) // {_HIST_BINS} AS bin,
         w::BIGINT AS n_px
  FROM rows_
  UNION ALL
  SELECT id, 'g', ((3 * id) % 256) // {_HIST_BINS}, (h * w)::BIGINT
  FROM dims
  UNION ALL
  SELECT id, 'b', ((7 * id) % 256) // {_HIST_BINS}, (h * w)::BIGINT
  FROM dims)
SELECT channel, bin::BIGINT AS bin,
       count(DISTINCT id)::BIGINT AS n_images,
       sum(n_px)::BIGINT AS n_pixels
FROM px GROUP BY 1, 2 ORDER BY channel, bin""",
)
def multimodal_image_channel_hist(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Corpus-level color-profile audit: per-channel 16-bin intensity
    histograms over REAL decoded pixels — the distribution check a
    vision-data curator runs before trusting a shard (an all-dark or
    clipped-channel corpus shows up here before any model does). The
    decode map emits per-image per-channel bin counts (16×3 rows per
    image, the pixel→histogram compression on the executor); the
    corpus rollup is a (channel, bin)-grain partial agg. Closed-form
    synthetic pixels let the oracle recompute every bin: the
    row-varying red exercises multi-bin histograms, the flat
    green/blue land each image in exactly one bin. Scale: map-only
    decode+bin, constant-grain (48-row) output at any corpus size."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterable, Iterator

    from hawaiidatapipeline_spark.sources.multimodal import (
        decode_image,
        synthetic_image_blobs,
    )

    def run(batches: "Iterable[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {"id": [], "channel": [], "bin": [], "n_px": []}
            for i, payload in zip(pdf["id"], pdf["payload"]):
                img = decode_image(bytes(payload))
                for ci, cname in enumerate(("r", "g", "b")):
                    binned = img[:, :, ci].astype("int64") // _HIST_BINS
                    vals, counts = np.unique(binned, return_counts=True)
                    for v, c in zip(vals, counts):
                        out["id"].append(int(i))
                        out["channel"].append(cname)
                        out["bin"].append(int(v))
                        out["n_px"].append(int(c))
            yield pd.DataFrame(out)

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    blobs = synthetic_image_blobs(d)
    binned = blobs.select("id", "payload").mapInPandas(
        run, "id bigint, channel string, bin bigint, n_px bigint"
    )
    return (
        binned.groupBy("channel", "bin")
        .agg(
            F.countDistinct("id").cast("long").alias("n_images"),
            F.sum("n_px").cast("long").alias("n_pixels"),
        )
        .orderBy("channel", "bin")
    )
