"""Training-corpus logistics and sequence/statistics operators.

Shard manifests, per-source quota sampling, existence-flag (mark) joins,
exact higher statistical moments, and top event-type sequences. All pure
DataFrame plans; the deterministic-sampling queries use the portable
md5 hash (`operators/dedup.py portable_hash64`) so DuckDB reproduces
every assignment bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table


def _ph(expr: str, seed) -> str:
    """DuckDB twin of portable_hash64: first 15 md5 hex digits as int."""
    return f"('0x' || substring(md5('{seed}:' || {expr}), 1, 15))::BIGINT"


QUERIES, ORACLES, q = new_module_registry()


@q(
    "llm_shard_manifest",
    f"""SELECT {_ph('doc_id::VARCHAR', 7)} % 16 AS shard,
              count(*) AS n_docs,
              sum(n_chars)::BIGINT AS total_chars,
              sum(len(string_split(text, ' ')))::BIGINT AS total_tokens
       FROM documents
       GROUP BY shard
       ORDER BY shard""",
)
def llm_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard manifest: every document deterministically assigned
    to one of 16 shards by portable content hash (stable under appends
    and re-orderings — a doc never migrates), with per-shard doc / char /
    token totals. This is the artifact a dataloader consumes; the hash-mod
    assignment is the scale-safe alternative to greedy bin-packing, which
    is inherently sequential. One partial-aggregated shuffle of 16 rows."""
    from hawaiidatapipeline_spark.operators.dedup import portable_hash64

    d = load_table(spark, sf_dir, "documents")
    shard = F.pmod(portable_hash64(F.col("doc_id").cast("string"), 7), F.lit(16))
    return (
        d.select(
            shard.alias("shard"),
            "n_chars",
            F.size(F.split("text", " ")).alias("n_tokens"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("shard")
    )


@q(
    "llm_quota_sample",
    f"""WITH ranked AS (
         SELECT doc_id, source,
                row_number() OVER (
                  PARTITION BY source
                  ORDER BY {_ph('doc_id::VARCHAR', 13)}, doc_id) AS rk
         FROM documents)
       SELECT source, doc_id, rk
       FROM ranked WHERE rk <= 5
       ORDER BY source, rk""",
)
def llm_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota sampling: exactly 5 documents per source, chosen
    by portable-hash rank — deterministic, reproducible on any engine,
    and stable as the corpus grows (new docs only displace picks when
    their hash ranks lower). The distributed shape is one row_number
    window per source partition — no global sort, no driver pass; at
    100 TB the quota keeps the output |sources|×k regardless of corpus
    size. Companion to llm_mixture_sample (per-source RATES)."""
    from hawaiidatapipeline_spark.operators.dedup import portable_hash64

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        portable_hash64(F.col("doc_id").cast("string"), 13), "doc_id"
    )
    return (
        d.select("source", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 5)
        .orderBy("source", "rk")
    )


@q(
    "join_exists_flag",
    """SELECT EXISTS(SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey) AS has_orders,
              EXISTS(SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey
                       AND o.o_orderpriority = '1-URGENT') AS has_urgent,
              count(*) AS n_customers
       FROM customer c
       GROUP BY has_orders, has_urgent
       ORDER BY has_orders, has_urgent""",
)
def join_exists_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence-flag (mark) join: EXISTS as a projected column rather
    than a filter — the segmentation primitive behind "has purchased /
    has churned" cohort matrices. Spark's EXISTS subqueries only filter,
    so the flags compile to left joins against DISTINCT key sets with an
    is-not-null indicator — semantically the mark join Catalyst would
    plan, and the distinct sides collapse to broadcast-sized key lists
    at any scale where the dimension fits (else they shuffle once)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    any_keys = o.select(F.col("o_custkey").alias("k_any")).distinct()
    urgent_keys = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("k_urgent"))
        .distinct()
    )
    return (
        c.join(F.broadcast(any_keys), c.c_custkey == F.col("k_any"), "left_outer")
        .join(F.broadcast(urgent_keys), c.c_custkey == F.col("k_urgent"), "left_outer")
        .select(
            F.col("k_any").isNotNull().alias("has_orders"),
            F.col("k_urgent").isNotNull().alias("has_urgent"),
        )
        .groupBy("has_orders", "has_urgent")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("has_orders", "has_urgent")
    )


@q(
    "agg_moments",
    """WITH s AS (
         SELECT l_returnflag,
                count(*)::DOUBLE AS n,
                sum(l_quantity::DECIMAL(20,2))::DOUBLE AS s1,
                sum((l_quantity * l_quantity)::DECIMAL(24,2))::DOUBLE AS s2,
                sum((l_quantity * l_quantity * l_quantity)
                    ::DECIMAL(28,2))::DOUBLE AS s3,
                sum((l_quantity * l_quantity * l_quantity * l_quantity)
                    ::DECIMAL(32,2))::DOUBLE AS s4
         FROM lineitem GROUP BY l_returnflag)
       SELECT l_returnflag,
              round(s1 / n, 6) AS mean,
              round(s2 / n - (s1 / n) * (s1 / n), 6) AS variance,
              round((s3 / n - 3 * (s1 / n) * (s2 / n)
                     + 2 * (s1 / n) * (s1 / n) * (s1 / n))
                    / pow(s2 / n - (s1 / n) * (s1 / n), 1.5), 6) AS skewness,
              round((s4 / n - 4 * (s1 / n) * (s3 / n)
                     + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                     - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
                    / pow(s2 / n - (s1 / n) * (s1 / n), 2.0) - 3, 6)
                AS excess_kurtosis
       FROM s ORDER BY l_returnflag""",
)
def agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis per group, built from the
    four exact-decimal power sums rather than the engines' built-ins
    (whose bias corrections differ): Σx..Σx⁴ partial-aggregate map-side
    exactly like any sum, then the central-moment formulas run in double
    on identical operands in both engines. The one-pass power-sum layout
    is the distributed-moments idiom — no second pass, no per-group
    sort, shuffle = |groups| rows."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x.cast("decimal(20,2)")).cast("double").alias("s1"),
        F.sum((x * x).cast("decimal(24,2)")).cast("double").alias("s2"),
        F.sum((x * x * x).cast("decimal(28,2)")).cast("double").alias("s3"),
        F.sum((x * x * x * x).cast("decimal(32,2)")).cast("double").alias("s4"),
    )
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    m = s1 / n
    var = s2 / n - m * m
    skew = (s3 / n - 3 * m * (s2 / n) + 2 * m * m * m) / F.pow(var, 1.5)
    kurt = (
        s4 / n - 4 * m * (s3 / n) + 6 * m * m * (s2 / n) - 3 * m * m * m * m
    ) / F.pow(var, 2.0) - 3
    return s.select(
        "l_returnflag",
        F.round(m, 6).alias("mean"),
        F.round(var, 6).alias("variance"),
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("excess_kurtosis"),
    ).orderBy("l_returnflag")


@q(
    "events_top_sequences",
    """WITH seq AS (
         SELECT event_type AS e1,
                lead(event_type, 1) OVER w AS e2,
                lead(event_type, 2) OVER w AS e3
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       SELECT e1, e2, e3, count(*) AS n
       FROM seq WHERE e3 IS NOT NULL
       GROUP BY e1, e2, e3
       ORDER BY n DESC, e1, e2, e3
       LIMIT 10""",
)
def events_top_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 3-step event-type sequences across user journeys (the 3-gram
    generalization of events_transition_matrix): two leads over one
    per-user window, then a bounded ≤|types|³ aggregate and a total-order
    top-10. One shuffle for the window; the aggregate output is constant-
    sized however large the event log grows."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.filter(F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "e1", "e2", "e3")
        .limit(10)
    )


@q(
    "llm_mixture_temperature",
    """WITH c AS (SELECT source, count(*)::BIGINT AS n_docs
                  FROM documents GROUP BY source),
       p AS (SELECT source, n_docs,
                    (floor(pow(n_docs::DOUBLE, 0.3) * 1000000))::BIGINT AS p03,
                    (floor(pow(n_docs::DOUBLE, 0.7) * 1000000))::BIGINT AS p07,
                    n_docs * 1000000 AS p10
             FROM c),
       t AS (SELECT sum(p03)::BIGINT AS s03, sum(p07)::BIGINT AS s07,
                    sum(p10)::BIGINT AS s10
             FROM p)
       SELECT p.source, p.n_docs,
              round(p.p03::DOUBLE / t.s03, 6) AS w_t03,
              round(p.p07::DOUBLE / t.s07, 6) AS w_t07,
              round(p.p10::DOUBLE / t.s10, 6) AS w_t10
       FROM p CROSS JOIN t
       ORDER BY p.source""",
)
def llm_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights per source — the standard
    multi-source LLM sampling rule w(s) ∝ n(s)^T (T=1 proportional,
    T→0 uniform; 0.3/0.7 are the published multilingual settings): the
    sweep a data engineer reads before choosing how hard to upweight
    small sources against the head. Each n^T is floored to integer
    micro-units before the (|sources|-row) normalizing sum, so the
    weights are hash-stable; T=1 is exact by construction. Scale note:
    one count aggregation over the corpus; the sweep itself runs on the
    per-source frame with a broadcast total."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    nd = F.col("n_docs").cast("double")
    p = c.select(
        "source",
        "n_docs",
        F.floor(F.pow(nd, F.lit(0.3)) * 1000000).cast("long").alias("p03"),
        F.floor(F.pow(nd, F.lit(0.7)) * 1000000).cast("long").alias("p07"),
        (F.col("n_docs") * 1000000).cast("long").alias("p10"),
    )
    t = p.agg(
        F.sum("p03").cast("long").alias("s03"),
        F.sum("p07").cast("long").alias("s07"),
        F.sum("p10").cast("long").alias("s10"),
    )
    return (
        p.crossJoin(F.broadcast(t))
        .select(
            "source",
            "n_docs",
            F.round(F.col("p03").cast("double") / F.col("s03"), 6).alias("w_t03"),
            F.round(F.col("p07").cast("double") / F.col("s07"), 6).alias("w_t07"),
            F.round(F.col("p10").cast("double") / F.col("s10"), 6).alias("w_t10"),
        )
        .orderBy("source")
    )
