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


_PIT_WINDOW_US = 7 * 86400 * 1000000  # trailing 7 days in microseconds


@q(
    "events_pit_features",
    f"""WITH ev AS (
         SELECT event_id, user_id, event_type,
                epoch_us(ts)::BIGINT AS us,
                (floor(value * 1000))::BIGINT AS vm
         FROM events
         WHERE event_type IN ('click', 'view', 'purchase')),
       feat AS (
         SELECT event_id, user_id, event_type,
                coalesce(sum(CASE WHEN event_type = 'click' THEN 1 END)
                  OVER w, 0)::BIGINT AS clicks_7d,
                coalesce(sum(CASE WHEN event_type = 'view' THEN 1 END)
                  OVER w, 0)::BIGINT AS views_7d,
                coalesce(sum(CASE WHEN event_type = 'click' THEN vm END)
                  OVER w, 0)::BIGINT AS click_value_7d_milli
         FROM ev
         WINDOW w AS (PARTITION BY user_id ORDER BY us
                      RANGE BETWEEN {_PIT_WINDOW_US} PRECEDING
                                AND 1 PRECEDING))
       SELECT event_id AS purchase_id, user_id,
              clicks_7d, views_7d, click_value_7d_milli
       FROM feat WHERE event_type = 'purchase'
       ORDER BY purchase_id""",
)
def events_pit_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct feature assembly (the feature-store
    backfill shape): for every purchase, the user's trailing-7-day
    click/view counts and click value STRICTLY BEFORE the purchase
    instant — the leakage-free training-set join that a naive
    "aggregate then join on user" silently gets wrong (it leaks
    post-label activity into the features). One event frame, one
    microsecond-keyed RANGE window per user with an exclusive upper
    bound (…AND 1 PRECEDING); value-based frames make same-instant
    ties deterministic on both engines with no tie-break column.
    Value sums are exact milli-unit int64. Shape: ONE shuffle on
    user_id + a per-user time sort shared by all three feature
    columns; at 100 TB this is the canonical windowed-feature
    backfill — linear, skew-bounded by the hottest user, and the
    window state is O(7 days of one user's events)."""
    e = load_table(spark, sf_dir, "events")
    ev = e.filter(
        F.col("event_type").isin("click", "view", "purchase")
    ).select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.floor(F.col("value") * 1000).cast("long").alias("vm"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-_PIT_WINDOW_US, -1)
    )
    feat = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "click", 1)).over(w), F.lit(0)
        )
        .cast("long")
        .alias("clicks_7d"),
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "view", 1)).over(w), F.lit(0)
        )
        .cast("long")
        .alias("views_7d"),
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "click", F.col("vm"))).over(w),
            F.lit(0),
        )
        .cast("long")
        .alias("click_value_7d_milli"),
    )
    return (
        feat.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "clicks_7d",
            "views_7d",
            "click_value_7d_milli",
        )
        .orderBy("purchase_id")
    )


_CURRICULUM_STAGES = 4


@q(
    "llm_curriculum_order",
    f"""WITH scored AS (
         SELECT doc_id,
                len(string_split(text, ' '))::BIGINT AS difficulty
         FROM documents),
       vals AS (
         SELECT difficulty, count(*)::BIGINT AS c
         FROM scored GROUP BY difficulty),
       tot AS (SELECT count(*)::BIGINT AS n FROM scored),
       cum AS (
         SELECT difficulty,
                sum(c) OVER (ORDER BY difficulty
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  ::BIGINT AS cum_c
         FROM vals),
       staged AS (
         SELECT s.doc_id, s.difficulty,
                least({_CURRICULUM_STAGES},
                      ceil({_CURRICULUM_STAGES}.0 * cum.cum_c / tot.n)
                      )::BIGINT AS stage
         FROM scored s
         JOIN cum ON cum.difficulty = s.difficulty
         CROSS JOIN tot)
       SELECT stage, count(*)::BIGINT AS n_docs,
              sum(difficulty)::BIGINT AS total_tokens,
              min(difficulty)::BIGINT AS min_difficulty,
              max(difficulty)::BIGINT AS max_difficulty
       FROM staged GROUP BY stage ORDER BY stage""",
)
def llm_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum staging for training-data scheduling: docs ranked by a
    difficulty proxy (token count) and split into four easy→hard
    stages, VALUE-grain quantile assignment — every doc with
    the same difficulty lands in the same stage (stage =
    ceil(S·cum_count(difficulty)/N), ties never split across a stage
    boundary, so the schedule is deterministic at any parallelism
    without a global row sort). Emits the stage manifest (doc counts,
    token budgets, difficulty range) a curriculum loader consumes.
    Shape: one doc-grain scan + a DISTINCT-VALUE-grain cumulative
    window (rows = distinct difficulty values, bounded far below doc
    count) + one broadcast-back join — the same distributed-rank
    discipline as ``agg_spearman_corr``: no single-partition pass over
    doc rows at any scale."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("difficulty"),
    )
    vals = scored.groupBy("difficulty").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = scored.agg(F.count(F.lit(1)).cast("long").alias("n"))
    w_cum = Window.orderBy("difficulty").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = vals.select(
        "difficulty", F.sum("c").over(w_cum).cast("long").alias("cum_c")
    )
    staged = (
        scored.join(cum, "difficulty")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "difficulty",
            F.least(
                F.lit(_CURRICULUM_STAGES),
                F.ceil(
                    F.lit(float(_CURRICULUM_STAGES))
                    * F.col("cum_c")
                    / F.col("n")
                ),
            )
            .cast("long")
            .alias("stage"),
        )
    )
    return (
        staged.groupBy("stage")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("difficulty").cast("long").alias("total_tokens"),
            F.min("difficulty").cast("long").alias("min_difficulty"),
            F.max("difficulty").cast("long").alias("max_difficulty"),
        )
        .orderBy("stage")
    )


@q(
    "llm_domain_reweight_step",
    """WITH docs AS (
         SELECT doc_id, source, string_split(lower(text), ' ') AS a
         FROM documents),
       tok AS (SELECT doc_id, source, unnest(a) AS w FROM docs),
       c1 AS (SELECT w, count(*)::BIGINT AS c FROM tok GROUP BY w),
       tot AS (SELECT count(*)::BIGINT AS t,
                      count(DISTINCT w)::BIGINT AS v FROM tok),
       scored AS (
         SELECT tk.source,
                (floor((ln(tot.t + tot.v) - ln(c1.c + 1)) * 1000000))::BIGINT
                  AS nll_micro
         FROM tok tk JOIN c1 ON c1.w = tk.w CROSS JOIN tot),
       per_source AS (
         SELECT source, count(*)::BIGINT AS n_tokens,
                sum(nll_micro)::BIGINT AS nll_sum
         FROM scored GROUP BY source),
       losses AS (
         SELECT source, n_tokens,
                nll_sum::DOUBLE / n_tokens / 1000000.0 AS loss,
                min(nll_sum::DOUBLE / n_tokens / 1000000.0) OVER () AS min_loss
         FROM per_source),
       weights AS (
         SELECT source, n_tokens, loss,
                (floor(exp(loss - min_loss) * 1000000))::BIGINT AS t_micro
         FROM losses),
       norm AS (SELECT sum(t_micro)::BIGINT AS z FROM weights)
       SELECT w.source, w.n_tokens,
              round(w.loss, 6) AS avg_nll,
              round(w.t_micro::DOUBLE / n.z, 6) AS weight_new
       FROM weights w CROSS JOIN norm n
       ORDER BY w.source""",
)
def llm_domain_reweight_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One DoReMi-style domain-reweighting step: score every source
    (domain) by its average add-one unigram NLL under the corpus-level
    LM, then apply multiplicative weights w(s) ∝ exp(η·excess_loss)
    with η = 1 from a uniform prior — domains the reference model finds
    HARD get upweighted for the next mixture, the training-data
    knob behind DoReMi/DSIR-style pipelines (here with the unigram LM
    standing in for the reference model's loss — swap the loss column
    for model NLLs and the step is unchanged). Per-token NLL terms are
    micro-floored pre-sum; exp terms are micro-floored pre-normalize,
    so the weight vector hash-checks. Shape: one token explode + a
    vocab-keyed join (linear), per-source partial aggs, then all
    reweighting math on the |sources|-row frame. At 100 TB the loss
    table comes from the training job's logs and this is pure
    frame arithmetic."""
    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id", "source", F.split(F.lower(F.col("text")), " ").alias("a")
    )
    tok = docs.select("source", F.explode("a").alias("w"))
    c1 = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = tok.agg(
        F.count(F.lit(1)).alias("t"), F.countDistinct("w").alias("v")
    )
    scored = (
        tok.join(c1, "w")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.floor(
                (F.log(F.col("t") + F.col("v")) - F.log(F.col("c") + 1))
                * F.lit(1000000.0)
            )
            .cast("long")
            .alias("nll_micro"),
        )
    )
    per_source = scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("nll_micro").cast("long").alias("nll_sum"),
    )
    loss = F.col("nll_sum").cast("double") / F.col("n_tokens") / 1000000.0
    w_all = Window.partitionBy()
    losses = per_source.select(
        "source",
        "n_tokens",
        loss.alias("loss"),
        F.min(loss).over(w_all).alias("min_loss"),
    )
    weights = losses.select(
        "source",
        "n_tokens",
        "loss",
        F.floor(F.exp(F.col("loss") - F.col("min_loss")) * 1000000.0)
        .cast("long")
        .alias("t_micro"),
    )
    norm = weights.agg(F.sum("t_micro").cast("long").alias("z"))
    return (
        weights.crossJoin(F.broadcast(norm))
        .select(
            "source",
            "n_tokens",
            F.round("loss", 6).alias("avg_nll"),
            F.round(F.col("t_micro").cast("double") / F.col("z"), 6).alias(
                "weight_new"
            ),
        )
        .orderBy("source")
    )
