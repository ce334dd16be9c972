"""Distributional statistics, attribution, and similarity extras.

Round-6 additions that round out the analytics surface: information-
theoretic profiling (entropy, Zipf slope), serial-correlation QC
(lag-1 autocorrelation), whole-graph connected components over the
co-purchase graph, running-distinct windows, first-touch attribution,
exact z-score outlier gating, and a blocked edit-distance similarity
join. Every float lands on the house determinism contract
(SURVEY.md §7 risk 1): exact integer/decimal sums first, IEEE doubles
only in the final closed-form expression, round(…, 6) on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()

# llm_zipf_slope x-axis: floor(ln(rank)·1e6) for ranks 1..100, computed ONCE
# driver-side and spliced as literals into BOTH the Spark plan and the DuckDB
# oracle — neither engine evaluates a transcendental on the x-side, so the
# libm-ulp boundary risk the round-7 verdict flagged is structurally gone
# (VERDICT r7 item 4). Values are exact small integers (≤ 4_605_170).
import math as _math

_LN_RANK_MICRO: tuple[int, ...] = tuple(
    _math.floor(_math.log(k) * 1_000_000) for k in range(1, 101)
)
_LN_RANK_SQL = "[" + ", ".join(str(v) for v in _LN_RANK_MICRO) + "]"


@q(
    "agg_entropy",
    """WITH c AS (
         SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2),
       t AS (SELECT lang, sum(n)::BIGINT AS n_docs FROM c GROUP BY lang),
       m AS (
         SELECT c.lang, t.n_docs,
                count(*) AS n_sources,
                sum((floor(c.n::DOUBLE * log2(c.n::DOUBLE)
                           * 1000000))::BIGINT)::BIGINT AS sum_nlog2n_micro
         FROM c JOIN t USING (lang)
         GROUP BY c.lang, t.n_docs)
       SELECT lang, n_docs, n_sources,
              round(log2(n_docs::DOUBLE)
                    - (sum_nlog2n_micro::DOUBLE / 1000000.0) / n_docs,
                    6) AS source_entropy_bits
       FROM m ORDER BY lang""",
)
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits) of each language's source mix — the
    diversity gate a corpus builder runs before mixing: a lang whose
    docs come from one crawl has entropy ~0 and needs re-balancing.
    Uses the identity H = log2(N) - (1/N)·Σ n_i·log2(n_i): each
    n·log2(n) term is floored to integer micro-units BEFORE summing, so
    the aggregate is an exact 64-bit integer sum (order-independent at
    any parallelism); only the final closed-form expression runs in
    doubles on both engines (the agg_corr_deterministic template).
    Residual cross-engine dependency: log2 is libm/JVM, not guaranteed
    correctly rounded — a term landing within an ulp of an integer
    micro-unit boundary could floor differently per engine; with n in
    the thousands and a 1e-6 grid the probability is negligible, and
    the final round(…, 6) absorbs sub-micro drift in the sum."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("lang").agg(F.sum("n").alias("n_docs"))
    nd = F.col("n").cast("double")
    term = F.floor(nd * F.log2(nd) * F.lit(1000000.0)).cast("bigint")
    m = (
        c.join(F.broadcast(t), "lang")
        .groupBy("lang", "n_docs")
        .agg(
            F.count(F.lit(1)).alias("n_sources"),
            F.sum(term).alias("sum_nlog2n_micro"),
        )
    )
    entropy = (
        F.log2(F.col("n_docs").cast("double"))
        - (F.col("sum_nlog2n_micro").cast("double") / F.lit(1000000.0))
        / F.col("n_docs")
    )
    return m.select(
        "lang", "n_docs", "n_sources",
        F.round(entropy, 6).alias("source_entropy_bits"),
    ).orderBy("lang")


@q(
    "llm_zipf_slope",
    f"""WITH tok AS (
         SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents),
       freq AS (SELECT lang, token, count(*) AS f FROM tok GROUP BY 1, 2),
       ranked AS (
         SELECT lang, f,
                row_number() OVER (PARTITION BY lang ORDER BY f DESC, token) AS rnk
         FROM freq),
       pts AS (
         SELECT lang,
                list_extract({_LN_RANK_SQL}, rnk::INT)::BIGINT AS x,
                (floor(ln(f) * 1000000))::BIGINT AS y
         FROM ranked WHERE rnk <= 100),
       s AS (
         SELECT lang, count(*) AS n_points, sum(x) AS sx, sum(y) AS sy,
                sum(x * y) AS sxy, sum(x * x) AS sxx
         FROM pts GROUP BY lang)
       SELECT lang, n_points,
              round((n_points * sxy - sx * sy)::DOUBLE
                    / (n_points * sxx - sx * sx)::DOUBLE, 6) AS zipf_slope
       FROM s ORDER BY lang""",
)
def llm_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit per language: OLS slope of ln(freq) on ln(rank)
    over the top-100 tokens. Natural text sits near slope −1; corpus
    slices that deviate hard (template spam ~0, truncated vocab ≪ −1)
    fail the gate. Token counting is one explode + hash agg; ranking is
    a bounded per-lang window with a unique (f DESC, token) tiebreak;
    the regression runs on ln values floored to integer micro-units so
    every sum is exact 64-bit arithmetic — only the final slope division
    is floating point (the agg_corr_deterministic template).
    The x-axis (ln of rank, rank ≤ 100) is ENGINE-FREE: the 100
    floor(ln(rank)·1e6) constants are computed once driver-side
    (_LN_RANK_MICRO) and spliced as the same literal array into the
    Spark plan and the DuckDB oracle, so no runtime transcendental can
    floor differently per engine (VERDICT r7 item 4). The y-side keeps
    runtime ln(f) — f is an unbounded token frequency, not enumerable —
    with the documented negligible ulp-boundary probability; the same
    reasoning keeps agg_entropy's n·log2(n) terms runtime-evaluated (n
    is an unbounded group count, so no literal table can cover it)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(F.split("text", " ")).alias("token"))
    freq = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("f"))
    w = Window.partitionBy("lang").orderBy(F.col("f").desc(), "token")
    # cast to long: the micro-unit literals fit int32 but sxx sums x·x
    # (~2.1e13), which silently wraps in int32 arithmetic with ANSI off
    ln_rank = F.array(*[F.lit(v) for v in _LN_RANK_MICRO]).cast("array<bigint>")
    pts = (
        freq.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 100)
        .select(
            "lang",
            F.element_at(ln_rank, F.col("rnk").cast("int")).alias("x"),
            F.floor(F.log(F.col("f").cast("double")) * 1000000).alias("y"),
        )
    )
    s = pts.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n, sx, sy = F.col("n_points"), F.col("sx"), F.col("sy")
    slope = ((n * F.col("sxy") - sx * sy).cast("double")
             / (n * F.col("sxx") - sx * sx).cast("double"))
    return s.select("lang", "n_points", F.round(slope, 6).alias("zipf_slope")).orderBy("lang")


@q(
    "ts_autocorr",
    """WITH daily AS (
         SELECT event_type, ts::DATE AS d, count(*) AS n
         FROM events GROUP BY 1, 2),
       lagged AS (
         SELECT event_type, n,
                lag(n) OVER (PARTITION BY event_type ORDER BY d) AS pn
         FROM daily),
       pairs AS (SELECT event_type, n, pn FROM lagged WHERE pn IS NOT NULL),
       s AS (
         SELECT event_type, count(*) AS n_pairs,
                sum(n) AS sx, sum(pn) AS sy, sum(n * pn) AS sxy,
                sum(n * n) AS sxx, sum(pn * pn) AS syy
         FROM pairs GROUP BY event_type)
       SELECT event_type, n_pairs,
              round((n_pairs * sxy - sx * sy)::DOUBLE
                    / sqrt((n_pairs * sxx - sx * sx)::DOUBLE
                           * (n_pairs * syy - sy * sy)::DOUBLE), 6) AS autocorr_lag1
       FROM s ORDER BY event_type""",
)
def ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the daily event-count series per event
    type — the monitoring statistic that separates bursty/trending
    signals (high positive r) from white noise (~0). Day counts are
    integers, so all five co-moment sums are exact; the Pearson formula
    runs once per group in doubles (agg_corr_deterministic template).
    One agg to build the series, one bounded per-type window for the
    lag, one final agg — no driver-side series handling."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    pairs = (
        daily.withColumn("pn", F.lag("n").over(w))
        .filter(F.col("pn").isNotNull())
    )
    s = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("n").alias("sx"),
        F.sum("pn").alias("sy"),
        F.sum(F.col("n") * F.col("pn")).alias("sxy"),
        F.sum(F.col("n") * F.col("n")).alias("sxx"),
        F.sum(F.col("pn") * F.col("pn")).alias("syy"),
    )
    n, sx, sy = F.col("n_pairs"), F.col("sx"), F.col("sy")
    r = (n * F.col("sxy") - sx * sy).cast("double") / F.sqrt(
        (n * F.col("sxx") - sx * sx).cast("double")
        * (n * F.col("syy") - sy * sy).cast("double")
    )
    return s.select("event_type", "n_pairs", F.round(r, 6).alias("autocorr_lag1")).orderBy(
        "event_type"
    )


@q(
    "graph_connected_components",
    """WITH RECURSIVE e AS (
         WITH items AS (SELECT l_orderkey, l_partkey FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) QUALIFY count(*) OVER (PARTITION BY l_orderkey) <= 64)
         SELECT a.l_partkey AS u, b.l_partkey AS v
         FROM items a JOIN items b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         GROUP BY 1, 2 HAVING count(*) >= 2),
       edges AS (SELECT u AS src, v AS dst FROM e UNION SELECT v, u FROM e),
       reach(node, r) AS (
         SELECT src, src FROM edges
         UNION
         SELECT e2.src, rr.r FROM edges e2 JOIN reach rr ON e2.dst = rr.node),
       labels AS (SELECT node, min(r) AS comp FROM reach GROUP BY node)
       SELECT comp AS component_id,
              count(*) AS n_nodes,
              min(node) AS min_node,
              max(node) AS max_node
       FROM labels GROUP BY comp
       ORDER BY n_nodes DESC, component_id
       LIMIT 30""",
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the part co-purchase graph (edges: part
    pairs sharing ≥2 orders), reported as the top-30 component size
    profile — the "is this graph one giant blob or many islands" question
    that decides whether downstream per-component work is parallelizable.
    Reuses the dedup clustering machinery (operators/dedup.py hash-min
    label propagation, O(diameter) join+min rounds with reliable
    materialization between rounds); the oracle recomputes components via
    a recursive transitive-closure CTE, feasible only at fixture scale."""
    from hawaiidatapipeline_spark.operators.dedup import connected_components
    from hawaiidatapipeline_spark.operators.graph import copurchase_edges

    li = load_table(spark, sf_dir, "lineitem")
    labels = connected_components(copurchase_edges(li), a_col="u", b_col="v")
    return (
        labels.groupBy(F.col("comp").alias("component_id"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("node").alias("min_node"),
            F.max("node").alias("max_node"),
        )
        .orderBy(F.col("n_nodes").desc(), "component_id")
        .limit(30)
    )


@q(
    "win_running_distinct",
    """WITH sub AS (SELECT * FROM events WHERE user_id % 13 = 0),
       flag AS (
         SELECT event_id, user_id, ts, event_type,
                CASE WHEN row_number() OVER (
                       PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
                     THEN 1 ELSE 0 END AS is_first
         FROM sub)
       SELECT event_id, user_id, event_type,
              (sum(is_first) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING))::BIGINT AS distinct_types_so_far
       FROM flag
       ORDER BY user_id, event_id""",
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over an ordered stream — not directly
    expressible as a window aggregate in either engine, so it is spelled
    as its scalable two-window expansion: flag each (user, type)'s first
    occurrence with row_number, then running-sum the flags. Both windows
    partition on user (bounded state per key); the same decomposition is
    how a streaming job tracks per-key distinct growth without a set in
    state. (ts, event_id) is a unique total order, so every row is
    deterministic."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 13 == 0)
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = e.withColumn(
        "is_first", F.when(F.row_number().over(w_first) == 1, 1).otherwise(0)
    )
    return (
        flagged.select(
            "event_id",
            "user_id",
            "event_type",
            F.sum("is_first").over(w_run).alias("distinct_types_so_far"),
        )
        .orderBy("user_id", "event_id")
    )


@q(
    "events_first_touch",
    """WITH ranked AS (
         SELECT user_id, event_type,
                row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
         FROM events),
       firsts AS (
         SELECT user_id, event_type AS first_event_type FROM ranked WHERE rn = 1),
       buyers AS (
         SELECT user_id, count(*) AS n_purchases
         FROM events WHERE event_type = 'purchase' GROUP BY user_id)
       SELECT f.first_event_type,
              count(*) AS n_converting_users,
              sum(b.n_purchases)::BIGINT AS total_purchases
       FROM firsts f JOIN buyers b USING (user_id)
       GROUP BY 1 ORDER BY 1""",
)
def events_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: credit each converting user's purchases
    to the first event type they ever emitted. One per-user window for
    the first touch (unique (ts, event_id) order), one filtered agg for
    purchase counts, then a user-keyed join + final rollup — both big
    inputs shuffle once on user_id and the attribution table is
    |event_types| rows. The window and the agg reuse the same user_id
    exchange under AQE."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    firsts = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("first_event_type"))
    )
    buyers = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    return (
        firsts.join(buyers, "user_id")
        .groupBy("first_event_type")
        .agg(
            F.count(F.lit(1)).alias("n_converting_users"),
            F.sum("n_purchases").alias("total_purchases"),
        )
        .orderBy("first_event_type")
    )


@q(
    "llm_doc_outlier_zscore",
    """WITH s AS (
         SELECT source, count(*) AS n,
                sum(n_chars) AS sx, sum(n_chars * n_chars) AS sxx
         FROM documents GROUP BY source),
       st AS (
         SELECT source, sx::DOUBLE / n AS mu,
                sqrt((n * sxx - sx * sx)::DOUBLE / (n::DOUBLE * (n - 1))) AS sd
         FROM s),
       z AS (
         SELECT d.doc_id, d.source, d.n_chars,
                (d.n_chars - st.mu) / st.sd AS zval
         FROM documents d JOIN st USING (source))
       SELECT doc_id, source, n_chars, round(zval, 6) AS z_score
       FROM z WHERE abs(zval) > 1.5
       ORDER BY doc_id""",
)
def llm_doc_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-outlier gate: docs whose n_chars sits >1.5σ from their
    source's mean — the cheap screen for truncation (far-left tail) and
    concatenation bugs (far-right) run per ingestion source. Mean and
    sample-σ come from exact integer sums (one agg), broadcast back onto
    the table (|sources| rows), so the only shuffle is the stats agg.
    The z expression is bit-identical across engines because its inputs
    are exact and /, sqrt are correctly-rounded IEEE ops — the >1.5
    boundary cannot disagree."""
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    st = s.select(
        "source",
        (sx.cast("double") / n).alias("mu"),
        F.sqrt((n * sxx - sx * sx).cast("double") / (n.cast("double") * (n - 1))).alias("sd"),
    )
    z = (F.col("n_chars") - F.col("mu")) / F.col("sd")
    return (
        d.join(F.broadcast(st), "source")
        .withColumn("zval", z)
        .filter(F.abs(F.col("zval")) > 1.5)
        .select("doc_id", "source", "n_chars", F.round("zval", 6).alias("z_score"))
        .orderBy("doc_id")
    )


@q(
    "fn_string_distance",
    """WITH names AS (
         SELECT DISTINCT p_name, string_split(p_name, ' ')[1] AS blk FROM part)
       SELECT a.p_name AS name_a, b.p_name AS name_b,
              levenshtein(a.p_name, b.p_name) AS edit_dist
       FROM names a JOIN names b
         ON a.blk = b.blk AND a.p_name < b.p_name
       WHERE levenshtein(a.p_name, b.p_name) <= 12
       ORDER BY name_a, name_b""",
)
def fn_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked edit-distance similarity join over distinct part names:
    Levenshtein within first-word blocks only — the standard scale shape
    for fuzzy matching (never all-pairs; the block key bounds each
    task's candidate set, and skewed blocks get the same salting
    treatment as any hot join key). Spark's levenshtein and DuckDB's
    agree on the classic unit-cost edit distance, so the join output is
    exactly comparable."""
    p = load_table(spark, sf_dir, "part")
    names = (
        p.select("p_name").distinct()
        .withColumn("blk", F.split("p_name", " ").getItem(0))
    )
    a = names.select(F.col("p_name").alias("name_a"), F.col("blk").alias("blk_a"))
    b = names.select(F.col("p_name").alias("name_b"), F.col("blk").alias("blk_b"))
    return (
        a.join(b, (F.col("blk_a") == F.col("blk_b")) & (F.col("name_a") < F.col("name_b")))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= 12)
        .select("name_a", "name_b", "edit_dist")
        .orderBy("name_a", "name_b")
    )


@q(
    "ts_pacf",
    """WITH daily AS (
         SELECT event_type, ts::DATE AS d, count(*)::BIGINT AS x
         FROM events GROUP BY 1, 2),
       st AS (SELECT event_type, count(*)::BIGINT AS n, sum(x)::BIGINT AS s
              FROM daily GROUP BY 1),
       yy AS (SELECT d.event_type, d.d, d.x * st.n - st.s AS y
              FROM daily d JOIN st ON st.event_type = d.event_type),
       lg AS (SELECT event_type, y,
                     lag(y, 1) OVER w AS y1,
                     lag(y, 2) OVER w AS y2,
                     lag(y, 3) OVER w AS y3
              FROM yy WINDOW w AS (PARTITION BY event_type ORDER BY d)),
       g AS (SELECT event_type,
                    sum(y * y)::BIGINT AS g0,
                    sum(CASE WHEN y1 IS NOT NULL THEN y * y1 ELSE 0 END)::BIGINT AS g1,
                    sum(CASE WHEN y2 IS NOT NULL THEN y * y2 ELSE 0 END)::BIGINT AS g2,
                    sum(CASE WHEN y3 IS NOT NULL THEN y * y3 ELSE 0 END)::BIGINT AS g3
             FROM lg GROUP BY 1),
       r AS (SELECT event_type,
                    floor(1000.0 * g1 / nullif(g0, 0))::BIGINT AS r1,
                    floor(1000.0 * g2 / nullif(g0, 0))::BIGINT AS r2,
                    floor(1000.0 * g3 / nullif(g0, 0))::BIGINT AS r3
             FROM g),
       p AS (SELECT event_type, r1, r2, r3,
                    (1000 * r2 - r1 * r1)::BIGINT AS n2,
                    (1000000 - r1 * r1)::BIGINT AS d2,
                    (1000 * (1000 * r3 - r2 * r1) - r1 * (r1 * r3 - r2 * r2)
                     + r1 * (r1 * r1 - 1000 * r2))::BIGINT AS n3,
                    (1000 * (1000000 - r1 * r1) - r1 * (1000 * r1 - r1 * r2)
                     + r2 * (r1 * r1 - 1000 * r2))::BIGINT AS d3
             FROM r)
       SELECT event_type, 1 AS lag, r1 AS acf_milli,
              round(r1 / 1000.0, 6) AS pacf FROM p
       UNION ALL
       SELECT event_type, 2, r2, round(n2::DOUBLE / nullif(d2, 0), 6) FROM p
       UNION ALL
       SELECT event_type, 3, r3, round(n3::DOUBLE / nullif(d3, 0), 6) FROM p
       ORDER BY event_type, lag""",
)
def ts_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation (Yule-Walker) through lag 3 of the daily
    event-count series per type — the ARIMA order-selection companion to
    ts_autocorr (AR(p) shows a PACF cutoff after lag p). Exact-integer
    construction end to end: centering multiplies through by N
    (y_t = N·x_t − S, integer), the lag co-moments G_k are exact integer
    sums, the autocorrelations are quantized to MILLI-UNITS, and each
    Yule-Walker solution is a ratio of determinants of small integer
    Toeplitz matrices — Cramer's rule expanded to integer polynomials,
    so the only floats are the three final divisions. The quantization
    (PACF of the milli-rounded ACF) is the documented contract, exactly
    like the engine's other fixed-point statistics. Plan: one day-grain
    agg, one bounded per-type lag window, one 4-sum partial agg — the
    series never leaves the executors."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    st = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    yy = daily.join(st, "event_type").select(
        "event_type", "d", (F.col("x") * F.col("n") - F.col("s")).alias("y")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    lg = yy.select(
        "event_type",
        "y",
        F.lag("y", 1).over(w).alias("y1"),
        F.lag("y", 2).over(w).alias("y2"),
        F.lag("y", 3).over(w).alias("y3"),
    )

    def gsum(c):
        return (
            F.sum(
                F.when(F.col(c).isNotNull(), F.col("y") * F.col(c)).otherwise(0)
            )
            .cast("long")
        )

    g = lg.groupBy("event_type").agg(
        F.sum(F.col("y") * F.col("y")).cast("long").alias("g0"),
        gsum("y1").alias("g1"),
        gsum("y2").alias("g2"),
        gsum("y3").alias("g3"),
    )
    g0 = F.nullif(F.col("g0"), F.lit(0))
    r = g.select(
        "event_type",
        F.floor(1000.0 * F.col("g1") / g0).cast("long").alias("r1"),
        F.floor(1000.0 * F.col("g2") / g0).cast("long").alias("r2"),
        F.floor(1000.0 * F.col("g3") / g0).cast("long").alias("r3"),
    )
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    p = r.select(
        "event_type",
        "r1",
        "r2",
        "r3",
        (1000 * r2 - r1 * r1).cast("long").alias("n2"),
        (F.lit(1000000) - r1 * r1).cast("long").alias("d2"),
        (
            1000 * (1000 * r3 - r2 * r1)
            - r1 * (r1 * r3 - r2 * r2)
            + r1 * (r1 * r1 - 1000 * r2)
        )
        .cast("long")
        .alias("n3"),
        (
            1000 * (F.lit(1000000) - r1 * r1)
            - r1 * (1000 * r1 - r1 * r2)
            + r2 * (r1 * r1 - 1000 * r2)
        )
        .cast("long")
        .alias("d3"),
    )
    out1 = p.select(
        "event_type",
        F.lit(1).alias("lag"),
        F.col("r1").alias("acf_milli"),
        F.round(F.col("r1") / 1000.0, 6).alias("pacf"),
    )
    out2 = p.select(
        "event_type",
        F.lit(2).alias("lag"),
        F.col("r2").alias("acf_milli"),
        # nullif: d2 = 0 when the milli-ACF is exactly +/-1000 (degenerate
        # series) — Spark 0-division gives NULL but DuckDB gives inf/NaN,
        # so both engines must take the NULL path (ADVICE r11)
        F.round(
            F.col("n2").cast("double") / F.nullif(F.col("d2"), F.lit(0)), 6
        ).alias("pacf"),
    )
    out3 = p.select(
        "event_type",
        F.lit(3).alias("lag"),
        F.col("r3").alias("acf_milli"),
        F.round(
            F.col("n3").cast("double") / F.nullif(F.col("d3"), F.lit(0)), 6
        ).alias("pacf"),
    )
    return out1.unionByName(out2).unionByName(out3).orderBy("event_type", "lag")
