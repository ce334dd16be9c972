"""Round-8 additions: reconciliation audits, behavioral segmentation,
and corpus-curation frontier queries.

Cross-table financial reconciliation (the DQ check every warehouse runs
before trusting a fact table), a completeness matrix, RFM user
segmentation, inter-arrival latency profiles, week-over-week growth,
cross-language contamination by prefix fingerprint, boilerplate-prefix
detection, token-length percentiles, an exact distributed covariance
top-k over the embedding matrix, the vocabulary coverage curve a
tokenizer-budget decision needs, distributed PCA by integer matrix
squaring, linear multi-touch attribution, a seasonal-naive forecast
backtest, IQR-fence anomaly days, per-document unigram NLL percentiles,
nearest-centroid separability margins, and the audience-overlap Jaccard
matrix.

House determinism contract throughout (SURVEY.md §7 risk 1): monetary
columns are exact 2-dp in the fixtures, so ``round(x*100)`` lifts them
to exact integer cents on both engines; every aggregate sums integers;
floats appear only in final closed-form expressions rounded to 6 dp on
both sides; every top-N carries a unique tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()


@q(
    "dq_order_total_reconciliation",
    """WITH lt AS (
         SELECT l_orderkey,
                count(*) AS n_lines,
                sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))
                    * (100 + CAST(round(l_tax * 100) AS BIGINT)))::BIGINT
                  AS charged_mc
         FROM lineitem GROUP BY l_orderkey),
       j AS (
         SELECT o.o_orderstatus,
                abs(lt.charged_mc
                    - CAST(round(o.o_totalprice * 100) AS BIGINT) * 10000)
                  AS diff_mc,
                CAST(round(o.o_totalprice * 100) AS BIGINT) * 10000 AS total_mc
         FROM orders o JOIN lt ON o.o_orderkey = lt.l_orderkey)
       SELECT o_orderstatus,
              count(*) AS n_orders,
              sum(CASE WHEN diff_mc * 100 <= total_mc THEN 1 ELSE 0 END)::BIGINT
                AS n_within_1pct,
              sum(CASE WHEN diff_mc * 10 > total_mc THEN 1 ELSE 0 END)::BIGINT
                AS n_over_10pct,
              max(diff_mc // 10000)::BIGINT AS max_diff_cents,
              round(sum(diff_mc)::DOUBLE / sum(total_mc)::DOUBLE, 6)
                AS rel_gap_total
       FROM j GROUP BY o_orderstatus ORDER BY o_orderstatus""",
)
def dq_order_total_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table financial reconciliation: per order, compare the stored
    header total against the recomputed gross charge
    Σ price·(1−disc)·(1+tax) from its lines, and report the mismatch
    profile per order status — the audit a warehouse runs before trusting
    either table for revenue. All arithmetic in exact integer
    micro-cents (2-dp money × 100, discount/tax in integer hundredths),
    so partial-aggregation order can never move a bucket boundary; the
    single relative-gap float is one division of two exact sums. Scale:
    one partial-agg shuffle on orderkey + one key-colocated join + one
    tiny status agg — no row explosion."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    d = F.round(F.col("l_discount") * 100).cast("bigint")
    t = F.round(F.col("l_tax") * 100).cast("bigint")
    lt = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(cents * (100 - d) * (100 + t)).alias("charged_mc"),
    )
    o = load_table(spark, sf_dir, "orders")
    total_mc = (F.round(F.col("o_totalprice") * 100).cast("bigint") * 10000)
    j = o.join(lt, o.o_orderkey == lt.l_orderkey).select(
        "o_orderstatus",
        F.abs(F.col("charged_mc") - total_mc).alias("diff_mc"),
        total_mc.alias("total_mc"),
    )
    return (
        j.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.when(F.col("diff_mc") * 100 <= F.col("total_mc"), 1).otherwise(0)
            ).alias("n_within_1pct"),
            F.sum(
                F.when(F.col("diff_mc") * 10 > F.col("total_mc"), 1).otherwise(0)
            ).alias("n_over_10pct"),
            F.max(F.floor(F.col("diff_mc") / 10000)).alias("max_diff_cents"),
            F.round(
                F.sum("diff_mc").cast("double") / F.sum("total_mc").cast("double"), 6
            ).alias("rel_gap_total"),
        )
        .orderBy("o_orderstatus")
    )


@q(
    "dq_completeness_matrix",
    """WITH a AS (
         SELECT count(*) AS n,
                sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)::BIGINT AS et_null,
                sum(CASE WHEN event_type IS NOT NULL AND trim(event_type) = ''
                         THEN 1 ELSE 0 END)::BIGINT AS et_blank,
                sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END)::BIGINT AS pr_null,
                sum(CASE WHEN props IS NOT NULL
                          AND trim(props) IN ('', '{}') THEN 1 ELSE 0 END)::BIGINT
                  AS pr_blank,
                sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT AS v_null,
                sum(CASE WHEN value = 0 THEN 1 ELSE 0 END)::BIGINT AS v_blank,
                sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END)::BIGINT AS ts_null,
                sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS u_null
         FROM events)
       SELECT col, n_null, n_blank,
              round((n - n_null - n_blank)::DOUBLE / n, 6) AS pct_filled
       FROM (
         SELECT 'event_type' AS col, n, et_null AS n_null, et_blank AS n_blank FROM a
         UNION ALL SELECT 'props', n, pr_null, pr_blank FROM a
         UNION ALL SELECT 'value', n, v_null, v_blank FROM a
         UNION ALL SELECT 'ts', n, ts_null, 0 FROM a
         UNION ALL SELECT 'user_id', n, u_null, 0 FROM a)
       ORDER BY col""",
)
def dq_completeness_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column completeness matrix over the event stream: per column, the
    null count, the 'blank' count (empty/`{}` strings, zero values — the
    nulls that aren't NULL), and the filled fraction — the profiling
    row a data contract check renders as a heatmap. ONE full-scan
    aggregate computes every counter (conditional sums fuse into a
    single WholeStageCodegen pass); the per-column rows are then
    unpivoted from that 1-row aggregate, so adding columns never adds
    scans."""
    e = load_table(spark, sf_dir, "events")
    one = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("event_type").isNull(), 1).otherwise(0)).alias("et_null"),
        F.sum(
            F.when(
                F.col("event_type").isNotNull() & (F.trim("event_type") == ""), 1
            ).otherwise(0)
        ).alias("et_blank"),
        F.sum(F.when(F.col("props").isNull(), 1).otherwise(0)).alias("pr_null"),
        F.sum(
            F.when(
                F.col("props").isNotNull() & F.trim("props").isin("", "{}"), 1
            ).otherwise(0)
        ).alias("pr_blank"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("v_null"),
        F.sum(F.when(F.col("value") == 0, 1).otherwise(0)).alias("v_blank"),
        F.sum(F.when(F.col("ts").isNull(), 1).otherwise(0)).alias("ts_null"),
        F.sum(F.when(F.col("user_id").isNull(), 1).otherwise(0)).alias("u_null"),
    )
    rows = one.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("event_type").alias("col"),
                    F.col("n"),
                    F.col("et_null").alias("n_null"),
                    F.col("et_blank").alias("n_blank"),
                ),
                F.struct(
                    F.lit("props").alias("col"), F.col("n"),
                    F.col("pr_null").alias("n_null"),
                    F.col("pr_blank").alias("n_blank"),
                ),
                F.struct(
                    F.lit("value").alias("col"), F.col("n"),
                    F.col("v_null").alias("n_null"),
                    F.col("v_blank").alias("n_blank"),
                ),
                F.struct(
                    F.lit("ts").alias("col"), F.col("n"),
                    F.col("ts_null").alias("n_null"),
                    F.lit(0).cast("bigint").alias("n_blank"),
                ),
                F.struct(
                    F.lit("user_id").alias("col"), F.col("n"),
                    F.col("u_null").alias("n_null"),
                    F.lit(0).cast("bigint").alias("n_blank"),
                ),
            )
        ).alias("r")
    ).select("r.*")
    return rows.select(
        "col",
        "n_null",
        "n_blank",
        F.round(
            (F.col("n") - F.col("n_null") - F.col("n_blank")).cast("double")
            / F.col("n"),
            6,
        ).alias("pct_filled"),
    ).orderBy("col")


@q(
    "events_rfm_segmentation",
    """WITH gmax AS (SELECT max(ts::DATE) AS gd FROM events),
       u AS (
         SELECT user_id,
                date_diff('day', max(ts::DATE), (SELECT gd FROM gmax)) AS rec_days,
                count(*) AS freq,
                sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS mon_c
         FROM events GROUP BY user_id),
       b AS (
         SELECT quantile_cont(rec_days, [0.2, 0.4, 0.6, 0.8]) AS rb,
                quantile_cont(freq, [0.2, 0.4, 0.6, 0.8]) AS fb,
                quantile_cont(mon_c, [0.2, 0.4, 0.6, 0.8]) AS mb
         FROM u),
       s AS (
         SELECT 1 + (CASE WHEN rec_days > rb[1] THEN 1 ELSE 0 END)
                  + (CASE WHEN rec_days > rb[2] THEN 1 ELSE 0 END)
                  + (CASE WHEN rec_days > rb[3] THEN 1 ELSE 0 END)
                  + (CASE WHEN rec_days > rb[4] THEN 1 ELSE 0 END) AS r_q,
                5 - (CASE WHEN freq > fb[1] THEN 1 ELSE 0 END)
                  - (CASE WHEN freq > fb[2] THEN 1 ELSE 0 END)
                  - (CASE WHEN freq > fb[3] THEN 1 ELSE 0 END)
                  - (CASE WHEN freq > fb[4] THEN 1 ELSE 0 END) AS f_q,
                5 - (CASE WHEN mon_c > mb[1] THEN 1 ELSE 0 END)
                  - (CASE WHEN mon_c > mb[2] THEN 1 ELSE 0 END)
                  - (CASE WHEN mon_c > mb[3] THEN 1 ELSE 0 END)
                  - (CASE WHEN mon_c > mb[4] THEN 1 ELSE 0 END) AS m_q,
                mon_c
         FROM u, b)
       SELECT r_q, f_q, m_q, count(*) AS n_users,
              sum(mon_c)::BIGINT AS monetary_cents
       FROM s GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
)
def events_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per user recency (days since last event),
    frequency (event count), monetary (exact cents), each bucketed into
    quintiles, then segment counts — the standard behavioral-marketing
    cube. Quintiles come from DISTRIBUTED percentile BREAKPOINTS
    (broadcast 1-row table) rather than a global ntile window: ntile
    needs one total-order partition over every user, breakpoint
    bucketing is a map-side CASE — the scale-correct shape. Inputs to
    the breakpoints are exact integers, so the interpolated boundaries
    are identical doubles on both engines and every `>` comparison is
    exact (quintile membership, 1 = best, can't drift)."""
    e = load_table(spark, sf_dir, "events")
    gmax = e.agg(F.max(F.col("ts").cast("date")).alias("gd"))
    u = (
        e.groupBy("user_id")
        .agg(
            F.max(F.col("ts").cast("date")).alias("ud"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("mon_c"),
        )
        .crossJoin(F.broadcast(gmax))  # 1-row global-max broadcast
        .select(
            "user_id",
            F.datediff("gd", "ud").alias("rec_days"),
            "freq",
            "mon_c",
        )
    )
    qs = F.array(*[F.lit(p) for p in (0.2, 0.4, 0.6, 0.8)])
    b = u.agg(
        F.percentile("rec_days", qs).alias("rb"),
        F.percentile("freq", qs).alias("fb"),
        F.percentile("mon_c", qs).alias("mb"),
    )

    def bucket_up(col: str, brk: str):  # bigger value -> bigger bucket
        return sum(
            F.when(F.col(col) > F.element_at(F.col(brk), k), 1).otherwise(0)
            for k in (1, 2, 3, 4)
        )

    s = u.crossJoin(F.broadcast(b)).select(
        (F.lit(1) + bucket_up("rec_days", "rb")).alias("r_q"),
        (F.lit(5) - bucket_up("freq", "fb")).alias("f_q"),
        (F.lit(5) - bucket_up("mon_c", "mb")).alias("m_q"),
        "mon_c",
    )
    return (
        s.groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("mon_c").alias("monetary_cents"),
        )
        .orderBy("r_q", "f_q", "m_q")
    )


@q(
    "events_inter_arrival_stats",
    """WITH g AS (
         SELECT event_type,
                epoch_us(ts) - lag(epoch_us(ts))
                  OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
         FROM events)
       SELECT event_type,
              count(*) AS n_gaps,
              round(min(gap_us)::DOUBLE / 1000000, 6) AS min_gap_s,
              round(max(gap_us)::DOUBLE / 1000000, 6) AS max_gap_s,
              round(quantile_cont(gap_us, 0.5) / 1000000, 6) AS median_gap_s,
              round(quantile_cont(gap_us, 0.9) / 1000000, 6) AS p90_gap_s
       FROM g WHERE gap_us IS NOT NULL
       GROUP BY event_type ORDER BY event_type""",
)
def events_inter_arrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival profile per event type: median/p90/min/max gap
    between consecutive events — the latency fingerprint that separates
    steady telemetry from bursty user actions and feeds outage
    thresholds (``ts_outage_detection``). Gaps are exact integer
    MICROSECONDS under a (ts, event_id) total order, so ties can't
    reorder between engines; percentiles interpolate over exact ints
    (identical doubles both sides); seconds appear only in the final
    rounded division. One shuffle to the event-type partitions, one lag
    window, one aggregate."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    g = e.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    return (
        g.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(F.min("gap_us").cast("double") / 1000000, 6).alias("min_gap_s"),
            F.round(F.max("gap_us").cast("double") / 1000000, 6).alias("max_gap_s"),
            F.round(F.expr("percentile(gap_us, 0.5)") / 1000000, 6).alias(
                "median_gap_s"
            ),
            F.round(F.expr("percentile(gap_us, 0.9)") / 1000000, 6).alias(
                "p90_gap_s"
            ),
        )
        .orderBy("event_type")
    )


@q(
    "ts_wow_growth",
    """WITH m AS (
         SELECT event_type,
                strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
                count(*) AS n
         FROM events GROUP BY 1, 2),
       l AS (
         SELECT event_type, week, n,
                lag(n) OVER (PARTITION BY event_type ORDER BY week) AS prev_n
         FROM m)
       SELECT event_type, week, n, prev_n,
              round((n - prev_n)::DOUBLE / prev_n, 6) AS wow_growth
       FROM l WHERE prev_n IS NOT NULL
       ORDER BY event_type, week""",
)
def ts_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth per event type — the first derivative
    every usage dashboard plots (weekly grain: the fixture spans one
    calendar month, and WoW is the cadence ops reviews use). Integer
    week counts, one bounded lag window per type (weeks, not events),
    growth as a single division of exact integers rounded on both
    engines. The ISO-Monday week label is a string on both sides so the
    driver's dtype comparison can't drift on date units."""
    e = load_table(spark, sf_dir, "events")
    m = e.groupBy(
        "event_type",
        F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("week")
    l = m.withColumn("prev_n", F.lag("n").over(w)).filter(
        F.col("prev_n").isNotNull()
    )
    return l.select(
        "event_type",
        "week",
        "n",
        "prev_n",
        F.round(
            (F.col("n") - F.col("prev_n")).cast("double") / F.col("prev_n"), 6
        ).alias("wow_growth"),
    ).orderBy("event_type", "week")


@q(
    "llm_cross_lang_contamination",
    """WITH fp AS (
         SELECT md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS fp,
                lang
         FROM documents)
       SELECT fp,
              count(*) AS n_docs,
              count(DISTINCT lang) AS n_langs,
              string_agg(DISTINCT lang, '|' ORDER BY lang) AS langs
       FROM fp GROUP BY fp
       HAVING count(DISTINCT lang) > 1
       ORDER BY fp""",
)
def llm_cross_lang_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-language contamination: documents whose 8-token prefix
    fingerprint appears under MORE THAN ONE language label — the signal
    that a scraper mislabeled translations or that boilerplate leaked
    across language shards (which silently poisons per-language mixture
    weights). Prefix fingerprinting (vs whole-text hash) catches the
    template case where bodies diverge after a shared head. One md5 per
    doc + one groupBy — linear; the language set is serialized sorted so
    the row is hash-stable."""
    d = load_table(spark, sf_dir, "documents")
    fp = d.select(
        F.md5(F.array_join(F.slice(F.split("text", " "), 1, 8), " ")).alias("fp"),
        "lang",
    )
    return (
        fp.groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("lang").alias("n_langs"),
            F.concat_ws("|", F.sort_array(F.collect_set("lang"))).alias("langs"),
        )
        .filter(F.col("n_langs") > 1)
        .orderBy("fp")
    )


@q(
    "llm_boilerplate_prefixes",
    """WITH p AS (
         SELECT source,
                array_to_string(string_split(text, ' ')[1:5], ' ') AS prefix
         FROM documents),
       c AS (SELECT source, prefix, count(*) AS n_docs FROM p GROUP BY 1, 2),
       t AS (SELECT source, count(*) AS total FROM p GROUP BY source),
       r AS (
         SELECT c.source, c.prefix, c.n_docs, t.total,
                row_number() OVER (PARTITION BY c.source
                                   ORDER BY c.n_docs DESC, c.prefix) AS rnk
         FROM c JOIN t USING (source))
       SELECT source, rnk, prefix, n_docs,
              round(n_docs::DOUBLE / total, 6) AS coverage
       FROM r WHERE rnk <= 3
       ORDER BY source, rnk""",
)
def llm_boilerplate_prefixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection: the top-3 5-token document prefixes per
    source with their corpus coverage — crawl sources whose docs open
    identically (cookie banners, license headers, nav text) show a
    dominant prefix and get routed to a stripper before training. Two
    narrow aggregates + a bounded per-source top-k window under a
    (count DESC, prefix) total order."""
    d = load_table(spark, sf_dir, "documents")
    p = d.select(
        "source",
        F.array_join(F.slice(F.split("text", " "), 1, 5), " ").alias("prefix"),
    )
    c = p.groupBy("source", "prefix").agg(F.count(F.lit(1)).alias("n_docs"))
    t = p.groupBy("source").agg(F.count(F.lit(1)).alias("total"))
    w = Window.partitionBy("source").orderBy(F.col("n_docs").desc(), "prefix")
    r = (
        c.join(F.broadcast(t), "source")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
    )
    return r.select(
        "source",
        "rnk",
        "prefix",
        "n_docs",
        F.round(F.col("n_docs").cast("double") / F.col("total"), 6).alias(
            "coverage"
        ),
    ).orderBy("source", "rnk")


@q(
    "llm_token_len_percentiles",
    """WITH tc AS (
         SELECT lang, len(string_split(text, ' '))::BIGINT AS n_tokens
         FROM documents)
       SELECT lang, count(*) AS n_docs, max(n_tokens) AS max_tokens,
              round(quantile_cont(n_tokens, 0.25), 6) AS p25,
              round(quantile_cont(n_tokens, 0.50), 6) AS p50,
              round(quantile_cont(n_tokens, 0.75), 6) AS p75,
              round(quantile_cont(n_tokens, 0.95), 6) AS p95
       FROM tc GROUP BY lang ORDER BY lang""",
)
def llm_token_len_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length distribution per language: p25/p50/p75/p95 document
    token counts — the context-budget planning table (how much packing
    headroom each language shard has, where truncation will bite).
    Lengths are exact integers; the percentile interpolation runs over
    identical ints on both engines. One map-side length computation +
    one aggregate; at 100 TB the exact percentile swaps for the sketch
    tier with the same plan shape (agg_percentile_approx)."""
    d = load_table(spark, sf_dir, "documents")
    tc = d.select(
        "lang", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    return (
        tc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_tokens").alias("max_tokens"),
            F.round(F.expr("percentile(n_tokens, 0.25)"), 6).alias("p25"),
            F.round(F.expr("percentile(n_tokens, 0.50)"), 6).alias("p50"),
            F.round(F.expr("percentile(n_tokens, 0.75)"), 6).alias("p75"),
            F.round(F.expr("percentile(n_tokens, 0.95)"), 6).alias("p95"),
        )
        .orderBy("lang")
    )


@q(
    "emb_covariance_topk",
    """WITH u AS (
         SELECT vec_id,
                unnest(range(len(embedding))) AS i,
                unnest(embedding) AS e
         FROM embeddings),
       x AS (
         SELECT vec_id, i,
                CAST(round(CAST(e AS DOUBLE) * 1000000) AS BIGINT) AS v
         FROM u),
       p AS (
         SELECT a.i AS i, b.i AS j, count(*) AS n,
                sum(a.v)::BIGINT AS sx, sum(b.v)::BIGINT AS sy,
                sum(a.v * b.v)::BIGINT AS sxy
         FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i < b.i
         GROUP BY 1, 2),
       c AS (SELECT i, j, n, (n * sxy - sx * sy)::BIGINT AS cov_mm FROM p)
       SELECT i, j, cov_mm,
              round(cov_mm::DOUBLE / (n::DOUBLE * n::DOUBLE) / 1e12, 8) AS cov
       FROM c ORDER BY abs(cov_mm) DESC, i, j LIMIT 20""",
)
def emb_covariance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most-correlated embedding dimension pairs by |covariance| —
    the redundancy probe run before dimensionality reduction or int8
    quantization (strongly covarying dims waste code space). Embeddings
    are lifted to exact integer micro-units, so the co-moment form
    n·Σxy − Σx·Σy is exact 64-bit arithmetic and the |cov| ranking is a
    total order over integers — no float tie can reorder engines. Scale:
    the (i, j) pair expansion happens IN-ARRAY per vector (higher-order
    transform/slice, pure codegen — the copurchase_edges trick), so
    there is NO self-join and NO N·d-row shuffle: the single groupBy
    shuffle carries only d²/2 partial-agg rows per task (d=64 → 2,016
    groups), and the final sort is over d²/2 rows — independent of N.
    The oracle keeps the equivalent self-join form for SQL clarity."""
    e = load_table(spark, sf_dir, "embeddings")
    vm = e.select(
        F.expr(
            "transform(embedding,"
            " e -> cast(round(cast(e AS double) * 1000000) AS bigint))"
        ).alias("vm")
    )
    pairs = vm.select(
        F.explode(
            F.expr(
                "flatten(transform(vm, (x, i) -> transform("
                "  slice(vm, i + 2, size(vm) - i - 1),"
                "  (y, j) -> struct(cast(i AS bigint) AS i,"
                "                   cast(i + 1 + j AS bigint) AS j,"
                "                   x AS x, y AS y))))"
            )
        ).alias("p")
    ).select("p.*")
    p = pairs.groupBy("i", "j").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    c = p.select(
        "i",
        "j",
        "n",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("cov_mm"),
    )
    return (
        c.select(
            "i",
            "j",
            "cov_mm",
            F.round(
                F.col("cov_mm").cast("double")
                / (F.col("n").cast("double") * F.col("n").cast("double"))
                / F.lit(1e12),
                8,
            ).alias("cov"),
        )
        .orderBy(F.abs("cov_mm").desc(), "i", "j")
        .limit(20)
    )


@q(
    "llm_vocab_coverage_curve",
    """WITH tok AS (
         SELECT unnest(string_split(text, ' ')) AS token FROM documents),
       f AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
       tot AS (SELECT sum(c)::BIGINT AS total, count(*) AS vocab FROM f),
       r AS (SELECT token, c,
                    row_number() OVER (ORDER BY c DESC, token) AS rnk
             FROM f),
       cum AS (SELECT rnk, sum(c) OVER (ORDER BY rnk)::BIGINT AS covered
               FROM r WHERE rnk <= 1000)
       SELECT k.k, least(k.k, tot.vocab)::BIGINT AS vocab_used,
              cum.covered AS covered_tokens,
              round(cum.covered::DOUBLE / tot.total, 6) AS coverage
       FROM (VALUES (10::BIGINT), (100::BIGINT), (1000::BIGINT)) k(k), tot
       JOIN cum ON cum.rnk = least(k.k, tot.vocab)
       ORDER BY k.k""",
)
def llm_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: the fraction of all corpus tokens
    covered by the top-k most frequent types for k ∈ {10, 100, 1000} —
    the table a tokenizer-budget decision reads (how fast does coverage
    saturate, how big must the vocab be). The global top-1000 is a
    distributed TakeOrdered under a (count DESC, token) total order;
    the cumulative window then runs over ≤1000 rows (bounded, single
    partition by construction), never over the full vocabulary. Totals
    are exact integer sums; the only float is the final rounded
    division."""
    d = load_table(spark, sf_dir, "documents")
    f = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = f.agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("vocab")
    )
    top = f.orderBy(F.col("c").desc(), "token").limit(1000)
    w = Window.orderBy(F.col("c").desc(), "token")
    cum = top.select(
        F.row_number().over(w).alias("rnk"),
        F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "covered"
        ),
    )
    k = spark.createDataFrame([(10,), (100,), (1000,)], "k long")
    return (
        k.crossJoin(F.broadcast(tot))  # 1-row totals broadcast
        .withColumn("vocab_used", F.least("k", "vocab").cast("bigint"))
        .join(F.broadcast(cum), F.col("vocab_used") == F.col("rnk"))
        .select(
            "k",
            "vocab_used",
            F.col("covered").alias("covered_tokens"),
            F.round(F.col("covered").cast("double") / F.col("total"), 6).alias(
                "coverage"
            ),
        )
        .orderBy("k")
    )


_PCA_SQUARINGS = 10  # S^(2^10): eigengap here is ~0.98, plain iteration is too slow
_PCA_PRESCALE = 1048576  # 2^20 keeps the exact S sums in int64 before normalizing
_PCA_NORM = 100000  # matrix entries renormalize to ±1e5: products ≤ 64e10·1e5 < 2^63


def _pca_oracle() -> str:
    """Unrolled matrix-squaring oracle: A₀ = normalize(S div 2^20), then
    A_{k+1} = normalize(A_k·A_k) for 10 rounds (A = S^1024 up to scale),
    finally w = normalize₁₀₀₀(A·1⃗). All BIGINT; both engines truncate
    integer division toward zero (verified). CTEs are MATERIALIZED:
    DuckDB inlines plain CTEs, and each squaring references its
    predecessor three times (two join legs + the max-abs normalizer),
    so inlining re-evaluates 3^10 subtrees."""
    ctes = [
        """u AS (
         SELECT vec_id, unnest(range(len(embedding))) AS i,
                unnest(embedding) AS e
         FROM embeddings),
       x AS (
         SELECT vec_id, i,
                CAST(round(CAST(e AS DOUBLE) * 1000000) AS BIGINT) AS v
         FROM u),
       s AS MATERIALIZED (
         SELECT a.i AS i, b.i AS j,
                (sum(a.v * b.v)::BIGINT // 1048576)::BIGINT AS s
         FROM x a JOIN x b USING (vec_id)
         GROUP BY 1, 2),
       a0 AS MATERIALIZED (
         SELECT i, j,
                ((s * 100000) // (SELECT max(abs(s)) FROM s))::BIGINT AS a
         FROM s)""",
    ]
    for k in range(1, _PCA_SQUARINGS + 1):
        ctes.append(
            f"""p{k} AS MATERIALIZED (
         SELECT l.i AS i, r.j AS j, sum(l.a * r.a)::BIGINT AS p
         FROM a{k - 1} l JOIN a{k - 1} r ON l.j = r.i
         GROUP BY 1, 2),
       a{k} AS MATERIALIZED (
         SELECT i, j,
                ((p * 100000) // (SELECT max(abs(p)) FROM p{k}))::BIGINT AS a
         FROM p{k})"""
        )
    last = f"a{_PCA_SQUARINGS}"
    return (
        "WITH " + ",\n       ".join(ctes)
        + f""",
       wr AS (SELECT i, sum(a)::BIGINT AS wr FROM {last} GROUP BY i),
       wn AS (
         SELECT i,
                ((wr * 1000) // (SELECT max(abs(wr)) FROM wr))::BIGINT AS w
         FROM wr)
       SELECT i, w, round(w::DOUBLE / 1000, 6) AS loading
       FROM wn ORDER BY i"""
    )


@q("emb_pca_power_iteration", _pca_oracle())
def emb_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant direction of the embedding second-moment matrix — the
    first principal axis a drift monitor or whitening step needs,
    computed WITHOUT a linear-algebra library and in fully exact integer
    arithmetic. The fixture eigengap is ~0.98, so plain power iteration
    needs hundreds of rounds; instead the d×d matrix is SQUARED 10 times
    (A = S^1024 up to scale) — numpy cross-check puts |cos| vs the exact
    top eigenvector above 0.9999 at every fixture SF
    (tests/test_audit_extra.py). Exactness: embeddings lift to integer
    micro-units; S = XᵀX is an exact-int partial aggregate; S pre-scales
    by 2^20 and every squaring renormalizes entries to ±1e5 so products
    stay in int64 (64·1e10·1e5 < 2^63); integer division truncates
    toward zero identically on both engines (verified; emulated in the
    driver ladder with sign·(|x| // m)). The squaring ladder runs on the
    COLLECTED d² co-moment matrix in exact numpy int64 (r14: the frame
    is constant-sized and feeding it through 10 materialize rounds cost
    10 Spark jobs for 64×64 matmuls); the oracle stays one unrolled
    nested-CTE SQL (DuckDB CTEs evaluate once).
    Scale: S aggregates to d²=4,096 rows with map-side combine
    (shuffle is d² per task, independent of N); the driver holds only
    that d² summary — never row data. At 100 TB,
    lift vectors to 1e3 units so the Σ x·x partials stay in int64 at
    N=10⁹ rows; the squaring ladder is unchanged (it never sees N)."""
    e = load_table(spark, sf_dir, "embeddings")
    vm = e.select(
        F.expr(
            "transform(embedding,"
            " e -> cast(round(cast(e AS double) * 1000000) AS bigint))"
        ).alias("vm")
    )
    # full d×d second-moment matrix (incl. diagonal + mirror), in-array
    pairs = vm.select(
        F.explode(
            F.expr(
                "flatten(transform(vm, (x, i) -> transform(vm,"
                " (y, j) -> struct(cast(i AS bigint) AS i,"
                "                  cast(j AS bigint) AS j,"
                "                  x * y AS xy))))"
            )
        ).alias("p")
    ).select("p.*")
    s = (
        pairs.groupBy("i", "j")
        .agg(F.sum("xy").alias("sxy"))
        .select(
            "i", "j",
            F.expr(f"sxy div {_PCA_PRESCALE}").cast("bigint").alias("a"),
        )
    )
    # The squaring ladder runs on the COLLECTED d² matrix (r14, guide
    # §1.2): the d×d frame is constant-sized (never sees N — only the S
    # aggregate above touches data), and the old per-squaring
    # materialize+Observation chain cost 10 Spark jobs to multiply
    # 64×64 integer matrices. numpy int64 matmul is exact here by the
    # same bound that kept Spark's sums in int64 (entries ≤ ±1e5,
    # products ≤ 64e10 < 2^63); `div` truncates toward zero, emulated
    # exactly with sign·(|x| // m). The collect moves d² rows — the
    # same volume the Observation normalizer already pulled per round.
    import numpy as np

    rows = s.collect()
    d = 1 + max(max(r["i"] for r in rows), max(r["j"] for r in rows))
    mat = np.zeros((d, d), dtype=np.int64)
    for r in rows:
        mat[r["i"], r["j"]] = r["a"]

    def normalize(x: "np.ndarray") -> "np.ndarray":
        m = int(np.abs(x).max())
        if m == 0:
            # ADVICE r14: numpy floor_divide-by-zero would return 0 with
            # a warning, silently diverging from the SQL div/NULL path —
            # an all-zero co-moment matrix must fail loudly instead.
            raise ValueError(
                "emb_pca_power_iteration: degenerate all-zero matrix"
            )
        return (np.abs(x) * _PCA_NORM // m) * np.sign(x)

    a = normalize(mat)
    for _ in range(_PCA_SQUARINGS):
        a = normalize(a @ a)
    wr = a.sum(axis=1)
    mw = int(np.abs(wr).max())
    if mw == 0:
        raise ValueError("emb_pca_power_iteration: degenerate zero loadings")
    w = (np.abs(wr) * 1000 // mw) * np.sign(wr)
    out = spark.createDataFrame(
        [(int(i), int(w[i])) for i in range(d)], "i bigint, w bigint"
    )
    return out.select(
        "i", "w", F.round(F.col("w").cast("double") / 1000, 6).alias("loading")
    ).orderBy("i")


@q(
    "events_attribution_linear",
    """WITH conv AS (
         SELECT event_id AS conv_id, user_id, ts AS conv_ts
         FROM events WHERE event_type = 'purchase'),
       touch AS (
         SELECT event_id AS touch_id, user_id, ts, event_type
         FROM events WHERE event_type IN ('view', 'click', 'signup')),
       tj AS (
         SELECT c.conv_id, t.event_type
         FROM conv c JOIN touch t
           ON c.user_id = t.user_id
          AND t.ts < c.conv_ts
          AND t.ts >= c.conv_ts - INTERVAL 24 HOURS),
       credited AS (
         SELECT conv_id, event_type,
                (1000000 // count(*) OVER (PARTITION BY conv_id))::BIGINT
                  AS credit_micro
         FROM tj)
       SELECT event_type,
              count(*) AS n_touches,
              count(DISTINCT conv_id) AS n_conversions_touched,
              round(sum(credit_micro)::DOUBLE / 1000000, 6) AS credit
       FROM credited GROUP BY event_type ORDER BY event_type""",
)
def events_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every view/click/signup in the 24 h
    before a purchase shares that conversion's credit equally — the
    attribution model marketing compares against last-touch
    (``events_first_touch``). Credit is 10⁶ integer micro-units divided
    by the touch count (truncating division, identical both engines), so
    the per-type credit sums are exact ints and only the final display
    division is float. Scale: the conv⋈touch join is an equi-join on
    user_id with a post-filter on the 24 h window (hash join, no
    nested-loop); per-conversion touch counts are a bounded window over
    the join output. At extreme fan-out, bucket both sides by
    (user, day) first — the join_interval_binned shape."""
    e = load_table(spark, sf_dir, "events")
    conv = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("conv_ts"),
    )
    touch = e.filter(F.col("event_type").isin("view", "click", "signup")).select(
        "user_id", "ts", "event_type"
    )
    tj = conv.join(
        touch,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("ts") < F.col("conv_ts"))
        & (F.col("ts") >= F.col("conv_ts") - F.expr("INTERVAL 24 HOURS")),
    ).select("conv_id", "event_type")
    credited = tj.select(
        "conv_id",
        "event_type",
        F.expr("1000000 div count(*) OVER (PARTITION BY conv_id)")
        .cast("bigint")
        .alias("credit_micro"),
    )
    return (
        credited.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.count_distinct("conv_id").alias("n_conversions_touched"),
            F.round(F.sum("credit_micro").cast("double") / 1000000, 6).alias(
                "credit"
            ),
        )
        .orderBy("event_type")
    )


@q(
    "events_forecast_naive_mae",
    """WITH daily AS (
         SELECT event_type, ts::DATE AS d, count(*) AS n
         FROM events GROUP BY 1, 2),
       scored AS (
         SELECT a.event_type, a.n, b.n AS fc
         FROM daily a JOIN daily b
           ON a.event_type = b.event_type
          AND a.d = b.d + INTERVAL 7 DAYS)
       SELECT event_type,
              count(*) AS n_days_scored,
              round(sum(abs(n - fc))::DOUBLE / count(*), 6) AS mae,
              round(sum(n - fc)::DOUBLE / count(*), 6) AS bias
       FROM scored GROUP BY event_type ORDER BY event_type""",
)
def events_forecast_naive_mae(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's event count
    with the SAME WEEKDAY LAST WEEK and report MAE and bias per type —
    the baseline every real forecasting model must beat, and the
    cheapest drift alarm (MAE jumps when the weekly pattern breaks).
    The 7-day alignment is an exact date equi-join (not lag-7-rows,
    which silently misaligns when days are missing); counts are ints so
    both error sums are exact, with two final display divisions."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    a, b = daily.alias("a"), daily.alias("b")
    scored = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.d") == F.date_add(F.col("b.d"), 7)),
    ).select(F.col("a.event_type").alias("event_type"), F.col("a.n").alias("n"),
             F.col("b.n").alias("fc"))
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days_scored"),
            F.round(
                F.sum(F.abs(F.col("n") - F.col("fc"))).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mae"),
            F.round(
                F.sum(F.col("n") - F.col("fc")).cast("double") / F.count(F.lit(1)),
                6,
            ).alias("bias"),
        )
        .orderBy("event_type")
    )


@q(
    "events_anomaly_iqr",
    """WITH daily AS (
         SELECT event_type, ts::DATE AS d, count(*) AS n
         FROM events GROUP BY 1, 2),
       q AS (
         SELECT event_type,
                quantile_cont(n, 0.25) AS q1,
                quantile_cont(n, 0.75) AS q3
         FROM daily GROUP BY event_type)
       SELECT d.event_type,
              count(*) AS n_days,
              sum(CASE WHEN d.n < q.q1 - 1.5 * (q.q3 - q.q1)
                         OR d.n > q.q3 + 1.5 * (q.q3 - q.q1)
                       THEN 1 ELSE 0 END)::BIGINT AS n_anomaly_days,
              round(min(q.q1), 6) AS q1, round(min(q.q3), 6) AS q3
       FROM daily d JOIN q USING (event_type)
       GROUP BY d.event_type ORDER BY d.event_type""",
)
def events_anomaly_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IQR-fence anomaly days per event type — Tukey's robust outlier
    rule (beyond q3+1.5·IQR / below q1−1.5·IQR), the non-parametric
    sibling of the z-score gate (``events_anomaly``) and the MAD gate:
    immune to the anomalies' own contribution to the spread. Day counts
    are exact ints; the quartiles interpolate over identical ints on
    both engines, so every fence comparison is between identical
    doubles and exact ints. One daily agg, one per-type quartile agg
    broadcast back, one conditional count."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    qb = daily.groupBy("event_type").agg(
        F.expr("percentile(n, 0.25)").alias("q1"),
        F.expr("percentile(n, 0.75)").alias("q3"),
    )
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    return (
        daily.join(F.broadcast(qb), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum(
                F.when((F.col("n") < lo) | (F.col("n") > hi), 1).otherwise(0)
            ).alias("n_anomaly_days"),
            F.round(F.min("q1"), 6).alias("q1"),
            F.round(F.min("q3"), 6).alias("q3"),
        )
        .orderBy("event_type")
    )


@q(
    "llm_doc_ppl_percentiles",
    """WITH tok AS (
         SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
         FROM documents),
       freq AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
       tot AS (SELECT sum(c)::BIGINT AS t,
                      (floor(ln(sum(c)) * 1000000))::BIGINT AS ln_t_micro
               FROM freq),
       terms AS (
         SELECT tok.doc_id, tok.lang,
                (floor(ln(freq.c) * 1000000))::BIGINT AS ln_c_micro
         FROM tok JOIN freq USING (token)),
       docs AS (
         SELECT doc_id, lang, count(*) AS n_tok,
                (count(*) * (SELECT ln_t_micro FROM tot)
                 - sum(ln_c_micro)::BIGINT) AS nll_micro
         FROM terms GROUP BY doc_id, lang),
       per AS (
         SELECT lang, (nll_micro // n_tok)::BIGINT AS nll_per_tok_micro
         FROM docs)
       SELECT lang, count(*) AS n_docs,
              round(quantile_cont(nll_per_tok_micro, 0.5), 6) AS p50_nll_micro,
              round(quantile_cont(nll_per_tok_micro, 0.9), 6) AS p90_nll_micro
       FROM per GROUP BY lang ORDER BY lang""",
)
def llm_doc_ppl_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram negative-log-likelihood percentiles per
    language — the corpus-LM fluency screen (a doc whose own corpus
    can't predict it is boilerplate soup or foreign-language leakage;
    perplexity is exp(nll/10⁶), left to the reader so no exp() runs on
    either engine — exp is NOT guaranteed cross-libm identical). House
    log discipline: per-token ln terms floor to integer micro-units
    BEFORE summing (nll = n·ln T − Σ ln c, all exact int64), per-doc
    normalization is truncating integer division, and percentiles
    interpolate over exact ints. One token explode, one freq agg, one
    equi-join, two tiny aggs."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("token")
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    tot = freq.agg(
        F.floor(F.log(F.sum("c").cast("double")) * 1000000).alias("ln_t_micro")
    )
    terms = tok.join(freq, "token").select(
        "doc_id",
        "lang",
        F.floor(F.log(F.col("c").cast("double")) * 1000000).alias("ln_c_micro"),
    )
    docs = (
        terms.crossJoin(F.broadcast(tot))  # 1-row corpus total broadcast
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            (
                F.count(F.lit(1)) * F.min("ln_t_micro") - F.sum("ln_c_micro")
            ).alias("nll_micro"),
        )
    )
    per = docs.select(
        "lang", F.expr("nll_micro div n_tok").cast("bigint").alias("nll_per_tok_micro")
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.expr("percentile(nll_per_tok_micro, 0.5)"), 6).alias(
                "p50_nll_micro"
            ),
            F.round(F.expr("percentile(nll_per_tok_micro, 0.9)"), 6).alias(
                "p90_nll_micro"
            ),
        )
        .orderBy("lang")
    )


@q(
    "emb_centroid_margin",
    """WITH u AS (
         SELECT vec_id, label,
                unnest(range(len(embedding))) AS i,
                unnest(embedding) AS e
         FROM embeddings),
       x AS (
         SELECT vec_id, label, i,
                CAST(round(CAST(e AS DOUBLE) * 1000000) AS BIGINT) AS v
         FROM u),
       cent AS (
         SELECT label AS c_label, i,
                (sum(v)::BIGINT // count(*))::BIGINT AS c
         FROM x GROUP BY label, i),
       dist AS (
         SELECT x.vec_id, x.label, cent.c_label,
                sum((x.v - cent.c) * (x.v - cent.c))::BIGINT AS d2
         FROM x JOIN cent USING (i)
         GROUP BY x.vec_id, x.label, cent.c_label),
       margins AS (
         SELECT vec_id, label,
                min(CASE WHEN c_label = label THEN d2 END) AS own_d2,
                min(CASE WHEN c_label <> label THEN d2 END) AS other_d2
         FROM dist GROUP BY vec_id, label)
       SELECT label, count(*) AS n_vecs,
              sum(CASE WHEN other_d2 > own_d2 THEN 1 ELSE 0 END)::BIGINT
                AS n_separable,
              round(sum(other_d2 - own_d2)::DOUBLE / count(*) / 1e12, 6)
                AS avg_margin
       FROM margins GROUP BY label ORDER BY label""",
)
def emb_centroid_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid separability audit: per label, how many vectors
    sit closer to their OWN label centroid than to every other centroid,
    and the average squared-distance margin — the go/no-go check before
    trusting labels for supervised filtering or a centroid classifier.
    Centroids are integer micro-unit means via truncating division
    (identical both engines); every distance is an exact int64 sum of
    squared diffs, so the separability counts cannot drift. Scale: the
    vec×centroid expansion is N·d·L rows but partial-aggregates on
    (vec, label-pair) map-side; centroids (L·d rows) broadcast."""
    e = load_table(spark, sf_dir, "embeddings")
    x = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "vec_id",
        "label",
        F.col("pos").cast("bigint").alias("i"),
        F.round(F.col("val").cast("double") * 1000000).cast("bigint").alias("v"),
    )
    cent = x.groupBy(F.col("label").alias("c_label"), "i").agg(
        F.expr("sum(v) div count(*)").cast("bigint").alias("c")
    )
    dist = (
        x.join(F.broadcast(cent), "i")
        .groupBy("vec_id", "label", "c_label")
        .agg(F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))).alias("d2"))
    )
    margins = dist.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("c_label") == F.col("label"), F.col("d2"))).alias("own_d2"),
        F.min(F.when(F.col("c_label") != F.col("label"), F.col("d2"))).alias(
            "other_d2"
        ),
    )
    return (
        margins.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(
                F.when(F.col("other_d2") > F.col("own_d2"), 1).otherwise(0)
            ).alias("n_separable"),
            F.round(
                F.sum(F.col("other_d2") - F.col("own_d2")).cast("double")
                / F.count(F.lit(1))
                / F.lit(1e12),
                6,
            ).alias("avg_margin"),
        )
        .orderBy("label")
    )


@q(
    "events_user_overlap_jaccard",
    """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
       sizes AS (SELECT event_type, count(*) AS n FROM tu GROUP BY 1),
       inter AS (
         SELECT a.event_type AS type_a, b.event_type AS type_b,
                count(*) AS n_inter
         FROM tu a JOIN tu b
           ON a.user_id = b.user_id AND a.event_type < b.event_type
         GROUP BY 1, 2)
       SELECT i.type_a, i.type_b, sa.n AS n_a, sb.n AS n_b, i.n_inter,
              round(i.n_inter::DOUBLE / (sa.n + sb.n - i.n_inter), 6)
                AS jaccard
       FROM inter i
       JOIN sizes sa ON sa.event_type = i.type_a
       JOIN sizes sb ON sb.event_type = i.type_b
       ORDER BY i.type_a, i.type_b""",
)
def events_user_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap matrix: Jaccard similarity of the user sets
    behind every pair of event types — the segmentation sanity check
    (do purchasers overlap clickers? is 'error' hitting everyone?).
    Set sizes and intersections are exact counts off one DISTINCT
    (type, user) table; Jaccard is a single final division. Scale: the
    self-join keys on user_id (equi-join, |types|²-bounded output) and
    the distinct table is the only corpus-sized shuffle."""
    e = load_table(spark, sf_dir, "events")
    tu = e.select("event_type", "user_id").distinct()
    sizes = tu.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a, b = tu.alias("a"), tu.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a", "type_b", "n_a", "n_b", "n_inter",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


_ILSH_N, _ILSH_BANDS = 16, 4
_ILSH_RPB = _ILSH_N // _ILSH_BANDS


def _ph(expr: str, seed) -> str:
    # portable md5-derived 60-bit hash — operators/dedup.portable_hash64 twin
    return f"('0x' || substring(md5('{seed}:' || {expr}), 1, 15))::BIGINT"


def _ilsh_sql() -> str:
    sig_cols = ",\n                ".join(
        f"min({_ph('sh', i)}) AS h{i}" for i in range(_ILSH_N)
    )
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {sig} AS sig FROM sig".format(
            b=b,
            sig=_ph(
                " || ',' || ".join(
                    f"h{b * _ILSH_RPB + r}::VARCHAR" for r in range(_ILSH_RPB)
                ),
                9999,
            ),
        )
        for b in range(_ILSH_BANDS)
    )
    agree = " + ".join(
        f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END" for i in range(_ILSH_N)
    )
    return f"""WITH words AS (
         SELECT doc_id, string_split(text, ' ') AS w FROM documents
       ),
       idx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
               FROM words),
       shingle AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS sh
                   FROM idx),
       sig AS (SELECT doc_id,
                {sig_cols}
               FROM shingle GROUP BY doc_id),
       bands AS ({band_rows}),
       cand AS (
         SELECT DISTINCT least(x.doc_id, y.doc_id) AS doc_a,
                greatest(x.doc_id, y.doc_id) AS doc_b,
                CASE WHEN x.doc_id % 10 = 0 AND y.doc_id % 10 = 0
                     THEN 'new_vs_new' ELSE 'new_vs_corpus' END AS pair_kind
         FROM bands x JOIN bands y
           ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
         WHERE x.doc_id % 10 = 0 OR y.doc_id % 10 = 0),
       scored AS (SELECT c.doc_a, c.doc_b, c.pair_kind, ({agree}) AS agree
                  FROM cand c
                  JOIN sig a ON a.doc_id = c.doc_a
                  JOIN sig b ON b.doc_id = c.doc_b)
       SELECT doc_a, doc_b, pair_kind,
              round(agree / {_ILSH_N}.0, 6) AS est_jaccard
       FROM scored WHERE agree / {_ILSH_N}.0 >= 0.6
       ORDER BY doc_a, doc_b"""


@q("llm_dedup_incremental_lsh", _ilsh_sql())
def llm_dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental LSH dedup — the arrival-time tier the exact-hash
    incremental path (``etl_dedup_incremental``) cannot cover: a NEW
    batch (doc_id % 10 == 0 stands in for today's crawl) is checked for
    NEAR-duplicates against the existing corpus and against itself,
    without ever re-pairing the corpus — batch signatures are the only
    new work, and the band equi-join emits only pairs touching the
    batch. In production the corpus side is the PERSISTED signature
    table from the last full pass (``corpus_sig=`` on
    operators/dedup.incremental_minhash_candidates, the band-reuse
    idiom); it is rebuilt here only because the fixture has no state
    store — with md5-portable hashes so the oracle recomputes the whole
    pipeline bit-for-bit. Candidate volume is O(batch collisions),
    never corpus² — the only LSH maintenance shape that works when the
    corpus is 100 TB and the daily batch is 0.1%."""
    from hawaiidatapipeline_spark.operators.dedup import (
        _band_columns,
        incremental_minhash_candidates,
        minhash_signatures,
        shingles_distinct,
    )
    from hawaiidatapipeline_spark.operators.materialize import materialize

    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    batch = d.filter(F.col("doc_id") % 10 == 0)
    # ONE shared signature build split by batch membership instead of two
    # independent builds (guide §2.4): signatures are a pure per-document
    # function, so the slices are bit-identical to per-side builds, and
    # the corpus pays one shingle-distinct exchange + one signature
    # aggregate instead of two of each. (In production corpus_sig is the
    # persisted table — this shares the fixture rebuild the same way.)
    sig_all = materialize(
        _band_columns(
            minhash_signatures(
                shingles_distinct(d), _ILSH_N, hash_fn="md5"
            ),
            _ILSH_N,
            _ILSH_BANDS,
            "md5",
        )
    )
    pairs = incremental_minhash_candidates(
        corpus, batch, tau=0.6, n_hashes=_ILSH_N, n_bands=_ILSH_BANDS,
        hash_fn="md5",
        corpus_sig=sig_all.filter(F.col("doc_id") % 10 != 0),
        batch_sig=sig_all.filter(F.col("doc_id") % 10 == 0),
    )
    return pairs.select(
        "doc_a", "doc_b", "pair_kind",
        F.round("est_jaccard", 6).alias("est_jaccard"),
    ).orderBy("doc_a", "doc_b")
