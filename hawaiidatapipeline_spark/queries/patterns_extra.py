"""Scale-pattern demonstrations and corpus-inequality analytics.

Each query here exists to make a 100 TB engineering pattern checkable:
the manual two-phase distinct (the skew-safe COUNT DISTINCT), prefix-
duplication clustering (the boilerplate gate), arbitrary-interval time
bucketing (``window()`` beyond what ``date_trunc`` can express), and an
exact Gini coefficient over ranked sums (inequality profiling of the
token budget across sources).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.operators.materialize import materialize
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()


@q(
    "agg_distinct_two_phase",
    """WITH dedup AS (
         SELECT l_returnflag, l_partkey FROM lineitem GROUP BY 1, 2)
       SELECT l_returnflag, count(*) AS n_parts
       FROM dedup GROUP BY l_returnflag
       ORDER BY l_returnflag""",
)
def agg_distinct_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) spelled as its two-phase expansion — dedupe on
    (group, value), then count per group. Same result as
    ``countDistinct`` (which Catalyst expands to exactly this), but
    writing it explicitly lets you re-partition the FIRST phase on
    (group, value) when one group holds most of the data — the skew
    control single-phase distinct cannot express. Both phases partial-
    aggregate map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    dedup = li.groupBy("l_returnflag", "l_partkey").agg(F.lit(1).alias("_one"))
    return (
        dedup.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .orderBy("l_returnflag")
    )


@q(
    "llm_prefix_clusters",
    """WITH pfx AS (
         SELECT doc_id,
                md5(array_to_string(
                    list_slice(string_split(text, ' '), 1, 8), ' ')) AS prefix_md5
         FROM documents)
       SELECT prefix_md5, count(*) AS n_docs,
              min(doc_id) AS canonical_doc
       FROM pfx GROUP BY prefix_md5
       HAVING count(*) >= 2
       ORDER BY n_docs DESC, prefix_md5
       LIMIT 25""",
)
def llm_prefix_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-prefix duplication clusters: documents sharing their first
    8 tokens (the template/boilerplate signature — scraped pages that
    differ only past the header land in one cluster). One md5 per doc,
    one groupBy on the 16-byte digest — the cheapest dedup gate in the
    curation funnel, run BEFORE the expensive shingle passes to shrink
    their input. min(doc_id) picks the deterministic survivor."""
    d = load_table(spark, sf_dir, "documents")
    prefix = F.md5(F.concat_ws(" ", F.slice(F.split("text", " "), 1, 8)))
    return (
        d.select("doc_id", prefix.alias("prefix_md5"))
        .groupBy("prefix_md5")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.col("n_docs").desc(), "prefix_md5")
        .limit(25)
    )


@q(
    "fn_time_bucket",
    """SELECT time_bucket(INTERVAL '90 minutes', ts) AS bucket_start,
              count(*) AS n,
              round(sum(value), 6) AS total_value
       FROM events
       GROUP BY bucket_start
       ORDER BY bucket_start
       LIMIT 40""",
)
def fn_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-interval time bucketing via ``window()`` — 90-minute
    buckets, which ``date_trunc`` cannot express. Spark's window origin
    is the 1970 epoch and DuckDB's time_bucket origin (2000-01-01) is an
    exact multiple of 90 minutes later, so the bucket boundaries agree —
    a real interoperability contract worth pinning in a test. The bucket
    assignment is pure arithmetic on the timestamp (no state), so this
    stays a two-phase hash aggregate."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "90 minutes").getField("start").alias("bucket_start"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .orderBy("bucket_start")
        .limit(40)
    )


@q(
    "llm_length_gini",
    """WITH ranked AS (
         SELECT source, n_chars,
                row_number() OVER (PARTITION BY source
                                   ORDER BY n_chars, doc_id) AS rk,
                count(*) OVER (PARTITION BY source) AS n,
                sum(n_chars) OVER (PARTITION BY source) AS total
         FROM documents)
       SELECT source,
              n::BIGINT AS n_docs,
              total::BIGINT AS total_chars,
              round((2.0 * sum(rk * n_chars::BIGINT)) / (n * total)
                    - (n + 1.0) / n, 6) AS gini
       FROM ranked
       GROUP BY source, n, total
       ORDER BY source""",
)
def llm_length_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of document length per source — the inequality
    profile of the token budget (a source whose Gini approaches 1 is a
    few giant documents plus noise; near 0 is uniform). Exact integer
    rank·length sums under a deterministic (n_chars, doc_id) order make
    the statistic hash-portable. One window shuffle per source partition
    + a per-source aggregate; at 100 TB the rank is the standard
    distributed sort this engine already relies on everywhere."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wp = Window.partitionBy("source")
    ranked = d.select(
        "source",
        "n_chars",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wp).alias("n"),
        F.sum("n_chars").over(wp).alias("total"),
    )
    return (
        ranked.groupBy("source", "n", "total")
        .agg(F.sum(F.col("rk") * F.col("n_chars").cast("long")).alias("s_rx"))
        .select(
            "source",
            F.col("n").cast("long").alias("n_docs"),
            F.col("total").cast("long").alias("total_chars"),
            F.round(
                (2.0 * F.col("s_rx")) / (F.col("n") * F.col("total"))
                - (F.col("n") + 1.0) / F.col("n"),
                6,
            ).alias("gini"),
        )
        .orderBy("source")
    )


@q(
    "ts_percentile_bands",
    """SELECT event_type,
              date_trunc('day', ts) AS day,
              count(*) AS n,
              round(quantile_cont(value, 0.5), 6) AS p50,
              round(quantile_cont(value, 0.95), 6) AS p95
       FROM events
       GROUP BY event_type, day
       ORDER BY event_type, day
       LIMIT 60""",
)
def ts_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latency-dashboard percentile bands: exact interpolated P50/P95 of
    the value column per (event_type, day) — the SLO readout shape.
    Exact percentile sorts within each group, which is fine while groups
    are day-sized; the approx sketch twin (`agg_percentile_approx`) is
    the drop-in when a single group outgrows an executor. One shuffle on
    the composite group key."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        )
        .orderBy("event_type", "day")
        .limit(60)
    )


@q(
    "llm_ngram_novelty",
    """WITH g AS (
         SELECT d.doc_id, array_to_string(d.ws[t.i:t.i+3], ' ') AS gram
         FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) d,
         LATERAL (SELECT unnest(range(1, greatest(len(d.ws) - 2, 1))) AS i) t),
       first_seen AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram),
       per_doc AS (
         SELECT g.doc_id,
                count(*) AS n_grams,
                sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS n_novel
         FROM g JOIN first_seen f ON g.gram = f.gram
         GROUP BY g.doc_id)
       SELECT doc_id, n_grams,
              round(n_novel * 1.0 / n_grams, 6) AS novelty
       FROM per_doc
       ORDER BY novelty, doc_id
       LIMIT 50""",
)
def llm_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-order novelty score: the fraction of a document's word
    4-grams whose corpus-wide FIRST occurrence (min doc_id, standing in
    for arrival order) is this document. The streaming-curation signal —
    a feed whose novelty trend collapses toward 0 has started re-sending
    old content. Reuses the same codegen gram expansion as
    llm_dupspan_ngram; the first-seen table is one groupBy and the
    join-back keys on the gram hash — two shuffles, both linear. Lowest
    50 novelty docs = the most derivative documents."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                # short-doc guard (ADVICE r11): sequence(1, 0) in Spark
                # steps -1 and yields [1, 0], making slice() throw on
                # docs under 4 tokens — the CASE mirrors the oracle's
                # empty-range semantics (zero grams)
                "CASE WHEN size(split(text, ' ')) >= 4"
                " THEN transform(sequence(1, size(split(text, ' ')) - 3),"
                " i -> concat_ws(' ', slice(split(text, ' '), i, 4)))"
                " ELSE array() END"
            )
        ).alias("gram"),
    )
    grams = materialize(grams)  # feeds two branches — expand the grams ONCE
    first_seen = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    return (
        grams.join(first_seen, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("_n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            F.round(F.col("_n_novel") / F.col("n_grams"), 6).alias("novelty"),
        )
        .orderBy("novelty", "doc_id")
        .limit(50)
    )


@q(
    "agg_median_absolute_deviation",
    """WITH med AS (
         SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS m
         FROM lineitem GROUP BY l_returnflag)
       SELECT l.l_returnflag,
              round(min(med.m), 6) AS median_price,
              round(quantile_cont(abs(l.l_extendedprice - med.m), 0.5), 6) AS mad
       FROM lineitem l JOIN med ON l.l_returnflag = med.l_returnflag
       GROUP BY l.l_returnflag
       ORDER BY l.l_returnflag""",
)
def agg_median_absolute_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group — the robust dispersion measure
    outlier-heavy pipelines use where stddev misleads. Two exact-percentile
    passes: per-group median, broadcast back (|groups| rows), then the
    median of absolute deviations. Both medians interpolate identically in
    both engines, so the statistic hash-matches. At 100 TB swap the exact
    percentile for the sketch tier per pass — same plan shape."""
    li = load_table(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("m")
    )
    return (
        li.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.min("m"), 6).alias("median_price"),
            F.round(
                F.expr("percentile(abs(l_extendedprice - m), 0.5)"), 6
            ).alias("mad"),
        )
        .orderBy("l_returnflag")
    )


@q(
    "graph_degree_distribution",
    """WITH items AS (SELECT l_orderkey, l_partkey FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) QUALIFY count(*) OVER (PARTITION BY l_orderkey) <= 64),
       e AS (SELECT a.l_partkey AS u, b.l_partkey AS v
             FROM items a JOIN items b
               ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             GROUP BY 1, 2 HAVING count(*) >= 2),
       deg AS (SELECT node, count(*) AS degree
               FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e) n
               GROUP BY node)
       SELECT degree, count(*) AS n_nodes
       FROM deg GROUP BY degree
       ORDER BY degree""",
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph (same edge set as
    pagerank/triangles) — the first diagnostic before any graph algorithm:
    a heavy right tail says 'orient by degree / salt the hubs' before the
    wedge or message-passing joins. Two stacked narrow aggregates over the
    undirected edge list."""
    from hawaiidatapipeline_spark.operators.graph import copurchase_edges

    li = load_table(spark, sf_dir, "lineitem")
    edges = copurchase_edges(li)  # collect+expand build — operators/graph.py
    nodes = edges.select(F.col("u").alias("node")).unionAll(
        edges.select(F.col("v").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("degree")
    )


@q(
    "events_dau_mau",
    """WITH daily AS (
         SELECT date_trunc('day', ts) AS day,
                date_trunc('month', ts) AS month,
                count(DISTINCT user_id) AS dau
         FROM events GROUP BY day, month),
       monthly AS (
         SELECT date_trunc('month', ts) AS month,
                count(DISTINCT user_id) AS mau
         FROM events GROUP BY month)
       SELECT d.day, d.dau, m.mau,
              round(d.dau * 1.0 / m.mau, 6) AS stickiness
       FROM daily d JOIN monthly m ON d.month = m.month
       ORDER BY d.day
       LIMIT 45""",
)
def events_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / MAU / stickiness — the product-health headline metric. Two
    distinct-count aggregates at different grains joined on month; at
    100 TB both become the mergeable KMV/HLL sketch tier
    (agg_distinct_kmv) with identical plan shape, and the daily grain
    partial-aggregates before the distinct shuffle."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.date_trunc("month", F.col("ts")).alias("month"),
    ).agg(F.countDistinct("user_id").alias("dau"))
    monthly = e.groupBy(F.date_trunc("month", F.col("ts")).alias("month")).agg(
        F.countDistinct("user_id").alias("mau")
    )
    return (
        daily.join(F.broadcast(monthly), "month")
        .select(
            "day",
            "dau",
            "mau",
            F.round(F.col("dau") * 1.0 / F.col("mau"), 6).alias("stickiness"),
        )
        .orderBy("day")
        .limit(45)
    )


@q(
    "events_power_users_pareto",
    """WITH per_user AS (
         SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id),
       ranked AS (
         SELECT n_events,
                row_number() OVER (ORDER BY n_events DESC, user_id) AS rk,
                count(*) OVER () AS n_users,
                sum(n_events) OVER () AS total_events
         FROM per_user)
       SELECT (n_users / 5)::BIGINT AS top20pct_users,
              total_events::BIGINT AS total_events,
              sum(CASE WHEN rk <= n_users / 5 THEN n_events ELSE 0 END)::BIGINT
                AS top20pct_events,
              round(sum(CASE WHEN rk <= n_users / 5 THEN n_events ELSE 0 END)
                    * 1.0 / total_events, 6) AS concentration
       FROM ranked
       GROUP BY n_users, total_events""",
)
def events_power_users_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration: what share of all events the top-20% most
    active users generate — the skew number that decides whether user_id
    is a saltable hot key. Per-user counts, a deterministic activity rank,
    one conditional sum. The per-user aggregate shuffles once; the rank
    over |users| rows is cheap at any corpus size because users, not
    events, enter the window."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.orderBy(F.col("n_events").desc(), "user_id")
    wall = Window.partitionBy()
    ranked = per_user.select(
        "n_events",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wall).alias("n_users"),
        F.sum("n_events").over(wall).alias("total_events"),
    )
    top = F.sum(
        F.when(F.col("rk") <= F.col("n_users") / 5, F.col("n_events")).otherwise(0)
    )
    return ranked.groupBy("n_users", "total_events").agg(
        (F.col("n_users") / 5).cast("long").alias("top20pct_users"),
        F.col("total_events").cast("long").alias("total_events_out"),
        top.cast("long").alias("top20pct_events"),
        F.round(top * 1.0 / F.col("total_events"), 6).alias("concentration"),
    ).select(
        "top20pct_users",
        F.col("total_events_out").alias("total_events"),
        "top20pct_events",
        "concentration",
    )


@q(
    "agg_winsorize",
    """WITH bounds AS (
         SELECT l_returnflag,
                quantile_cont(l_extendedprice, 0.05) AS lo,
                quantile_cont(l_extendedprice, 0.95) AS hi
         FROM lineitem GROUP BY l_returnflag)
       SELECT l.l_returnflag,
              count(*) AS n,
              round(sum(l.l_extendedprice::DECIMAL(20,4))::DOUBLE / count(*), 6)
                AS raw_mean,
              round(sum(greatest(least(l.l_extendedprice, b.hi), b.lo)
                        ::DECIMAL(20,4))::DOUBLE / count(*), 6)
                AS winsorized_mean,
              sum(CASE WHEN l.l_extendedprice < b.lo
                         OR l.l_extendedprice > b.hi
                       THEN 1 ELSE 0 END)::BIGINT AS n_clamped
       FROM lineitem l JOIN bounds b ON l.l_returnflag = b.l_returnflag
       GROUP BY l.l_returnflag
       ORDER BY l.l_returnflag""",
)
def agg_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per group — clamp to the [P5, P95] band before
    averaging, the outlier treatment that keeps sample size (unlike
    trimming) and bounds influence (unlike raw means). Exact per-group
    percentile bounds broadcast back (|groups| rows), clamp is pure
    codegen greatest/least, sums in exact decimal. The raw vs winsorized
    delta IS the outlier-influence report."""
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.05)").alias("lo"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("hi"),
    )
    x = F.col("l_extendedprice")
    clamped = F.greatest(F.least(x, F.col("hi")), F.col("lo"))
    return (
        li.join(F.broadcast(bounds), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(x.cast("decimal(20,4)")).cast("double") / F.count(F.lit(1)), 6
            ).alias("raw_mean"),
            F.round(
                F.sum(clamped.cast("decimal(20,4)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("winsorized_mean"),
            F.sum(F.when((x < F.col("lo")) | (x > F.col("hi")), 1).otherwise(0))
            .cast("long")
            .alias("n_clamped"),
        )
        .orderBy("l_returnflag")
    )


@q(
    "llm_source_overlap_matrix",
    """WITH sh AS (
         SELECT DISTINCT d.source,
                md5(array_to_string(d.ws[t.i:t.i+7], ' ')) AS sh
         FROM (SELECT source, string_split(text, ' ') AS ws FROM documents) d,
         LATERAL (SELECT unnest(range(1, greatest(len(d.ws) - 6, 1))) AS i) t),
       pairs AS (
         SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
         FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
         GROUP BY 1, 2)
       SELECT src_a, src_b, n_shared
       FROM pairs
       ORDER BY n_shared DESC, src_a, src_b
       LIMIT 25""",
)
def llm_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: shared distinct 8-gram shingles
    per source pair — the crawl-planning readout ('feed B is 80% feed A,
    drop it') that runs BEFORE per-document dedup. Shingles dedupe to
    (source, hash) first, so the self-join fans out per shared shingle
    across ≤|sources|² pairs, not per document pair; the stop-shingle
    discipline from llm_containment_pairs applies unchanged at scale."""
    d = load_table(spark, sf_dir, "documents")
    grams = d.select(
        "source",
        F.explode(
            F.expr(
                # short-doc guard (ADVICE r11): see analysis_extra.py —
                # sequence(1, 0) yields [1, 0], slice() would throw
                "CASE WHEN size(split(text, ' ')) >= 8"
                " THEN transform(sequence(1, size(split(text, ' ')) - 7),"
                " i -> md5(concat_ws(' ', slice(split(text, ' '), i, 8))))"
                " ELSE array() END"
            )
        ).alias("sh"),
    ).distinct()
    a = grams.select(F.col("source").alias("src_a"), "sh")
    b = grams.select(F.col("source").alias("src_b"), "sh")
    return (
        a.join(b, "sh")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .orderBy(F.col("n_shared").desc(), "src_a", "src_b")
        .limit(25)
    )


@q(
    "llm_vocab_growth",
    """WITH first_seen AS (
         SELECT token, min(doc_id) AS first_doc
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
               FROM documents) t
         GROUP BY token)
       SELECT sum(CASE WHEN first_doc < 100 THEN 1 ELSE 0 END)::BIGINT AS v100,
              sum(CASE WHEN first_doc < 200 THEN 1 ELSE 0 END)::BIGINT AS v200,
              sum(CASE WHEN first_doc < 300 THEN 1 ELSE 0 END)::BIGINT AS v300,
              sum(CASE WHEN first_doc < 400 THEN 1 ELSE 0 END)::BIGINT AS v400,
              count(*) AS total_vocab
       FROM first_seen""",
)
def llm_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (the Heaps-law readout): distinct tokens
    seen after the first N documents, N at four checkpoints plus the
    full corpus. A curve that flattens early says the corpus stopped
    contributing new vocabulary — the same first-occurrence table that
    drives llm_ngram_novelty, at token rather than 4-gram grain. One
    explode + one (token → min doc) aggregate + a single conditional
    reduce; linear, and the first-seen table is exactly the structure an
    incremental ingest maintains to extend the curve without rescans."""
    d = load_table(spark, sf_dir, "documents")
    first_seen = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    cp = lambda n: F.sum(
        F.when(F.col("first_doc") < n, 1).otherwise(0)
    ).cast("long")
    return first_seen.agg(
        cp(100).alias("v100"),
        cp(200).alias("v200"),
        cp(300).alias("v300"),
        cp(400).alias("v400"),
        F.count(F.lit(1)).alias("total_vocab"),
    )


@q(
    "fn_format_strings",
    """SELECT p_partkey,
              printf('%05d|%s', p_size, p_brand) AS padded_code,
              printf('%.2f', p_retailprice) AS price_2dp,
              lpad(p_size::VARCHAR, 4, '0') AS lpad_size,
              rpad(p_brand, 10, '.') AS rpad_brand,
              upper(substring(p_type, 1, 3)) AS type_prefix
       FROM part
       ORDER BY p_partkey
       LIMIT 40""",
)
def fn_format_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """printf-style formatting parity (format_string compiles to the same
    C-style conversions DuckDB's printf implements — width, zero-pad,
    fixed decimals) plus lpad/rpad/substring — the report-rendering
    surface. All pure codegen; the %.2f case doubles as a check that
    both engines round the same double to the same decimal string."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.format_string("%05d|%s", F.col("p_size"), F.col("p_brand")).alias(
                "padded_code"
            ),
            F.format_string("%.2f", F.col("p_retailprice")).alias("price_2dp"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("lpad_size"),
            F.rpad("p_brand", 10, ".").alias("rpad_brand"),
            F.upper(F.substring("p_type", 1, 3)).alias("type_prefix"),
        )
        .orderBy("p_partkey")
        .limit(40)
    )


@q(
    "events_seasonality_profile",
    """SELECT dayofweek(ts)::INT AS dow, hour(ts)::INT AS hod,
              count(*) AS n, round(sum(value), 6) AS total_value
       FROM events
       GROUP BY dow, hod
       ORDER BY dow, hod""",
)
def events_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday × hour-of-day seasonality matrix — the load-shape profile
    behind capacity planning and anomaly baselines (events_anomaly
    flags deviations; this is the baseline it deviates FROM). Bounded
    7×24 output whatever the event volume; pure two-phase hash agg.
    DuckDB's dayofweek (0=Sunday) matches Spark's dayofweek−1, handled
    on the Spark side so the oracle stays the engine default."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            (F.dayofweek("ts") - 1).cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hod"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .orderBy("dow", "hod")
    )


@q(
    "ts_type_correlation",
    """WITH daily AS (
         SELECT date_trunc('day', ts) AS day,
                sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::DOUBLE
                  AS clicks,
                sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::DOUBLE
                  AS purchases
         FROM events GROUP BY day)
       SELECT count(*) AS n_days,
              round(corr(clicks, purchases), 6) AS click_purchase_corr,
              round(regr_slope(purchases, clicks), 6) AS purchases_per_click
       FROM daily""",
)
def ts_type_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-series correlation: align two event streams onto a shared
    daily grid (conditional sums — no join needed when both series come
    from one table), then correlate. The align-then-correlate shape is
    how 'does marketing activity predict purchases' questions execute:
    one grouped pass builds the grid, one tiny aggregate computes the
    statistics over |days| rows."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("double")
        .alias("clicks"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("double")
        .alias("purchases"),
    )
    return daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.corr("clicks", "purchases"), 6).alias("click_purchase_corr"),
        F.round(F.regr_slope(F.col("purchases"), F.col("clicks")), 6).alias(
            "purchases_per_click"
        ),
    )
