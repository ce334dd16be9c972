"""Aggregations (SURVEY.md §2.D) — the SoQL ``$group``/``$having`` surface plus
Ruby ``group_by``/``reduce``, and the [NS] extensions (rollup/cube/grouping
sets, statistical moments, extrema, percentiles).

All of these run as Spark partial+final hash aggregation: the map-side combine
means the shuffle carries one row per (partition × group), so even at 100 TB
the exchanged volume is bounded by group cardinality, not input rows.
Floating aggregates are rounded to 6 dp on both sides (SURVEY.md §7 risk 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.ranks import partitioned_prefix_sums
from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()


@q(
    "agg_groupby_basic",
    """SELECT l_returnflag,
              count(*)                          AS n_items,
              round(sum(l_quantity), 6)         AS total_qty,
              round(sum(l_extendedprice::DECIMAL(18,6))::DOUBLE / count(*), 6) AS avg_price,
              round(min(l_extendedprice), 6)    AS min_price,
              round(max(l_extendedprice), 6)    AS max_price
       FROM lineitem GROUP BY l_returnflag""",
)
def agg_groupby_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_quantity"), 6).alias("total_qty"),
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_price"),
        F.round(F.min("l_extendedprice"), 6).alias("min_price"),
        F.round(F.max("l_extendedprice"), 6).alias("max_price"),
    )


@q(
    "agg_global",
    """SELECT count(*)                       AS n_orders,
              round(sum(o_totalprice), 6)    AS gross,
              round(sum(o_totalprice::DECIMAL(18,6))::DOUBLE / count(*), 6) AS avg_order,
              round(min(o_totalprice), 6)    AS smallest,
              round(max(o_totalprice), 6)    AS biggest
       FROM orders""",
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 6).alias("gross"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_order"),
        F.round(F.min("o_totalprice"), 6).alias("smallest"),
        F.round(F.max("o_totalprice"), 6).alias("biggest"),
    )


@q(
    "agg_multikey",
    """SELECT user_id, event_type, count(*) AS n_events,
              round(sum(value), 6) AS total_value
       FROM events GROUP BY user_id, event_type""",
)
def agg_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


@q(
    "agg_count_distinct",
    """SELECT o_orderpriority,
              count(DISTINCT o_custkey) AS n_customers,
              count(*)                  AS n_orders
       FROM orders GROUP BY o_orderpriority""",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct → Spark expands to a two-phase partial-distinct plan."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@q("agg_approx_count_distinct")  # W: HLL++ sketch — not oracle-matchable
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ cardinality — the 100 TB path where exact distinct's
    per-key state would blow memory. Rows-only check (sketch ≠ DuckDB HLL)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers")
    )


@q(
    "agg_having",
    """SELECT c_nationkey, count(*) AS n_customers,
              round(sum(c_acctbal), 6) AS nation_balance
       FROM customer GROUP BY c_nationkey HAVING count(*) > 50""",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 6).alias("nation_balance"),
        )
        .filter(F.col("n_customers") > 50)
    )


@q(
    "agg_rollup",
    """SELECT r_name, n_name, count(*) AS n_customers,
              round(sum(c_acctbal), 6) AS balance
       FROM customer
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY ROLLUP (r_name, n_name)""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals region→nation→grand total."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    enriched = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return enriched.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 6).alias("balance"),
    )


@q(
    "agg_cube",
    """SELECT lang, source, count(*) AS n_docs
       FROM documents GROUP BY CUBE (lang, source)""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.cube("lang", "source").agg(F.count(F.lit(1)).alias("n_docs"))


@q(
    "agg_grouping_sets",
    """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 6) AS qty
       FROM lineitem
       GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping-set list via the SQL entry point (§3.2 EP2)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 6) AS qty
           FROM lineitem_gs
           GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))"""
    )


@q(
    "agg_stats",
    """SELECT c_nationkey,
              round(stddev_samp(c_acctbal), 6) AS sd_bal,
              round(var_samp(c_acctbal), 6)    AS var_bal,
              round(stddev_pop(c_acctbal), 6)  AS sdp_bal,
              round(var_pop(c_acctbal), 6)     AS varp_bal
       FROM customer GROUP BY c_nationkey""",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.round(F.stddev_samp("c_acctbal"), 6).alias("sd_bal"),
        F.round(F.var_samp("c_acctbal"), 6).alias("var_bal"),
        F.round(F.stddev_pop("c_acctbal"), 6).alias("sdp_bal"),
        F.round(F.var_pop("c_acctbal"), 6).alias("varp_bal"),
    )


@q(
    "agg_minby_maxby",
    """SELECT c_nationkey,
              arg_max(c_name, c_acctbal) AS richest,
              arg_min(c_name, c_acctbal) AS poorest
       FROM customer GROUP BY c_nationkey""",
)
def agg_minby_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-valued extrema (value of one column at another's min/max).
    Deterministic because fixture acctbals are tie-free per nation; the
    engine's tie-safe variant is max_by over a (value, pk) struct."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.expr("max_by(c_name, c_acctbal)").alias("richest"),
        F.expr("min_by(c_name, c_acctbal)").alias("poorest"),
    )


@q(
    "agg_collect_sorted",
    """SELECT s_nationkey,
              array_to_string(list(s_name ORDER BY s_name), '|') AS supplier_names
       FROM supplier GROUP BY s_nationkey""",
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List aggregation, sorted for determinism (collect order is not).
    Serialized to '|'-joined string: the driver's pandas canonicalizer cannot
    hash array cells (round-1 TypeError), and a delimited string is equally
    hash-comparable."""
    s = load_table(spark, sf_dir, "supplier")
    return s.groupBy("s_nationkey").agg(
        F.concat_ws("|", F.sort_array(F.collect_list("s_name"))).alias(
            "supplier_names"
        )
    )


@q(
    "agg_percentile",
    """SELECT o_orderpriority,
              round(quantile_cont(o_totalprice, 0.5), 6)  AS median_price,
              round(quantile_cont(o_totalprice, 0.9), 6)  AS p90_price
       FROM orders GROUP BY o_orderpriority""",
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentile (sorts each group's values — at 100 TB
    prefer the approx variant below)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90_price"),
    )


@q(
    "agg_quantile_histogram",
    """WITH bounds AS (
         SELECT o_orderpriority,
                min(o_totalprice) AS mn, max(o_totalprice) AS mx,
                count(*) AS n
         FROM orders GROUP BY o_orderpriority
       ),
       wb AS (SELECT o_orderpriority, mn, (mx - mn) / 1000.0 AS w, n, mx FROM bounds),
       bucketed AS (
         SELECT o.o_orderpriority, wb.mn, wb.w, wb.n,
                CASE WHEN wb.mx = wb.mn THEN 0
                     ELSE least(floor((o.o_totalprice - wb.mn) / wb.w), 999)
                END::BIGINT AS b
         FROM orders o JOIN wb ON o.o_orderpriority = wb.o_orderpriority
       ),
       counts AS (
         SELECT o_orderpriority, mn, w, n, b, count(*) AS c
         FROM bucketed GROUP BY 1, 2, 3, 4, 5
       ),
       ranked AS (
         SELECT *, sum(c) OVER (PARTITION BY o_orderpriority ORDER BY b
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         FROM counts
       ),
       sel AS (
         SELECT o_orderpriority, mn, w, n, min(b) AS b_sel
         FROM ranked WHERE cum >= ceil(0.5 * n)
         GROUP BY 1, 2, 3, 4
       )
       SELECT o_orderpriority,
              round(mn + (b_sel + 1) * w, 6) AS q_estimate,
              n::BIGINT AS n,
              round(w, 6) AS bucket_width
       FROM sel""",
)
def agg_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mergeable quantile sketch (operators/sketches.py):
    fixed-grid histogram median per group. Unlike percentile_approx's
    engine-internal t-digest (rows-only checkable), every step here —
    bounds, integer bucket counts, cumulative crossing, one IEEE division
    chain — reproduces bit-for-bit in DuckDB, so the APPROXIMATE operator
    gets an EXACT oracle. Bucket counts merge across partitions/increments,
    which is the scale story of histogram sketches; error ≤ range/1000."""
    from hawaiidatapipeline_spark.operators.sketches import histogram_quantile

    o = load_table(spark, sf_dir, "orders")
    return histogram_quantile(o, "o_orderpriority", "o_totalprice", p=0.5, n_buckets=1000)


@q(
    "agg_distinct_kmv",
    """WITH hashed AS (
         SELECT DISTINCT o_orderpriority,
                ('0x' || substring(md5('7:' || o_custkey::VARCHAR), 1, 15))::BIGINT AS h
         FROM orders
       ),
       ranked AS (
         SELECT o_orderpriority, h,
                row_number() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rn,
                count(*) OVER (PARTITION BY o_orderpriority) AS nd
         FROM hashed
       ),
       kth AS (SELECT * FROM ranked WHERE rn = 256 OR (nd < 256 AND rn = nd))
       SELECT o_orderpriority,
              CASE WHEN nd < 256 THEN nd::DOUBLE
                   ELSE round(255.0 * 1152921504606846976.0 / h, 6)
              END AS est_distinct
       FROM kth""",
)
def agg_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verifiable distinct-count sketch (operators/sketches.py
    kmv_distinct): K-minimum-values over the portable 60-bit hash — state
    is the k smallest distinct hashes (mergeable: union, re-take k), the
    estimate one identical IEEE division. The deterministic counterpart of
    approx_count_distinct's HLL++, whose registers no other engine can
    recompute; accuracy vs exact asserted in tests/test_sketches.py."""
    from hawaiidatapipeline_spark.operators.sketches import kmv_distinct

    o = load_table(spark, sf_dir, "orders")
    return kmv_distinct(o, "o_orderpriority", "o_custkey", k=256)


@q("agg_percentile_approx")  # W: t-digest-style sketch — not oracle-matchable
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentile — bounded-memory sketch, mergeable across
    partitions; the scale path for quantiles."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("median_price_approx")
    )


@q(
    "agg_pivot",
    """SELECT l_linestatus,
              round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 6) AS A,
              round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 6) AS N,
              round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 6) AS R
       FROM lineitem GROUP BY l_linestatus""",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation): one column per l_returnflag value. Pivot
    values are declared explicitly, so no extra distinct-values job runs and
    the plan stays a single partial+final aggregate — the conditional-sum
    rewrite Catalyst applies is exactly the SQL oracle's CASE form."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 6))
    )


@q(
    "reshape_unpivot",
    """SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice::DOUBLE AS value
       FROM part
       UNION ALL
       SELECT p_partkey, 'p_size' AS metric, p_size::DOUBLE AS value
       FROM part""",
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (long reshape) — Spark 4 native ``unpivot``: narrow scan
    (only the id + value columns are read) and zero shuffles; the oracle is
    the classic UNION ALL rewrite."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_retailprice").cast("double"),
        F.col("p_size").cast("double"),
    ).unpivot("p_partkey", ["p_retailprice", "p_size"], "metric", "value")


@q(
    "agg_salted_skew",
    """SELECT user_id,
              count(*) AS n_events,
              round(sum(value), 6) AS total_value,
              round(min(value), 6) AS min_value,
              round(max(value), 6) AS max_value
       FROM events GROUP BY user_id""",
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation on the skew-friendly user_id key
    (operators/skew.py): phase 1 aggregates (key, salt) so a hot key's rows
    spread over 16 reducers, phase 2 merges partials. The oracle is the
    plain GROUP BY — salting must be algebraically invisible (also
    property-tested in tests/test_properties.py). sum(value) merges as
    sum-of-sums; rounding happens only after the final merge."""
    from hawaiidatapipeline_spark.operators.skew import salted_aggregate

    e = load_table(spark, sf_dir, "events")
    out = salted_aggregate(
        e,
        ["user_id"],
        {
            "n_events": F.count(F.lit(1)),
            "total_value": F.sum("value"),
            "min_value": F.min("value"),
            "max_value": F.max("value"),
        },
        n_salts=16,
        salt_src=["event_id"],
    )
    return out.select(
        "user_id",
        "n_events",
        F.round("total_value", 6).alias("total_value"),
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"),
    )


@q(
    "agg_mode_deterministic",
    """WITH counts AS (
         SELECT l_returnflag, l_quantity, count(*) AS n
         FROM lineitem GROUP BY l_returnflag, l_quantity
       ),
       ranked AS (
         SELECT l_returnflag, l_quantity, n,
                row_number() OVER (PARTITION BY l_returnflag
                                   ORDER BY n DESC, l_quantity) AS rnk
         FROM counts
       )
       SELECT l_returnflag, l_quantity AS mode_quantity, n AS n_occurrences
       FROM ranked WHERE rnk = 1""",
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode with a DETERMINISTIC tie-break (highest count, then
    smallest value) — engine-native ``mode()`` breaks ties arbitrarily,
    which can never be hash-verified across engines or even across runs.
    Two partial+final aggregations plus a per-group rank over the tiny
    (group, value) count table; the raw rows never enter the window."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("l_returnflag").orderBy(F.col("n").desc(), "l_quantity")
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("mode_quantity"),
            F.col("n").alias("n_occurrences"),
        )
    )


@q(
    "agg_corr_deterministic",
    """WITH s AS (
         SELECT l_returnflag,
                count(*) AS n,
                sum(l_quantity::DECIMAL(18,6))                          AS sx,
                sum(l_extendedprice::DECIMAL(18,6))                     AS sy,
                sum((l_quantity * l_extendedprice)::DECIMAL(24,6))      AS sxy,
                sum((l_quantity * l_quantity)::DECIMAL(24,6))           AS sxx,
                sum((l_extendedprice * l_extendedprice)::DECIMAL(30,4)) AS syy
         FROM lineitem GROUP BY l_returnflag
       )
       SELECT l_returnflag, n,
              round(
                (n * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                / sqrt((n * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                       * (n * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)),
              6) AS corr_qty_price
       FROM s""",
)
def agg_corr_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from exact decimal co-moments. Engine-native
    ``corr()`` accumulates floating co-moments in partition order, so the
    low digits differ run-to-run and engine-to-engine; here the five sums
    are exact decimals (order-free), and only the final closed-form
    expression runs in IEEE double — identical on both engines, stable
    at any parallelism. This is the template for every second-moment
    statistic (covariance, variance, z-scores) at 100 TB: partial+final
    decimal sums, floats only at the very end."""
    li = load_table(spark, sf_dir, "lineitem")
    d = lambda c, t: F.col(c).cast(t)
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d("l_quantity", "decimal(18,6)")).alias("sx"),
        F.sum(d("l_extendedprice", "decimal(18,6)")).alias("sy"),
        F.sum((F.col("l_quantity") * F.col("l_extendedprice")).cast("decimal(24,6)")).alias("sxy"),
        F.sum((F.col("l_quantity") * F.col("l_quantity")).cast("decimal(24,6)")).alias("sxx"),
        F.sum((F.col("l_extendedprice") * F.col("l_extendedprice")).cast("decimal(30,4)")).alias("syy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (F.col(c).cast("double") for c in ("sxy", "sxx", "syy"))
    corr = (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return s.select("l_returnflag", "n", F.round(corr, 6).alias("corr_qty_price"))


@q(
    "agg_bitmap_distinct",
    """WITH bits AS (
         SELECT l_returnflag,
                l_suppkey // 63 AS word_idx,
                bit_or((1::BIGINT << (l_suppkey % 63)::INT)::BIGINT) AS word
         FROM lineitem GROUP BY l_returnflag, word_idx
       )
       SELECT l_returnflag,
              sum(bit_count(word))::BIGINT AS n_distinct_supp,
              count(*) AS n_words
       FROM bits GROUP BY l_returnflag""",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-index distinct counting: suppkeys bucket into 63-bit words
    (word = key/63, bit = key%63 — 63 not 64 because DuckDB range-checks
    1<<63 as signed overflow while Spark wraps; one bit of density is the
    price of a portable oracle), per-group words merge with BIT_OR, and
    popcount sums give the EXACT distinct count — the roaring-bitmap
    pattern OLAP engines use when count_distinct must be both exact and
    mergeable (HLL is mergeable but approximate; count_distinct is exact
    but not partial-aggregable without a full shuffle of keys). Shuffle
    volume is one word per (group, key/64) — for dense key spaces that is
    ~63× smaller than shipping the keys. Verified against the direct
    count_distinct in tests."""
    li = load_table(spark, sf_dir, "lineitem")
    # SQL-form shiftleft: the Python helper only takes a literal shift count
    word = F.bit_or(F.expr("shiftleft(1L, cast(l_suppkey % 63 AS INT))"))
    bits = li.groupBy(
        "l_returnflag", (F.col("l_suppkey") / 63).cast("long").alias("word_idx")
    ).agg(word.alias("word"))
    return bits.groupBy("l_returnflag").agg(
        F.sum(F.bit_count("word")).cast("long").alias("n_distinct_supp"),
        F.count(F.lit(1)).alias("n_words"),
    )


@q(
    "agg_boolean",
    """SELECT o_orderpriority,
              bool_and(o_totalprice > 1000)  AS all_over_1k,
              bool_or(o_totalprice > 400000) AS any_over_400k,
              count_if(o_orderstatus = 'F')::BIGINT AS n_finished
       FROM orders GROUP BY o_orderpriority""",
)
def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate family — bool_and / bool_or / count_if per group.
    All three are algebraic (partial-merge is AND/OR/sum), so they ride
    the same two-phase hash aggregation as sum/count at any scale."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
    )


@q(
    "agg_gini_lorenz",
    """WITH per_cust AS (
         SELECT o_custkey, sum((floor(o_totalprice * 100))::BIGINT)::BIGINT
                  AS cents
         FROM orders GROUP BY o_custkey),
       vals AS (
         SELECT cents, count(*)::BIGINT AS c
         FROM per_cust GROUP BY cents),
       cum AS (
         SELECT cents, c,
                sum(c) OVER w::BIGINT AS cum_n,
                sum(cents * c) OVER w::BIGINT AS cum_cents,
                sum(c) OVER ()::BIGINT AS n,
                sum(cents * c) OVER ()::BIGINT AS total
         FROM vals
         WINDOW w AS (ORDER BY cents
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       gini_terms AS (
         -- value-grain Gini: sum over customers of (2·rank − n − 1)·x
         -- with tie blocks using their average rank (exact: the block's
         -- ranks are consecutive, so the sum telescopes to c·(2·mid −
         -- n − 1)·cents with 2·mid = 2·cum_n − c + 1 — all integers
         -- when doubled)
         SELECT sum(cents * c * (2 * cum_n - c - n))::BIGINT AS g_num,
                max(n) AS n, max(total) AS total
         FROM cum),
       deciles AS (
         SELECT ((cum_n * 10 - 1) // n)::BIGINT AS decile,
                max(cum_cents)::BIGINT AS cum_cents_at,
                max(total)::BIGINT AS total
         FROM cum GROUP BY ((cum_n * 10 - 1) // n)::BIGINT)
       SELECT d.decile + 1 AS decile,
              round(d.cum_cents_at::DOUBLE * 100.0 / d.total, 6)
                AS cum_revenue_pct,
              round(g.g_num::DOUBLE / (g.n::DOUBLE * g.total), 6) AS gini
       FROM deciles d CROSS JOIN gini_terms g
       ORDER BY decile""",
)
def agg_gini_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration profile: the Lorenz curve (cumulative
    revenue share at each customer decile) plus the Gini coefficient —
    the canonical inequality pair next to ``agg_hhi_concentration``'s
    market-share form. Gini uses the tie-aware rank identity
    Σc·x·(2·cum_n − c − n)/(n·total): tie blocks enter at their average
    rank via a telescoped EXACT integer numerator (no per-row rank, no
    float sums), and the Lorenz points read off the same value-grain
    cumulative frame. Shape: customer rollup (the data-sized pass) →
    distinct-revenue-value frame with DISTRIBUTED cumulative sums
    (operators/ranks.py partitioned_prefix_sums: range slices cumsum in
    parallel; the serial prefix pass sees one row per partition) →
    10-row report. The value grain is ~|customers| (continuous revenues
    rarely collide), so a global Window.orderBy here would be the serial
    trap; with the rank-map shape no single task ever holds more than
    one range slice at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    vals = per_cust.groupBy("cents").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    totals = vals.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("cents") * F.col("c")).cast("long").alias("total"),
    )
    cum = (
        partitioned_prefix_sums(
            vals,
            [F.col("cents")],
            {"cum_n": F.col("c"), "cum_cents": F.col("cents") * F.col("c")},
        )
        .withColumn("cum_n", F.col("cum_n").cast("long"))
        .withColumn("cum_cents", F.col("cum_cents").cast("long"))
        .crossJoin(F.broadcast(totals))
    )
    gini_terms = cum.agg(
        F.sum(
            F.col("cents")
            * F.col("c")
            * (2 * F.col("cum_n") - F.col("c") - F.col("n"))
        )
        .cast("long")
        .alias("g_num"),
        F.max("n").alias("n"),
        F.max("total").alias("total"),
    )
    deciles = (
        cum.groupBy(
            ((F.col("cum_n") * 10 - 1) / F.col("n"))
            .cast("long")
            .alias("decile")
        )
        .agg(
            F.max("cum_cents").cast("long").alias("cum_cents_at"),
            F.max("total").cast("long").alias("total"),
        )
    )
    return (
        deciles.crossJoin(F.broadcast(gini_terms).withColumnRenamed("total", "g_total"))
        .select(
            (F.col("decile") + 1).alias("decile"),
            F.round(
                F.col("cum_cents_at").cast("double") * 100.0 / F.col("total"),
                6,
            ).alias("cum_revenue_pct"),
            F.round(
                F.col("g_num").cast("double")
                / (F.col("n").cast("double") * F.col("g_total")),
                6,
            ).alias("gini"),
        )
        .orderBy("decile")
    )
