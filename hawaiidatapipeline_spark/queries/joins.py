"""Joins (SURVEY.md §2.C).

SoQL is single-dataset — the reference joined datasets client-side in Ruby
(hash-index over row arrays). Here every join is declarative and Catalyst
picks the physical strategy; we force the choices that matter at 100 TB:

- dims (region/nation/supplier, band tables) are explicitly ``broadcast()`` —
  no shuffle of the fact side;
- fact-fact joins shuffle on the join key (sort-merge; AQE converts to
  broadcast/skew-split at runtime when stats allow);
- the as-of join is the union-then-window pattern: O(n log n) single shuffle,
  no pairwise join explosion (the naive join-then-filter is quadratic per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()


@q(
    "join_inner_broadcast",
    """SELECT c_custkey, c_name, n_name, r_name
       FROM customer
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey""",
)
def join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema enrichment: both dims broadcast → zero fact shuffles."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@q(
    "join_inner_sortmerge",
    """SELECT l_orderkey, l_linenumber, o_orderdate,
              round(l_extendedprice * (1 - l_discount), 6) AS net_price
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE o_totalprice > 150000.0""",
)
def join_inner_sortmerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi-join: shuffle both sides on the key (sort-merge). The
    orders filter is pushed below the join so the shuffled build side shrinks."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000.0)
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        "o_orderdate",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("net_price"),
    )


@q(
    "join_left_outer",
    """SELECT c_custkey, o_orderkey, o_totalprice
       FROM customer LEFT JOIN orders ON c_custkey = o_custkey""",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "o_orderkey", "o_totalprice"
    )


@q(
    "join_right_outer",
    """SELECT c_custkey, o_orderkey, o_totalprice
       FROM orders RIGHT JOIN customer ON c_custkey = o_custkey""",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return o.join(c, c.c_custkey == o.o_custkey, "right").select(
        "c_custkey", "o_orderkey", "o_totalprice"
    )


@q(
    "join_full_outer",
    """SELECT a.c_custkey AS rich_key, b.o_custkey AS big_spender_key
       FROM (SELECT c_custkey FROM customer WHERE c_acctbal > 8000.0) a
       FULL OUTER JOIN (SELECT DISTINCT o_custkey FROM orders
                        WHERE o_totalprice > 250000.0) b
       ON a.c_custkey = b.o_custkey""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 8000.0)
        .select("c_custkey")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 250000.0)
        .select("o_custkey")
        .distinct()
    )
    return c.join(o, c.c_custkey == o.o_custkey, "full").select(
        F.col("c_custkey").alias("rich_key"), F.col("o_custkey").alias("big_spender_key")
    )


@q(
    "join_left_semi",
    """SELECT c_custkey, c_name FROM customer
       WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0)""",
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence filter — semi-join never duplicates the left side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@q(
    "join_left_anti",
    """SELECT c_custkey, c_name FROM customer
       WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 250000.0)""",
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-existence (customers with no high-value order)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@q(
    "join_cross",
    """SELECT r_name, n_name FROM region CROSS JOIN nation""",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian — only ever sane on tiny dims (5 × 25 here)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


_BANDS = [(0, 0.0, 20000.0), (1, 20000.0, 40000.0), (2, 40000.0, 60000.0), (3, 60000.0, 120000.0)]
_BANDS_SQL = "(VALUES " + ", ".join(f"({b}, {lo}, {hi})" for b, lo, hi in _BANDS) + ") AS bands(band_id, lo, hi)"


@q(
    "join_theta_range",
    f"""SELECT band_id, count(*) AS n_items, round(sum(l_extendedprice), 6) AS band_value
        FROM lineitem JOIN {_BANDS_SQL}
        ON l_extendedprice >= lo AND l_extendedprice < hi
        GROUP BY band_id""",
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi band join → broadcast nested-loop over the (tiny) band table;
    the fact side streams through without a shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    bands = F.broadcast(spark.createDataFrame(_BANDS, "band_id int, lo double, hi double"))
    return (
        li.join(
            bands,
            (F.col("l_extendedprice") >= F.col("lo")) & (F.col("l_extendedprice") < F.col("hi")),
        )
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 6).alias("band_value"),
        )
    )


@q(
    "join_bloom_prefilter",
    """SELECT o_orderpriority,
              count(*) AS n_items,
              round(sum(l_extendedprice), 2) AS total_price
       FROM lineitem JOIN (
         SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 450000
       ) big ON l_orderkey = big.o_orderkey
       GROUP BY o_orderpriority""",
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit bloom runtime filter (operators/sketches.py): a bloom over
    the selective dim's keys prunes fact rows with a pure-codegen predicate
    BEFORE the join shuffle — the user-controlled form of engine-injected
    bloom runtime filters. False positives only, so the result equals the
    plain join (the oracle)."""
    from hawaiidatapipeline_spark.operators.sketches import bloom_prefilter_join

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    big = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000)
        .select("o_orderkey", "o_orderpriority")
    )
    return (
        bloom_prefilter_join(li, big, "l_orderkey", "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
    )


@q(
    "join_salted_skew",
    """SELECT o_orderpriority,
              count(*) AS n_items,
              round(sum(l_extendedprice), 2) AS total_price
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       GROUP BY o_orderpriority""",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resilient fact⋈dim join (operators/skew.py salted_join): the
    fact side is salted, the dim replicated per salt, so one hot orderkey
    spreads over n_salts reducers instead of stalling a single task — the
    companion of agg_salted_skew for the skewed JOIN key regime AQE's
    sort-merge splitting doesn't cover (e.g. broadcast-ineligible dims).
    Result is identical to the unsalted join, so the oracle is the plain
    SQL join."""
    from hawaiidatapipeline_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    return (
        salted_join(li, o, "l_orderkey", n_salts=8)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
    )


@q(
    "join_asof",
    """SELECT p.event_id AS purchase_id, p.user_id,
              c.event_id AS last_click_id
       FROM (SELECT * FROM events WHERE event_type = 'purchase') p
       ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
       ON p.user_id = c.user_id AND p.ts >= c.ts""",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the user's latest click at-or-before it.

    Scalable pattern (no pairwise explosion): union both sides tagged, one
    window sorted by (user, ts) carrying the last-seen click id forward
    (``last(..., ignorenulls)`` over an unbounded-preceding ROWS frame), then
    keep the purchase rows. One shuffle on user_id, O(n log n) — survives
    100 TB where join-then-filter-latest is quadratic per key. Clicks sort
    before purchases at equal ts (tag order) → inclusive at-or-before.
    """
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"), F.lit(0).alias("tag")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id"), F.lit(1).alias("tag")
    )
    merged = clicks.select(
        "user_id", "ts", "tag", "click_id", F.lit(None).cast("long").alias("purchase_id")
    ).unionByName(
        purchases.select(
            "user_id", "ts", "tag", F.lit(None).cast("long").alias("click_id"), "purchase_id"
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn("last_click_id", F.last("click_id", ignorenulls=True).over(w))
        .filter(F.col("tag") == 1)
        .select(
            F.col("purchase_id"),
            "user_id",
            F.col("last_click_id").alias("last_click_id"),
        )
    )
