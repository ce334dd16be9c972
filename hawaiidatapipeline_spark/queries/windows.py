"""Window functions (SURVEY.md §2.E).

No SoQL equivalent — the reference computed running totals/rankings
imperatively over sorted Ruby arrays; here each family is a single window
spec: one shuffle on the partition key, one sort within partitions. At
100 TB the partition key (custkey / user_id) distributes; skewed users are
handled by AQE or pre-salting — there is never a single-partition global
window in this module except where the query is semantically global and
bounded (none here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()


@q(
    "win_ranking",
    """SELECT o_orderkey, o_custkey,
              row_number() OVER w AS rn,
              rank()       OVER w AS rnk,
              dense_rank() OVER w AS drnk
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)""",
)
def win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@q(
    "win_ntile_pct",
    """SELECT o_orderkey,
              ntile(4)       OVER w AS quartile,
              round(percent_rank() OVER w, 6) AS pct_rank,
              round(cume_dist()    OVER w, 6) AS cume
       FROM orders
       WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)""",
)
def win_ntile_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@q(
    "win_lag_lead",
    """SELECT event_id, user_id,
              lag(event_type)  OVER w AS prev_type,
              lead(event_type) OVER w AS next_type,
              round(value - lag(value) OVER w, 6) AS value_delta
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-to-event deltas per user (the reference's sorted-array idiom)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("value_delta"),
    )


@q(
    "win_running_rows",
    """SELECT event_id, user_id,
              round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_value,
              count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_so_far
       FROM events""",
)
def win_running_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative aggregate over a ROWS frame."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 6).alias("running_value"),
        F.count(F.lit(1)).over(w).alias("n_so_far"),
    )


@q(
    "win_range_frame",
    """SELECT event_id, user_id,
              round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                    RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW), 6) AS trailing_day_value
       FROM events""",
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-range frame: 24-hour trailing sum keyed on epoch microseconds.
    RANGE frames bound by *value* distance, not row count — the time-series
    idiom SoQL could not express at all."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("epoch_us"))
        .rangeBetween(-86_400_000_000, Window.currentRow)
    )
    return (
        e.withColumn("epoch_us", F.unix_micros("ts"))
        .select(
            "event_id",
            "user_id",
            F.round(F.sum("value").over(w), 6).alias("trailing_day_value"),
        )
    )


@q(
    "win_first_last",
    """SELECT event_id, user_id,
              first_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)     AS first_type,
              last_value(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS final_type
       FROM events""",
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last_value are frame-sensitive: last over the default frame is
    just the current row, so the full-partition frame is spelled explicitly."""
    e = load_table(spark, sf_dir, "events")
    w_first = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_full = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "event_id",
        "user_id",
        F.first("event_type").over(w_first).alias("first_type"),
        F.last("event_type").over(w_full).alias("final_type"),
    )


@q(
    "win_topk_per_group",
    """SELECT c_custkey, o_orderkey, o_totalprice
       FROM (SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
                    row_number() OVER (PARTITION BY o_custkey
                                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
             FROM orders)
       WHERE rn <= 3""",
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — rank-then-filter; Spark pushes a per-group
    limit into the window sort (WindowGroupLimit) so no full rank materializes."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice")
    )


@q(
    "win_islands",
    """WITH seq AS (
         SELECT user_id, event_id, event_type, ts,
                row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                - row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) AS grp
         FROM events
       )
       SELECT user_id, event_type, grp AS island_key,
              count(*) AS run_length,
              min(ts) AS run_start,
              max(ts) AS run_end
       FROM seq GROUP BY user_id, event_type, grp
       HAVING count(*) >= 3""",
)
def win_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands run detection: maximal runs of the SAME event_type
    per user (the difference-of-row-numbers identity), keeping runs of ≥3 —
    e.g. 'three errors in a row' alerting. Two windows over the same
    (user_id) partitioning — Catalyst plans them in one shuffle — then a
    hash aggregate on the island key."""
    e = load_table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = e.withColumn(
        "grp", F.row_number().over(w_all) - F.row_number().over(w_type)
    )
    return (
        seq.groupBy("user_id", "event_type", F.col("grp").alias("island_key"))
        .agg(
            F.count(F.lit(1)).alias("run_length"),
            F.min("ts").alias("run_start"),
            F.max("ts").alias("run_end"),
        )
        .filter(F.col("run_length") >= 3)
    )


@q(
    "win_distribution",
    """SELECT o_orderkey, o_orderpriority,
              round(percent_rank() OVER w, 6) AS pct_rank,
              round(cume_dist() OVER w, 6) AS cume,
              nth_value(o_orderkey, 3) OVER (
                PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
              ) AS third_cheapest_key
       FROM orders
       WHERE o_orderkey < 2000
       WINDOW w AS (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice, o_orderkey)""",
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — percent_rank, cume_dist, and an
    unbounded-frame nth_value — completing the ranking-family surface.
    Total order (price, key) makes every rank deterministic; the ratios
    are exact small-integer divisions, identical IEEE on both engines
    (round 6 defensively). Same single window shuffle as win_ranking."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.nth_value("o_orderkey", 3).over(w_full).alias("third_cheapest_key"),
    )


@q(
    "win_range_time_interval",
    """SELECT event_id, user_id, ts,
              count(*) OVER w AS n_events_1h,
              round(sum(value) OVER w, 6) AS sum_value_1h
       FROM events
       WHERE user_id < 50
       WINDOW w AS (PARTITION BY user_id ORDER BY ts
                    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""",
)
def win_range_time_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: per user, every event sees the count/sum
    of its trailing hour INCLUSIVE of equal timestamps (RANGE, not ROWS —
    peers share a frame, so the result is deterministic under timestamp
    ties without a tiebreak column). Spark expresses interval ranges as a
    numeric rangeBetween over epoch seconds — same one window shuffle on
    user_id as any frame; at scale this is the sensor/telemetry rolling
    aggregate."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3600, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_events_1h"),
        F.round(F.sum("value").over(w), 6).alias("sum_value_1h"),
    )


@q(
    "win_nth_value",
    """SELECT o_custkey, o_orderkey,
              round(o_totalprice, 6) AS o_totalprice,
              nth_value(o_orderkey, 2) OVER w AS second_order,
              round(nth_value(o_totalprice, 3) OVER w, 6) AS third_price
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       ORDER BY o_custkey, o_orderkey""",
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``nth_value`` — the frame-positional window function the family
    was missing next to first/last/lag: for every order, the customer's
    2nd-ever order key and 3rd-ever order price (NULL until the frame
    has reached that depth — the growing-frame semantics that make
    nth_value different from a self-join on rank). Total order inside
    each partition via (date, orderkey) so ties cannot reorder. One
    customer-keyed window pass, same shuffle/sort as the rest of 2.E;
    identical plan at any scale."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 6).alias("o_totalprice"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
        F.round(F.nth_value("o_totalprice", 3).over(w), 6).alias(
            "third_price"
        ),
    ).orderBy("o_custkey", "o_orderkey")
