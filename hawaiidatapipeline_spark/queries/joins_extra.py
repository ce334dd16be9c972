"""Large-to-large non-equi joins, re-expressed as shuffled equi-joins.

queries/joins.py covers the broadcast-able range join (tiny band table).
This module covers the case broadcast can't touch: BOTH sides big — the
classic time-interval join — via bucket binning (operators/bucketing.py
``interval_join_binned``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.bucketing import interval_join_binned
from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()


@q(
    "join_interval_binned",
    """WITH iv AS (
         SELECT event_id AS interval_id, user_id,
                ts AS start_ts, ts + INTERVAL 30 MINUTE AS end_ts
         FROM events WHERE event_id % 10 = 0
       )
       SELECT iv.interval_id, count(*) AS n_events,
              round(sum(e.value::DECIMAL(18,6))::DOUBLE, 6) AS window_value
       FROM iv JOIN events e
         ON e.user_id = iv.user_id
        AND e.ts >= iv.start_ts AND e.ts < iv.end_ts
       GROUP BY iv.interval_id""",
)
def join_interval_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-interval event rollup where BOTH sides are fact-sized: every
    10th event opens a 30-minute window; count/sum the same user's events
    inside it. Executed as an equi-join on (user_id, time-bucket) — a
    plain shuffled hash join (no broadcast-nested-loop, no cartesian) —
    with the exact range predicate applied to candidates in-stage. The
    bin width (1800 s) equals the max interval length, so each interval
    lands in ≤2 buckets and each candidate pair meets exactly once."""
    e = load_table(spark, sf_dir, "events")
    intervals = e.filter(F.col("event_id") % 10 == 0).select(
        F.col("event_id").alias("interval_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end_ts"),
    )
    points = e.select("user_id", "ts", "value")
    joined = interval_join_binned(
        points, intervals, on="user_id", ts_col="ts", bin_seconds=1800
    )
    return joined.groupBy("interval_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        # decimal sum: exact/associative, so partition order can't move the
        # 6th digit (SURVEY.md §7 risk 1 flake class)
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6).alias(
            "window_value"
        ),
    )
