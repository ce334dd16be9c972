"""Time-series / streaming batch twins (SURVEY.md §2.I).

The reference had no streaming — its analog was repeated polling of
timestamped datasets. Strategy per SURVEY.md: every stateful streaming
operator is implemented ONCE as a batch-checkable computation (exact DuckDB
oracle here), and the streaming/ package wraps the same logic as a Structured
Streaming query whose micro-batch output must equal the batch twin on a
closed input (verified by our pytest suite, not the driver hash).

Window alignment: Spark's ``window()``/``session_window()`` buckets are
epoch-aligned in UTC, matching DuckDB ``time_bucket``/``date_trunc``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()


@q(
    "stream_tumbling",
    """SELECT date_trunc('hour', ts) AS win_start,
              user_id,
              count(*)              AS n_events,
              round(sum(value), 6) AS total_value
       FROM events GROUP BY 1, 2""",
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window per user. Streaming twin: identical groupBy
    over readStream + watermark (streaming/jobs.py)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(F.col("win.start").alias("win_start"), "user_id", "n_events", "total_value")
    )


@q(
    "stream_sliding",
    """SELECT time_bucket(INTERVAL '15 minutes', ts) - (k.k * INTERVAL '15 minutes') AS win_start,
              count(*)             AS n_events,
              round(sum(value), 6) AS total_value
       FROM events, (SELECT unnest(range(4)) AS k) k
       GROUP BY 1""",
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1-hour span, 15-minute slide — each event lands in 4
    windows. Oracle replicates each row into its 4 windows explicitly."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(F.col("win.start").alias("win_start"), "n_events", "total_value")
    )


@q(
    "stream_session",
    """WITH marked AS (
         SELECT user_id, ts, value,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                     THEN 1 ELSE 0 END AS is_new
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts)
       ),
       sess AS (
         SELECT user_id, ts, value,
                sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
         FROM marked
       )
       SELECT user_id,
              min(ts)                          AS session_start,
              max(ts) + INTERVAL '30 minutes'  AS session_end,
              count(*)                         AS n_events,
              round(sum(value), 6)             AS session_value
       FROM sess GROUP BY user_id, sid""",
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows: per-user sessions split on >30-min inactivity.
    Spark ``session_window`` MERGES an event exactly gap-after its
    predecessor (verified in tests/test_relational_edges.py), so the
    gaps-and-islands oracle splits strictly on ``> gap``; session end =
    last event + gap (SURVEY.md §7 risk 3)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


@q(
    "stream_dedup",
    """SELECT user_id, event_type, event_id, ts
       FROM (SELECT user_id, event_type, event_id, ts,
                    row_number() OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts, event_id) AS rn
             FROM events)
       WHERE rn = 1""",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup on (user_id, event_type) — the deterministic batch
    twin of ``withWatermark(...).dropDuplicates(...)`` (which keeps the first
    *arrival*; in the batch twin, first = earliest event time)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
    )
