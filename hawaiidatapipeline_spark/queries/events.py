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
    "stream_topk_window",
    """WITH c AS (
         SELECT date_trunc('hour', ts) AS win_start, event_type,
                count(*) AS n_events
         FROM events GROUP BY 1, 2)
       SELECT win_start, event_type, n_events, rk
       FROM (SELECT *, rank() OVER (PARTITION BY win_start
                                    ORDER BY n_events DESC, event_type) AS rk
             FROM c)
       WHERE rk <= 3""",
)
def stream_topk_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per tumbling hour — the trending-items query.
    Streaming twin: the SAME stage-2 rank (streaming/runtime.py
    topk_per_window) over the watermarked windowed counts
    (windowed_type_counts); rank() can't run mid-stream, so the split is
    incremental-count (all the state, watermark-bounded) + sink-side
    bounded rank — the composition the 24th streaming equivalence test
    replays micro-batched."""
    from hawaiidatapipeline_spark.streaming.runtime import topk_per_window

    e = load_table(spark, sf_dir, "events")
    counts = (
        e.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n_events")
    )
    return topk_per_window(counts, k=3)


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
    "stream_interval_join",
    """SELECT p.event_id AS purchase_id, p.user_id AS user_id, p.ts AS p_ts,
              c.event_id AS click_id, c.ts AS c_ts
       FROM events p JOIN events c
         ON p.user_id = c.user_id
        AND c.ts BETWEEN p.ts - INTERVAL 30 MINUTE AND p.ts
       WHERE p.event_type = 'purchase' AND c.event_type = 'click'""",
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded stream-stream join, batch-checked: each purchase joins
    the same user's clicks within the preceding 30 minutes. This calls THE
    SAME code path the streaming runtime runs
    (streaming/runtime.interval_stream_stream_join) — batch queries
    eliminate the watermark nodes, so one function serves both modes; the
    streaming side's micro-batch equivalence is proven separately in
    tests/test_streaming.py. Scale: an equi-join on user_id with an
    event-time band predicate — Spark shuffles both sides on the user key
    and the band prunes within partitions; in streaming the watermark +
    band are exactly what bounds the join state store."""
    from hawaiidatapipeline_spark.streaming.runtime import (
        interval_stream_stream_join,
    )

    e = load_table(spark, sf_dir, "events")
    return interval_stream_stream_join(
        e.filter(F.col("event_type") == "purchase"),
        e.filter(F.col("event_type") == "click"),
        lookback="30 minutes",
    )


@q(
    "stream_interval_left_join",
    """SELECT p.event_id AS purchase_id, p.user_id AS user_id, p.ts AS p_ts,
              c.event_id AS click_id, c.ts AS c_ts
       FROM events p LEFT JOIN events c
         ON p.user_id = c.user_id
        AND c.ts BETWEEN p.ts - INTERVAL 30 MINUTE AND p.ts
        AND c.event_type = 'click'
       WHERE p.event_type = 'purchase'""",
)
def stream_interval_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER variant of stream_interval_join: purchases with no click
    in the lookback survive with NULL click columns — the attribution
    shape where unconverted rows matter as much as converted ones. Calls
    the SAME interval_stream_stream_left_join the streaming runtime runs;
    in streaming the NULL rows emit only once the watermark proves no
    match can arrive (state-eviction contract, proven in
    tests/test_streaming.py), in batch they emit directly."""
    from hawaiidatapipeline_spark.streaming.runtime import (
        interval_stream_stream_left_join,
    )

    e = load_table(spark, sf_dir, "events")
    return interval_stream_stream_left_join(
        e.filter(F.col("event_type") == "purchase"),
        e.filter(F.col("event_type") == "click"),
        lookback="30 minutes",
    )


@q(
    "stream_static_enrich",
    """SELECT coalesce(c.c_mktsegment, 'UNMATCHED') AS segment,
              e.event_type,
              count(*)::BIGINT AS n_events,
              sum(round(e.value * 100)::BIGINT)::BIGINT AS value_cents
       FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
       GROUP BY 1, 2""",
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join, batch-checked: events LEFT-joined to
    the broadcast customer dim, rolled up per (segment, event_type) in
    exact integer cents. Calls THE SAME ``stream_static_join`` the
    streaming runtime runs per micro-batch (the static side re-broadcasts
    each batch, no state); the streaming equivalence of the identical
    rollup is proven in tests/test_streaming.py. Unmatched users keep
    their rows with segment 'UNMATCHED' — the left-outer contract the
    enrichment pattern needs. Scale: broadcast hash join (dim-sized
    build), stream side never shuffles for the join; the rollup is a
    bounded segment×type grain."""
    from hawaiidatapipeline_spark.streaming.runtime import stream_static_join

    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    return (
        stream_static_join(e, c)
        .groupBy(
            F.coalesce("c_mktsegment", F.lit("UNMATCHED")).alias("segment"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("value_cents"),
        )
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


@q(
    "ts_resample",
    """WITH spans AS (
         SELECT user_id,
                date_trunc('hour', min(ts)) AS lo,
                date_trunc('hour', max(ts)) AS hi
         FROM events GROUP BY user_id
       ),
       grid AS (
         SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
         FROM spans
       ),
       actual AS (
         SELECT user_id, date_trunc('hour', ts) AS bucket,
                count(*) AS n_events, round(sum(value), 6) AS total_value
         FROM events GROUP BY 1, 2
       )
       SELECT g.user_id, g.bucket,
              coalesce(a.n_events, 0) AS n_events,
              coalesce(a.total_value, 0.0) AS total_value
       FROM grid g LEFT JOIN actual a
         ON g.user_id = a.user_id AND g.bucket = a.bucket""",
)
def ts_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap fill: a dense hourly grid per user
    (sequence + explode over each user's [min, max] span) left-joined to the
    actual hourly aggregate; empty buckets become explicit zero rows —
    the shape chart/forecast consumers need. Scale: the grid is generated
    from the per-user span aggregate (tiny), the join shuffles on
    (user, bucket) — linear; grid size is bounded by span × resolution,
    never by event count."""
    e = load_table(spark, sf_dir, "events")
    spans = e.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = spans.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("bucket"),
    )
    actual = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )
    return grid.join(actual, ["user_id", "bucket"], "left").select(
        "user_id",
        "bucket",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
    )


@q(
    "ts_fill_forward",
    """WITH masked AS (
         SELECT event_id, user_id, ts,
                CASE WHEN event_type <> 'error' THEN round(value, 6) END AS v
         FROM events
       )
       SELECT event_id, user_id, v AS value_raw,
              last_value(v IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
       FROM masked""",
)
def ts_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill interpolation: error events mask their reading to NULL
    (deterministic stand-in for sensor dropout); the fill carries the last
    non-null value per user in (ts, event_id) order. One window shuffle on
    user_id; per-key state is a single value regardless of history length."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    v = F.when(F.col("event_type") != "error", F.round("value", 6))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        v.alias("value_raw"),
        F.last(v, ignorenulls=True).over(w).alias("value_filled"),
    )


@q(
    "ts_interpolate_linear",
    """WITH masked AS (
         SELECT event_id, user_id, ts, epoch_us(ts) AS us,
                CASE WHEN event_type <> 'error' THEN round(value, 6) END AS v
         FROM events
       ),
       ctx AS (
         SELECT event_id, user_id, us, v,
                last_value(v IGNORE NULLS) OVER w_prev AS prev_v,
                last_value(CASE WHEN v IS NOT NULL THEN us END IGNORE NULLS)
                  OVER w_prev AS prev_us,
                first_value(v IGNORE NULLS) OVER w_next AS next_v,
                first_value(CASE WHEN v IS NOT NULL THEN us END IGNORE NULLS)
                  OVER w_next AS next_us
         FROM masked
         WINDOW
           w_prev AS (PARTITION BY user_id ORDER BY us, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w_next AS (PARTITION BY user_id ORDER BY us, event_id
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
       )
       SELECT event_id, user_id, v AS value_raw,
              round(CASE
                WHEN v IS NOT NULL THEN v
                WHEN prev_v IS NULL OR next_v IS NULL THEN NULL
                WHEN next_us = prev_us THEN prev_v
                ELSE prev_v + (next_v - prev_v)
                     * ((us - prev_us)::DOUBLE / (next_us - prev_us))
              END, 6) AS value_interp
       FROM ctx""",
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of masked readings — the fill for continuous
    sensors where forward-fill (``ts_fill_forward``) would step. Each NULL
    takes prev + (next−prev)·Δt-fraction from the nearest non-null
    neighbors per user; boundary NULLs (no neighbor on one side) stay
    NULL. Two mirror-image window passes on the same (user_id) shuffle —
    per-key state is one value+timestamp per direction regardless of gap
    length, so an arbitrarily long dropout costs nothing extra. The time
    fraction is computed on integer epoch-µs, and prev/next are exact
    row values, so the single final float expression is identical IEEE
    on both engines (round 6)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    v = F.when(F.col("event_type") != "error", F.round("value", 6))
    base = e.select("event_id", "user_id", us.alias("us"), v.alias("v"))
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    vus = F.when(F.col("v").isNotNull(), F.col("us"))
    ctx = base.select(
        "event_id",
        "user_id",
        "us",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("prev_v"),
        F.last(vus, ignorenulls=True).over(w_prev).alias("prev_us"),
        F.first("v", ignorenulls=True).over(w_next).alias("next_v"),
        F.first(vus, ignorenulls=True).over(w_next).alias("next_us"),
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("prev_v").isNull() | F.col("next_v").isNull(), F.lit(None))
        .when(F.col("next_us") == F.col("prev_us"), F.col("prev_v"))
        .otherwise(
            F.col("prev_v")
            + (F.col("next_v") - F.col("prev_v"))
            * (
                (F.col("us") - F.col("prev_us")).cast("double")
                / (F.col("next_us") - F.col("prev_us"))
            )
        )
    )
    return ctx.select(
        "event_id",
        "user_id",
        F.col("v").alias("value_raw"),
        F.round(interp, 6).alias("value_interp"),
    )


@q(
    "events_user_lifecycle",
    """WITH active AS (
         SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS week_start
         FROM events
       ),
       marked AS (
         SELECT user_id, week_start,
                lag(week_start) OVER (PARTITION BY user_id ORDER BY week_start)
                  AS prev_week
         FROM active
       ),
       status AS (
         SELECT week_start,
                CASE WHEN prev_week IS NULL THEN 'new'
                     WHEN week_start - prev_week = 7 THEN 'retained'
                     ELSE 'resurrected' END AS status,
                user_id
         FROM marked
       )
       SELECT week_start, status, count(*) AS n_users
       FROM status GROUP BY week_start, status""",
)
def events_user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly user-lifecycle classification (new / retained / resurrected)
    — the growth-accounting dashboard behind every activity metric. One
    distinct on (user, week), one lag window on the same user shuffle,
    then a small week×status aggregate; 'churned' is the complement
    (absent this week, active last) and derivable by shifting the same
    lag. Weeks are Monday-aligned ``date_trunc`` on both engines."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    active = e.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("week_start")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("week_start")
    marked = active.withColumn("prev_week", F.lag("week_start").over(w))
    status = (
        F.when(F.col("prev_week").isNull(), "new")
        .when(F.datediff("week_start", "prev_week") == 7, "retained")
        .otherwise("resurrected")
    )
    return (
        marked.select("week_start", status.alias("status"), "user_id")
        .groupBy("week_start", "status")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@q(
    "events_transition_matrix",
    """WITH seq AS (
         SELECT user_id, event_type,
                lag(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS prev_type
         FROM events
       )
       SELECT prev_type AS from_type, event_type AS to_type, count(*) AS n
       FROM seq WHERE prev_type IS NOT NULL
       GROUP BY from_type, to_type""",
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (Markov/funnel diagnostics): per user,
    each consecutive event pair under the deterministic (ts, event_id)
    order contributes one (from→to) edge. One window shuffle on user_id
    then a small (|types|² ≤ 25-row) aggregate — the per-user sequence
    never leaves its partition."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.withColumn("prev_type", F.lag("event_type").over(w))
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@q(
    "events_markov_next_accuracy",
    """WITH seq AS (
         SELECT user_id, event_type,
                lag(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS prev_type
         FROM events),
       trans AS (
         SELECT prev_type AS from_type, event_type AS to_type,
                count(*)::BIGINT AS n
         FROM seq WHERE prev_type IS NOT NULL
         GROUP BY 1, 2),
       best AS (
         SELECT from_type, to_type AS predicted_next, n AS n_correct
         FROM (SELECT *, row_number() OVER (PARTITION BY from_type
                          ORDER BY n DESC, to_type) AS rn
               FROM trans) t
         WHERE rn = 1),
       tot AS (SELECT from_type, sum(n)::BIGINT AS n_transitions
               FROM trans GROUP BY from_type)
       SELECT t.from_type AS event_type, b.predicted_next,
              t.n_transitions, b.n_correct,
              round(b.n_correct::DOUBLE / t.n_transitions, 6) AS hit_rate
       FROM tot t JOIN best b ON t.from_type = b.from_type
       ORDER BY event_type""",
)
def events_markov_next_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority-class next-event baseline: for each current event type,
    predict the most frequent successor (from the same transition counts
    ``events_transition_matrix`` emits, deterministic (count DESC, type)
    tie-break) and score its hit rate — the floor any sequence model must
    beat before it earns its training cost, and the companion number to
    ``events_markov_stationary``. Accuracy is a ratio of exact counts.
    One user_id window shuffle; everything after runs on the ≤ |types|²
    transition table."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.withColumn("prev_type", F.lag("event_type").over(w))
    trans = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wb = Window.partitionBy("from_type").orderBy(F.col("n").desc(), "to_type")
    best = (
        trans.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select(
            "from_type",
            F.col("to_type").alias("predicted_next"),
            F.col("n").alias("n_correct"),
        )
    )
    tot = trans.groupBy("from_type").agg(
        F.sum("n").cast("long").alias("n_transitions")
    )
    return (
        tot.join(best, "from_type")
        .select(
            F.col("from_type").alias("event_type"),
            "predicted_next",
            "n_transitions",
            "n_correct",
            F.round(
                F.col("n_correct").cast("double") / F.col("n_transitions"), 6
            ).alias("hit_rate"),
        )
        .orderBy("event_type")
    )


@q(
    "stream_late_audit",
    """WITH arr AS (
         SELECT event_type, ts, user_id, event_id,
                event_id + (event_id * 2654435761) % 4294967296 % 101 - 50
                  AS arrival_seq
         FROM events),
       wm AS (
         SELECT event_type, ts,
                max(ts) OVER (PARTITION BY user_id
                              ORDER BY arrival_seq, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS prev_max
         FROM arr),
       cls AS (
         SELECT event_type,
                CASE WHEN prev_max IS NULL
                       OR ts >= prev_max - INTERVAL 30 MINUTE
                     THEN 'on_time'
                     WHEN ts >= prev_max - INTERVAL 30 MINUTE
                                         - INTERVAL 60 MINUTE
                     THEN 'late_accepted'
                     ELSE 'late_dropped' END AS late_class
         FROM wm)
       SELECT event_type,
              count(*)::BIGINT AS n_total,
              sum(CASE WHEN late_class = 'on_time' THEN 1 ELSE 0 END)::BIGINT
                AS n_on_time,
              sum(CASE WHEN late_class = 'late_accepted' THEN 1 ELSE 0 END)::BIGINT
                AS n_late_accepted,
              sum(CASE WHEN late_class = 'late_dropped' THEN 1 ELSE 0 END)::BIGINT
                AS n_late_dropped
       FROM cls GROUP BY 1 ORDER BY 1""",
)
def stream_late_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the late-data audit side sink (SURVEY §2.I "Late-data
    audit" — the last D-only streaming row, now E-checked): every event is
    classified against the per-user watermark its OWN arrival saw — the
    running max event time over strictly-earlier arrivals minus a
    30-minute threshold — into on_time / late_accepted (within a
    60-minute grace behind the watermark) / late_dropped, rolled up per
    event_type. The fixture's events land in event-time order (event_id
    is ts-monotone), which would make every row trivially on-time, so the
    twin replays them through a DETERMINISTIC bounded reorder — arrival
    sequence = event_id + (Knuth-hash(event_id) mod 101) − 50, a ±50-slot
    network-style jitter — which exercises all three verdicts at every
    SF. Calls THE SAME classify_late the streaming runtime's
    run_late_audit_sink routes with; because the verdict depends only on
    the arrival prefix, the micro-batched replay equals this batch result
    on any in-order split (equivalence test #31, tests/test_streaming.py).
    Scale: the jitter is a map-side expression; one per-user ordered
    window (per-key event counts bound the partition) + a bounded
    event_type rollup; the streaming side carries one max-ts row per key
    as state."""
    from hawaiidatapipeline_spark.streaming.runtime import classify_late

    e = load_table(spark, sf_dir, "events").withColumn(
        "arrival_seq",
        F.col("event_id")
        + (F.col("event_id") * F.lit(2654435761)) % F.lit(4294967296) % 101
        - 50,
    )
    cls = classify_late(
        e,
        threshold="30 minutes",
        grace="60 minutes",
        order_col=("arrival_seq", "event_id"),
    )
    return (
        cls.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.sum(F.when(F.col("late_class") == "on_time", 1).otherwise(0))
            .cast("long")
            .alias("n_on_time"),
            F.sum(F.when(F.col("late_class") == "late_accepted", 1).otherwise(0))
            .cast("long")
            .alias("n_late_accepted"),
            F.sum(F.when(F.col("late_class") == "late_dropped", 1).otherwise(0))
            .cast("long")
            .alias("n_late_dropped"),
        )
        .orderBy("event_type")
    )
