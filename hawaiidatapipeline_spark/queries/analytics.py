"""Warehouse/product-analytics operators: SCD2 history construction, funnel
analysis, cohort retention. The reference's consumers did exactly this kind
of client-side munging over fetched rows (group_by/sort_by chains in Ruby);
here each is one declarative plan.

Scale notes: all three are single-shuffle window/aggregate shapes keyed on
the natural partition key (customer / user / cohort) — no pairwise joins, no
driver materialization, state per key bounded by that key's history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()


@q(
    "etl_scd2",
    """SELECT o_custkey,
              o_orderkey AS version_key,
              o_orderdate AS valid_from,
              lead(o_orderdate) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS valid_to,
              CASE WHEN lead(o_orderdate) OVER (PARTITION BY o_custkey
                                                ORDER BY o_orderdate, o_orderkey)
                   IS NULL THEN TRUE ELSE FALSE END AS is_current
       FROM orders""",
)
def etl_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) history build: each order becomes
    a version row with a [valid_from, valid_to) range per customer via
    ``lead``; the open-ended row is flagged current. One window shuffle on
    the dimension key — the standard merge shape for incremental SCD2 loads
    (at scale, union the increment with current open rows, re-window, and
    write back partitioned by is_current)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        F.col("o_orderkey").alias("version_key"),
        F.col("o_orderdate").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@q(
    "etl_merge_upsert",
    """WITH updates AS (
         SELECT o_orderkey, o_custkey, o_orderpriority,
                round(o_totalprice * 1.1, 6) AS o_totalprice,
                'UPDATED' AS merge_action
         FROM orders WHERE o_orderkey % 10 = 0 AND o_orderkey < 5000
       ),
       inserts AS (
         SELECT o_orderkey + 1000000 AS o_orderkey, o_custkey,
                o_orderpriority, round(o_totalprice, 6) AS o_totalprice,
                'INSERTED' AS merge_action
         FROM orders WHERE o_orderkey % 97 = 0 AND o_orderkey < 5000
       ),
       target AS (
         SELECT o_orderkey, o_custkey, o_orderpriority,
                round(o_totalprice, 6) AS o_totalprice,
                'KEPT' AS merge_action
         FROM orders WHERE o_orderkey < 5000
       )
       SELECT * FROM target
       WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
       UNION ALL SELECT * FROM updates
       UNION ALL SELECT * FROM inserts""",
)
def etl_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse MERGE (upsert): updates override matching target keys,
    unmatched update keys insert, untouched target rows carry through —
    the anti-join + union rewrite of ``MERGE INTO`` for plain-parquet
    targets (no Delta/Iceberg in this container; with a table format the
    same logical shape becomes its transactional MERGE). One shuffle on
    the merge key; at scale, partition the target by key range and
    rewrite only partitions containing update keys."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    base = o.select(
        "o_orderkey", "o_custkey", "o_orderpriority",
        F.round("o_totalprice", 6).alias("o_totalprice"),
    )
    target = base.withColumn("merge_action", F.lit("KEPT"))
    updates = (
        base.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_totalprice", F.round(F.col("o_totalprice") * 1.1, 6))
        .withColumn("merge_action", F.lit("UPDATED"))
    )
    inserts = (
        base.filter(F.col("o_orderkey") % 97 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + 1000000)
        .withColumn("merge_action", F.lit("INSERTED"))
    )
    merged = (
        target.join(updates.select("o_orderkey"), "o_orderkey", "left_anti")
        .unionByName(updates)
        .unionByName(inserts)
    )
    return merged


@q(
    "events_anomaly",
    """WITH w AS (
         SELECT event_id, user_id, value,
                sum(value::DECIMAL(18,6)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS trail_sum,
                count(*) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS trail_n
         FROM events
       )
       SELECT event_id, user_id,
              round(value, 6) AS value,
              round(value / (trail_sum::DOUBLE / trail_n), 6) AS ratio
       FROM w
       WHERE trail_n >= 10 AND trail_sum > 0
         AND value / (trail_sum::DOUBLE / trail_n) >= 1.5""",
)
def events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window outlier detection: flag events whose value exceeds
    1.5× the user's trailing-20 mean. The trailing sum uses DECIMAL(18,6)
    so partial-sum order cannot move the 6th digit (the cross-engine float
    discipline) and one identical IEEE division forms the ratio; stddev-
    based z-scores would differ in final ulps between engines. One window
    shuffle on user_id — linear at any scale."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    e = load_table(spark, sf_dir, "events")
    trail_sum = F.sum(F.col("value").cast("decimal(18,6)")).over(w)
    trail_n = F.count(F.lit(1)).over(w)
    ratio = F.col("value") / (trail_sum.cast("double") / trail_n)
    return (
        e.select(
            "event_id", "user_id", "ts", "value",
            trail_sum.alias("_s"), trail_n.alias("_n"),
        )
        .filter((F.col("_n") >= 10) & (F.col("_s") > 0))
        .withColumn("ratio", F.col("value") / (F.col("_s").cast("double") / F.col("_n")))
        .filter(F.col("ratio") >= 1.5)
        .select(
            "event_id", "user_id",
            F.round("value", 6).alias("value"),
            F.round("ratio", 6).alias("ratio"),
        )
    )


@q(
    "events_funnel",
    """WITH stages AS (
         SELECT user_id,
                min(CASE WHEN event_type = 'signup'   THEN ts END) AS t_signup,
                min(CASE WHEN event_type = 'click'    THEN ts END) AS t_click,
                min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
         FROM events GROUP BY user_id
       )
       SELECT count(*) AS n_users,
              count(t_signup) AS n_signup,
              count(CASE WHEN t_click > t_signup THEN 1 END) AS n_signup_then_click,
              count(CASE WHEN t_purchase > t_click AND t_click > t_signup
                         THEN 1 END) AS n_full_funnel
       FROM stages""",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users progressing signup → click → purchase, each
    stage strictly after the previous (first-occurrence semantics via
    conditional min). One partial+final aggregate over user_id — stage
    timestamps are a fixed-width accumulator per user regardless of event
    volume, so the funnel costs the same as a count at 100 TB."""
    e = load_table(spark, sf_dir, "events")

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    stages = e.groupBy("user_id").agg(
        first_ts("signup").alias("t_signup"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_signup").alias("n_signup"),
        F.count(F.when(F.col("t_click") > F.col("t_signup"), 1)).alias(
            "n_signup_then_click"
        ),
        F.count(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_signup")),
                1,
            )
        ).alias("n_full_funnel"),
    )


@q(
    "events_retention",
    """WITH firsts AS (
         SELECT user_id, min(ts::DATE) AS cohort_day
         FROM events GROUP BY user_id
       ),
       activity AS (
         SELECT DISTINCT e.user_id, f.cohort_day,
                datediff('day', f.cohort_day, e.ts::DATE) AS day_offset
         FROM events e JOIN firsts f ON e.user_id = f.user_id
       )
       SELECT cohort_day, day_offset, count(*) AS n_active_users
       FROM activity
       WHERE day_offset <= 7
       GROUP BY cohort_day, day_offset""",
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, counted on each
    subsequent active day (offset ≤ 7). The cohort map (user → first day) is
    an aggregate that joins back to events — at 100 TB both sides shuffle
    once on user_id and the distinct bounds state to user × active-day."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.to_date("ts"), F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


@q(
    "etl_snapshot_diff",
    """WITH old_snap AS (
         SELECT o_orderkey AS key, o_totalprice AS val
         FROM orders WHERE o_orderkey % 10 <> 0
       ),
       new_snap AS (
         SELECT o_orderkey AS key,
                CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 100.0
                     ELSE o_totalprice END AS val
         FROM orders WHERE o_orderkey % 7 <> 0
       )
       SELECT coalesce(o.key, n.key) AS key,
              CASE WHEN o.key IS NULL THEN 'insert'
                   WHEN n.key IS NULL THEN 'delete'
                   ELSE 'update' END AS change_type,
              round(o.val, 2) AS old_val,
              round(n.val, 2) AS new_val
       FROM old_snap o FULL OUTER JOIN new_snap n ON o.key = n.key
       WHERE o.key IS NULL OR n.key IS NULL OR o.val <> n.val""",
)
def etl_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC from full dumps: diff two table snapshots into insert / delete /
    update rows (the primitive behind incremental loads when the upstream —
    like a Socrata dataset re-published daily — exposes no change feed).

    Scale shape: one full-outer shuffle join on the key; unchanged rows
    (the overwhelming majority of a daily diff) are discarded in the same
    stage, so only the change set survives. At 100 TB, bucket both
    snapshots by key to make the diff shuffle-free, and compare
    xxhash64(all value columns) instead of the columns themselves so wide
    rows diff on one long. Snapshots here are deterministic slices of
    orders: new drops key%7==0, adds back key%10==0, bumps key%5==0."""
    o = load_table(spark, sf_dir, "orders")
    old_snap = (
        o.filter(F.col("o_orderkey") % 10 != 0)
        .select(F.col("o_orderkey").alias("key"), F.col("o_totalprice").alias("old_full"))
    )
    new_snap = (
        o.filter(F.col("o_orderkey") % 7 != 0)
        .select(
            F.col("o_orderkey").alias("key"),
            F.when(F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 100.0)
            .otherwise(F.col("o_totalprice"))
            .alias("new_full"),
        )
    )
    joined = old_snap.join(new_snap, "key", "full_outer")
    return (
        joined.filter(
            F.col("old_full").isNull()
            | F.col("new_full").isNull()
            | (F.col("old_full") != F.col("new_full"))
        )
        .select(
            "key",
            F.when(F.col("old_full").isNull(), F.lit("insert"))
            .when(F.col("new_full").isNull(), F.lit("delete"))
            .otherwise(F.lit("update"))
            .alias("change_type"),
            F.round("old_full", 2).alias("old_val"),
            F.round("new_full", 2).alias("new_val"),
        )
    )


@q(
    "etl_incremental_agg",
    """WITH base AS (
         SELECT o_orderpriority, count(*) AS n, sum(o_totalprice::DECIMAL(18,2)) AS total,
                min(o_orderdate) AS first_dt, max(o_orderdate) AS last_dt
         FROM orders WHERE o_orderkey % 10 <> 0
         GROUP BY o_orderpriority
       ),
       delta AS (
         SELECT o_orderpriority, count(*) AS n, sum(o_totalprice::DECIMAL(18,2)) AS total,
                min(o_orderdate) AS first_dt, max(o_orderdate) AS last_dt
         FROM orders WHERE o_orderkey % 10 = 0
         GROUP BY o_orderpriority
       ),
       merged AS (
         SELECT o_orderpriority, sum(n) AS n, sum(total) AS total,
                min(first_dt) AS first_dt, max(last_dt) AS last_dt
         FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
         GROUP BY o_orderpriority
       )
       SELECT o_orderpriority, n::BIGINT AS n, total::DOUBLE AS total,
              first_dt, last_dt
       FROM merged""",
)
def etl_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-aggregate maintenance: merge a delta batch's partial
    aggregates into a stored base WITHOUT recomputing history. Only
    algebraic aggregates (count/sum/min/max — and avg as sum/count) merge
    this way; the merge input is |groups| rows per side, not raw data, so
    the nightly cost at 100 TB is proportional to the delta + group
    cardinality. The query computes base partials (orderkey%10!=0),
    delta partials (the rest), merges, and the oracle verifies the merged
    result — which tests/test_incremental.py also asserts equals the
    direct full aggregate. Decimal sums: merge must be exact, float
    partial-order must not leak into the stored aggregate."""
    o = load_table(spark, sf_dir, "orders")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total"),
            F.min("o_orderdate").alias("first_dt"),
            F.max("o_orderdate").alias("last_dt"),
        )

    base = partial(o.filter(F.col("o_orderkey") % 10 != 0))
    delta = partial(o.filter(F.col("o_orderkey") % 10 == 0))
    merged = (
        base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n").alias("n"),
            F.sum("total").alias("total"),
            F.min("first_dt").alias("first_dt"),
            F.max("last_dt").alias("last_dt"),
        )
    )
    return merged.select(
        "o_orderpriority", "n", F.col("total").cast("double").alias("total"),
        "first_dt", "last_dt",
    )


@q(
    "etl_rollup_hierarchy",
    """SELECT date_trunc('month', ts)::DATE AS month, event_type,
              count(*) AS n_events,
              sum(value::DECIMAL(18,6))::DOUBLE AS total_value
       FROM events GROUP BY month, event_type""",
)
def etl_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-hierarchy maintenance (the materialized-view rollup
    pattern): monthly aggregates are built ONLY from stored daily
    partials — the raw events are scanned once for the daily tier and
    never again. The oracle aggregates raw events directly to monthly,
    so the hash check IS the proof that partial re-aggregation loses
    nothing (counts and decimal sums are algebraic). At 100 TB this is
    the daily→monthly→yearly cascade every BI layer serves: each tier's
    cost ∝ the tier below's group count, not raw data, and re-running a
    late-arriving day only touches that day's partial upward."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("total"),
    )
    monthly = daily.groupBy(
        F.date_trunc("month", "day").cast("date").alias("month"), "event_type"
    ).agg(F.sum("n").alias("n_events"), F.sum("total").alias("total"))
    return monthly.select(
        "month", "event_type", "n_events", F.col("total").cast("double").alias("total_value")
    )


@q(
    "events_bot_score",
    """WITH ts_us AS (
         SELECT user_id, epoch_us(ts)::BIGINT AS us
         FROM events),
       gaps AS (
         SELECT user_id,
                (us - lag(us) OVER (PARTITION BY user_id ORDER BY us))
                  // 1000000 AS gap_s
         FROM ts_us),
       per_user AS (
         SELECT user_id, count(*)::BIGINT AS n_gaps,
                sum(gap_s)::BIGINT AS sg,
                sum(gap_s * gap_s)::BIGINT AS sgg
         FROM gaps WHERE gap_s IS NOT NULL
         GROUP BY user_id HAVING count(*) >= 10),
       scored AS (
         SELECT user_id, n_gaps,
                round(sg::DOUBLE / n_gaps, 6) AS mean_gap_s,
                round(sqrt(greatest(n_gaps::DOUBLE * sgg - sg::DOUBLE * sg, 0))
                      / sg, 6) AS gap_cv
         FROM per_user WHERE sg > 0)
       SELECT user_id, n_gaps, mean_gap_s, gap_cv
       FROM scored
       ORDER BY gap_cv, user_id LIMIT 20""",
)
def events_bot_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot-likeness ranking by inter-arrival regularity: humans are
    bursty (coefficient of variation of gaps ≈ 1 for Poisson, higher
    with sessions); schedulers and scripts are metronomic (CV → 0).
    Per user: CV = sqrt(n·Σg² − (Σg)²)/Σg over SECOND-grain gaps (the
    grain keeps Σg² inside int64 at every benchmarked SF), minimum 10
    gaps so the statistic is meaningful; the 20 most-regular users are
    the review queue — the abuse-filter twin of ``events_rate_limit``
    (volume) and the curation guard that keeps synthetic traffic out
    of a training corpus. All sufficient statistics are exact int64;
    CV is one closed-form double. Shape: one user-keyed window for
    gaps (the sessionization shape), one user-grain partial agg, then
    TakeOrdered(20) — no global sort materializes."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("us")
    gaps = e.select(
        "user_id", F.unix_micros("ts").alias("us")
    ).select(
        "user_id",
        F.floor(
            (F.col("us") - F.lag("us").over(w)) / 1000000
        ).cast("long").alias("gap_s"),
    )
    per_user = (
        gaps.filter(F.col("gap_s").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.sum("gap_s").cast("long").alias("sg"),
            F.sum(F.col("gap_s") * F.col("gap_s")).cast("long").alias("sgg"),
        )
        .filter(F.col("n_gaps") >= 10)
        .filter(F.col("sg") > 0)
    )
    n = F.col("n_gaps").cast("double")
    sg = F.col("sg").cast("double")
    sgg = F.col("sgg").cast("double")
    return (
        per_user.select(
            "user_id",
            "n_gaps",
            F.round(sg / n, 6).alias("mean_gap_s"),
            F.round(
                F.sqrt(F.greatest(n * sgg - sg * sg, F.lit(0.0))) / sg, 6
            ).alias("gap_cv"),
        )
        .orderBy("gap_cv", "user_id")
        .limit(20)
    )


_HILL_TOPK = 30  # tail size for the Hill estimator


@q(
    "events_power_law_hill",
    f"""WITH per_user AS (
         SELECT user_id, count(*)::BIGINT AS n
         FROM events GROUP BY user_id),
       tail AS (
         SELECT n FROM (
           SELECT n, row_number() OVER (ORDER BY n DESC, user_id) AS rk
           FROM per_user) t
         WHERE rk <= {_HILL_TOPK}),
       xmin AS (SELECT min(n)::BIGINT AS x_min FROM tail),
       terms AS (
         SELECT (floor(ln(tail.n::DOUBLE / xmin.x_min) * 1000000000))::BIGINT
                  AS t_nano
         FROM tail CROSS JOIN xmin),
       s AS (SELECT count(*)::BIGINT AS k, sum(t_nano)::BIGINT AS sum_nano
             FROM terms)
       SELECT s.k AS tail_size, xmin.x_min,
              round(s.k::DOUBLE
                    / (s.sum_nano::DOUBLE / 1000000000.0), 6) AS hill_alpha
       FROM s CROSS JOIN xmin""",
)
def events_power_law_hill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the activity tail index: α = k / Σ ln(x_i/x_min)
    over the k = 30 most active users — the heavy-tail diagnostic that
    says whether user activity is power-law (α ≲ 2: a few users
    dominate — expect skew everywhere downstream) or light-tailed
    (α large: uniform partitioning is safe). The quantitative companion
    of ``events_power_users_pareto``'s share curve and the direct input
    to salting decisions (operators/skew.py). Each ln ratio is
    NANO-floored before the k-term sum. Shape: one user-grain rollup
    (the data-sized pass), TakeOrdered(k) for the tail, then constant
    arithmetic; at 100 TB the tail extraction is the standard top-k
    tree reduce."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.orderBy(F.col("n").desc(), "user_id")
    tail = (
        per_user.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _HILL_TOPK)
        .select("n")
    )
    from hawaiidatapipeline_spark.operators.materialize import materialize

    tail = materialize(tail)
    xmin = tail.agg(F.min("n").cast("long").alias("x_min"))
    terms = tail.crossJoin(F.broadcast(xmin)).select(
        F.floor(
            F.log(F.col("n").cast("double") / F.col("x_min"))
            * F.lit(1000000000.0)
        )
        .cast("long")
        .alias("t_nano")
    )
    s = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("t_nano").cast("long").alias("sum_nano"),
    )
    return s.crossJoin(F.broadcast(xmin)).select(
        F.col("k").alias("tail_size"),
        "x_min",
        F.round(
            F.col("k").cast("double")
            / (F.col("sum_nano").cast("double") / 1000000000.0),
            6,
        ).alias("hill_alpha"),
    )
