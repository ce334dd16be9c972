"""Round-9 analytics batch: drift/forecast/test statistics over the events
and orders tables (SURVEY.md §2.I time-series, §2.D aggregations, §2.L
events-analytics / data-quality / ETL families).

House determinism rules throughout: money and daily totals move in integer
CENTS (exact sums, any aggregation order), means as integer floor-division
where a scalar target is needed, floats only in final single-division
ratios rounded to 6 dp on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.ranks import partitioned_prefix_sums
from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()


# ------------------------------------------------------------- time series


@q(
    "ts_cusum_drift",
    """WITH daily AS (
         SELECT date_trunc('day', ts) AS day,
                sum(round(value * 100)::BIGINT) AS cents
         FROM events GROUP BY 1),
       tot AS (SELECT sum(cents) AS s, count(*) AS n FROM daily),
       y AS (SELECT day, cents, cents * 1000 - (t.s * 1000) // t.n AS yv
             FROM daily, tot t),
       r AS (SELECT day, cents, yv,
                    sum(yv) OVER w AS run,
                    sum(-yv) OVER w AS run_neg
             FROM y WINDOW w AS (ORDER BY day
                                 ROWS UNBOUNDED PRECEDING)),
       m AS (SELECT day, cents, run, run_neg,
                    min(run) OVER w AS mn,
                    min(run_neg) OVER w AS mn_neg
             FROM r WINDOW w AS (ORDER BY day
                                 ROWS UNBOUNDED PRECEDING))
       SELECT day, round(cents / 100.0, 2) AS daily_value,
              round((run - least(0, mn)) / 100000.0, 6) AS cusum_up,
              round((run_neg - least(0, mn_neg)) / 100000.0, 6) AS cusum_down
       FROM m ORDER BY day""",
)
def ts_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM drift statistic over the daily event-value series —
    the classic change-detection chart. The textbook recursion
    S_t = max(0, S_{t-1} + y_t) is not a window function, but it has an
    exact prefix form: S_t = R_t - min(0, min_{j<=t} R_j) with R the
    running sum of deviations — so the whole chart is two window sums +
    two window mins, no iteration and no UDF. Deviations are integer
    milli-cents against an integer floor-division mean, so every S_t is
    exact int64 and the oracle hash-matches; only the final display
    division is float. Scale: daily pre-aggregation shrinks N to
    #days before the (single-partition) ordered prefix scan — the same
    shape as every ts_* cumulative; at 100 TB the prefix runs over a
    few thousand day rows, not the raw events."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    tot = daily.agg(F.sum("cents").alias("s"), F.count(F.lit(1)).alias("n"))
    y = daily.crossJoin(F.broadcast(tot)).select(
        "day", "cents",
        (F.col("cents") * 1000 - F.expr("(s * 1000) div n")).alias("yv"),
    )
    wp = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    r = y.select(
        "day", "cents",
        F.sum("yv").over(wp).alias("run"),
        F.sum(-F.col("yv")).over(wp).alias("run_neg"),
    )
    m = r.select(
        "day", "cents", "run", "run_neg",
        F.min("run").over(wp).alias("mn"),
        F.min("run_neg").over(wp).alias("mn_neg"),
    )
    return m.select(
        "day",
        F.round(F.col("cents") / 100.0, 2).alias("daily_value"),
        F.round((F.col("run") - F.least(F.lit(0), F.col("mn"))) / 100000.0, 6)
        .alias("cusum_up"),
        F.round(
            (F.col("run_neg") - F.least(F.lit(0), F.col("mn_neg"))) / 100000.0, 6
        ).alias("cusum_down"),
    ).orderBy("day")


@q(
    "ts_rolling_corr",
    """WITH daily AS (
         SELECT date_trunc('day', ts) AS day,
                sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
                sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
         FROM events GROUP BY 1),
       s AS (SELECT day,
                    count(*) OVER w AS n,
                    sum(c) OVER w AS sx, sum(p) OVER w AS sy,
                    sum(c * p) OVER w AS sxy,
                    sum(c * c) OVER w AS sxx, sum(p * p) OVER w AS syy
             FROM daily
             WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING
                          AND CURRENT ROW))
       SELECT day, n AS win_days,
              CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) > 0
                   THEN round((n * sxy - sx * sy)
                        / sqrt(((n * sxx - sx * sx)
                                * (n * syy - sy * sy))::DOUBLE), 6)
              END AS corr_7d
       FROM s ORDER BY day""",
)
def ts_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling Pearson correlation between the daily click and
    purchase volumes — the co-movement monitor (are conversions tracking
    traffic this week?). All five sufficient statistics (Σx, Σy, Σxy,
    Σx², Σy², over a ROWS 6-preceding frame) are integer window sums over
    integer daily counts, so the correlation is ONE float expression per
    day from exact int64 inputs — hash-stable, zero-variance windows
    NULLed. Scale: like ts_cusum_drift the raw stream pre-aggregates to
    day grain first; the rolling frame then runs over #days rows."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("c"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("p"),
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    s = daily.select(
        "day",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("c").over(w).alias("sx"),
        F.sum("p").over(w).alias("sy"),
        F.sum(F.col("c") * F.col("p")).over(w).alias("sxy"),
        F.sum(F.col("c") * F.col("c")).over(w).alias("sxx"),
        F.sum(F.col("p") * F.col("p")).over(w).alias("syy"),
    )
    den2 = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) * (
        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    )
    return s.select(
        "day",
        F.col("n").alias("win_days"),
        F.when(
            den2 > 0,
            F.round(
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / F.sqrt(den2.cast("double")),
                6,
            ),
        ).alias("corr_7d"),
    ).orderBy("day")


@q(
    "ts_forecast_seasonal_naive_smape",
    """WITH daily AS (
         SELECT date_trunc('day', ts) AS day,
                sum(round(value * 100)::BIGINT) AS cents
         FROM events GROUP BY 1),
       l AS (SELECT day, cents,
                    lag(cents, 7) OVER (ORDER BY day) AS f
             FROM daily),
       t AS (SELECT abs(cents - f) AS ae,
                    CASE WHEN cents + f = 0 THEN 0.0
                         ELSE 2.0 * abs(cents - f) / (cents + f) END AS sm
             FROM l WHERE f IS NOT NULL)
       SELECT count(*) AS n_days,
              round(avg(sm), 6) AS smape,
              round(sum(ae)::DOUBLE / count(*) / 100.0, 6) AS mae_dollars
       FROM t""",
)
def ts_forecast_seasonal_naive_smape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast benchmark: predict each day's total value
    with the value 7 days earlier (lag-7 over the daily series) and score
    with sMAPE + MAE — the baseline every real forecaster must beat, and
    the weekly-seasonality complement to events_forecast_naive_mae's
    lag-1 naive. Daily totals are integer cents (exact), each sMAPE term
    a single float division from int64 — deterministic; the two averages
    are sums-over-count of those exact terms rounded at 6 dp."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    lw = Window.orderBy("day")
    t = (
        daily.withColumn("f", F.lag("cents", 7).over(lw))
        .filter(F.col("f").isNotNull())
        .select(
            F.abs(F.col("cents") - F.col("f")).alias("ae"),
            F.when(F.col("cents") + F.col("f") == 0, F.lit(0.0))
            .otherwise(
                2.0 * F.abs(F.col("cents") - F.col("f"))
                / (F.col("cents") + F.col("f"))
            )
            .alias("sm"),
        )
    )
    return t.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.avg("sm"), 6).alias("smape"),
        F.round(F.sum("ae").cast("double") / F.count(F.lit(1)) / 100.0, 6)
        .alias("mae_dollars"),
    )


# --------------------------------------------------------- events analytics


@q(
    "events_session_entry_exit",
    """WITH o AS (
         SELECT user_id, ts, event_id, event_type,
                CASE WHEN lag(ts) OVER w IS NULL
                          OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS brk
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       s AS (SELECT user_id, ts, event_id, event_type,
                    sum(brk) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS sess
             FROM o),
       r AS (SELECT user_id, sess, event_type,
                    row_number() OVER (PARTITION BY user_id, sess
                                       ORDER BY ts, event_id) AS rn_a,
                    row_number() OVER (PARTITION BY user_id, sess
                                       ORDER BY ts DESC, event_id DESC) AS rn_d,
                    count(*) OVER (PARTITION BY user_id, sess) AS n_ev
             FROM s),
       pair AS (SELECT user_id, sess,
                       max(CASE WHEN rn_a = 1 THEN event_type END) AS entry_type,
                       max(CASE WHEN rn_d = 1 THEN event_type END) AS exit_type,
                       max(n_ev) AS n_ev
                FROM r GROUP BY 1, 2)
       SELECT entry_type, exit_type, count(*) AS n_sessions,
              round(sum(n_ev)::DOUBLE / count(*), 6) AS avg_events
       FROM pair GROUP BY 1, 2 ORDER BY entry_type, exit_type""",
)
def events_session_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session entry/exit matrix: sessionize per user (30-minute
    inactivity gap, the events_sessionize_gap islands), take each
    session's first and last event type ((ts, event_id) total order so
    same-timestamp rows break ties identically on both engines), and
    count sessions per (entry, exit) pair with mean session length — the
    landing/abandonment table product analytics reads first. Scale: one
    shuffle on user_id serves the lag, the island sum, and both
    row_number frames (same partition key); the final matrix is
    #event_types² rows."""
    e = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    o = e.select(
        "user_id", "ts", "event_id", "event_type",
        F.when(
            F.lag("ts").over(wo).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(wo))
                > gap_us
            ),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    s = o.withColumn("sess", F.sum("brk").over(wo))
    ws = Window.partitionBy("user_id", "sess")
    r = s.select(
        "user_id", "sess", "event_type",
        F.row_number().over(ws.orderBy("ts", "event_id")).alias("rn_a"),
        F.row_number()
        .over(ws.orderBy(F.col("ts").desc(), F.col("event_id").desc()))
        .alias("rn_d"),
        F.count(F.lit(1)).over(ws.orderBy(F.lit(1)).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )).alias("n_ev"),
    )
    pair = r.groupBy("user_id", "sess").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("event_type"))).alias("entry_type"),
        F.max(F.when(F.col("rn_d") == 1, F.col("event_type"))).alias("exit_type"),
        F.max("n_ev").alias("n_ev"),
    )
    return (
        pair.groupBy("entry_type", "exit_type")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.round(F.sum("n_ev").cast("double") / F.count(F.lit(1)), 6)
            .alias("avg_events"),
        )
        .orderBy("entry_type", "exit_type")
    )


@q(
    "events_weekly_active_streaks",
    """WITH wk AS (
         SELECT DISTINCT user_id,
                epoch(date_trunc('week', ts))::BIGINT // 604800 AS w
         FROM events),
       isl AS (SELECT user_id,
                      w - row_number() OVER (PARTITION BY user_id
                                             ORDER BY w) AS g
               FROM wk),
       streak AS (SELECT user_id, g, count(*) AS len
                  FROM isl GROUP BY 1, 2),
       mx AS (SELECT user_id, max(len) AS max_streak
              FROM streak GROUP BY 1)
       SELECT max_streak AS streak_weeks, count(*) AS n_users
       FROM mx GROUP BY 1 ORDER BY 1""",
)
def events_weekly_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-week streak per user, reported as a
    histogram — the engagement-habit metric behind "n-week streak"
    product features. Weeks become integer indexes (epoch of the ISO-week
    Monday div 604800, identical on both engines), consecutive runs fall
    out of the classic islands trick (week - row_number is constant on a
    run), then two tiny aggregations. Scale: the DISTINCT (user, week)
    projection collapses the stream first; everything after is
    #users x #weeks."""
    e = load_table(spark, sf_dir, "events")
    wk = e.select(
        "user_id",
        F.floor(
            F.unix_timestamp(F.date_trunc("week", F.col("ts"))) / 604800
        ).alias("w"),
    ).distinct()
    isl = wk.select(
        "user_id",
        (
            F.col("w")
            - F.row_number().over(
                Window.partitionBy("user_id").orderBy("w")
            )
        ).alias("g"),
    )
    streak = isl.groupBy("user_id", "g").agg(F.count(F.lit(1)).alias("len"))
    mx = streak.groupBy("user_id").agg(F.max("len").alias("max_streak"))
    return (
        mx.groupBy(F.col("max_streak").alias("streak_weeks"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("streak_weeks")
    )


@q(
    "events_cohort_ltv",
    """WITH f AS (SELECT user_id, min(ts) AS fts FROM events GROUP BY 1),
       c AS (SELECT user_id, date_trunc('week', fts) AS cohort_week FROM f),
       size_ AS (SELECT cohort_week, count(*) AS n_users
                 FROM c GROUP BY 1),
       cell AS (
         SELECT c.cohort_week,
                (epoch(date_trunc('week', e.ts))::BIGINT
                 - epoch(c.cohort_week)::BIGINT) // 604800 AS age_weeks,
                sum(CASE WHEN e.event_type = 'purchase'
                         THEN round(e.value * 100)::BIGINT ELSE 0 END) AS cents
         FROM events e JOIN c ON c.user_id = e.user_id
         GROUP BY 1, 2),
       cum AS (SELECT cohort_week, age_weeks,
                      sum(cents) OVER (PARTITION BY cohort_week
                                       ORDER BY age_weeks) AS cum_cents
               FROM cell)
       SELECT cum.cohort_week AS cohort_week, cum.age_weeks, s.n_users,
              round(cum.cum_cents / 100.0 / s.n_users, 6) AS cum_ltv_per_user
       FROM cum JOIN size_ s ON s.cohort_week = cum.cohort_week
       ORDER BY cum.cohort_week, cum.age_weeks""",
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: users cohorted by first-seen week,
    cumulative purchase revenue per user tracked by cohort age in weeks —
    the standard LTV triangle (events_retention counts who comes back;
    this prices what they spend). Revenue moves in integer cents (exact
    cumulative sums, any order); the per-user normalization is the only
    float, one division at the end. Scale: one groupBy builds cohorts,
    one broadcast-able join tags events, one (cohort, age) aggregation +
    a cumulative window over #cohorts x #ages rows."""
    e = load_table(spark, sf_dir, "events")
    f = e.groupBy("user_id").agg(F.min("ts").alias("fts"))
    c = f.select(
        "user_id", F.date_trunc("week", "fts").alias("cohort_week")
    )
    size_ = c.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("n_users"))
    cell = (
        e.join(c, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(
                (
                    F.unix_timestamp(F.date_trunc("week", F.col("ts")))
                    - F.unix_timestamp(F.col("cohort_week"))
                )
                / 604800
            ).alias("age_weeks"),
        )
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("long"),
                ).otherwise(0)
            ).alias("cents")
        )
    )
    cum = cell.withColumn(
        "cum_cents",
        F.sum("cents").over(
            Window.partitionBy("cohort_week").orderBy("age_weeks")
        ),
    )
    return (
        cum.join(F.broadcast(size_), "cohort_week")
        .select(
            "cohort_week",
            "age_weeks",
            "n_users",
            F.round(F.col("cum_cents") / 100.0 / F.col("n_users"), 6).alias(
                "cum_ltv_per_user"
            ),
        )
        .orderBy("cohort_week", "age_weeks")
    )


# ------------------------------------------------------------- aggregations


@q(
    "agg_mann_whitney_u",
    """WITH v AS (SELECT event_type AS grp, value AS x FROM events
                  WHERE event_type IN ('click', 'purchase')),
       r AS (SELECT grp, x,
                    rank() OVER (ORDER BY x)
                    + (count(*) OVER (PARTITION BY x) - 1) / 2.0 AS arank
             FROM v),
       ties AS (SELECT coalesce(sum(tc * tc * tc - tc), 0)::BIGINT AS tsum
                FROM (SELECT count(*) AS tc FROM v GROUP BY x
                      HAVING count(*) > 1) t),
       s AS (SELECT
               sum(CASE WHEN grp = 'click' THEN 1 ELSE 0 END)::BIGINT AS n1,
               sum(CASE WHEN grp = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n2,
               sum(CASE WHEN grp = 'click' THEN arank ELSE 0 END) AS r1
             FROM r)
       SELECT s.n1 AS n_click, s.n2 AS n_purchase,
              s.r1 - s.n1 * (s.n1 + 1) / 2.0 AS u_click,
              s.n1 * s.n2 - (s.r1 - s.n1 * (s.n1 + 1) / 2.0) AS u_purchase,
              round(((s.r1 - s.n1 * (s.n1 + 1) / 2.0) - s.n1 * s.n2 / 2.0)
                    / sqrt((s.n1 * s.n2 / 12.0)
                           * ((s.n1 + s.n2 + 1)
                              - t.tsum::DOUBLE
                                / ((s.n1 + s.n2)
                                   * (s.n1 + s.n2 - 1)))), 6) AS z_score,
              round(2.0 * (s.r1 - s.n1 * (s.n1 + 1) / 2.0)
                    / (s.n1 * s.n2) - 1.0, 6) AS rank_biserial
       FROM s, ties t""",
)
def agg_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test comparing click vs purchase event
    values — the nonparametric two-sample test (events_ab_lift compares
    means; this compares whole distributions without normality
    assumptions). Average ranks for ties land on the exact .5 grid
    (rank() + (tie_count-1)/2), so the rank sum is EXACT in double and U
    is hash-stable; the normal approximation carries the full tie
    correction from integer tie counts, and rank-biserial is the effect
    size. Scale note: ranks come from the DISTRIBUTED rank map
    (operators/ranks.py — range-partitioned local cumsums + a broadcast
    prefix over one row per partition, joined back by value), never a
    single-partition ``Window.orderBy``; everything else is one
    aggregation."""
    from hawaiidatapipeline_spark.operators.ranks import doubled_avg_rank_map

    e = load_table(spark, sf_dir, "events")
    v = e.filter(F.col("event_type").isin("click", "purchase")).select(
        F.col("event_type").alias("grp"), F.col("value").alias("x")
    )
    rmap = doubled_avg_rank_map(v, "x", "dbl")
    r = v.join(rmap, "x").select("grp", (F.col("dbl") / 2.0).alias("arank"))
    ties = (
        v.groupBy("x")
        .agg(F.count(F.lit(1)).alias("tc"))
        .filter(F.col("tc") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("tc") * F.col("tc") * F.col("tc") - F.col("tc")),
                F.lit(0),
            )
            .cast("long")
            .alias("tsum")
        )
    )
    s = r.agg(
        F.sum(F.when(F.col("grp") == "click", 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("grp") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n2"),
        F.sum(F.when(F.col("grp") == "click", F.col("arank")).otherwise(0.0))
        .alias("r1"),
    )
    u1 = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2.0
    n = F.col("n1") + F.col("n2")
    sigma2 = (F.col("n1") * F.col("n2") / 12.0) * (
        (n + 1) - F.col("tsum").cast("double") / (n * (n - 1))
    )
    return s.crossJoin(F.broadcast(ties)).select(
        F.col("n1").alias("n_click"),
        F.col("n2").alias("n_purchase"),
        u1.alias("u_click"),
        (F.col("n1") * F.col("n2") - u1).alias("u_purchase"),
        F.round(
            (u1 - F.col("n1") * F.col("n2") / 2.0) / F.sqrt(sigma2), 6
        ).alias("z_score"),
        F.round(2.0 * u1 / (F.col("n1") * F.col("n2")) - 1.0, 6).alias(
            "rank_biserial"
        ),
    )


@q(
    "agg_hhi_concentration",
    """WITH rev AS (
         SELECT s.s_nationkey, l.l_suppkey,
                sum(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                    ::BIGINT) AS cents
         FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
         GROUP BY 1, 2),
       tot AS (SELECT s_nationkey, sum(cents) AS tc, count(*) AS n_sup
               FROM rev GROUP BY 1),
       sh AS (SELECT r.s_nationkey, r.cents::DOUBLE / t.tc AS share
              FROM rev r JOIN tot t ON t.s_nationkey = r.s_nationkey)
       SELECT n.n_name AS nation, t.n_sup AS n_suppliers,
              round(sum(sh.share * sh.share), 6) AS hhi,
              round(max(sh.share), 6) AS top_share
       FROM sh JOIN tot t ON t.s_nationkey = sh.s_nationkey
       JOIN nation n ON n.n_nationkey = sh.s_nationkey
       GROUP BY 1, 2 ORDER BY 1""",
)
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman supplier-revenue concentration per nation —
    the market-concentration scan (one dominant supplier per nation is a
    supply-chain risk the flat revenue ranking never surfaces). Revenue
    is summed in integer cents per (nation, supplier); shares are one
    float division each and HHI their squared sum rounded at 6 dp.
    Scale: one partial-aggregated groupBy on (nation, supplier), a
    broadcast of per-nation totals (#nations rows), and a #suppliers-row
    final aggregation — no shuffle grows with lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(
            F.broadcast(su.select("s_suppkey", "s_nationkey")),
            li.l_suppkey == su.s_suppkey,
        )
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            ).alias("cents")
        )
    )
    tot = rev.groupBy("s_nationkey").agg(
        F.sum("cents").alias("tc"), F.count(F.lit(1)).alias("n_sup")
    )
    sh = rev.join(F.broadcast(tot), "s_nationkey").select(
        "s_nationkey", "n_sup",
        (F.col("cents").cast("double") / F.col("tc")).alias("share"),
    )
    return (
        sh.groupBy("s_nationkey", "n_sup")
        .agg(
            F.round(F.sum(F.col("share") * F.col("share")), 6).alias("hhi"),
            F.round(F.max("share"), 6).alias("top_share"),
        )
        .join(
            F.broadcast(na.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            F.col("n_sup").alias("n_suppliers"),
            "hhi",
            "top_share",
        )
        .orderBy("nation")
    )


# ----------------------------------------------------------- ETL / quality


@q(
    "etl_backfill_plan",
    """WITH b AS (SELECT date_trunc('day', min(o_orderdate)) AS lo,
                         date_trunc('day', max(o_orderdate)) AS hi
                  FROM orders),
       cal AS (SELECT unnest(generate_series(lo, hi,
                                             INTERVAL 1 DAY)) AS day
               FROM b),
       act AS (SELECT date_trunc('day', o_orderdate) AS day,
                      count(*) AS n
               FROM orders GROUP BY 1)
       SELECT date_trunc('month', c.day) AS month,
              count(*) AS expected_days,
              sum(CASE WHEN a.day IS NULL THEN 1 ELSE 0 END)::BIGINT
                AS missing_days,
              coalesce(sum(a.n), 0)::BIGINT AS n_rows
       FROM cal c LEFT JOIN act a ON a.day = c.day
       GROUP BY 1 ORDER BY 1""",
)
def etl_backfill_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill planner: generate the full expected daily calendar between
    the table's min and max order date, anti-probe it against the days
    actually present, and report per month how many partition-days are
    missing plus the row volume — the table an orchestrator turns
    directly into backfill job parameters (dq_freshness says the table is
    stale; this says exactly WHICH days to re-run). Scale: the calendar
    is a few-thousand-row generated sequence (broadcast side), actual
    days come from one partial-aggregated groupBy — partition-pruned to
    metadata if the table is date-partitioned."""
    o = load_table(spark, sf_dir, "orders")
    b = o.agg(
        F.date_trunc("day", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("day", F.max("o_orderdate")).alias("hi"),
    )
    cal = b.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 day"))
        ).alias("day")
    )
    act = o.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        cal.join(act, "day", "left")
        .groupBy(F.date_trunc("month", "day").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("expected_days"),
            F.sum(F.when(F.col("n").isNull(), 1).otherwise(0)).alias(
                "missing_days"
            ),
            F.coalesce(F.sum("n"), F.lit(0)).alias("n_rows"),
        )
        .orderBy("month")
    )


@q(
    "dq_ks_drift",
    """WITH g AS (
         SELECT o_totalprice AS x,
                sum(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                         THEN 1 ELSE 0 END) AS c1,
                sum(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
                         THEN 1 ELSE 0 END) AS c2
         FROM orders GROUP BY 1),
       n AS (SELECT sum(c1)::BIGINT AS n1, sum(c2)::BIGINT AS n2 FROM g),
       c AS (SELECT x, sum(c1) OVER (ORDER BY x) AS f1,
                    sum(c2) OVER (ORDER BY x) AS f2
             FROM g),
       d AS (SELECT c.x,
                    abs(c.f1::DOUBLE / n.n1 - c.f2::DOUBLE / n.n2) AS gap
             FROM c, n),
       top AS (SELECT x, gap FROM d ORDER BY gap DESC, x LIMIT 1)
       SELECT n.n1 AS n_before, n.n2 AS n_after,
              round(top.gap, 6) AS ks_stat,
              round(top.x, 6) AS at_value,
              CASE WHEN top.gap > 1.358 * sqrt((n.n1 + n.n2)::DOUBLE
                                               / (n.n1 * n.n2))
                   THEN 1 ELSE 0 END AS reject_95
       FROM top, n""",
)
def dq_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test on the order-price
    distribution before/after 1998 — the distribution-shape complement
    to dq_psi_drift's binned divergence (PSI needs bin choices; KS is
    the sup-norm ECDF gap, bin-free). Both ECDFs come from ONE value-
    grouped table with two conditional cumulative window sums over the
    pooled value order; the statistic is the max of exact-integer-ratio
    gaps, located deterministically ((gap DESC, value) order), with the
    alpha=0.05 rejection bound. Scale: grouping by value collapses N to
    #distinct prices, but that grain still grows with data (continuous
    prices rarely collide), so the cumulative ECDF sums run through
    operators/ranks.py partitioned_prefix_sums — range slices cumsum in
    parallel, the serial prefix pass sees one row per partition — never
    a global single-partition window; the same shape monitors any
    numeric column between two loads."""
    o = load_table(spark, sf_dir, "orders")
    g = o.groupBy(F.col("o_totalprice").alias("x")).agg(
        F.sum(
            F.when(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"), 1)
            .otherwise(0)
        ).alias("c1"),
        F.sum(
            F.when(
                F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"), 1
            ).otherwise(0)
        ).alias("c2"),
    )
    n = g.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    c = partitioned_prefix_sums(
        g, [F.col("x")], {"f1": "c1", "f2": "c2"}
    ).select("x", "f1", "f2")
    d = c.crossJoin(F.broadcast(n)).select(
        "x", "n1", "n2",
        F.abs(
            F.col("f1").cast("double") / F.col("n1")
            - F.col("f2").cast("double") / F.col("n2")
        ).alias("gap"),
    )
    top = d.orderBy(F.col("gap").desc(), "x").limit(1)
    return top.select(
        F.col("n1").alias("n_before"),
        F.col("n2").alias("n_after"),
        F.round("gap", 6).alias("ks_stat"),
        F.round("x", 6).alias("at_value"),
        F.when(
            F.col("gap")
            > 1.358
            * F.sqrt(
                (F.col("n1") + F.col("n2")).cast("double")
                / (F.col("n1") * F.col("n2"))
            ),
            1,
        )
        .otherwise(0)
        .alias("reject_95"),
    )


@q(
    "ts_seasonal_decompose",
    """WITH daily AS (
         SELECT date_trunc('day', ts) AS day,
                sum(round(value * 100)::BIGINT) AS cents
         FROM events GROUP BY 1),
       tr AS (SELECT day, cents,
                     (epoch(day)::BIGINT // 86400) % 7 AS dow,
                     CASE WHEN count(*) OVER w = 7
                          THEN round(sum(cents) OVER w / 700.0, 6) END AS trend
              FROM daily
              WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING
                           AND 3 FOLLOWING)),
       se AS (SELECT dow, round(avg(cents / 100.0 - trend), 6) AS seasonal
              FROM tr WHERE trend IS NOT NULL GROUP BY dow)
       SELECT t.day, round(t.cents / 100.0, 2) AS daily_value, t.trend,
              CASE WHEN t.trend IS NOT NULL THEN s.seasonal END AS seasonal,
              CASE WHEN t.trend IS NOT NULL
                   THEN round(t.cents / 100.0 - t.trend - s.seasonal, 6)
              END AS residual
       FROM tr t JOIN se s ON s.dow = t.dow
       ORDER BY t.day""",
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the daily value series:
    trend = centered 7-day moving average (full windows only), weekly
    seasonal = mean detrended deviation per day-of-week, residual = the
    rest — the decomposition behind every "is this dip seasonal or real?"
    question, feeding ts_forecast_seasonal_naive_smape's premise.
    Day-of-week comes from epoch-day mod 7 (no engine weekday-numbering
    convention involved); trend is an integer sum over one float division,
    and seasonal/residual subtract ALREADY-ROUNDED values, so every column
    hash-matches. Scale: day-grain pre-aggregation first; the decomposition
    runs over #days rows."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "cents",
        (F.floor(F.unix_timestamp("day") / 86400) % 7).alias("dow"),
        F.when(
            F.count(F.lit(1)).over(w) == 7,
            F.round(F.sum("cents").over(w) / 700.0, 6),
        ).alias("trend"),
    )
    se = (
        tr.filter(F.col("trend").isNotNull())
        .groupBy("dow")
        .agg(
            F.round(F.avg(F.col("cents") / 100.0 - F.col("trend")), 6).alias(
                "seasonal"
            )
        )
    )
    return (
        tr.join(F.broadcast(se), "dow")
        .select(
            "day",
            F.round(F.col("cents") / 100.0, 2).alias("daily_value"),
            "trend",
            F.when(F.col("trend").isNotNull(), F.col("seasonal")).alias(
                "seasonal"
            ),
            F.when(
                F.col("trend").isNotNull(),
                F.round(
                    F.col("cents") / 100.0 - F.col("trend") - F.col("seasonal"),
                    6,
                ),
            ).alias("residual"),
        )
        .orderBy("day")
    )


@q(
    "ts_downsample_minmax",
    """WITH b AS (
         SELECT time_bucket(INTERVAL '6 hours', ts) AS bucket_start,
                ts, event_id, value
         FROM events),
       r AS (SELECT *,
                    row_number() OVER (PARTITION BY bucket_start
                                       ORDER BY value, ts, event_id) AS rn_min,
                    row_number() OVER (PARTITION BY bucket_start
                                       ORDER BY value DESC, ts, event_id)
                      AS rn_max
             FROM b)
       SELECT bucket_start, 'min' AS kind, ts, value FROM r WHERE rn_min = 1
       UNION ALL
       SELECT bucket_start, 'max' AS kind, ts, value FROM r WHERE rn_max = 1
       ORDER BY bucket_start, kind""",
)
def ts_downsample_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max downsampling for time-series visualization: per 6-hour
    bucket keep exactly the extreme points (the rendering-safe downsample —
    spikes survive, which plain bucket averaging erases). Ties resolve by
    the (value, ts, event_id) total order so both engines pick the same
    point. Scale: one window pass per bucket partition; output is
    2 × #buckets rows regardless of input volume — the property that lets
    a dashboard pull a year of 100 TB telemetry."""
    e = load_table(spark, sf_dir, "events")
    b = e.select(
        F.window("ts", "6 hours").start.alias("bucket_start"),
        "ts", "event_id", "value",
    )
    wp = Window.partitionBy("bucket_start")
    r = b.select(
        "*",
        F.row_number()
        .over(wp.orderBy("value", "ts", "event_id"))
        .alias("rn_min"),
        F.row_number()
        .over(wp.orderBy(F.col("value").desc(), "ts", "event_id"))
        .alias("rn_max"),
    )
    mn = r.filter(F.col("rn_min") == 1).select(
        "bucket_start", F.lit("min").alias("kind"), "ts", "value"
    )
    mx = r.filter(F.col("rn_max") == 1).select(
        "bucket_start", F.lit("max").alias("kind"), "ts", "value"
    )
    return mn.unionByName(mx).orderBy("bucket_start", "kind")


@q(
    "agg_weighted_median",
    """WITH g AS (SELECT l_returnflag AS flag, l_extendedprice AS x,
                         sum(round(l_quantity)::BIGINT) AS wt
                  FROM lineitem GROUP BY 1, 2),
       c AS (SELECT flag, x, wt,
                    sum(wt) OVER (PARTITION BY flag ORDER BY x) AS cum
             FROM g),
       t AS (SELECT flag, sum(wt)::BIGINT AS total_weight FROM g GROUP BY 1)
       SELECT c.flag AS flag, t.total_weight,
              round(min(c.x), 2) AS weighted_median
       FROM c JOIN t ON t.flag = c.flag
       WHERE 2 * c.cum >= t.total_weight
       GROUP BY 1, 2 ORDER BY flag""",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag by EXPLICIT order
    statistic: the smallest price whose cumulative weight reaches half the
    total (the lower weighted median — no interpolation, so no float-drift
    between engines). Values are pre-grouped by (flag, price) so cumulative
    sums never depend on tie order; weights are integer. This is the
    exact-arithmetic weighted companion to agg_percentile /
    agg_median_absolute_deviation. Scale: one (flag, price) partial agg +
    an ordered prefix scan per flag partition."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("x"),
    ).agg(F.sum(F.round("l_quantity").cast("long")).alias("wt"))
    c = g.withColumn(
        "cum", F.sum("wt").over(Window.partitionBy("flag").orderBy("x"))
    )
    t = g.groupBy("flag").agg(F.sum("wt").alias("total_weight"))
    return (
        c.join(F.broadcast(t), "flag")
        .filter(2 * F.col("cum") >= F.col("total_weight"))
        .groupBy("flag", "total_weight")
        .agg(F.round(F.min("x"), 2).alias("weighted_median"))
        .orderBy("flag")
    )


_BOOT_B = 40  # resamples; 2.5% / 97.5% order statistics = ranks 1 and 39


@q(
    "agg_bootstrap_ci_mean",
    f"""WITH r AS (
         SELECT e.event_id, round(e.value * 100)::BIGINT AS cents, b.b,
                ('0x' || substring(md5('bs:' || e.event_id::VARCHAR || ':'
                                       || b.b::VARCHAR), 1, 15))::BIGINT
                  % 1000 AS h
         FROM events e,
              (SELECT unnest(generate_series(0, {_BOOT_B - 1})) AS b) b),
       m AS (SELECT event_id, cents, b,
                    CASE WHEN h < 368 THEN 0 WHEN h < 736 THEN 1
                         WHEN h < 920 THEN 2 WHEN h < 981 THEN 3
                         WHEN h < 996 THEN 4 ELSE 5 END AS mult
             FROM r),
       means AS (SELECT b,
                        sum(mult * cents)::BIGINT AS sm,
                        sum(mult)::BIGINT AS sw
                 FROM m GROUP BY b),
       ranked AS (SELECT sm * 1.0 / sw / 100.0 AS mean_b,
                         row_number() OVER (ORDER BY sm * 1.0 / sw, b) AS rn
                  FROM means),
       base AS (SELECT count(*)::BIGINT AS n_rows,
                       round(sum(round(value * 100)::BIGINT)
                             * 1.0 / count(*) / 100.0, 6) AS mean_value
                FROM events)
       SELECT base.n_rows, {_BOOT_B} AS n_resamples, base.mean_value,
              round(lo.mean_b, 6) AS ci_lo,
              round(hi.mean_b, 6) AS ci_hi
       FROM base,
            (SELECT mean_b FROM ranked WHERE rn = 1) lo,
            (SELECT mean_b FROM ranked WHERE rn = {_BOOT_B - 1}) hi""",
)
def agg_bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 95% confidence interval for the mean event value —
    THE distributed bootstrap: instead of materializing B global resamples
    (each a full shuffle), every row draws a deterministic multiplicity
    per resample (hash-bucketed to the Poisson(1) pmf: P(0)=.368, P(1)=.368,
    P(2)=.184, ...), so all B resample means come out of ONE pass over the
    data. Multiplicities come from the portable md5 hash (bit-identical on
    both engines), sums are integer cents, and the CI bounds are explicit
    order statistics (ranks 1 and B-1 of B=40 means) — fully
    hash-deterministic 'randomness'. Scale: input x B row expansion is
    map-side (no shuffle grows with B beyond the B-row means table);
    production uses xxhash64 for the same ~32x speedup as the minhash
    lanes."""
    e = load_table(spark, sf_dir, "events")
    bs = spark.range(_BOOT_B).select(F.col("id").alias("b"))
    from hawaiidatapipeline_spark.operators.dedup import portable_hash64

    r = e.select(
        "event_id", F.round(F.col("value") * 100).cast("long").alias("cents")
    ).crossJoin(F.broadcast(bs))
    h = (
        portable_hash64(
            F.concat(
                F.col("event_id").cast("string"),
                F.lit(":"),
                F.col("b").cast("string"),
            ),
            "bs",
        )
        % 1000
    )
    m = r.withColumn(
        "mult",
        F.when(h < 368, 0)
        .when(h < 736, 1)
        .when(h < 920, 2)
        .when(h < 981, 3)
        .when(h < 996, 4)
        .otherwise(5),
    )
    means = m.groupBy("b").agg(
        F.sum(F.col("mult") * F.col("cents")).alias("sm"),
        F.sum("mult").alias("sw"),
    )
    ranked = means.select(
        (F.col("sm") * 1.0 / F.col("sw") / 100.0).alias("mean_b"),
        F.row_number()
        .over(Window.orderBy(F.col("sm") * 1.0 / F.col("sw"), F.col("b")))
        .alias("rn"),
    )
    base = e.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            * 1.0
            / F.count(F.lit(1))
            / 100.0,
            6,
        ).alias("mean_value"),
    )
    lo = ranked.filter(F.col("rn") == 1).select(
        F.round("mean_b", 6).alias("ci_lo")
    )
    hi = ranked.filter(F.col("rn") == _BOOT_B - 1).select(
        F.round("mean_b", 6).alias("ci_hi")
    )
    return (
        base.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            "n_rows",
            F.lit(_BOOT_B).alias("n_resamples"),
            "mean_value",
            "ci_lo",
            "ci_hi",
        )
    )


@q(
    "ts_peak_detection",
    """WITH daily AS (
         SELECT date_trunc('day', ts)::DATE AS d, count(*)::BIGINT AS n
         FROM events GROUP BY 1),
       w AS (
         SELECT d, n,
                lag(n) OVER (ORDER BY d) AS prev_n,
                lead(n) OVER (ORDER BY d) AS next_n,
                max(n) OVER (ORDER BY d
                  ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS left_max,
                max(n) OVER (ORDER BY d
                  ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING) AS right_max
         FROM daily)
       SELECT d AS peak_day, n AS n_events,
              (n - greatest(left_max, right_max))::BIGINT AS prominence
       FROM w
       WHERE prev_n IS NOT NULL AND next_n IS NOT NULL
         AND n > prev_n AND n > next_n
         AND n > left_max AND n > right_max
       ORDER BY peak_day""",
)
def ts_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-maximum peak detection over the daily event-count series:
    a day is a peak when it strictly dominates both immediate neighbors
    AND every day within a ±3-day exclusion window (the rule that
    suppresses double-reporting of one traffic spike smeared over
    adjacent days); reported prominence = height above the tallest
    excluded neighbor. All integers — counts, windows maxima,
    prominence — so the result is exactly hash-checkable. Shape: one
    partial-aggregated day-grain rollup (the only pass that sees data
    volume), then lag/lead/frame windows over the CALENDAR-grain frame
    (30 rows here, bounded by days-of-history at any scale) — same
    bounded-frame discipline as ``ts_seasonal_decompose``. At 100 TB
    the rollup is map-side combined; the peak logic is metadata-sized."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    wo = Window.orderBy("d")
    w = daily.select(
        "d",
        "n",
        F.lag("n").over(wo).alias("prev_n"),
        F.lead("n").over(wo).alias("next_n"),
        F.max("n").over(wo.rowsBetween(-3, -1)).alias("left_max"),
        F.max("n").over(wo.rowsBetween(1, 3)).alias("right_max"),
    )
    return (
        w.filter(
            F.col("prev_n").isNotNull()
            & F.col("next_n").isNotNull()
            & (F.col("n") > F.col("prev_n"))
            & (F.col("n") > F.col("next_n"))
            & (F.col("n") > F.col("left_max"))
            & (F.col("n") > F.col("right_max"))
        )
        .select(
            F.col("d").alias("peak_day"),
            F.col("n").alias("n_events"),
            (F.col("n") - F.greatest("left_max", "right_max"))
            .cast("long")
            .alias("prominence"),
        )
        .orderBy("peak_day")
    )


@q(
    "ts_mann_kendall",
    """WITH daily AS (
         SELECT date_trunc('day', ts)::DATE AS d, count(*)::BIGINT AS n
         FROM events GROUP BY 1),
       pairs AS (
         SELECT CASE WHEN b.n > a.n THEN 1
                     WHEN b.n < a.n THEN -1 ELSE 0 END AS sgn
         FROM daily a JOIN daily b ON b.d > a.d),
       s_stat AS (SELECT sum(sgn)::BIGINT AS s, count(*)::BIGINT AS n_pairs
                  FROM pairs),
       nn AS (SELECT count(*)::BIGINT AS n FROM daily),
       ties AS (
         SELECT coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)::BIGINT AS tie_adj
         FROM (SELECT count(*)::BIGINT AS t FROM daily GROUP BY n
               HAVING count(*) > 1)),
       z AS (
         SELECT s_stat.s, s_stat.n_pairs, nn.n,
                (nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_adj)::DOUBLE
                  / 18.0 AS var_s
         FROM s_stat CROSS JOIN nn CROSS JOIN ties)
       SELECT n AS n_days, n_pairs, s AS s_statistic,
              round(var_s, 6) AS var_s,
              round(CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
                         WHEN s < 0 THEN (s + 1) / sqrt(var_s)
                         ELSE 0.0 END, 6) AS z_stat
       FROM z""",
)
def ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test over the daily event-count
    series — the SIGNIFICANCE companion of ``ts_theil_sen_trend``'s
    slope estimate (Theil-Sen says how steep; Mann-Kendall says whether
    a monotonic trend exists at all): S = Σ_{i<j} sign(x_j − x_i), the
    tie-corrected variance n(n−1)(2n+5)/18 − Σt(t−1)(2t+5)/18, and the
    continuity-corrected z. S and the tie adjustment are exact
    integers; z is one closed form. Shape: the pair enumeration runs on
    the DAY-grain frame (30 rows → 435 pairs here; even a decade is
    ~6.6M pairs, a single task), after the one data-sized day rollup —
    the bounded-frame discipline every ts_* query shares."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    from hawaiidatapipeline_spark.operators.materialize import materialize

    daily = materialize(daily)
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(b, F.col("b.d") > F.col("a.d")).select(
        F.when(F.col("b.n") > F.col("a.n"), 1)
        .when(F.col("b.n") < F.col("a.n"), -1)
        .otherwise(0)
        .alias("sgn")
    )
    s_stat = pairs.agg(
        F.sum("sgn").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    nn = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ties = (
        daily.groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_adj")
        )
    )
    z = (
        s_stat.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(ties))
        .select(
            "s",
            "n_pairs",
            "n",
            (
                (
                    F.col("n")
                    * (F.col("n") - 1)
                    * (2 * F.col("n") + 5)
                    - F.col("tie_adj")
                ).cast("double")
                / 18.0
            ).alias("var_s"),
        )
    )
    s = F.col("s")
    return z.select(
        F.col("n").alias("n_days"),
        "n_pairs",
        s.alias("s_statistic"),
        F.round("var_s", 6).alias("var_s"),
        F.round(
            F.when(s > 0, (s - 1) / F.sqrt(F.col("var_s")))
            .when(s < 0, (s + 1) / F.sqrt(F.col("var_s")))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("z_stat"),
    )
