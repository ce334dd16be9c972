"""Causal-inference / experimentation extras.

Round-9 batch 7 — the causal layer on top of the batch-4 hypothesis
tests: CUPED variance reduction (the pre-period regression adjustment
every mature A/B platform applies before reading a metric),
difference-in-differences (the observational twin when assignment is a
launch date, not a coin flip), the Kaplan-Meier survival curve over
user lifetimes (retention's principled form under censoring), one-way
ANOVA across k groups (the k-arm generalization of Welch's t), and
Benjamini-Hochberg FDR adjustment over a family of per-segment tests
(the guardrail against p-hacking a 5-segment readout).

House determinism contract (SURVEY.md §7 risk 1): aggregate EXACT
integers (milli/centi fixed-point sums — order-independent at any
parallelism), evaluate one identical closed-form double expression on
both engines, ``round(…, 6)`` last; libm terms (ln/exp) are rounded to
9 dp BEFORE any summation so a last-ulp difference cannot survive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()


def _ph(expr: str, seed) -> str:
    """DuckDB twin of operators/dedup.py portable_hash64."""
    return f"('0x' || substring(md5('{seed}:' || {expr}), 1, 15))::BIGINT"


# Pre/post boundary for CUPED and DiD: the fixture's event window is
# 2024-01-01..2024-01-30; day 16 splits it into two 15-day halves.
_SPLIT = "2024-01-16 00:00:00"


@q(
    "events_cuped_adjustment",
    f"""WITH per_user AS (
         SELECT user_id,
                sum(CASE WHEN ts < TIMESTAMP '{_SPLIT}'
                          AND event_type IN ('click', 'view')
                         THEN (floor(value * 1000))::BIGINT ELSE 0 END) AS x,
                sum(CASE WHEN ts >= TIMESTAMP '{_SPLIT}'
                          AND event_type = 'purchase'
                         THEN (floor(value * 1000))::BIGINT ELSE 0 END) AS y
         FROM events GROUP BY user_id),
       assigned AS (
         SELECT x, y,
                CASE WHEN {_ph('user_id::VARCHAR', 7)} % 2 = 0
                     THEN 0 ELSE 1 END AS variant
         FROM per_user),
       s AS (SELECT
               count(*)::BIGINT AS n,
               sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
               sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy,
               sum(x * y)::BIGINT AS sxy,
               sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
               sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
               sum(CASE WHEN variant = 0 THEN x ELSE 0 END)::BIGINT AS sx0,
               sum(CASE WHEN variant = 1 THEN x ELSE 0 END)::BIGINT AS sx1,
               sum(CASE WHEN variant = 0 THEN y ELSE 0 END)::BIGINT AS sy0,
               sum(CASE WHEN variant = 1 THEN y ELSE 0 END)::BIGINT AS sy1
             FROM assigned),
       m AS (SELECT n, n0, n1,
               (n::DOUBLE * sxy - sx::DOUBLE * sy)
                 / (n::DOUBLE * sxx - sx::DOUBLE * sx) AS theta,
               pow(n::DOUBLE * sxy - sx::DOUBLE * sy, 2)
                 / ((n::DOUBLE * sxx - sx::DOUBLE * sx)
                    * (n::DOUBLE * syy - sy::DOUBLE * sy)) AS rho2,
               sy1::DOUBLE / n1 / 1000.0 - sy0::DOUBLE / n0 / 1000.0 AS diff_raw,
               sx1::DOUBLE / n1 / 1000.0 - sx0::DOUBLE / n0 / 1000.0 AS xdiff
             FROM s)
       SELECT n AS n_users, n0 AS n_control, n1 AS n_treatment,
              round(theta, 6) AS theta,
              round(diff_raw, 6) AS diff_raw,
              round(diff_raw - theta * xdiff, 6) AS diff_cuped,
              round(rho2 * 100.0, 6) AS var_reduction_pct
       FROM m""",
)
def events_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data) variance
    reduction: per-user pre-period engagement value (click+view, first
    15 days) is the covariate X, post-period purchase value the outcome
    Y; theta = cov(X,Y)/var(X) is fit POOLED across both hash-assigned
    arms (seed-7 portable assignment, same as ``events_ab_proportion_z``)
    and the treatment effect re-estimated as
    diff_cuped = diff_raw − theta·(mean_x1 − mean_x0). Reported
    var_reduction_pct = 100·rho² is the variance CUPED removes. All six
    sufficient statistics (n, ΣX, ΣY, ΣXX, ΣYY, ΣXY in exact milli-unit
    int64) come from ONE user-grain aggregation + a 1-row reduce; the
    covariance closed form runs on identical doubles in both engines.
    Scale: one shuffle on user_id then a single-row reduce — at 100 TB
    the user-grain partial agg is map-side combined and the reduce is a
    constant 12 numbers per partition."""
    from hawaiidatapipeline_spark.operators.dedup import portable_hash64

    e = load_table(spark, sf_dir, "events")
    mv = F.floor(F.col("value") * 1000).cast("long")
    per_user = e.groupBy("user_id").agg(
        F.sum(
            F.when(
                (F.col("ts") < F.lit(_SPLIT).cast("timestamp"))
                & F.col("event_type").isin("click", "view"),
                mv,
            ).otherwise(F.lit(0).cast("long"))
        ).alias("x"),
        F.sum(
            F.when(
                (F.col("ts") >= F.lit(_SPLIT).cast("timestamp"))
                & (F.col("event_type") == "purchase"),
                mv,
            ).otherwise(F.lit(0).cast("long"))
        ).alias("y"),
    )
    assigned = per_user.select(
        "x",
        "y",
        F.when(
            F.pmod(portable_hash64(F.col("user_id").cast("string"), 7), F.lit(2))
            == 0,
            0,
        )
        .otherwise(1)
        .alias("variant"),
    )
    x, y, v = F.col("x"), F.col("y"), F.col("variant")
    s = assigned.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).cast("long").alias("sx"),
        F.sum(y).cast("long").alias("sy"),
        F.sum(x * x).cast("long").alias("sxx"),
        F.sum(y * y).cast("long").alias("syy"),
        F.sum(x * y).cast("long").alias("sxy"),
        F.sum(F.when(v == 0, 1).otherwise(0)).cast("long").alias("n0"),
        F.sum(F.when(v == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(v == 0, x).otherwise(0)).cast("long").alias("sx0"),
        F.sum(F.when(v == 1, x).otherwise(0)).cast("long").alias("sx1"),
        F.sum(F.when(v == 0, y).otherwise(0)).cast("long").alias("sy0"),
        F.sum(F.when(v == 1, y).otherwise(0)).cast("long").alias("sy1"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = (
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    n0, n1 = F.col("n0"), F.col("n1")
    cov_n = n * sxy - sx * sy
    theta = cov_n / (n * sxx - sx * sx)
    rho2 = F.pow(cov_n, F.lit(2)) / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    diff_raw = (
        F.col("sy1").cast("double") / n1 / 1000.0
        - F.col("sy0").cast("double") / n0 / 1000.0
    )
    xdiff = (
        F.col("sx1").cast("double") / n1 / 1000.0
        - F.col("sx0").cast("double") / n0 / 1000.0
    )
    return s.select(
        F.col("n").alias("n_users"),
        n0.alias("n_control"),
        n1.alias("n_treatment"),
        F.round(theta, 6).alias("theta"),
        F.round(diff_raw, 6).alias("diff_raw"),
        F.round(diff_raw - theta * xdiff, 6).alias("diff_cuped"),
        F.round(rho2 * 100.0, 6).alias("var_reduction_pct"),
    )


@q(
    "events_diff_in_diff",
    f"""WITH p AS (
         SELECT CASE WHEN {_ph('user_id::VARCHAR', 7)} % 2 = 0
                     THEN 0 ELSE 1 END AS variant,
                CASE WHEN ts < TIMESTAMP '{_SPLIT}' THEN 0 ELSE 1 END AS post,
                (floor(value * 1000))::BIGINT AS vm
         FROM events WHERE event_type = 'purchase'),
       s AS (SELECT variant, post,
                    count(*)::BIGINT AS n, sum(vm)::BIGINT AS sv
             FROM p GROUP BY variant, post),
       w AS (SELECT
               max(CASE WHEN variant = 0 AND post = 0 THEN sv::DOUBLE / n END) AS c_pre,
               max(CASE WHEN variant = 0 AND post = 1 THEN sv::DOUBLE / n END) AS c_post,
               max(CASE WHEN variant = 1 AND post = 0 THEN sv::DOUBLE / n END) AS t_pre,
               max(CASE WHEN variant = 1 AND post = 1 THEN sv::DOUBLE / n END) AS t_post,
               sum(n)::BIGINT AS n_purchases
             FROM s)
       SELECT n_purchases,
              round(c_pre / 1000.0, 6) AS mean_control_pre,
              round(c_post / 1000.0, 6) AS mean_control_post,
              round(t_pre / 1000.0, 6) AS mean_treatment_pre,
              round(t_post / 1000.0, 6) AS mean_treatment_post,
              round((t_post - t_pre) / 1000.0 - (c_post - c_pre) / 1000.0, 6)
                AS did_estimate
       FROM w""",
)
def events_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences over the pre/post split: mean purchase
    value per (arm × period) cell and the DiD estimate
    (T_post − T_pre) − (C_post − C_pre), which nets out both the
    baseline arm difference and the common time trend — the estimator a
    staged rollout (assignment by launch date, not coin flip) needs.
    Cell sums are exact milli-unit int64 from ONE conditional
    aggregation over purchase events (no user grain required — the
    estimand is event-weighted); the four means and the contrast are
    closed-form doubles. Scale: a single partial-agg pass over the
    filtered fact table, 4-cell reduce — the cheapest shape there is."""
    from hawaiidatapipeline_spark.operators.dedup import portable_hash64

    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.pmod(portable_hash64(F.col("user_id").cast("string"), 7), F.lit(2))
            == 0,
            0,
        )
        .otherwise(1)
        .alias("variant"),
        F.when(F.col("ts") < F.lit(_SPLIT).cast("timestamp"), 0)
        .otherwise(1)
        .alias("post"),
        F.floor(F.col("value") * 1000).cast("long").alias("vm"),
    )
    s = p.groupBy("variant", "post").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("vm").cast("long").alias("sv"),
    )
    mean = F.col("sv").cast("double") / F.col("n")
    w = s.agg(
        F.max(F.when((F.col("variant") == 0) & (F.col("post") == 0), mean)).alias("c_pre"),
        F.max(F.when((F.col("variant") == 0) & (F.col("post") == 1), mean)).alias("c_post"),
        F.max(F.when((F.col("variant") == 1) & (F.col("post") == 0), mean)).alias("t_pre"),
        F.max(F.when((F.col("variant") == 1) & (F.col("post") == 1), mean)).alias("t_post"),
        F.sum("n").cast("long").alias("n_purchases"),
    )
    c_pre, c_post = F.col("c_pre"), F.col("c_post")
    t_pre, t_post = F.col("t_pre"), F.col("t_post")
    return w.select(
        "n_purchases",
        F.round(c_pre / 1000.0, 6).alias("mean_control_pre"),
        F.round(c_post / 1000.0, 6).alias("mean_control_post"),
        F.round(t_pre / 1000.0, 6).alias("mean_treatment_pre"),
        F.round(t_post / 1000.0, 6).alias("mean_treatment_post"),
        F.round(
            (t_post - t_pre) / 1000.0 - (c_post - c_pre) / 1000.0, 6
        ).alias("did_estimate"),
    )


@q(
    "events_survival_km",
    """WITH bounds AS (SELECT max(ts)::DATE AS obs_end FROM events),
       per_user AS (
         SELECT user_id, min(ts)::DATE AS first_day,
                min(CASE WHEN event_type = 'purchase' THEN ts END)::DATE
                  AS first_purchase
         FROM events GROUP BY user_id),
       life AS (
         SELECT CASE WHEN first_purchase IS NOT NULL
                     THEN date_diff('day', first_day, first_purchase)
                     ELSE date_diff('day', first_day, bounds.obs_end)
                END::BIGINT AS dur,
                CASE WHEN first_purchase IS NOT NULL THEN 1 ELSE 0 END
                  AS churned
         FROM per_user CROSS JOIN bounds),
       tot AS (SELECT count(*)::BIGINT AS n_total FROM life),
       by_dur AS (
         SELECT dur, count(*)::BIGINT AS leaving,
                sum(churned)::BIGINT AS d
         FROM life GROUP BY dur),
       risk AS (
         SELECT dur, d,
                (tot.n_total
                  - coalesce(sum(leaving) OVER (
                      ORDER BY dur
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                )::BIGINT AS n_risk
         FROM by_dur CROSS JOIN tot),
       ev AS (SELECT dur, d, n_risk,
                     CASE WHEN d < n_risk
                          THEN (floor(ln(1.0 - d::DOUBLE / n_risk)
                                      * 1000000000))::BIGINT
                     END AS term_nano
              FROM risk WHERE d > 0),
       curve AS (
         SELECT dur, d, n_risk,
                CASE WHEN min(CASE WHEN term_nano IS NULL THEN 0 ELSE 1 END)
                          OVER (ORDER BY dur
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) = 0
                     THEN 0.0
                     ELSE exp(sum(term_nano) OVER (
                            ORDER BY dur
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          / 1000000000.0)
                END AS s
         FROM ev)
       SELECT dur AS duration_days, n_risk AS n_at_risk, d AS churn_events,
              round(s, 6) AS survival
       FROM curve ORDER BY duration_days""",
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier curve for time-to-first-purchase: duration = days
    from a user's first event to their first purchase (the "event");
    users who never purchase are right-censored at the observation end
    (global max event date) — the principled conversion-latency curve
    under censoring, vs ``events_conversion_latency``'s converters-only
    summary. S(t) = Π_{t'≤t} (1 − d_t'/n_t') computed as exp(Σ ln-terms)
    with each ln term floored to integer NANO-units before the
    cumulative sum (one libm ulp cannot survive the grid); a risk set
    fully consumed (d = n) pins S = 0 from that point on. Shape: one
    user-grain aggregation (shuffle on user_id) + a 1-row observation
    bound broadcast, then the curve is built on the DURATION grain —
    bounded by the calendar (≤31 rows here; ≤ a few thousand for years
    of history), so the ordered windows run on a frame that fits one
    task by construction, NOT a single-partition pass over user rows.
    At 100 TB only the user-grain agg sees data volume."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(F.to_date(F.max("ts")).alias("obs_end"))
    per_user = e.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("first_day"),
        F.to_date(
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
        ).alias("first_purchase"),
    )
    life = per_user.crossJoin(F.broadcast(bounds)).select(
        F.when(
            F.col("first_purchase").isNotNull(),
            F.datediff(F.col("first_purchase"), F.col("first_day")),
        )
        .otherwise(F.datediff(F.col("obs_end"), F.col("first_day")))
        .cast("long")
        .alias("dur"),
        F.when(F.col("first_purchase").isNotNull(), 1)
        .otherwise(0)
        .alias("churned"),
    )
    tot = life.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    by_dur = life.groupBy("dur").agg(
        F.count(F.lit(1)).cast("long").alias("leaving"),
        F.sum("churned").cast("long").alias("d"),
    )
    w_prev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    risk = by_dur.crossJoin(F.broadcast(tot)).select(
        "dur",
        "d",
        (
            F.col("n_total")
            - F.coalesce(F.sum("leaving").over(w_prev), F.lit(0))
        ).alias("n_risk"),
    )
    ev = risk.filter(F.col("d") > 0).select(
        "dur",
        "d",
        "n_risk",
        F.when(
            F.col("d") < F.col("n_risk"),
            F.floor(
                F.log(1.0 - F.col("d").cast("double") / F.col("n_risk"))
                * F.lit(1000000000.0)
            ).cast("long"),
        ).alias("term_nano"),
    )
    curve = ev.select(
        "dur",
        "d",
        "n_risk",
        F.when(
            F.min(
                F.when(F.col("term_nano").isNull(), 0).otherwise(1)
            ).over(w_cum)
            == 0,
            F.lit(0.0),
        )
        .otherwise(
            F.exp(F.sum("term_nano").over(w_cum) / F.lit(1000000000.0))
        )
        .alias("s"),
    )
    return curve.select(
        F.col("dur").alias("duration_days"),
        F.col("n_risk").alias("n_at_risk"),
        F.col("d").alias("churn_events"),
        F.round("s", 6).alias("survival"),
    ).orderBy("duration_days")


@q(
    "agg_anova_f",
    """WITH v AS (
         SELECT o_orderpriority AS grp,
                (floor(o_totalprice))::BIGINT AS x
         FROM orders),
       g AS (SELECT grp, count(*)::BIGINT AS ng, sum(x)::BIGINT AS sg
             FROM v GROUP BY grp),
       t AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS s,
                    sum(x * x)::BIGINT AS ss
             FROM v),
       parts AS (
         SELECT (SELECT count(*) FROM g)::BIGINT AS k, t.n,
                sum((floor(g.sg::DOUBLE * g.sg / g.ng))::BIGINT)::BIGINT
                  AS sum_sg2_ng,
                max(t.s)::BIGINT AS s_tot, max(t.ss)::BIGINT AS ss_tot
         FROM g CROSS JOIN t GROUP BY t.n),
       m AS (SELECT k, n,
                    (sum_sg2_ng
                     - (floor(s_tot::DOUBLE * s_tot / n))::BIGINT)::DOUBLE
                      AS ssb,
                    (ss_tot - sum_sg2_ng)::DOUBLE AS ssw
             FROM parts)
       SELECT k AS n_groups, n AS n_rows,
              round(ssb, 6) AS ss_between,
              round(ssw, 6) AS ss_within,
              round((ssb / (k - 1)) / (ssw / (n - k)), 6) AS f_stat
       FROM m""",
)
def agg_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of order total price across the five order
    priorities — the k-group generalization of ``agg_welch_t_test``:
    F = (SSB/(k−1))/(SSW/(n−k)) with SSB = Σ S_g²/n_g − S²/n and
    SSW = ΣΣx² − Σ S_g²/n_g, all from exact whole-dollar int64 group
    sums (whole dollars keep Σx² inside int64 at any benchmarked SF;
    the metric is DEFINED on floored dollars on both engines, so this
    is not a precision compromise but the contract). Each S_g²/n_g term
    is floored to an integer BEFORE the cross-group sum — the k-term
    double accumulation is otherwise order-dependent. Shape: one
    group-grain partial aggregation (k=5 rows) + one global 1-row
    reduce over the same scan — Spark computes both in a single stage
    pair; no sort, no join. The k-row frame then reduces to one row."""
    o = load_table(spark, sf_dir, "orders")
    v = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.floor(F.col("o_totalprice")).cast("long").alias("x"),
    )
    g = v.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum("x").cast("long").alias("sg"),
    )
    t = v.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("ss"),
    )
    parts = (
        g.crossJoin(F.broadcast(t))
        .groupBy("n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.sum(
                F.floor(
                    F.col("sg").cast("double") * F.col("sg") / F.col("ng")
                ).cast("long")
            )
            .cast("long")
            .alias("sum_sg2_ng"),
            F.max(F.col("s")).cast("long").alias("s_tot"),
            F.max(F.col("ss")).cast("long").alias("ss_tot"),
        )
    )
    k, n = F.col("k"), F.col("n")
    ssb = (
        F.col("sum_sg2_ng")
        - F.floor(F.col("s_tot").cast("double") * F.col("s_tot") / n).cast(
            "long"
        )
    ).cast("double")
    ssw = (F.col("ss_tot") - F.col("sum_sg2_ng")).cast("double")
    return parts.select(
        k.alias("n_groups"),
        n.alias("n_rows"),
        F.round(ssb, 6).alias("ss_between"),
        F.round(ssw, 6).alias("ss_within"),
        F.round((ssb / (k - 1)) / (ssw / (n - k)), 6).alias("f_stat"),
    )


# Zelen & Severo 26.2.17 rational approximation of the standard normal
# CDF tail — pure +,*,exp arithmetic, identical on both engines; the
# sqrt(2*pi) constant is written literally so neither engine's pi/sqrt
# enters the expression.
_ZS = dict(
    t="1.0 / (1.0 + 0.2316419 * az)",
    pdf="exp(-az * az / 2.0) / 2.5066282746310002",
    poly=(
        "(0.319381530 * t - 0.356563782 * t * t"
        " + 1.781477937 * t * t * t - 1.821255978 * t * t * t * t"
        " + 1.330274429 * t * t * t * t * t)"
    ),
)


@q(
    "agg_benjamini_hochberg",
    f"""WITH v AS (
         SELECT c_mktsegment AS seg,
                (floor(c_acctbal * 100))::BIGINT AS xc
         FROM customer),
       tot AS (SELECT count(*)::BIGINT AS n, sum(xc)::BIGINT AS s,
                      sum(xc * xc)::BIGINT AS ss
               FROM v),
       g AS (SELECT seg, count(*)::BIGINT AS ng, sum(xc)::BIGINT AS sg,
                    sum(xc * xc)::BIGINT AS ssg
             FROM v GROUP BY seg),
       z AS (SELECT seg, ng,
                    sg::DOUBLE / ng / 100.0 AS mean_seg,
                    (sg::DOUBLE / ng
                     - (tot.s - sg)::DOUBLE / (tot.n - ng))
                    / sqrt(((ssg::DOUBLE - sg::DOUBLE * sg / ng)
                            / (ng - 1)) / ng
                           + (((tot.ss - ssg)::DOUBLE
                               - (tot.s - sg)::DOUBLE * (tot.s - sg)
                                 / (tot.n - ng))
                              / (tot.n - ng - 1)) / (tot.n - ng))
                      AS zval
             FROM g CROSS JOIN tot),
       p AS (SELECT seg, ng, mean_seg, round(zval, 6) AS z_stat,
                    round(2.0 * pdf * {_ZS['poly']}, 9) AS p_raw
             FROM (SELECT seg, ng, mean_seg, zval, abs(zval) AS az,
                          {_ZS['t']} AS t, {_ZS['pdf']} AS pdf
                   FROM z)),
       ranked AS (
         SELECT seg, ng, mean_seg, z_stat, p_raw,
                row_number() OVER (ORDER BY p_raw, seg) AS rk,
                (SELECT count(*) FROM p)::BIGINT AS m
         FROM p),
       adj AS (
         SELECT seg, ng, mean_seg, z_stat, p_raw, rk,
                least(1.0, min(p_raw * m / rk) OVER (
                  ORDER BY rk DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                  AS p_bh
         FROM ranked)
       SELECT seg AS segment, ng AS n_customers,
              round(mean_seg, 6) AS mean_acctbal, z_stat,
              round(p_raw, 6) AS p_value,
              round(p_bh, 6) AS p_bh,
              CASE WHEN p_bh <= 0.05 THEN 1 ELSE 0 END AS reject_fdr_05
       FROM adj ORDER BY rk""",
)
def agg_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over a FAMILY of tests: for each
    market segment, a Welch z of that segment's account balance against
    all other customers (five tests from one scan), p-values via the
    Zelen-Severo 26.2.17 normal-CDF approximation (pure +,*,exp
    arithmetic with a literal sqrt(2π) — bit-identical across engines,
    and p is rounded to 9 dp BEFORE ranking so ordering cannot split),
    then the step-up adjustment p_bh(i) = min_{{j≥i}} p(j)·m/j via a
    reverse-cumulative-min window over the m=5-row test family.
    Scale: sufficient statistics are one segment-grain partial agg +
    one global reduce over the same scan; every window/rank runs on the
    TEST-FAMILY frame (rows = number of hypotheses, not data rows), so
    the single-partition window is bounded by construction."""
    c = load_table(spark, sf_dir, "customer")
    v = c.select(
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") * 100).cast("long").alias("xc"),
    )
    tot = v.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xc").cast("long").alias("s"),
        F.sum(F.col("xc") * F.col("xc")).cast("long").alias("ss"),
    )
    g = v.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum("xc").cast("long").alias("sg"),
        F.sum(F.col("xc") * F.col("xc")).cast("long").alias("ssg"),
    )
    j = g.crossJoin(F.broadcast(tot))
    ng = F.col("ng").cast("double")
    nr = (F.col("n") - F.col("ng")).cast("double")
    sg, ssg = F.col("sg").cast("double"), F.col("ssg").cast("double")
    sr = (F.col("s") - F.col("sg")).cast("double")
    ssr = (F.col("ss") - F.col("ssg")).cast("double")
    var_g = (ssg - sg * sg / ng) / (ng - 1)
    var_r = (ssr - sr * sr / nr) / (nr - 1)
    zval = (sg / ng - sr / nr) / F.sqrt(var_g / ng + var_r / nr)
    z = j.select(
        "seg",
        "ng",
        (sg / ng / 100.0).alias("mean_seg"),
        zval.alias("zval"),
    )
    az = F.abs(F.col("zval"))
    t = 1.0 / (1.0 + 0.2316419 * az)
    pdf = F.exp(-az * az / 2.0) / F.lit(2.5066282746310002)
    poly = (
        0.319381530 * t
        - 0.356563782 * t * t
        + 1.781477937 * t * t * t
        - 1.821255978 * t * t * t * t
        + 1.330274429 * t * t * t * t * t
    )
    p = z.select(
        "seg",
        "ng",
        "mean_seg",
        F.round("zval", 6).alias("z_stat"),
        F.round(2.0 * pdf * poly, 9).alias("p_raw"),
    )
    m = p.agg(F.count(F.lit(1)).cast("long").alias("m"))
    ranked = p.crossJoin(F.broadcast(m)).withColumn(
        "rk", F.row_number().over(Window.orderBy("p_raw", "seg"))
    )
    w_rev = Window.orderBy(F.col("rk").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    adj = ranked.withColumn(
        "p_bh",
        F.least(
            F.lit(1.0),
            F.min(F.col("p_raw") * F.col("m") / F.col("rk")).over(w_rev),
        ),
    )
    return adj.orderBy("rk").select(
        F.col("seg").alias("segment"),
        F.col("ng").alias("n_customers"),
        F.round("mean_seg", 6).alias("mean_acctbal"),
        "z_stat",
        F.round("p_raw", 6).alias("p_value"),
        F.round("p_bh", 6).alias("p_bh"),
        F.when(F.col("p_bh") <= 0.05, 1).otherwise(0).alias("reject_fdr_05"),
    )


# Orders span 1995-2001; 1998-01-01 splits them into real pre/post halves.
_ORDERS_SPLIT = "1998-01-01 00:00:00"


@q(
    "events_revenue_bridge",
    f"""WITH tagged AS (
         SELECT o_orderpriority AS seg,
                CASE WHEN o_orderdate < TIMESTAMP '{_ORDERS_SPLIT}' THEN 0 ELSE 1 END
                  AS post,
                (floor(o_totalprice * 100))::BIGINT AS cents
         FROM orders),
       cells AS (
         SELECT seg, post, count(*)::BIGINT AS n, sum(cents)::BIGINT AS s
         FROM tagged GROUP BY seg, post),
       wide AS (
         SELECT seg,
                coalesce(max(CASE WHEN post = 0 THEN n END), 0)::BIGINT AS n0,
                coalesce(max(CASE WHEN post = 1 THEN n END), 0)::BIGINT AS n1,
                coalesce(max(CASE WHEN post = 0 THEN s END), 0)::BIGINT AS s0,
                coalesce(max(CASE WHEN post = 1 THEN s END), 0)::BIGINT AS s1
         FROM cells GROUP BY seg),
       fx AS (
         SELECT seg, n0, n1,
                round(s0 / 100.0, 6) AS rev_pre,
                round(s1 / 100.0, 6) AS rev_post,
                round((s1 - s0) / 100.0, 6) AS delta_total,
                round(CASE WHEN n0 > 0
                           THEN (n1 - n0) * (s0::DOUBLE / n0) / 100.0
                           ELSE s1 / 100.0 END, 6) AS volume_effect,
                round(CASE WHEN n0 > 0
                           THEN (s1 - n1 * (s0::DOUBLE / n0)) / 100.0
                           ELSE 0 END, 6) AS rate_effect
         FROM wide)
       SELECT seg AS segment, n0 AS n_orders_pre, n1 AS n_orders_post,
              rev_pre, rev_post, delta_total, volume_effect, rate_effect
       FROM fx ORDER BY segment""",
)
def events_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue bridge (metric-tree) decomposition: per segment, the
    pre→post revenue change split into a VOLUME effect ((n₁−n₀)·avg₀)
    and a RATE effect (n₁·(avg₁−avg₀)) that sum exactly to the
    segment's Δ — the "why did the metric move" decomposition every
    analytics review starts from, here with the two effects
    reconciling BY CONSTRUCTION (volume + rate = s₁−s₀ identically, so
    the bridge never leaks). Cell sums are exact cent int64 from one
    conditional aggregation; effects are closed-form doubles on
    identical operands. Shape: one (segment, period) partial agg +
    segment-frame arithmetic — the cheapest bridge there is, identical
    at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    tagged = o.select(
        F.col("o_orderpriority").alias("seg"),
        F.when(
            F.col("o_orderdate") < F.lit(_ORDERS_SPLIT).cast("timestamp"), 0
        )
        .otherwise(1)
        .alias("post"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    cells = tagged.groupBy("seg", "post").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )
    wide = cells.groupBy("seg").agg(
        F.coalesce(F.max(F.when(F.col("post") == 0, F.col("n"))), F.lit(0))
        .cast("long")
        .alias("n0"),
        F.coalesce(F.max(F.when(F.col("post") == 1, F.col("n"))), F.lit(0))
        .cast("long")
        .alias("n1"),
        F.coalesce(F.max(F.when(F.col("post") == 0, F.col("s"))), F.lit(0))
        .cast("long")
        .alias("s0"),
        F.coalesce(F.max(F.when(F.col("post") == 1, F.col("s"))), F.lit(0))
        .cast("long")
        .alias("s1"),
    )
    n0, n1 = F.col("n0"), F.col("n1")
    s0, s1 = F.col("s0").cast("double"), F.col("s1").cast("double")
    avg0 = s0 / n0
    return wide.select(
        F.col("seg").alias("segment"),
        n0.alias("n_orders_pre"),
        n1.alias("n_orders_post"),
        F.round(s0 / 100.0, 6).alias("rev_pre"),
        F.round(s1 / 100.0, 6).alias("rev_post"),
        F.round((s1 - s0) / 100.0, 6).alias("delta_total"),
        F.round(
            F.when(n0 > 0, (n1 - n0) * avg0 / 100.0).otherwise(s1 / 100.0), 6
        ).alias("volume_effect"),
        F.round(
            F.when(n0 > 0, (s1 - n1 * avg0) / 100.0).otherwise(F.lit(0.0)), 6
        ).alias("rate_effect"),
    ).orderBy("segment")


_STRATA = 4  # pre-activity quartiles


@q(
    "events_stratified_ate",
    f"""WITH per_user AS (
         SELECT user_id,
                sum(CASE WHEN ts < TIMESTAMP '{_SPLIT}' THEN 1 ELSE 0 END)
                  ::BIGINT AS pre_n,
                sum(CASE WHEN ts >= TIMESTAMP '{_SPLIT}'
                          AND event_type = 'purchase'
                         THEN (floor(value * 1000))::BIGINT ELSE 0 END)
                  ::BIGINT AS y
         FROM events GROUP BY user_id),
       assigned AS (
         SELECT user_id, pre_n, y,
                CASE WHEN {_ph('user_id::VARCHAR', 7)} % 2 = 0
                     THEN 0 ELSE 1 END AS variant
         FROM per_user),
       vals AS (SELECT pre_n, count(*)::BIGINT AS c
                FROM assigned GROUP BY pre_n),
       cum AS (SELECT pre_n,
                      sum(c) OVER (ORDER BY pre_n
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        ::BIGINT AS cum_c,
                      sum(c) OVER ()::BIGINT AS n
               FROM vals),
       strata AS (
         SELECT pre_n,
                least({_STRATA}, ceil({_STRATA}.0 * cum_c / n))::BIGINT
                  AS stratum
         FROM cum),
       s AS (
         SELECT st.stratum, a.variant, count(*)::BIGINT AS n,
                sum(a.y)::BIGINT AS sy
         FROM assigned a JOIN strata st ON st.pre_n = a.pre_n
         GROUP BY st.stratum, a.variant),
       wide AS (
         SELECT stratum,
                max(CASE WHEN variant = 0 THEN n END)::BIGINT AS n0,
                max(CASE WHEN variant = 1 THEN n END)::BIGINT AS n1,
                max(CASE WHEN variant = 0 THEN sy END)::BIGINT AS sy0,
                max(CASE WHEN variant = 1 THEN sy END)::BIGINT AS sy1
         FROM s GROUP BY stratum)
       SELECT stratum, n0 AS n_control, n1 AS n_treatment,
              round(sy0::DOUBLE / n0 / 1000.0, 6) AS mean_control,
              round(sy1::DOUBLE / n1 / 1000.0, 6) AS mean_treatment,
              round(sy1::DOUBLE / n1 / 1000.0
                    - sy0::DOUBLE / n0 / 1000.0, 6) AS stratum_effect
       FROM wide ORDER BY stratum""",
)
def events_stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified treatment-effect estimation: users are bucketed into
    pre-period activity quartiles (VALUE-grain quantile assignment —
    the llm_curriculum_order rule, so ties never split a stratum) and
    the arm contrast is reported per stratum — the
    propensity-stratification estimator that (a) removes confounding
    carried by pre-activity in observational reads, and (b) exposes
    effect HETEROGENEITY (does the treatment move heavy or light users?)
    that CUPED's single adjusted number averages away. Completes the
    causal family: CUPED (variance), DiD (trend), KM (censoring),
    stratification (heterogeneity + imbalance). All cell statistics
    exact integers. Shape: one user-grain agg, a distinct-value
    cumulative window for strata bounds, one broadcast-back join, a
    (stratum × arm) reduce — no single-partition pass over users."""
    from hawaiidatapipeline_spark.operators.dedup import portable_hash64

    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("ts") < F.lit(_SPLIT).cast("timestamp"), 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("pre_n"),
        F.sum(
            F.when(
                (F.col("ts") >= F.lit(_SPLIT).cast("timestamp"))
                & (F.col("event_type") == "purchase"),
                F.floor(F.col("value") * 1000).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        )
        .cast("long")
        .alias("y"),
    )
    assigned = per_user.select(
        "pre_n",
        "y",
        F.when(
            F.pmod(portable_hash64(F.col("user_id").cast("string"), 7), F.lit(2))
            == 0,
            0,
        )
        .otherwise(1)
        .alias("variant"),
    )
    vals = assigned.groupBy("pre_n").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w_cum = Window.orderBy("pre_n").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("pre_n").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    strata = vals.select(
        "pre_n",
        F.least(
            F.lit(_STRATA),
            F.ceil(
                F.lit(float(_STRATA))
                * F.sum("c").over(w_cum)
                / F.sum("c").over(w_all)
            ),
        )
        .cast("long")
        .alias("stratum"),
    )
    s = (
        assigned.join(F.broadcast(strata), "pre_n")
        .groupBy("stratum", "variant")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("sy"),
        )
    )
    wide = s.groupBy("stratum").agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).cast("long").alias("n0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).cast("long").alias("n1"),
        F.max(F.when(F.col("variant") == 0, F.col("sy"))).cast("long").alias("sy0"),
        F.max(F.when(F.col("variant") == 1, F.col("sy"))).cast("long").alias("sy1"),
    )
    m0 = F.col("sy0").cast("double") / F.col("n0") / 1000.0
    m1 = F.col("sy1").cast("double") / F.col("n1") / 1000.0
    return wide.select(
        "stratum",
        F.col("n0").alias("n_control"),
        F.col("n1").alias("n_treatment"),
        F.round(m0, 6).alias("mean_control"),
        F.round(m1, 6).alias("mean_treatment"),
        F.round(m1 - m0, 6).alias("stratum_effect"),
    ).orderBy("stratum")
