"""Statistical-inference extras: the experiment-analysis surface.

Round-9 batch 4 — the hypothesis-testing toolkit an analytics engine
needs next to the descriptive aggregates: Welch's unequal-variance
t-test (parametric twin of ``agg_mann_whitney_u``), chi-square
independence with Cramér's V effect size, the sample-ratio-mismatch
guardrail every A/B platform runs before reading an experiment,
Spearman rank correlation (the robust twin of
``agg_corr_deterministic``), mutual information between categorical
columns, and the Ljung-Box portmanteau test over the daily event
series (the "is this even noise?" gate before fitting any forecast).

Every float follows the house determinism contract (SURVEY.md §7
risk 1): aggregate EXACT integers (milli/micro fixed-point or
integer ranks) so sums are order-independent at any parallelism,
then evaluate one identical closed-form double expression on both
engines, ``round(…, 6)`` last.
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


@q(
    "agg_welch_t_test",
    """WITH v AS (
         SELECT event_type AS grp,
                (floor(value * 1000))::BIGINT AS xm
         FROM events WHERE event_type IN ('click', 'purchase')),
       s AS (SELECT
               sum(CASE WHEN grp = 'click' THEN 1 ELSE 0 END)::BIGINT AS n1,
               sum(CASE WHEN grp = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n2,
               sum(CASE WHEN grp = 'click' THEN xm ELSE 0 END)::BIGINT AS sx1,
               sum(CASE WHEN grp = 'purchase' THEN xm ELSE 0 END)::BIGINT AS sx2,
               sum(CASE WHEN grp = 'click' THEN xm * xm ELSE 0 END)::BIGINT AS sxx1,
               sum(CASE WHEN grp = 'purchase' THEN xm * xm ELSE 0 END)::BIGINT AS sxx2
             FROM v),
       m AS (SELECT n1, n2,
               sx1::DOUBLE / 1000.0 / n1 AS mean1,
               sx2::DOUBLE / 1000.0 / n2 AS mean2,
               (sxx1::DOUBLE - sx1::DOUBLE * sx1::DOUBLE / n1)
                 / (n1 - 1) / 1000000.0 AS var1,
               (sxx2::DOUBLE - sx2::DOUBLE * sx2::DOUBLE / n2)
                 / (n2 - 1) / 1000000.0 AS var2
             FROM s)
       SELECT n1 AS n_click, n2 AS n_purchase,
              round(mean1, 6) AS mean_click,
              round(mean2, 6) AS mean_purchase,
              round((mean1 - mean2)
                    / sqrt(var1 / n1 + var2 / n2), 6) AS t_stat,
              round(pow(var1 / n1 + var2 / n2, 2)
                    / (pow(var1 / n1, 2) / (n1 - 1)
                       + pow(var2 / n2, 2) / (n2 - 1)), 6) AS df_welch
       FROM m""",
)
def agg_welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test on click vs purchase
    event values — the parametric companion of ``agg_mann_whitney_u``
    with the Satterthwaite degrees-of-freedom correction. Values are
    floored to integer milli-units BEFORE aggregation, so the five
    sufficient statistics (n, Σx, Σx² per group) are exact 64-bit sums
    — order-independent at any parallelism — and mean/variance/t/df
    are one closed-form double expression evaluated identically on
    both engines. Scale note: this is ONE partial-aggregated pass over
    the fact table (six conditional sums), the cheapest possible shape
    — no sort, no join, no second pass; at 100 TB it is a map-side
    combine plus a 1-row reduce."""
    e = load_table(spark, sf_dir, "events")
    xm = F.floor(F.col("value") * 1000).cast("long")
    v = e.filter(F.col("event_type").isin("click", "purchase")).select(
        F.col("event_type").alias("grp"), xm.alias("xm")
    )
    s = v.agg(
        F.sum(F.when(F.col("grp") == "click", 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("grp") == "purchase", 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(F.col("grp") == "click", F.col("xm")).otherwise(0)).cast("long").alias("sx1"),
        F.sum(F.when(F.col("grp") == "purchase", F.col("xm")).otherwise(0)).cast("long").alias("sx2"),
        F.sum(F.when(F.col("grp") == "click", F.col("xm") * F.col("xm")).otherwise(0)).cast("long").alias("sxx1"),
        F.sum(F.when(F.col("grp") == "purchase", F.col("xm") * F.col("xm")).otherwise(0)).cast("long").alias("sxx2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    mean1 = F.col("sx1").cast("double") / 1000.0 / n1
    mean2 = F.col("sx2").cast("double") / 1000.0 / n2
    var1 = (
        (F.col("sxx1").cast("double") - F.col("sx1").cast("double") * F.col("sx1").cast("double") / n1)
        / (n1 - 1)
        / 1000000.0
    )
    var2 = (
        (F.col("sxx2").cast("double") - F.col("sx2").cast("double") * F.col("sx2").cast("double") / n2)
        / (n2 - 1)
        / 1000000.0
    )
    se2 = var1 / n1 + var2 / n2
    return s.select(
        n1.alias("n_click"),
        n2.alias("n_purchase"),
        F.round(mean1, 6).alias("mean_click"),
        F.round(mean2, 6).alias("mean_purchase"),
        F.round((mean1 - mean2) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(
            F.pow(se2, F.lit(2))
            / (F.pow(var1 / n1, F.lit(2)) / (n1 - 1) + F.pow(var2 / n2, F.lit(2)) / (n2 - 1)),
            6,
        ).alias("df_welch"),
    )


@q(
    "agg_chi2_cramers_v",
    """WITH cells AS (
         SELECT o_orderpriority AS r, o_orderstatus AS c,
                count(*)::BIGINT AS n
         FROM orders GROUP BY 1, 2),
       rm AS (SELECT r, sum(n)::BIGINT AS rn FROM cells GROUP BY r),
       cm AS (SELECT c, sum(n)::BIGINT AS cn FROM cells GROUP BY c),
       tot AS (SELECT sum(n)::BIGINT AS nn,
                      count(DISTINCT r)::BIGINT AS nr,
                      count(DISTINCT c)::BIGINT AS nc
               FROM cells),
       terms AS (
         SELECT (floor(
                   pow(cells.n::DOUBLE
                       - rm.rn::DOUBLE * cm.cn::DOUBLE / tot.nn, 2)
                   / (rm.rn::DOUBLE * cm.cn::DOUBLE / tot.nn)
                   * 1000000))::BIGINT AS term_micro
         FROM cells JOIN rm USING (r) JOIN cm USING (c) CROSS JOIN tot),
       chi AS (SELECT sum(term_micro)::BIGINT AS chi_micro FROM terms)
       SELECT t.nn AS n_orders, t.nr AS n_priorities, t.nc AS n_statuses,
              (t.nr - 1) * (t.nc - 1) AS dof,
              round(chi.chi_micro::DOUBLE / 1000000.0, 6) AS chi2,
              round(sqrt(chi.chi_micro::DOUBLE / 1000000.0
                         / (t.nn * least(t.nr - 1, t.nc - 1))), 6) AS cramers_v
       FROM tot t CROSS JOIN chi""",
)
def agg_chi2_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between order priority and order
    status, with Cramér's V effect size — the categorical-association
    audit (are these two dimensions redundant?) that complements the
    numeric ``agg_corr_deterministic``. The contingency table is one
    groupBy of exact counts; each cell's (O−E)²/E term is floored to
    integer micro-units before the (tiny, cells-count-sized) sum, so
    the statistic is hash-stable. Scale note: cost is ONE count
    aggregation over the fact table; everything after runs on the
    R×C cell table (≤ dozens of rows), with the margins broadcast."""
    o = load_table(spark, sf_dir, "orders")
    cells = (
        o.groupBy(F.col("o_orderpriority").alias("r"), F.col("o_orderstatus").alias("c"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rm = cells.groupBy("r").agg(F.sum("n").alias("rn"))
    cm = cells.groupBy("c").agg(F.sum("n").alias("cn"))
    tot = cells.agg(
        F.sum("n").alias("nn"),
        F.count_distinct("r").alias("nr"),
        F.count_distinct("c").alias("nc"),
    )
    e = F.col("rn").cast("double") * F.col("cn").cast("double") / F.col("nn")
    term = F.floor(
        F.pow(F.col("n").cast("double") - e, F.lit(2)) / e * 1000000
    ).cast("long")
    chi = (
        cells.join(F.broadcast(rm), "r")
        .join(F.broadcast(cm), "c")
        .crossJoin(F.broadcast(tot))
        .select(term.alias("term_micro"))
        .agg(F.sum("term_micro").cast("long").alias("chi_micro"))
    )
    chi2 = F.col("chi_micro").cast("double") / 1000000.0
    return tot.crossJoin(F.broadcast(chi)).select(
        F.col("nn").alias("n_orders"),
        F.col("nr").alias("n_priorities"),
        F.col("nc").alias("n_statuses"),
        ((F.col("nr") - 1) * (F.col("nc") - 1)).alias("dof"),
        F.round(chi2, 6).alias("chi2"),
        F.round(
            F.sqrt(chi2 / (F.col("nn") * F.least(F.col("nr") - 1, F.col("nc") - 1))), 6
        ).alias("cramers_v"),
    )


@q(
    "agg_ab_srm_check",
    f"""WITH u AS (SELECT DISTINCT user_id FROM events),
       assigned AS (
         SELECT user_id,
                CASE WHEN {_ph('user_id::VARCHAR', 7)} % 2 = 0
                     THEN 'control' ELSE 'treatment' END AS variant
         FROM u),
       s AS (SELECT
               sum(CASE WHEN variant = 'control' THEN 1 ELSE 0 END)::BIGINT AS n0,
               sum(CASE WHEN variant = 'treatment' THEN 1 ELSE 0 END)::BIGINT AS n1
             FROM assigned)
       SELECT n0 AS n_control, n1 AS n_treatment,
              round((n0 - n1)::DOUBLE * (n0 - n1)::DOUBLE
                    / (n0 + n1), 6) AS chi2,
              (n0 - n1)::DOUBLE * (n0 - n1)::DOUBLE / (n0 + n1)
                > 3.841459 AS srm_flag
       FROM s""",
)
def agg_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail for a 50/50 experiment split: users
    are assigned by the portable content hash (the same deterministic
    bucketing as ``llm_train_val_split``), then the observed counts are
    tested against the expected equal split with the 1-df chi-square
    (which reduces to (n0−n1)²/N for a 50/50 design) at α = 0.05. An
    SRM flag means the assignment or logging pipeline is biased and the
    experiment readout (``events_ab_lift``) cannot be trusted. Scale
    note: distinct users is one shuffle on user_id; the test itself is
    a 1-row closed form on two exact counts."""
    from hawaiidatapipeline_spark.operators.dedup import portable_hash64

    e = load_table(spark, sf_dir, "events")
    u = e.select("user_id").distinct()
    variant = F.when(
        F.pmod(portable_hash64(F.col("user_id").cast("string"), 7), F.lit(2)) == 0,
        "control",
    ).otherwise("treatment")
    s = u.select(variant.alias("variant")).agg(
        F.sum(F.when(F.col("variant") == "control", 1).otherwise(0)).cast("long").alias("n0"),
        F.sum(F.when(F.col("variant") == "treatment", 1).otherwise(0)).cast("long").alias("n1"),
    )
    d = (F.col("n0") - F.col("n1")).cast("double")
    chi2 = d * d / (F.col("n0") + F.col("n1"))
    return s.select(
        F.col("n0").alias("n_control"),
        F.col("n1").alias("n_treatment"),
        F.round(chi2, 6).alias("chi2"),
        (chi2 > 3.841459).alias("srm_flag"),
    )


@q(
    "agg_spearman_corr",
    """WITH v AS (
         SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem),
       r AS (SELECT
               (2 * rank() OVER (ORDER BY x)
                  + count(*) OVER (PARTITION BY x) - 1)::BIGINT AS a,
               (2 * rank() OVER (ORDER BY y)
                  + count(*) OVER (PARTITION BY y) - 1)::BIGINT AS b
             FROM v),
       s AS (SELECT count(*)::BIGINT AS n,
                    sum(a)::BIGINT AS sa, sum(b)::BIGINT AS sb,
                    sum(a * b)::BIGINT AS sab,
                    sum(a * a)::BIGINT AS saa,
                    sum(b * b)::BIGINT AS sbb
             FROM r)
       SELECT n AS n_rows,
              round((n::DOUBLE * sab - sa::DOUBLE * sb)
                    / sqrt((n::DOUBLE * saa - sa::DOUBLE * sa)
                           * (n::DOUBLE * sbb - sb::DOUBLE * sb)),
                    6) AS spearman_rho
       FROM s""",
)
def agg_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between line-item quantity and extended
    price — the outlier-robust, monotonic-association twin of
    ``agg_corr_deterministic`` (Pearson). Average ranks for ties land
    on the exact .5 grid, so DOUBLED ranks (2·rank + tie_count − 1) are
    exact integers; all five sufficient statistics are exact 64-bit
    sums and rho is Pearson's closed form on them, evaluated once in
    doubles identically on both engines. Scale note: ranks come from
    the DISTRIBUTED rank map (operators/ranks.py — range-partitioned
    local cumsums + a broadcast prefix over one row per partition),
    never a single-partition ``Window.orderBy``; the per-value maps
    join back by value equality. No pair enumeration anywhere."""
    from hawaiidatapipeline_spark.operators.ranks import doubled_avg_rank_map

    li = load_table(spark, sf_dir, "lineitem")
    v = li.select(F.col("l_quantity").alias("x"), F.col("l_extendedprice").alias("y"))
    amap = doubled_avg_rank_map(v, "x", "a")
    bmap = doubled_avg_rank_map(v, "y", "b")
    # x = l_quantity has a fixed ~50-value domain (TPC-H law), so its rank
    # map is always broadcastable — saves shuffling the fact table on x
    # (guide §3.1: hint when you know a side is small). y's map scales
    # with distinct prices and keeps the shuffle join.
    r = v.join(F.broadcast(amap), "x").join(bmap, "y").select("a", "b")
    s = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("a").cast("long").alias("sa"),
        F.sum("b").cast("long").alias("sb"),
        F.sum(F.col("a") * F.col("b")).cast("long").alias("sab"),
        F.sum(F.col("a") * F.col("a")).cast("long").alias("saa"),
        F.sum(F.col("b") * F.col("b")).cast("long").alias("sbb"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sab") - F.col("sa").cast("double") * F.col("sb")
    den = F.sqrt(
        (n * F.col("saa") - F.col("sa").cast("double") * F.col("sa"))
        * (n * F.col("sbb") - F.col("sb").cast("double") * F.col("sb"))
    )
    return s.select(
        F.col("n").alias("n_rows"),
        F.round(num / den, 6).alias("spearman_rho"),
    )


@q(
    "dq_mutual_information",
    """WITH cells AS (
         SELECT lang AS r, source AS c, count(*)::BIGINT AS n
         FROM documents GROUP BY 1, 2),
       rm AS (SELECT r, sum(n)::BIGINT AS rn FROM cells GROUP BY r),
       cm AS (SELECT c, sum(n)::BIGINT AS cn FROM cells GROUP BY c),
       tot AS (SELECT sum(n)::BIGINT AS nn FROM cells),
       mi AS (SELECT sum((floor(cells.n::DOUBLE
                     * log2(tot.nn::DOUBLE * cells.n
                            / (rm.rn::DOUBLE * cm.cn))
                     * 1000000))::BIGINT)::BIGINT AS mi_micro
              FROM cells JOIN rm USING (r) JOIN cm USING (c) CROSS JOIN tot),
       hr AS (SELECT sum((floor(rn::DOUBLE * log2(rn::DOUBLE)
                                * 1000000))::BIGINT)::BIGINT AS s FROM rm),
       hc AS (SELECT sum((floor(cn::DOUBLE * log2(cn::DOUBLE)
                                * 1000000))::BIGINT)::BIGINT AS s FROM cm)
       SELECT t.nn AS n_docs,
              (SELECT count(*) FROM cells) AS n_cells,
              round(mi.mi_micro::DOUBLE / 1000000.0 / t.nn, 6) AS mi_bits,
              round((mi.mi_micro::DOUBLE / 1000000.0 / t.nn)
                    / least(log2(t.nn::DOUBLE) - hr.s::DOUBLE / 1000000.0 / t.nn,
                            log2(t.nn::DOUBLE) - hc.s::DOUBLE / 1000000.0 / t.nn),
                    6) AS nmi
       FROM tot t CROSS JOIN mi CROSS JOIN hr CROSS JOIN hc""",
)
def dq_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (bits) between document language and source,
    normalized by min-entropy — the information-theoretic dependence
    audit that catches associations chi-square scores but entropy
    alone cannot (is `lang` mostly determined by `source`? NMI → 1).
    Every n·log2 term is floored to integer micro-units before its
    (cells-sized) sum — the ``agg_entropy`` identity H = log2(N) −
    (1/N)Σ n·log2(n) applied to both margins and the joint. Scale
    note: one count aggregation over the table; all log arithmetic on
    the R×C cell frame with broadcast margins."""
    d = load_table(spark, sf_dir, "documents")
    cells = d.groupBy(F.col("lang").alias("r"), F.col("source").alias("c")).agg(
        F.count(F.lit(1)).alias("n")
    )
    rm = cells.groupBy("r").agg(F.sum("n").alias("rn"))
    cm = cells.groupBy("c").agg(F.sum("n").alias("cn"))
    tot = cells.agg(F.sum("n").alias("nn"))
    n_cells = cells.agg(F.count(F.lit(1)).alias("n_cells"))
    mi_term = F.floor(
        F.col("n").cast("double")
        * F.log2(F.col("nn").cast("double") * F.col("n") / (F.col("rn").cast("double") * F.col("cn")))
        * 1000000
    ).cast("long")
    mi = (
        cells.join(F.broadcast(rm), "r")
        .join(F.broadcast(cm), "c")
        .crossJoin(F.broadcast(tot))
        .select(mi_term.alias("t"))
        .agg(F.sum("t").cast("long").alias("mi_micro"))
    )
    ent_term = lambda col: F.floor(  # noqa: E731
        col.cast("double") * F.log2(col.cast("double")) * 1000000
    ).cast("long")
    hr = rm.select(ent_term(F.col("rn")).alias("t")).agg(F.sum("t").cast("long").alias("hr_s"))
    hc = cm.select(ent_term(F.col("cn")).alias("t")).agg(F.sum("t").cast("long").alias("hc_s"))
    nn = F.col("nn")
    mi_bits = F.col("mi_micro").cast("double") / 1000000.0 / nn
    h_r = F.log2(nn.cast("double")) - F.col("hr_s").cast("double") / 1000000.0 / nn
    h_c = F.log2(nn.cast("double")) - F.col("hc_s").cast("double") / 1000000.0 / nn
    return (
        tot.crossJoin(F.broadcast(n_cells))
        .crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hr))
        .crossJoin(F.broadcast(hc))
        .select(
            nn.alias("n_docs"),
            F.col("n_cells"),
            F.round(mi_bits, 6).alias("mi_bits"),
            F.round(mi_bits / F.least(h_r, h_c), 6).alias("nmi"),
        )
    )


@q(
    "ts_ljung_box",
    """WITH daily AS (
         SELECT date_trunc('day', ts) AS d, count(*)::BIGINT AS x
         FROM events GROUP BY 1),
       s AS (SELECT row_number() OVER (ORDER BY d) AS t, x FROM daily),
       g AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
                    sum(x * x)::BIGINT AS sxx
             FROM s),
       lags AS (SELECT unnest(generate_series(1, 7)) AS k),
       cross_k AS (
         SELECT l.k,
                sum(a.x * b.x)::BIGINT AS ck,
                sum(b.x)::BIGINT AS sh,
                sum(a.x)::BIGINT AS st
         FROM lags l
         JOIN s a ON a.t > l.k
         JOIN s b ON b.t = a.t - l.k
         GROUP BY l.k),
       acf AS (
         SELECT c.k, g.n,
                (c.ck::DOUBLE
                 - (g.sx::DOUBLE / g.n) * (c.sh + c.st)
                 + (g.n - c.k) * (g.sx::DOUBLE / g.n) * (g.sx::DOUBLE / g.n))
                / (g.sxx::DOUBLE - g.sx::DOUBLE * g.sx / g.n) AS r
         FROM cross_k c CROSS JOIN g),
       terms AS (
         SELECT k, n, r,
                (floor(r * r / (n - k) * 1000000000000))::BIGINT AS term_pico
         FROM acf)
       SELECT k AS lag, round(r, 6) AS acf,
              round(n::DOUBLE * (n + 2)
                    * (sum(term_pico) OVER (ORDER BY k
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE
                    / 1000000000000.0, 6) AS q_stat
       FROM terms ORDER BY lag""",
)
def ts_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test over the daily event-count series:
    autocorrelations at lags 1..7 plus the cumulative Q statistic — the
    "is there any serial structure at all?" gate run before fitting
    seasonal models (``ts_seasonal_decompose``/``events_forecast_*``);
    Q above the chi-square critical value at lag 7 rejects white noise.
    Daily counts are exact integers, so every lagged cross-product
    Σx_t·x_{t−k} and marginal sum is an exact 64-bit aggregate; the
    ACF is one closed-form double expression on them, and each
    r²/(n−k) term is floored to pico-units so the running Q is an
    exact integer window sum. Scale note: the only pass over raw data
    is the daily count; the lag joins run on the tiny day-indexed
    series (one row per day), broadcast everywhere."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", F.col("ts")).alias("d")).agg(
        F.count(F.lit(1)).alias("x")
    )
    s = daily.select(F.row_number().over(Window.orderBy("d")).alias("t"), "x")
    g = s.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    lags = spark.range(1, 8).select(F.col("id").alias("k"))
    a = s.alias("a")
    b = s.alias("b")
    cross_k = (
        lags.join(a, F.col("a.t") > F.col("k"))
        .join(b, F.col("b.t") == F.col("a.t") - F.col("k"))
        .groupBy("k")
        .agg(
            F.sum(F.col("a.x") * F.col("b.x")).cast("long").alias("ck"),
            F.sum(F.col("b.x")).cast("long").alias("sh"),
            F.sum(F.col("a.x")).cast("long").alias("st"),
        )
    )
    n = F.col("n")
    mean = F.col("sx").cast("double") / n
    r = (
        F.col("ck").cast("double")
        - mean * (F.col("sh") + F.col("st"))
        + (n - F.col("k")) * mean * mean
    ) / (F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx") / n)
    terms = cross_k.crossJoin(F.broadcast(g)).select(
        "k",
        "n",
        r.alias("r"),
        F.floor(r * r / (n - F.col("k")) * F.lit(1000000000000)).cast("long").alias("term_pico"),
    )
    wq = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return terms.select(
        F.col("k").alias("lag"),
        F.round("r", 6).alias("acf"),
        F.round(
            F.col("n").cast("double")
            * (F.col("n") + 2)
            * F.sum("term_pico").over(wq).cast("double")
            / 1000000000000.0,
            6,
        ).alias("q_stat"),
    ).orderBy("lag")


@q(
    "events_ab_proportion_z",
    f"""WITH u AS (SELECT DISTINCT user_id FROM events),
       conv AS (SELECT DISTINCT user_id FROM events
                WHERE event_type = 'purchase'),
       assigned AS (
         SELECT u.user_id,
                CASE WHEN {_ph('u.user_id::VARCHAR', 7)} % 2 = 0
                     THEN 0 ELSE 1 END AS variant,
                CASE WHEN conv.user_id IS NOT NULL THEN 1 ELSE 0 END AS converted
         FROM u LEFT JOIN conv ON u.user_id = conv.user_id),
       s AS (SELECT
               sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
               sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
               sum(CASE WHEN variant = 0 THEN converted ELSE 0 END)::BIGINT AS x0,
               sum(CASE WHEN variant = 1 THEN converted ELSE 0 END)::BIGINT AS x1
             FROM assigned)
       SELECT n0 AS n_control, n1 AS n_treatment,
              x0 AS conv_control, x1 AS conv_treatment,
              round(x0::DOUBLE / n0, 6) AS cvr_control,
              round(x1::DOUBLE / n1, 6) AS cvr_treatment,
              CASE WHEN sqrt(((x0 + x1)::DOUBLE / (n0 + n1))
                            * (1.0 - (x0 + x1)::DOUBLE / (n0 + n1))
                            * (1.0 / n0 + 1.0 / n1)) > 0
                   THEN round((x1::DOUBLE / n1 - x0::DOUBLE / n0)
                        / sqrt(((x0 + x1)::DOUBLE / (n0 + n1))
                               * (1.0 - (x0 + x1)::DOUBLE / (n0 + n1))
                               * (1.0 / n0 + 1.0 / n1)), 6)
              END AS z_score
       FROM s""",
)
def events_ab_proportion_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on conversion (any purchase) between the
    hash-assigned experiment arms — the categorical companion of
    ``agg_welch_t_test`` (means) and the readout that
    ``agg_ab_srm_check`` gates: same seed-7 portable assignment, pooled
    standard error. The four sufficient statistics are exact integer
    counts off one distinct-users pass plus a purchase semi-join; z is
    one closed-form double expression. Scale note: two shuffles on
    user_id (distinct + left join), then a 1-row reduce."""
    from hawaiidatapipeline_spark.operators.dedup import portable_hash64

    e = load_table(spark, sf_dir, "events")
    u = e.select("user_id").distinct()
    conv = (
        e.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    )
    assigned = u.join(
        conv.withColumn("converted", F.lit(1)), "user_id", "left"
    ).select(
        F.when(
            F.pmod(portable_hash64(F.col("user_id").cast("string"), 7), F.lit(2))
            == 0,
            0,
        )
        .otherwise(1)
        .alias("variant"),
        F.coalesce(F.col("converted"), F.lit(0)).alias("converted"),
    )
    s = assigned.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).cast("long").alias("n0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("variant") == 0, F.col("converted")).otherwise(0)).cast("long").alias("x0"),
        F.sum(F.when(F.col("variant") == 1, F.col("converted")).otherwise(0)).cast("long").alias("x1"),
    )
    n0, n1, x0, x1 = (F.col(c) for c in ("n0", "n1", "x0", "x1"))
    p0 = x0.cast("double") / n0
    p1 = x1.cast("double") / n1
    pp = (x0 + x1).cast("double") / (n0 + n1)
    return s.select(
        n0.alias("n_control"),
        n1.alias("n_treatment"),
        x0.alias("conv_control"),
        x1.alias("conv_treatment"),
        F.round(p0, 6).alias("cvr_control"),
        F.round(p1, 6).alias("cvr_treatment"),
        F.when(
            F.sqrt(pp * (1.0 - pp) * (1.0 / n0 + 1.0 / n1)) > 0,
            F.round(
                (p1 - p0) / F.sqrt(pp * (1.0 - pp) * (1.0 / n0 + 1.0 / n1)), 6
            ),
        ).alias("z_score"),
    )
