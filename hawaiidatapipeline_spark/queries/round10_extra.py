"""Round-10 batch 2: exact-quantile grid on the distributed rank path,
inequality indices, link-prediction Jaccard, ops/data-quality reports,
and user-behavior analytics — all exact (E) DuckDB oracles.

House discipline throughout: integer lanes up to the last closed-form
expression (cents/micro units, floored transcendental terms summed as
int64), deterministic orders with explicit tie-breaks, floats rounded to
6 dp on BOTH engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.ranks import partitioned_prefix_sums
from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()


@q(
    "agg_percentile_exact_grid",
    """WITH vals AS (
         SELECT floor(o_totalprice * 100)::BIGINT AS cents,
                count(*)::BIGINT AS c
         FROM orders GROUP BY 1),
       cum AS (
         SELECT cents, c,
                sum(c) OVER (ORDER BY cents
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW)::BIGINT AS cum_n,
                sum(c) OVER ()::BIGINT AS n
         FROM vals),
       g AS (SELECT unnest([25, 50, 75, 90, 99])::BIGINT AS p)
       SELECT g.p,
              max(cum.n)::BIGINT AS n_rows,
              round(min(cum.cents) / 100.0, 2) AS quantile
       FROM cum JOIN g ON cum.cum_n >= (g.p * cum.n + 99) // 100
       GROUP BY g.p ORDER BY g.p""",
)
def agg_percentile_exact_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentile grid (p25/50/75/90/99 of order totals) at any
    scale — the exact counterpart to agg_percentile_approx's sketch and
    agg_quantile_histogram's binned estimate. Lower-quantile definition:
    the smallest value whose inclusive cumulative count reaches
    ceil(p·n/100). The cumulative counts come from operators/ranks.py
    partitioned_prefix_sums (range-sliced parallel cumsum; the serial
    prefix pass sees one row per partition), so unlike the textbook
    ``ntile``/global-sort approach there is NO single-partition stage:
    the value grain (~|orders| for continuous prices) cumsums in range
    slices, and each percentile is a 5-way broadcast-join + min. All
    integers until the final cents→dollars division."""
    o = load_table(spark, sf_dir, "orders")
    vals = o.groupBy(
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = vals.agg(F.sum("c").cast("long").alias("n"))
    cum = partitioned_prefix_sums(vals, [F.col("cents")], {"cum_n": "c"}).crossJoin(
        F.broadcast(tot)
    )
    grid = spark.createDataFrame([(25,), (50,), (75,), (90,), (99,)], "p long")
    target = (F.col("p") * F.col("n") + 99) / 100
    return (
        cum.join(
            F.broadcast(grid),
            F.col("cum_n") >= F.floor(target).cast("long"),
        )
        .groupBy("p")
        .agg(
            F.max("n").cast("long").alias("n_rows"),
            F.round(F.min("cents") / 100.0, 2).alias("quantile"),
        )
        .orderBy("p")
    )


@q(
    "agg_theil_index",
    """WITH pc AS (
         SELECT o_custkey,
                sum(floor(o_totalprice * 100)::BIGINT)::BIGINT AS cents
         FROM orders GROUP BY 1),
       s AS (
         SELECT count(*)::BIGINT AS n,
                sum(cents)::BIGINT AS total,
                sum((floor(cents::DOUBLE * ln(cents::DOUBLE)
                           * 1000))::BIGINT)::BIGINT AS sum_xlnx_milli,
                sum((floor(ln(cents::DOUBLE) * 1000000))::BIGINT)::BIGINT
                  AS sum_lnx_micro
         FROM pc)
       SELECT n, total,
              round((sum_xlnx_milli::DOUBLE / 1000.0) / total
                    - ln(total::DOUBLE / n), 6) AS theil_t,
              round(ln(total::DOUBLE / n)
                    - (sum_lnx_micro::DOUBLE / 1000000.0) / n, 6) AS theil_l
       FROM s""",
)
def agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T and Theil L (mean log deviation) inequality indices over
    per-customer revenue — the decomposable complements to
    agg_gini_lorenz (Theil is additively decomposable across subgroups;
    Gini is not). Identities avoid any per-row mean reference:
    T = Σx·ln(x)/(n·μ)·(n/1) − ln μ  →  (Σ x·ln x)/total − ln(total/n);
    L = ln μ − (Σ ln x)/n. Each transcendental term is floored to an
    integer grid BEFORE summing (x·ln x in milli-units — bounded by
    cents·18·1e3 ≈ 2e12 per term, safely inside int64 at fixture scale;
    at larger scales widen to decimal(38) sums — the agg_entropy
    recipe), so the aggregates are order-independent exact integers and
    only the final closed form runs in doubles on both engines."""
    o = load_table(spark, sf_dir, "orders")
    pc = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    cd = F.col("cents").cast("double")
    s = pc.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("total"),
        F.sum(F.floor(cd * F.log(cd) * 1000).cast("long"))
        .cast("long")
        .alias("sum_xlnx_milli"),
        F.sum(F.floor(F.log(cd) * 1000000).cast("long"))
        .cast("long")
        .alias("sum_lnx_micro"),
    )
    ln_mu = F.log(F.col("total").cast("double") / F.col("n"))
    return s.select(
        "n",
        "total",
        F.round(
            (F.col("sum_xlnx_milli").cast("double") / 1000.0) / F.col("total")
            - ln_mu,
            6,
        ).alias("theil_t"),
        F.round(
            ln_mu - (F.col("sum_lnx_micro").cast("double") / 1000000.0) / F.col("n"),
            6,
        ).alias("theil_l"),
    )


_JC_HUB_CAP = 40  # same stop-hub bar as graph_link_prediction/adamic_adar


@q(
    "graph_jaccard_links",
    f"""WITH items AS (
         SELECT l_orderkey, l_partkey
         FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
         QUALIFY count(*) OVER (PARTITION BY l_orderkey) <= 64),
       e AS (SELECT a.l_partkey AS u, b.l_partkey AS v
             FROM items a JOIN items b
               ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             GROUP BY 1, 2 HAVING count(*) >= 2),
       adj AS (SELECT u AS node, v AS nbr FROM e
               UNION ALL SELECT v AS node, u AS nbr FROM e),
       deg AS (SELECT node, count(*) AS deg FROM adj GROUP BY node),
       w AS (SELECT a.node AS na, b.node AS nb, count(*) AS cn
             FROM adj a JOIN adj b ON a.nbr = b.nbr AND a.node < b.node
             JOIN deg d ON d.node = a.nbr
             WHERE d.deg <= {_JC_HUB_CAP}
             GROUP BY 1, 2),
       scored AS (
         SELECT w.na, w.nb, w.cn,
                round(w.cn::DOUBLE / (da.deg + db.deg - w.cn), 6) AS jc
         FROM w JOIN deg da ON da.node = w.na
                JOIN deg db ON db.node = w.nb),
       nonadj AS (SELECT s.* FROM scored s LEFT JOIN e
                  ON e.u = s.na AND e.v = s.nb WHERE e.u IS NULL)
       SELECT na AS part_a, nb AS part_b, cn AS common_neighbors,
              jc AS jaccard
       FROM nonadj
       ORDER BY jc DESC, part_a, part_b LIMIT 50""",
)
def graph_jaccard_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood-Jaccard link prediction over the part co-purchase
    graph: |N(a)∩N(b)| / |N(a)∪N(b)| for non-adjacent pairs — the
    size-normalized member of the link-prediction family (common
    neighbors favors hubs; Adamic-Adar discounts them; Jaccard
    normalizes by both endpoint degrees). Same wedge plan and STOP-HUB
    cap as its siblings: wedges only through centers with deg ≤ 40, so
    wedge volume is Σ min(deg, cap)² not Σ deg². Pure integer counts up
    to one rounded division; top-50 ordered by the ROUNDED score with
    (a, b) tie-breaks — identical ranks on both engines."""
    from hawaiidatapipeline_spark.operators.graph import copurchase_edges
    from hawaiidatapipeline_spark.operators.materialize import materialize

    li = load_table(spark, sf_dir, "lineitem")
    edges = materialize(copurchase_edges(li))  # (u, v), u < v
    adj = materialize(
        edges.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
            edges.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
        )
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    centers = deg.filter(F.col("deg") <= _JC_HUB_CAP).select("node")
    a, b = adj.alias("a"), adj.alias("b")
    wedges = (
        a.join(b, (F.col("a.nbr") == F.col("b.nbr")) & (F.col("a.node") < F.col("b.node")))
        .join(F.broadcast(centers.withColumnRenamed("node", "nbr")), "nbr")
        .groupBy(F.col("a.node").alias("na"), F.col("b.node").alias("nb"))
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    da = deg.select(F.col("node").alias("na"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("nb"), F.col("deg").alias("deg_b"))
    scored = (
        wedges.join(da, "na")
        .join(db, "nb")
        .select(
            "na",
            "nb",
            "cn",
            F.round(
                F.col("cn").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("cn")),
                6,
            ).alias("jc"),
        )
    )
    nonadj = scored.join(
        edges,
        (scored["na"] == edges["u"]) & (scored["nb"] == edges["v"]),
        "left_anti",
    )
    return (
        nonadj.select(
            F.col("na").alias("part_a"),
            F.col("nb").alias("part_b"),
            F.col("cn").alias("common_neighbors"),
            F.col("jc").alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "part_a", "part_b")
        .limit(50)
    )


@q(
    "dq_row_count_anomaly",
    """WITH daily AS (
         SELECT date_trunc('day', ts) AS day, count(*)::BIGINT AS n
         FROM events GROUP BY 1),
       w AS (
         SELECT day, n,
                count(*) OVER tw AS k,
                sum(n) OVER tw::BIGINT AS s,
                sum(n * n) OVER tw::BIGINT AS ss
         FROM daily
         WINDOW tw AS (ORDER BY day ROWS BETWEEN 28 PRECEDING
                       AND 1 PRECEDING))
       SELECT day, n,
              round(s::DOUBLE / k, 6) AS trailing_mean,
              round((n * k - s)
                    / sqrt(greatest(k::DOUBLE * ss - s::DOUBLE * s, 1.0)),
                    6) AS z_score,
              CASE WHEN abs(n * k - s)
                        > 3 * sqrt(greatest(k::DOUBLE * ss
                                            - s::DOUBLE * s, 1.0))
                   THEN 1 ELSE 0 END AS is_anomaly
       FROM w WHERE k >= 7 ORDER BY day""",
)
def dq_row_count_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly monitor: each day's event count scored against the
    trailing 28-day window (current day excluded) — the freshness-check
    companion every ingestion pipeline pages on (a stuck upstream shows
    as a low-z day before any content check fires). The z-score is
    computed from the scale-invariant integer identity
    (n·k − s)/√(k·ss − s²) — exact int64 window sums, one float division
    — and needs ≥7 prior days to arm. Scale: the window runs on the DAY
    grain (bounded by calendar length, not data volume), after one
    partial-aggregated count shuffle."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tw = Window.orderBy("day").rowsBetween(-28, -1)
    w = daily.select(
        "day",
        "n",
        F.count(F.lit(1)).over(tw).alias("k"),
        F.sum("n").over(tw).cast("long").alias("s"),
        F.sum(F.col("n") * F.col("n")).over(tw).cast("long").alias("ss"),
    )
    num = F.col("n") * F.col("k") - F.col("s")
    den = F.sqrt(
        F.greatest(
            F.col("k").cast("double") * F.col("ss")
            - F.col("s").cast("double") * F.col("s"),
            F.lit(1.0),
        )
    )
    return (
        w.filter(F.col("k") >= 7)
        .select(
            "day",
            "n",
            F.round(F.col("s").cast("double") / F.col("k"), 6).alias(
                "trailing_mean"
            ),
            F.round(num / den, 6).alias("z_score"),
            F.when(F.abs(num) > 3 * den, 1).otherwise(0).alias("is_anomaly"),
        )
        .orderBy("day")
    )


@q(
    "events_sequence_entropy",
    """WITH seq AS (
         SELECT user_id, event_type,
                lead(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS nxt
         FROM events),
       tr AS (SELECT user_id, event_type, nxt, count(*)::BIGINT AS c
              FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2, 3),
       u AS (
         SELECT user_id, sum(c)::BIGINT AS n_trans,
                count(*)::BIGINT AS n_patterns,
                sum((floor(c::DOUBLE * log2(c::DOUBLE)
                           * 1000000))::BIGINT)::BIGINT AS sum_clog2c_micro
         FROM tr GROUP BY user_id)
       SELECT user_id, n_trans, n_patterns,
              round(log2(n_trans::DOUBLE)
                    - (sum_clog2c_micro::DOUBLE / 1000000.0) / n_trans,
                    6) AS transition_entropy_bits
       FROM u
       ORDER BY n_trans DESC, user_id LIMIT 20""",
)
def events_sequence_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral predictability: Shannon entropy (bits) of the
    user's (event_type → next event_type) transition distribution — low
    entropy = scripted/bot-like repetition (the information-theoretic
    companion to events_bot_score's rate heuristics), high entropy =
    diverse organic behavior. Same exact-integer recipe as agg_entropy:
    H = log2(N) − (1/N)·Σ c·log2(c) with each term floored to micro
    units before the int64 sum; report the 20 most active users under a
    deterministic (n_trans DESC, user_id) order. Scale: one user-keyed
    shuffle shared by the lead window and the transition rollup; the
    per-user state is the event-type² pattern grain, not events."""
    e = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "event_type", F.lead("event_type").over(wu).alias("nxt")
    )
    tr = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy("user_id", "event_type", "nxt")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    cd = F.col("c").cast("double")
    u = tr.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n_trans"),
        F.count(F.lit(1)).cast("long").alias("n_patterns"),
        F.sum(F.floor(cd * F.log2(cd) * 1000000).cast("long"))
        .cast("long")
        .alias("sum_clog2c_micro"),
    )
    h = F.log2(F.col("n_trans").cast("double")) - (
        F.col("sum_clog2c_micro").cast("double") / 1000000.0
    ) / F.col("n_trans")
    return (
        u.select(
            "user_id",
            "n_trans",
            "n_patterns",
            F.round(h, 6).alias("transition_entropy_bits"),
        )
        .orderBy(F.col("n_trans").desc(), "user_id")
        .limit(20)
    )


@q(
    "dq_uniqueness_report",
    """WITH n AS (SELECT count(*)::BIGINT AS n_rows FROM orders)
       SELECT col, n_rows, n_distinct,
              (n_rows - n_distinct)::BIGINT AS n_dup_rows,
              round(n_distinct::DOUBLE / n_rows, 6) AS uniqueness
       FROM (
         SELECT 'o_orderkey' AS col, n.n_rows,
                count(DISTINCT o_orderkey)::BIGINT AS n_distinct
         FROM orders, n GROUP BY n.n_rows
         UNION ALL
         SELECT 'o_custkey', n.n_rows, count(DISTINCT o_custkey)::BIGINT
         FROM orders, n GROUP BY n.n_rows
         UNION ALL
         SELECT 'o_orderstatus', n.n_rows,
                count(DISTINCT o_orderstatus)::BIGINT
         FROM orders, n GROUP BY n.n_rows
         UNION ALL
         SELECT 'o_orderpriority', n.n_rows,
                count(DISTINCT o_orderpriority)::BIGINT
         FROM orders, n GROUP BY n.n_rows
         UNION ALL
         SELECT 'o_orderdate', n.n_rows, count(DISTINCT o_orderdate)::BIGINT
         FROM orders, n GROUP BY n.n_rows)
       ORDER BY col""",
)
def dq_uniqueness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-uniqueness profile — the key-discovery half of data
    profiling next to dq_completeness_matrix's null half: per candidate
    column, distinct count, duplicate-row count, and uniqueness ratio
    (1.0 ⇒ candidate key; ~0 ⇒ categorical). One pass per column over a
    pruned scan, each a two-phase distinct aggregate (partial per
    partition, exact merge) — at 100 TB swap exact distinct for the
    HLL/KMV sketches this engine already ships where ±1% suffices. The
    five single-row aggregates union into the report; exact integers
    plus one rounded ratio."""
    o = load_table(spark, sf_dir, "orders")
    n_rows = o.count()  # bounded: one scalar pulled to drive the report
    cols = ["o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority", "o_orderstatus"]
    parts = [
        o.agg(
            F.lit(c).alias("col"),
            F.lit(n_rows).cast("long").alias("n_rows"),
            F.count_distinct(F.col(c)).cast("long").alias("n_distinct"),
        )
        for c in cols
    ]
    rep = parts[0]
    for p in parts[1:]:
        rep = rep.unionByName(p)
    return rep.select(
        "col",
        "n_rows",
        "n_distinct",
        (F.col("n_rows") - F.col("n_distinct")).cast("long").alias("n_dup_rows"),
        F.round(F.col("n_distinct").cast("double") / F.col("n_rows"), 6).alias(
            "uniqueness"
        ),
    ).orderBy("col")


@q(
    "events_retention_triangle",
    """WITH firsts AS (
         SELECT user_id,
                min(date_trunc('week', ts)) AS cohort_week
         FROM events GROUP BY user_id),
       act AS (
         SELECT DISTINCT e.user_id, f.cohort_week,
                (epoch(date_trunc('week', e.ts))
                 - epoch(f.cohort_week))::BIGINT // 604800 AS week_offset
         FROM events e JOIN firsts f USING (user_id)),
       sizes AS (SELECT cohort_week, count(*)::BIGINT AS cohort_size
                 FROM firsts GROUP BY cohort_week)
       SELECT a.cohort_week, a.week_offset,
              count(*)::BIGINT AS active_users,
              s.cohort_size,
              round(count(*)::DOUBLE / s.cohort_size, 6) AS retention
       FROM act a JOIN sizes s USING (cohort_week)
       GROUP BY a.cohort_week, a.week_offset, s.cohort_size
       ORDER BY a.cohort_week, a.week_offset""",
)
def events_retention_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle — the canonical growth-accounting view:
    users bucketed by first-seen week, and for each (cohort, week-offset)
    cell the count and fraction of the cohort active that week. The
    week-offset arithmetic runs on epoch integers (no date subtraction
    semantics to diverge on); distinct-per-(user, week) collapses repeat
    activity before the cell rollup. Scale: one user-keyed aggregate for
    cohorts (broadcastable — one row per user per... no, one row per
    user), a user-keyed join back, then a cells-sized rollup bounded by
    weeks² — the triangle never exceeds the calendar grain squared."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.date_trunc("week", "ts")).alias("cohort_week")
    )
    act = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                (
                    F.unix_timestamp(F.date_trunc("week", "ts"))
                    - F.unix_timestamp("cohort_week")
                )
                / 604800
            )
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    return (
        act.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("active_users"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "active_users",
            "cohort_size",
            F.round(
                F.col("active_users").cast("double") / F.col("cohort_size"), 6
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )
