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


def _ph10(expr: str, seed) -> str:
    """Portable 60-bit hash in DuckDB SQL — first 15 hex digits of
    md5('<seed>:' || value) parsed base-16; the operators/dedup.py
    portable_hash64 twin (same scheme as the minhash/fingerprint
    oracles)."""
    return f"('0x' || substring(md5('{seed}:' || {expr}), 1, 15))::BIGINT"


@q(
    "llm_oov_rate",
    """WITH tok AS (
         SELECT lang, unnest(string_split(text, ' ')) AS token
         FROM documents),
       counts AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
       vocab AS (SELECT token FROM counts
                 ORDER BY n DESC, token LIMIT 1000),
       per AS (
         SELECT t.lang, count(*)::BIGINT AS n_occurrences,
                sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)::BIGINT
                  AS oov_occurrences
         FROM tok t LEFT JOIN vocab v USING (token)
         GROUP BY t.lang)
       SELECT lang, n_occurrences, oov_occurrences,
              round(oov_occurrences::DOUBLE / n_occurrences, 6) AS oov_rate
       FROM per ORDER BY lang""",
)
def llm_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary occurrence rate per language against the global
    top-1000 token vocabulary — the tokenizer-budget failure metric
    llm_vocab_coverage measures from the other side (coverage says what
    the vocab explains; OOV rate says who pays for what it doesn't —
    a high-OOV language will fragment into bytes/unk at train time).
    Scale: the vocabulary is a distributed TakeOrdered under the
    (count DESC, token) total order, then a 1000-row BROADCAST against
    the token stream — the corpus-sized side never shuffles for the
    membership test; exact integer counts, one rounded division."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(F.split("text", " ")).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    vocab = (
        counts.orderBy(F.col("n").desc(), "token")
        .limit(1000)
        .select("token", F.lit(1).alias("_in_vocab"))
    )
    per = (
        tok.join(F.broadcast(vocab), "token", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("oov_occurrences"),
        )
    )
    return per.select(
        "lang",
        "n_occurrences",
        "oov_occurrences",
        F.round(
            F.col("oov_occurrences").cast("double") / F.col("n_occurrences"), 6
        ).alias("oov_rate"),
    ).orderBy("lang")


@q(
    "llm_mixture_epochs",
    """WITH s AS (
         SELECT source,
                sum(len(string_split(text, ' ')))::BIGINT AS tokens
         FROM documents GROUP BY source),
       w AS (SELECT source, tokens,
                    (floor(sqrt(tokens::DOUBLE) * 1000000))::BIGINT AS sq_micro
             FROM s),
       t AS (SELECT sum(tokens)::BIGINT AS total,
                    sum(sq_micro)::BIGINT AS sq_total FROM w)
       SELECT w.source, w.tokens,
              round(w.sq_micro::DOUBLE / t.sq_total, 6) AS weight,
              ((2 * t.total * w.sq_micro) // t.sq_total)::BIGINT
                AS alloc_tokens,
              least(4000, ((2 * t.total * w.sq_micro) // t.sq_total)
                          * 1000 // w.tokens)::BIGINT AS epochs_milli,
              CASE WHEN ((2 * t.total * w.sq_micro) // t.sq_total) * 1000
                        // w.tokens > 4000
                   THEN 1 ELSE 0 END AS capped
       FROM w, t ORDER BY w.source""",
)
def llm_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-factor (epoch) planning for a data-constrained training run:
    given a token budget of 2× the corpus and per-source weights
    proportional to √tokens (the square-root mixture that upweights
    small high-value sources without drowning large ones), allocate
    budget per source and cap repetition at 4 epochs — past which
    repeated data stops helping (the data-constrained-scaling rule of
    thumb). Completes the curation planning family next to
    llm_mixture_temperature (sampling weights) and llm_curriculum_order
    (ordering): this one answers "how many PASSES per source". √tokens
    is micro-floored once per SOURCE (a bounded grain) and everything
    downstream is exact integer arithmetic — allocations, milli-epochs,
    cap flags hash identically. Scale: one partial-aggregated token
    count per source, then source-grain closed forms."""
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("tokens")
    )
    w = s.withColumn(
        "sq_micro",
        F.floor(F.sqrt(F.col("tokens").cast("double")) * 1000000).cast("long"),
    )
    t = w.agg(
        F.sum("tokens").cast("long").alias("total"),
        F.sum("sq_micro").cast("long").alias("sq_total"),
    )
    j = w.crossJoin(F.broadcast(t))
    alloc = F.expr("(2 * total * sq_micro) div sq_total").cast("long")
    epochs = F.expr(
        "((2 * total * sq_micro) div sq_total) * 1000 div tokens"
    ).cast("long")
    return j.select(
        "source",
        "tokens",
        F.round(F.col("sq_micro").cast("double") / F.col("sq_total"), 6).alias(
            "weight"
        ),
        alloc.alias("alloc_tokens"),
        F.least(F.lit(4000).cast("long"), epochs).alias("epochs_milli"),
        F.when(epochs > 4000, 1).otherwise(0).alias("capped"),
    ).orderBy("source")


_FP_HUB_CAP = 20  # fingerprints in more docs than this carry ~no signal


@q(
    "llm_fingerprint_overlap_pairs",
    f"""WITH words AS (
         SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       pos AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
               FROM words WHERE len(w) >= 3),
       hashed AS (SELECT doc_id, i,
                         {_ph10("array_to_string(w[i:i+2], ' ')", 0)} AS h
                  FROM pos),
       fp AS (SELECT DISTINCT doc_id,
                     min(h) OVER (PARTITION BY doc_id ORDER BY i
                                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                       AS fingerprint
              FROM hashed),
       live AS (SELECT fingerprint FROM fp GROUP BY fingerprint
                HAVING count(*) BETWEEN 2 AND {_FP_HUB_CAP}),
       f2 AS (SELECT fp.* FROM fp JOIN live USING (fingerprint)),
       sizes AS (SELECT doc_id, count(*)::BIGINT AS nfp FROM fp
                 GROUP BY doc_id),
       pairs AS (
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                count(*)::BIGINT AS shared
         FROM f2 a JOIN f2 b
           ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
         GROUP BY 1, 2 HAVING count(*) >= 3)
       SELECT p.doc_a, p.doc_b, p.shared,
              round(p.shared::DOUBLE / least(sa.nfp, sb.nfp), 6) AS containment
       FROM pairs p JOIN sizes sa ON sa.doc_id = p.doc_a
                    JOIN sizes sb ON sb.doc_id = p.doc_b
       ORDER BY containment DESC, p.doc_a, p.doc_b LIMIT 50""",
)
def llm_fingerprint_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The USE of winnowing fingerprints (llm_fingerprint_exact builds the
    sets; this query runs the dedup on them): document pairs sharing ≥3
    selected fingerprints, scored by containment (shared / smaller set) —
    the position-robust partial-overlap detector that catches reordered
    or partially-copied spans MinHash's whole-document Jaccard dilutes
    away. Scale shape is the banded-LSH discipline: an equi-join on
    fingerprint, with a stop-hub band cap (fingerprints in >20 docs are
    boilerplate carrying ~no per-pair signal — the measured
    incremental-LSH hot-band rule applied to winnowing), so candidate
    volume is bounded by live-fingerprint collisions, never doc².
    Portable md5 hashes let DuckDB recompute the pipeline bit-for-bit."""
    from hawaiidatapipeline_spark.functions.text import winnowing_fingerprints

    d = load_table(spark, sf_dir, "documents")
    fp = winnowing_fingerprints(d, hash_fn="md5")
    live = (
        fp.groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("ndocs"))
        .filter((F.col("ndocs") >= 2) & (F.col("ndocs") <= _FP_HUB_CAP))
        .select("fingerprint")
    )
    f2 = fp.join(live, "fingerprint")
    sizes = fp.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("nfp"))
    a = f2.select(F.col("doc_id").alias("doc_a"), "fingerprint")
    b = f2.select(F.col("doc_id").alias("doc_b"), "fingerprint")
    pairs = (
        a.join(b, "fingerprint")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .filter(F.col("shared") >= 3)
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("nfp").alias("nfp_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("nfp").alias("nfp_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "shared",
            F.round(
                F.col("shared").cast("double") / F.least("nfp_a", "nfp_b"), 6
            ).alias("containment"),
        )
        .orderBy(F.col("containment").desc(), "doc_a", "doc_b")
        .limit(50)
    )


@q(
    "emb_mahalanobis_outliers",
    """WITH u AS (
         SELECT vec_id, unnest(range(len(embedding))) AS i,
                unnest(embedding) AS e
         FROM embeddings),
       x AS (SELECT vec_id, i,
                    CAST(round(CAST(e AS DOUBLE) * 1000000) AS BIGINT) AS v
             FROM u),
       st AS (
         SELECT i, (sum(v) // count(*))::BIGINT AS mu,
                ((sum(v * v) // count(*))
                 - (sum(v) // count(*))::BIGINT
                   * (sum(v) // count(*))::BIGINT)::BIGINT AS var_micro2
         FROM x GROUP BY i),
       term AS (
         SELECT x.vec_id,
                ((x.v - st.mu) * (x.v - st.mu))
                  // greatest(st.var_micro2 // 1000000, 1) AS t
         FROM x JOIN st USING (i)),
       sc AS (SELECT vec_id, count(*)::BIGINT AS d,
                     sum(t)::BIGINT AS maha
              FROM term GROUP BY vec_id)
       SELECT vec_id, maha AS maha_score,
              round(maha::DOUBLE / (d * 1000000.0), 6) AS avg_z2
       FROM sc ORDER BY maha DESC, vec_id LIMIT 20""",
)
def emb_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diagonal-Mahalanobis OOD scoring: each vector's summed per-dim
    squared z-score against the corpus mean/variance — the
    distribution-aware outlier detector next to emb_knn_dist_outliers
    (neighbor-based) and llm_doc_outlier_zscore (scalar-feature): a
    vector can sit near neighbors yet far from the global density, and
    this is the score that says so. Exact-integer discipline throughout
    (the emb_centroid_margin recipe): values on the 1e-6 grid, means and
    variances by truncating division — identical on both engines — and
    each z² term is an integer division by the milli-scaled variance, so
    the score sum is an exact int64 no matter the aggregation order.
    Scale: one d-grain stats aggregate (broadcastable), one map-side
    join + per-vector partial agg; no pairwise anything."""
    e = load_table(spark, sf_dir, "embeddings")
    x = e.select("vec_id", F.posexplode("embedding").alias("pos", "val")).select(
        "vec_id",
        F.col("pos").cast("bigint").alias("i"),
        F.round(F.col("val").cast("double") * 1000000).cast("bigint").alias("v"),
    )
    st = (
        x.groupBy("i")
        .agg(
            F.expr("sum(v) div count(*)").cast("long").alias("mu"),
            F.expr("sum(v * v) div count(*)").cast("long").alias("ms"),
        )
        .select(
            "i",
            "mu",
            (F.col("ms") - F.col("mu") * F.col("mu")).cast("long").alias(
                "var_micro2"
            ),
        )
    )
    term = x.join(F.broadcast(st), "i").select(
        "vec_id",
        F.expr(
            "((v - mu) * (v - mu)) div greatest(var_micro2 div 1000000, 1)"
        ).alias("t"),
    )
    sc = term.groupBy("vec_id").agg(
        F.count(F.lit(1)).cast("long").alias("d"),
        F.sum("t").cast("long").alias("maha"),
    )
    return (
        sc.select(
            "vec_id",
            F.col("maha").alias("maha_score"),
            F.round(
                F.col("maha").cast("double") / (F.col("d") * 1000000.0), 6
            ).alias("avg_z2"),
        )
        .orderBy(F.col("maha_score").desc(), "vec_id")
        .limit(20)
    )


@q(
    "agg_effect_sizes",
    """WITH g AS (
         SELECT event_type,
                count(*)::BIGINT AS n,
                sum(floor(value * 1000)::BIGINT)::BIGINT AS s,
                sum(floor(value * 1000)::BIGINT
                    * floor(value * 1000)::BIGINT)::BIGINT AS ss
         FROM events WHERE event_type IN ('click', 'purchase')
         GROUP BY event_type),
       w AS (
         SELECT max(CASE WHEN event_type = 'click' THEN n END) AS n1,
                max(CASE WHEN event_type = 'click' THEN s END) AS s1,
                max(CASE WHEN event_type = 'click' THEN ss END) AS ss1,
                max(CASE WHEN event_type = 'purchase' THEN n END) AS n2,
                max(CASE WHEN event_type = 'purchase' THEN s END) AS s2,
                max(CASE WHEN event_type = 'purchase' THEN ss END) AS ss2
         FROM g),
       d AS (
         SELECT n1, n2,
                s1::DOUBLE / n1 / 1000 AS m1, s2::DOUBLE / n2 / 1000 AS m2,
                (ss1 - s1::DOUBLE * s1 / n1) / (n1 - 1) / 1e6 AS v1,
                (ss2 - s2::DOUBLE * s2 / n2) / (n2 - 1) / 1e6 AS v2
         FROM w)
       SELECT n1 AS n_click, n2 AS n_purchase,
              round(m1 - m2, 6) AS mean_diff,
              round((m1 - m2)
                    / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2)
                           / (n1 + n2 - 2)), 6) AS cohens_d,
              round((m1 - m2)
                    / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2)
                           / (n1 + n2 - 2))
                    * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)), 6) AS hedges_g
       FROM d""",
)
def agg_effect_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized effect sizes for the click-vs-purchase value contrast:
    Cohen's d on the pooled standard deviation plus Hedges' g (the
    small-sample bias correction 1 − 3/(4N − 9)) — the magnitude
    companion to agg_welch_t_test's significance answer (a p-value says
    whether; d says how much, which is what a launch decision reads).
    Same milli-unit integer moment sums as the t-test (exact, order
    independent at any parallelism); one closed-form double expression
    per statistic. Scale: a 2-group partial aggregate, nothing else."""
    e = load_table(spark, sf_dir, "events")
    vm = F.floor(F.col("value") * 1000).cast("long")
    g = (
        e.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(vm).cast("long").alias("s"),
            F.sum(vm * vm).cast("long").alias("ss"),
        )
    )
    w = g.agg(
        *[
            F.max(F.when(F.col("event_type") == t, F.col(c))).alias(f"{c}{i}")
            for i, t in ((1, "click"), (2, "purchase"))
            for c in ("n", "s", "ss")
        ]
    )
    m1 = F.col("s1").cast("double") / F.col("n1") / 1000
    m2 = F.col("s2").cast("double") / F.col("n2") / 1000
    v1 = (
        (F.col("ss1") - F.col("s1").cast("double") * F.col("s1") / F.col("n1"))
        / (F.col("n1") - 1)
        / 1e6
    )
    v2 = (
        (F.col("ss2") - F.col("s2").cast("double") * F.col("s2") / F.col("n2"))
        / (F.col("n2") - 1)
        / 1e6
    )
    pooled_sd = F.sqrt(
        ((F.col("n1") - 1) * v1 + (F.col("n2") - 1) * v2)
        / (F.col("n1") + F.col("n2") - 2)
    )
    d = (m1 - m2) / pooled_sd
    corr = 1.0 - 3.0 / (4.0 * (F.col("n1") + F.col("n2")) - 9.0)
    return w.select(
        F.col("n1").alias("n_click"),
        F.col("n2").alias("n_purchase"),
        F.round(m1 - m2, 6).alias("mean_diff"),
        F.round(d, 6).alias("cohens_d"),
        F.round(d * corr, 6).alias("hedges_g"),
    )


@q(
    "ts_ohlc_bars",
    """WITH x AS (
         SELECT date_trunc('day', ts) AS day, ts, event_id,
                floor(value * 100)::BIGINT AS cents
         FROM events),
       r AS (
         SELECT day, cents,
                row_number() OVER (PARTITION BY day
                                   ORDER BY ts, event_id) AS rn_a,
                row_number() OVER (PARTITION BY day
                                   ORDER BY ts DESC, event_id DESC) AS rn_d
         FROM x)
       SELECT day,
              round(max(CASE WHEN rn_a = 1 THEN cents END) / 100.0, 2)
                AS open,
              round(max(cents) / 100.0, 2) AS high,
              round(min(cents) / 100.0, 2) AS low,
              round(max(CASE WHEN rn_d = 1 THEN cents END) / 100.0, 2)
                AS close,
              count(*)::BIGINT AS n_events,
              round(sum(cents) / 100.0, 2) AS volume
       FROM r GROUP BY day ORDER BY day""",
)
def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC resampling — the candle-bar downsample every metrics
    dashboard and financial pipeline draws, complementing ts_resample's
    mean bars and ts_downsample_minmax's plot-preserving extremes: open
    and close are the FIRST/LAST values under the total (ts, event_id)
    order (the tie-break makes both engines pick the same row —
    arg_min/arg_max without it is nondeterministic under equal
    timestamps), high/low/volume are plain extremes/sums, all in exact
    integer cents. Scale: both row_number windows and the rollup share
    ONE day-keyed exchange; per-partition state is a day's rows."""
    e = load_table(spark, sf_dir, "events")
    x = e.select(
        F.date_trunc("day", "ts").alias("day"),
        "ts",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    wa = Window.partitionBy("day").orderBy("ts", "event_id")
    wd = Window.partitionBy("day").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    r = x.select(
        "day",
        "cents",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return (
        r.groupBy("day")
        .agg(
            F.round(F.max(F.when(F.col("rn_a") == 1, F.col("cents"))) / 100.0, 2).alias("open"),
            F.round(F.max("cents") / 100.0, 2).alias("high"),
            F.round(F.min("cents") / 100.0, 2).alias("low"),
            F.round(F.max(F.when(F.col("rn_d") == 1, F.col("cents"))) / 100.0, 2).alias("close"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("cents") / 100.0, 2).alias("volume"),
        )
        .orderBy("day")
    )


@q(
    "agg_group_median_exact",
    """WITH vals AS (
         SELECT o_orderpriority AS grp,
                floor(o_totalprice * 100)::BIGINT AS cents,
                count(*)::BIGINT AS c
         FROM orders GROUP BY 1, 2),
       cum AS (
         SELECT grp, cents, c,
                sum(c) OVER (PARTITION BY grp ORDER BY cents
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW)::BIGINT AS gcum,
                sum(c) OVER (PARTITION BY grp)::BIGINT AS gn
         FROM vals)
       SELECT grp AS priority, max(gn)::BIGINT AS n_rows,
              round(min(cents) / 100.0, 2) AS median
       FROM cum WHERE gcum >= (gn + 1) // 2
       GROUP BY grp ORDER BY grp""",
)
def agg_group_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group median (lower median: smallest value whose
    within-group cumulative count reaches ceil(n_g/2)) — the grouped
    companion to agg_percentile_exact_grid, and the scale answer to the
    usual trap (a per-group Window.orderBy(value) puts each group's
    ENTIRE value grain in one task — fine for many small groups, serial
    for one big one). Shape: GLOBAL prefix sums over the (group, value)
    total order via operators/ranks.py partitioned_prefix_sums — range
    slices cut across group boundaries, so even a single dominant group
    spreads over many partitions — then each group's local cumulative is
    the global prefix minus the group's starting offset (a prefix over
    the tiny per-group totals frame, one row per group). All integers
    until the cents→dollars division."""
    o = load_table(spark, sf_dir, "orders")
    vals = o.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    cum = partitioned_prefix_sums(vals, [F.col("grp"), F.col("cents")], {"cum": "c"})
    gtot = vals.groupBy("grp").agg(F.sum("c").cast("long").alias("gn"))
    w_g = Window.orderBy("grp").rowsBetween(Window.unboundedPreceding, -1)
    # offsets: one row per GROUP (bounded grain) — the only ordered pass
    off = gtot.select(
        "grp",
        "gn",
        F.coalesce(F.sum("gn").over(w_g), F.lit(0)).cast("long").alias("goff"),
    )
    j = cum.join(F.broadcast(off), "grp").withColumn(
        "gcum", F.col("cum") - F.col("goff")
    )
    return (
        j.filter(F.col("gcum") >= F.floor((F.col("gn") + 1) / 2).cast("long"))
        .groupBy(F.col("grp").alias("priority"))
        .agg(
            F.max("gn").cast("long").alias("n_rows"),
            F.round(F.min("cents") / 100.0, 2).alias("median"),
        )
        .orderBy("priority")
    )


@q(
    "ts_bollinger_bands",
    """WITH daily AS (
         SELECT date_trunc('day', ts) AS day,
                sum(floor(value * 100)::BIGINT)::BIGINT AS cents
         FROM events GROUP BY 1),
       w AS (
         SELECT day, cents,
                count(*) OVER tw AS k,
                sum(cents) OVER tw::BIGINT AS s,
                sum(cents * cents) OVER tw::BIGINT AS ss
         FROM daily
         WINDOW tw AS (ORDER BY day ROWS BETWEEN 6 PRECEDING
                       AND CURRENT ROW))
       SELECT day, round(cents / 100.0, 2) AS daily_value,
              round(s::DOUBLE / k / 100, 6) AS ma7,
              round((s::DOUBLE / k
                     - 2 * sqrt((ss::DOUBLE * k - s::DOUBLE * s))
                       / k) / 100, 6) AS lower_band,
              round((s::DOUBLE / k
                     + 2 * sqrt((ss::DOUBLE * k - s::DOUBLE * s))
                       / k) / 100, 6) AS upper_band,
              CASE WHEN (cents * k - s) * (cents * k - s)
                        > 4 * (ss * k - s * s)
                        AND cents * k > s THEN 1
                   WHEN (cents * k - s) * (cents * k - s)
                        > 4 * (ss * k - s * s)
                        AND cents * k < s THEN -1
                   ELSE 0 END AS breakout
       FROM w WHERE k = 7 ORDER BY day""",
)
def ts_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands on daily volume: 7-day rolling mean ± 2 population
    standard deviations, with a breakout flag (+1 above, −1 below) — the
    rolling-band complement to ts_percentile_bands' per-day quantiles
    and dq_row_count_anomaly's trailing z-score (this one includes the
    current day in the window, the trading-chart convention). The
    breakout decision is PURE integer arithmetic — (x·k − s)² > 4·(k·ss
    − s²) is the band inequality cleared of divisions and square roots —
    so the flag cannot drift across engines; band edges are doubles from
    the same exact int sums, rounded 6 dp. Scale: day grain (calendar-
    bounded window) after one partial-aggregated shuffle."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).cast("long").alias("cents")
    )
    tw = Window.orderBy("day").rowsBetween(-6, 0)
    w = daily.select(
        "day",
        "cents",
        F.count(F.lit(1)).over(tw).alias("k"),
        F.sum("cents").over(tw).cast("long").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).over(tw).cast("long").alias("ss"),
    ).filter(F.col("k") == 7)
    mean = F.col("s").cast("double") / F.col("k")
    sd = F.sqrt(
        F.col("ss").cast("double") * F.col("k") - F.col("s").cast("double") * F.col("s")
    ) / F.col("k")
    dev2 = (F.col("cents") * F.col("k") - F.col("s")) * (
        F.col("cents") * F.col("k") - F.col("s")
    )
    var4 = 4 * (F.col("ss") * F.col("k") - F.col("s") * F.col("s"))
    return w.select(
        "day",
        F.round(F.col("cents") / 100.0, 2).alias("daily_value"),
        F.round(mean / 100, 6).alias("ma7"),
        F.round((mean - 2 * sd) / 100, 6).alias("lower_band"),
        F.round((mean + 2 * sd) / 100, 6).alias("upper_band"),
        F.when(
            (dev2 > var4) & (F.col("cents") * F.col("k") > F.col("s")), 1
        )
        .when((dev2 > var4) & (F.col("cents") * F.col("k") < F.col("s")), -1)
        .otherwise(0)
        .alias("breakout"),
    ).orderBy("day")


@q(
    "scan_schema_merge",
    """SELECT n_nationkey, n_name, NULL::BIGINT AS n_regionkey
       FROM nation WHERE n_nationkey < 12
       UNION ALL
       SELECT n_nationkey, n_name, n_regionkey
       FROM nation WHERE n_nationkey >= 12""",
)
def scan_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: two parquet drops under one table root —
    an old batch written BEFORE the n_regionkey column existed and a new
    batch with it — read back through ``mergeSchema``, which unions the
    footers and null-fills the missing column (the migration-in-place
    pattern every long-lived landing zone hits; without mergeSchema the
    scan silently serves whichever footer it sampled first). At 100 TB
    mergeSchema's footer union is a planning-time cost over file
    metadata only; pin the canonical schema in a catalog once evolution
    settles. The oracle replays the union with explicit NULLs."""
    from hawaiidatapipeline_spark.queries.sources import _scratch

    n = load_table(spark, sf_dir, "nation")
    root = _scratch("nation_schema_merge")
    old = n.filter(F.col("n_nationkey") < 12).select("n_nationkey", "n_name")
    new = n.filter(F.col("n_nationkey") >= 12).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    old.write.mode("overwrite").parquet(root + "/batch=old")
    new.write.mode("overwrite").parquet(root + "/batch=new")
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(root)
        .select(
            "n_nationkey", "n_name", F.col("n_regionkey").cast("long").alias("n_regionkey")
        )
    )


@q(
    "dq_partition_skew_report",
    """WITH m AS (
         SELECT date_trunc('month', o_orderdate) AS month,
                count(*)::BIGINT AS n
         FROM orders GROUP BY 1),
       s AS (
         SELECT count(*)::BIGINT AS n_parts,
                max(n)::BIGINT AS max_rows,
                min(n)::BIGINT AS min_rows,
                sum(n)::BIGINT AS total,
                (quantile_disc(n, 0.5))::BIGINT AS median_rows
         FROM m),
       top AS (SELECT month, n FROM m ORDER BY n DESC, month LIMIT 3)
       SELECT s.n_parts, s.total, s.min_rows, s.median_rows, s.max_rows,
              round(s.max_rows::DOUBLE / s.median_rows, 6) AS skew_factor,
              top.month AS top_month, top.n AS top_rows
       FROM s, top ORDER BY top_rows DESC, top_month""",
)
def dq_partition_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-volume skew report for the natural layout key (order
    month): per-partition row counts summarized as min/median/max with
    the max/median skew factor and the three heaviest partitions — the
    table a write-path review reads before choosing partitionBy(date)
    at 100 TB (a skew factor of 5 means the biggest partition's files
    and any partition-aligned task run 5× the median; the fix is
    salting or sub-partitioning exactly where this report points).
    Discrete median (largest value with cumulative count ≥ n/2 under
    quantile_disc semantics — replicated exactly on the Spark side via
    sorted-array indexing over the bounded month grain); all integers
    but the one rounded ratio."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    # month grain is calendar-bounded: collect-free summary via sort_array
    s = m.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("n").cast("long").alias("total"),
        F.min("n").cast("long").alias("min_rows"),
        F.max("n").cast("long").alias("max_rows"),
        F.sort_array(F.collect_list("n")).alias("ns"),
    ).select(
        "n_parts",
        "total",
        "min_rows",
        "max_rows",
        # quantile_disc(0.5): element at ceil(0.5*n) in 1-based sorted order
        F.element_at(
            "ns", F.ceil(F.col("n_parts") * 0.5).cast("int")
        )
        .cast("long")
        .alias("median_rows"),
    )
    top = m.orderBy(F.col("n").desc(), "month").limit(3)
    return (
        top.select(F.col("month").alias("top_month"), F.col("n").alias("top_rows"))
        .crossJoin(F.broadcast(s))
        .select(
            "n_parts",
            "total",
            "min_rows",
            "median_rows",
            "max_rows",
            F.round(
                F.col("max_rows").cast("double") / F.col("median_rows"), 6
            ).alias("skew_factor"),
            "top_month",
            "top_rows",
        )
        .orderBy(F.col("top_rows").desc(), "top_month")
    )


@q(
    "events_new_vs_returning",
    """WITH firsts AS (
         SELECT user_id, min(date_trunc('day', ts)) AS first_day
         FROM events GROUP BY user_id),
       act AS (
         SELECT DISTINCT e.user_id, date_trunc('day', e.ts) AS day,
                f.first_day
         FROM events e JOIN firsts f USING (user_id))
       SELECT day,
              sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)::BIGINT
                AS new_users,
              sum(CASE WHEN day > first_day THEN 1 ELSE 0 END)::BIGINT
                AS returning_users,
              round(sum(CASE WHEN day > first_day THEN 1 ELSE 0 END)::DOUBLE
                    / count(*), 6) AS returning_share
       FROM act GROUP BY day ORDER BY day""",
)
def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning daily active mix — the growth-accounting split
    (acquisition vs retention) that events_retention_triangle shows by
    cohort and this shows by calendar day: per day, distinct users seen
    for the first time vs returning, plus the returning share. One
    user-grain first-seen aggregate joined back (broadcastable dim — one
    row per user... at 100 TB it's a user-keyed shuffle join, the same
    single exchange the distinct-per-day rollup already needs); exact
    integer counts, one rounded share."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("first_day")
    )
    act = (
        e.select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
        .join(firsts, "user_id")
    )
    is_new = F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
    is_ret = F.when(F.col("day") > F.col("first_day"), 1).otherwise(0)
    return (
        act.groupBy("day")
        .agg(
            F.sum(is_new).cast("long").alias("new_users"),
            F.sum(is_ret).cast("long").alias("returning_users"),
            F.round(
                F.sum(is_ret).cast("double") / F.count(F.lit(1)), 6
            ).alias("returning_share"),
        )
        .orderBy("day")
    )
