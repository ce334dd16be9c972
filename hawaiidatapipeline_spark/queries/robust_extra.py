"""Robust statistics, frontier analytics, and data-audit extras.

Round-7 batch 2: exact dyadic EWMA smoothing, Theil–Sen robust trend,
2-D skyline (Pareto frontier), candidate-key discovery, interval-
coverage merge, a time-windowed conversion funnel, per-edge triangle
support (k-truss building block), and IPv4/CIDR classification.

Every float follows the house determinism contract (SURVEY.md §7
risk 1): integer/decimal arithmetic stays exact through every
aggregate; IEEE doubles appear only in final closed-form expressions
(division of exact integers is correctly rounded, hence bit-identical
across engines); ``round(…, 6)`` on both sides. The EWMA uses dyadic
weights (powers of two) so even the weighted sums are exact 64-bit
integers — no floating accumulation anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.materialize import materialize
from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()

# --------------------------------------------------------------------------
# ts_ewma_dyadic — exact EWMA via power-of-two weights
# --------------------------------------------------------------------------

_EWMA_W = 8  # window of most recent observations (halving weights)

_EWMA_NUM = " + ".join(
    f"CASE WHEN lag(n, {k}) OVER w IS NOT NULL"
    f" THEN lag(n, {k}) OVER w * {1 << (_EWMA_W - 1 - k)} ELSE 0 END"
    for k in range(_EWMA_W)
)
_EWMA_DEN = " + ".join(
    f"CASE WHEN lag(n, {k}) OVER w IS NOT NULL"
    f" THEN {1 << (_EWMA_W - 1 - k)} ELSE 0 END"
    for k in range(_EWMA_W)
)

_EWMA_SQL = f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
  FROM events GROUP BY 1, 2),
acc AS (
  SELECT event_type, day, n,
         ({_EWMA_NUM})::BIGINT AS num,
         ({_EWMA_DEN})::BIGINT AS den
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day))
SELECT event_type, day, n, round(num::DOUBLE / den, 6) AS ewma
FROM acc ORDER BY event_type, day
"""


@q("ts_ewma_dyadic", _EWMA_SQL)
def ts_ewma_dyadic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA smoothing of the daily event-count series with halving
    (α = 1/2) weights over the last 8 observations — the monitoring
    smoother that reacts to level shifts without a full seasonal model.

    Determinism: the usual recursive EWMA accumulates floats (order-
    and history-dependent); this form instead takes weights 2^(W-1-k),
    making numerator AND denominator exact 64-bit integer sums per row
    (no accumulation across partitions — each row's window is
    recomputed from integer lags). The single final division of two
    exact integers is correctly rounded IEEE, so Spark and the oracle
    agree bit-for-bit. Scale: one shuffle to (event_type, day) grain,
    then a per-key ordered window — series length per key is bounded
    by calendar days, never by event volume."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    num = F.lit(0).cast("bigint")
    den = F.lit(0).cast("bigint")
    for k in range(_EWMA_W):
        wt = 1 << (_EWMA_W - 1 - k)
        lagn = F.lag("n", k).over(w)
        num = num + F.when(lagn.isNotNull(), lagn * wt).otherwise(0)
        den = den + F.when(lagn.isNotNull(), F.lit(wt)).otherwise(0)
    return (
        daily.withColumn("num", num.cast("bigint"))
        .withColumn("den", den.cast("bigint"))
        .select(
            "event_type",
            "day",
            "n",
            F.round(F.col("num").cast("double") / F.col("den"), 6).alias("ewma"),
        )
        .orderBy("event_type", "day")
    )


# --------------------------------------------------------------------------
# ts_theil_sen_trend — robust median-of-slopes trend
# --------------------------------------------------------------------------

_THEIL_SEN_SQL = """
WITH daily AS (
  SELECT event_type,
         (ts::DATE - DATE '1970-01-01')::BIGINT AS x,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2),
pairs AS (
  SELECT a.event_type,
         (b.n - a.n)::DOUBLE / (b.x - a.x) AS slope,
         a.x AS xi, b.x AS xj
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.x < b.x),
ranked AS (
  SELECT event_type, slope,
         row_number() OVER (PARTITION BY event_type ORDER BY slope, xi, xj) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n_pairs
  FROM pairs)
SELECT event_type, n_pairs, round(slope, 6) AS theil_sen_slope
FROM ranked WHERE rn = (n_pairs + 1) // 2
ORDER BY event_type
"""


@q("ts_theil_sen_trend", _THEIL_SEN_SQL)
def ts_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per event type: the MEDIAN of all pairwise
    slopes of the daily-count series — ~29% breakdown point, immune to
    the outlier days that wreck OLS (compare ``llm_zipf_slope``'s OLS
    template). Deterministic: every slope is one division of exact
    integers (correctly rounded → bit-identical), and the median is an
    explicit lower-median ORDER STATISTIC (row_number at (n+1) div 2
    under a total order with (xi, xj) tiebreak) — no interpolation
    arithmetic to drift between engines. Scale: pairs are O(days²) per
    key — bounded by the calendar (30 days → 435 pairs), NOT by event
    volume; the expensive grain reduction runs first."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("x"),
    ).agg(F.count(F.lit(1)).alias("n"))
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type")) & (F.col("a.x") < F.col("b.x")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        ((F.col("b.n") - F.col("a.n")).cast("double") / (F.col("b.x") - F.col("a.x"))).alias(
            "slope"
        ),
        F.col("a.x").alias("xi"),
        F.col("b.x").alias("xj"),
    )
    w = Window.partitionBy("event_type").orderBy("slope", "xi", "xj")
    wc = Window.partitionBy("event_type")
    ranked = pairs.select(
        "event_type",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n_pairs"),
    )
    return (
        ranked.filter(F.col("rn") == F.expr("(n_pairs + 1) div 2"))
        .select("event_type", "n_pairs", F.round("slope", 6).alias("theil_sen_slope"))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# mine_skyline_2d — Pareto frontier via one sorted window pass
# --------------------------------------------------------------------------

_SKYLINE_SQL = """
WITH pts AS (
  SELECT DISTINCT p_brand, p_retailprice, p_size FROM part),
flagged AS (
  SELECT p_brand, p_retailprice, p_size,
         max(p_size) OVER (PARTITION BY p_brand
                           ORDER BY p_retailprice ASC, p_size DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM pts)
SELECT p_brand, p_retailprice, p_size
FROM flagged WHERE prev_max IS NULL OR p_size > prev_max
ORDER BY p_brand, p_retailprice, p_size
"""


@q("mine_skyline_2d", _SKYLINE_SQL)
def mine_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand 2-D skyline (Pareto frontier): parts where no other part
    of the brand is both cheaper-or-equal AND larger-or-equal (with one
    strict) — the classic "best price/size trade-offs" query. The naive
    formulation is a quadratic NOT EXISTS self-join; this is the O(n log n)
    sorted-sweep: after dedup, order by (price ASC, size DESC) and keep a
    row iff its size strictly exceeds the running max of all preceding
    sizes (any preceding row has price ≤ current, so a preceding size
    ≥ current means domination; distinct points make the converse exact).
    Scale: one shuffle to the brand partitions then a linear window pass —
    no self-join at any size."""
    p = load_table(spark, sf_dir, "part")
    pts = p.select("p_brand", "p_retailprice", "p_size").distinct()
    w = (
        Window.partitionBy("p_brand")
        .orderBy(F.col("p_retailprice").asc(), F.col("p_size").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        pts.withColumn("prev_max", F.max("p_size").over(w))
        .filter(F.col("prev_max").isNull() | (F.col("p_size") > F.col("prev_max")))
        .select("p_brand", "p_retailprice", "p_size")
        .orderBy("p_brand", "p_retailprice", "p_size")
    )


# --------------------------------------------------------------------------
# dq_candidate_keys — uniqueness / candidate-key discovery
# --------------------------------------------------------------------------

_KEY_COMBOS: tuple[tuple[str, ...], ...] = (
    ("o_orderkey",),
    ("o_custkey", "o_orderdate"),
    ("o_orderdate", "o_orderpriority"),
    ("o_custkey", "o_orderstatus"),
)


def _combo_sql(cols: tuple[str, ...]) -> str:
    label = ",".join(cols)
    distinct = cols[0] if len(cols) == 1 else "(" + ", ".join(cols) + ")"
    return (
        f"SELECT '{label}' AS combo, count(*) AS n_rows,"
        f" count(DISTINCT {distinct}) AS n_distinct,"
        f" CASE WHEN count(*) = count(DISTINCT {distinct}) THEN 1 ELSE 0 END AS is_key"
        f" FROM orders"
    )


_CANDIDATE_KEYS_SQL = (
    " UNION ALL ".join(_combo_sql(c) for c in _KEY_COMBOS) + " ORDER BY combo"
)


@q("dq_candidate_keys", _CANDIDATE_KEYS_SQL)
def dq_candidate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key discovery: for each declared column combination of
    ``orders``, compare row count to distinct-combination count and flag
    exact keys — the profiling step that validates primary-key contracts
    and finds de-facto keys before a MERGE/upsert is trusted. All columns
    probed are non-null in this schema (NULL tuples would diverge between
    engines' DISTINCT semantics, so a production run null-guards first).
    Scale: each probe is one partial-aggregated distinct count (map-side
    combine); probes are independent and union cheaply — no row
    explosion, no driver loop over data (only over the fixed combo
    list)."""
    o = load_table(spark, sf_dir, "orders")
    frames = []
    for cols in _KEY_COMBOS:
        label = ",".join(cols)
        frames.append(
            o.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct(*[F.col(c) for c in cols]).alias("n_distinct"),
            ).select(
                F.lit(label).alias("combo"),
                "n_rows",
                "n_distinct",
                F.when(F.col("n_rows") == F.col("n_distinct"), 1)
                .otherwise(0)
                .alias("is_key"),
            )
        )
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionAll(f_)
    return out.orderBy("combo")


# --------------------------------------------------------------------------
# ts_interval_coverage — overlap-merging interval sweep
# --------------------------------------------------------------------------

_COVERAGE_SQL = """
WITH iv AS (
  SELECT l_suppkey,
         (l_shipdate::DATE - DATE '1970-01-01')::BIGINT AS s,
         (l_shipdate::DATE - DATE '1970-01-01')::BIGINT
           + l_quantity::BIGINT AS e
  FROM lineitem),
m AS (
  SELECT l_suppkey, s, e,
         max(e) OVER (PARTITION BY l_suppkey ORDER BY s, e DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
  FROM iv),
fl AS (
  SELECT l_suppkey, s, e,
         CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS brk
  FROM m),
isl AS (
  SELECT l_suppkey, s, e,
         (sum(brk) OVER (PARTITION BY l_suppkey ORDER BY s, e DESC
                         ROWS UNBOUNDED PRECEDING))::BIGINT AS island
  FROM fl),
g AS (
  SELECT l_suppkey, island, min(s) AS lo, max(e) AS hi
  FROM isl GROUP BY 1, 2)
SELECT l_suppkey, count(*) AS n_intervals, sum(hi - lo)::BIGINT AS covered_days
FROM g GROUP BY l_suppkey ORDER BY l_suppkey
"""


@q("ts_interval_coverage", _COVERAGE_SQL)
def ts_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier covered time after merging overlapping service
    intervals (ship date → ship date + quantity days): the classic
    interval-union sweep (uptime/SLA coverage, sensor on-time). One
    ordered pass per key: a row opens a new merged interval iff its
    start exceeds the running max of all previous ends; interval id =
    running sum of those breaks; covered time = Σ (max(end) − min(start))
    per merged island. All arithmetic on integer epoch-days. Scale: one
    shuffle to the supplier partitions, two linear window passes, one
    aggregate — no interval self-join, which would be quadratic on
    dense overlap."""
    li = load_table(spark, sf_dir, "lineitem")
    s = F.datediff(F.to_date("l_shipdate"), F.lit("1970-01-01").cast("date")).cast(
        "bigint"
    )
    iv = li.select(
        "l_suppkey",
        s.alias("s"),
        (s + F.col("l_quantity").cast("bigint")).alias("e"),
    )
    wo = Window.partitionBy("l_suppkey").orderBy(F.col("s").asc(), F.col("e").desc())
    pmax = F.max("e").over(wo.rowsBetween(Window.unboundedPreceding, -1))
    brk = F.when(pmax.isNull() | (F.col("s") > pmax), 1).otherwise(0)
    isl = iv.withColumn(
        "island",
        F.sum(brk).over(wo.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"),
    )
    g = isl.groupBy("l_suppkey", "island").agg(
        F.min("s").alias("lo"), F.max("e").alias("hi")
    )
    return (
        g.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum(F.col("hi") - F.col("lo")).alias("covered_days"),
        )
        .orderBy("l_suppkey")
    )


# --------------------------------------------------------------------------
# events_funnel_windowed — time-constrained conversion funnel
# --------------------------------------------------------------------------

_FUNNEL_WINDOW_SQL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click'
    AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 1 HOUR
  GROUP BY 1),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase'
    AND e.ts > s2.t2 AND e.ts <= s2.t2 + INTERVAL 1 HOUR
  GROUP BY 1)
SELECT (SELECT count(*) FROM s1) AS n_view,
       (SELECT count(*) FROM s2) AS n_click_1h,
       (SELECT count(*) FROM s3) AS n_purchase_1h,
       round((SELECT count(*) FROM s2) * 1.0
             / nullif((SELECT count(*) FROM s1), 0), 6) AS cr_click,
       round((SELECT count(*) FROM s3) * 1.0
             / nullif((SELECT count(*) FROM s2), 0), 6) AS cr_purchase
"""


@q("events_funnel_windowed", _FUNNEL_WINDOW_SQL)
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-constrained funnel: first view → first qualifying click
    within 1 h of it → first qualifying purchase within 1 h of the
    click, with per-stage user counts and conversion rates. Unlike the
    unordered funnel (``events_funnel``), each stage anchors on the
    PREVIOUS stage's timestamp — the attribution-correct definition.
    Conversion rates divide exact integers (correctly rounded, engine-
    identical); a zero-user stage yields NULL via the null guard on both
    engines. Scale: each stage is one broadcastable join of the (small)
    prior-stage anchor table against a filtered event scan, then a
    per-user min — no window over the raw stream, no driver loop."""
    e = load_table(spark, sf_dir, "events")
    hour = F.expr("INTERVAL 1 HOUR")
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(F.broadcast(s1), "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + hour))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(s2), "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + hour))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n1 = s1.agg(F.count(F.lit(1)).alias("n_view"))
    n2 = s2.agg(F.count(F.lit(1)).alias("n_click_1h"))
    n3 = s3.agg(F.count(F.lit(1)).alias("n_purchase_1h"))
    return (
        n1.crossJoin(n2)
        .crossJoin(n3)
        .select(
            "n_view",
            "n_click_1h",
            "n_purchase_1h",
            F.round(
                F.col("n_click_1h") * F.lit(1.0)
                / F.nullif(F.col("n_view"), F.lit(0)),
                6,
            ).alias("cr_click"),
            F.round(
                F.col("n_purchase_1h") * F.lit(1.0)
                / F.nullif(F.col("n_click_1h"), F.lit(0)),
                6,
            ).alias("cr_purchase"),
        )
    )


# --------------------------------------------------------------------------
# graph_edge_triangle_support — per-edge triangle support (k-truss core)
# --------------------------------------------------------------------------

_EDGE_SUPPORT_SQL = """
WITH items AS (SELECT l_orderkey, l_partkey FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) QUALIFY count(*) OVER (PARTITION BY l_orderkey) <= 64),
e0 AS (SELECT a.l_partkey AS u, b.l_partkey AS v
       FROM items a JOIN items b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       GROUP BY 1, 2 HAVING count(*) >= 2),
deg AS (SELECT node, count(*) AS deg FROM (SELECT u AS node FROM e0
        UNION ALL SELECT v AS node FROM e0) nn GROUP BY node),
e AS (SELECT CASE WHEN (du.deg, e0.u) < (dv.deg, e0.v)
                  THEN e0.u ELSE e0.v END AS u,
             CASE WHEN (du.deg, e0.u) < (dv.deg, e0.v)
                  THEN e0.v ELSE e0.u END AS v
      FROM e0 JOIN deg du ON du.node = e0.u
              JOIN deg dv ON dv.node = e0.v),
tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1 JOIN e e2 ON e2.u = e1.v
                  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
te AS (SELECT least(a, b) AS u, greatest(a, b) AS v FROM tri
       UNION ALL SELECT least(b, c), greatest(b, c) FROM tri
       UNION ALL SELECT least(a, c), greatest(a, c) FROM tri)
SELECT u, v, count(*) AS support
FROM te GROUP BY u, v
ORDER BY support DESC, u, v
"""


@q("graph_edge_triangle_support", _EDGE_SUPPORT_SQL)
def graph_edge_triangle_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-edge triangle support over the co-purchase graph — the k-truss
    building block (an edge is in the k-truss iff support ≥ k−2) and the
    standard cohesion score for community pruning: high-support edges sit
    inside dense clusters, support-0 edges (absent here) are bridges.
    Same skew discipline as ``graph_triangle_count``: edges are oriented
    low-degree → high-degree (Suri–Vassilvitskii) before the wedge join,
    bounding per-node fan-out at O(√m); each triangle is enumerated once,
    then unpivoted back to its three UNDIRECTED edges for the support
    count. Scale: the oriented edge table is materialized once and feeds
    all three join legs; the unpivot is a 3× linear explode, and the
    final count partial-aggregates map-side."""
    from hawaiidatapipeline_spark.operators.graph import (
        copurchase_edges,
        orient_edges_by_degree,
    )

    li = load_table(spark, sf_dir, "lineitem")
    e = materialize(orient_edges_by_degree(copurchase_edges(li, min_orders=2)))
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(e3, (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")))
        .select(
            F.col("e1.u").alias("a"), F.col("e1.v").alias("b"), F.col("e2.v").alias("c")
        )
    )
    te = tri.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
                ),
                F.struct(
                    F.least("b", "c").alias("u"), F.greatest("b", "c").alias("v")
                ),
                F.struct(
                    F.least("a", "c").alias("u"), F.greatest("a", "c").alias("v")
                ),
            )
        ).alias("p")
    ).select("p.u", "p.v")
    return (
        te.groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("support"))
        .orderBy(F.col("support").desc(), "u", "v")
    )


# --------------------------------------------------------------------------
# fn_ip_cidr — IPv4 derivation + CIDR-block classification
# --------------------------------------------------------------------------

_CIDR_BLOCKS: tuple[tuple[str, int, int], ...] = (
    # (cidr, prefix as uint32, 2^(32 - prefix_bits))
    ("10.0.0.0/8", 10 * (1 << 24), 1 << 24),
    ("172.16.0.0/12", 172 * (1 << 24) + 16 * (1 << 16), 1 << 20),
    ("192.168.1.0/24", 192 * (1 << 24) + 168 * (1 << 16) + 1 * (1 << 8), 1 << 8),
)

_CIDR_BLOCKS_SQL = " UNION ALL ".join(
    f"SELECT '{c}' AS cidr, {p} AS pref, {d} AS bdiv" for c, p, d in _CIDR_BLOCKS
)

_IP_CIDR_SQL = f"""
WITH ips AS (
  SELECT (c_custkey * 2654435761) % 4294967296 AS ip FROM customer),
blocks AS ({_CIDR_BLOCKS_SQL}),
m AS (
  SELECT coalesce(b.cidr, 'public') AS cidr, ips.ip
  FROM ips LEFT JOIN blocks b ON ip // b.bdiv = b.pref // b.bdiv),
g AS (SELECT cidr, count(*) AS n_ips, min(ip)::BIGINT AS min_ip FROM m GROUP BY cidr)
SELECT cidr, n_ips, min_ip,
       concat((min_ip // 16777216)::VARCHAR, '.',
              ((min_ip // 65536) % 256)::VARCHAR, '.',
              ((min_ip // 256) % 256)::VARCHAR, '.',
              (min_ip % 256)::VARCHAR) AS min_ip_dotted
FROM g ORDER BY cidr
"""


@q("fn_ip_cidr", _IP_CIDR_SQL)
def fn_ip_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 / CIDR classification — the log-enrichment primitive: derive
    a deterministic synthetic IPv4 per customer (Knuth multiplicative
    hash mod 2³²; the fixture has no IP column), classify each against
    RFC-1918-style CIDR blocks (left join — unmatched IPs land in a
    'public' catch-all so the classification is total), and report
    per-block membership counts plus the lowest member dotted-quad. CIDR containment is
    pure integer arithmetic (ip div 2^(32−bits) = prefix div
    2^(32−bits)) — no string parsing in the hot path, portable across
    engines, and sargable so a literal block list can prune at the scan.
    Scale: the block list is a 3-row broadcast; the probe side is one
    projection of the customer scan — no shuffle before the final tiny
    aggregate."""
    c = load_table(spark, sf_dir, "customer")
    ips = c.select(
        ((F.col("c_custkey") * F.lit(2654435761)) % F.lit(4294967296)).alias("ip")
    )
    blocks = spark.createDataFrame(
        [(c_, p, d) for c_, p, d in _CIDR_BLOCKS], "cidr string, pref long, bdiv long"
    )
    m = ips.join(
        F.broadcast(blocks),
        F.expr("ip div bdiv") == F.expr("pref div bdiv"),
        "left",
    ).select(F.coalesce("cidr", F.lit("public")).alias("cidr"), "ip")
    g = m.groupBy("cidr").agg(
        F.count(F.lit(1)).alias("n_ips"), F.min("ip").alias("min_ip")
    )
    octet = lambda div, mod: (F.expr(f"min_ip div {div}") % mod).cast("string")  # noqa: E731
    return g.select(
        "cidr",
        "n_ips",
        "min_ip",
        F.concat_ws(
            ".",
            F.expr("min_ip div 16777216").cast("string"),
            octet(65536, 256),
            octet(256, 256),
            (F.col("min_ip") % 256).cast("string"),
        ).alias("min_ip_dotted"),
    ).orderBy("cidr")


_TRIM_PCT_NUM, _TRIM_PCT_DEN = 1, 10  # trim 10% of rows from each tail


@q(
    "agg_trimmed_mean",
    """WITH v AS (
         SELECT o_orderpriority AS grp,
                (floor(o_totalprice * 100))::BIGINT AS xc
         FROM orders),
       vals AS (
         SELECT grp, xc, count(*)::BIGINT AS c
         FROM v GROUP BY grp, xc),
       cum AS (
         SELECT grp, xc, c,
                sum(c) OVER (PARTITION BY grp ORDER BY xc
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  ::BIGINT AS cum_c,
                sum(c) OVER (PARTITION BY grp)::BIGINT AS n
         FROM vals),
       clipped AS (
         SELECT grp, xc, n,
                n // 10 AS lo, n - n // 10 AS hi,
                least(cum_c, n - n // 10)
                  - greatest(cum_c - c, n // 10) AS keep
         FROM cum),
       agg AS (
         SELECT grp, max(n) AS n,
                sum(CASE WHEN keep > 0 THEN keep ELSE 0 END)::BIGINT
                  AS n_kept,
                sum(CASE WHEN keep > 0 THEN xc * keep ELSE 0 END)::BIGINT
                  AS s_kept
         FROM clipped GROUP BY grp)
       SELECT grp AS o_orderpriority, n AS n_rows, n_kept,
              round(s_kept::DOUBLE / n_kept / 100.0, 6) AS trimmed_mean
       FROM agg ORDER BY o_orderpriority""",
)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% two-sided trimmed mean of order totals per priority — the
    robust-location estimator between the mean (agg_stats) and the
    median (agg_percentile): drop the ⌊N/10⌋ smallest and largest ROWS,
    average the rest. Computed on the DISTINCT-VALUE grain with partial
    inclusion at the cut boundaries (keep = min(cum, hi) − max(cum−c,
    lo), so a tie block straddling the 10% line contributes exactly its
    in-range multiplicity — row semantics with no row-level sort). Sums
    are exact cent·count int64. Shape: one (grp, value) partial agg,
    cumulative windows over the distinct-value frame (bounded by price
    cardinality, far below row count), and a group-grain reduce — the
    same distributed-rank discipline as agg_weighted_median; no
    single-partition pass over data rows at any scale."""
    o = load_table(spark, sf_dir, "orders")
    v = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("xc"),
    )
    vals = v.groupBy("grp", "xc").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w_cum = (
        Window.partitionBy("grp")
        .orderBy("xc")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("grp")
    cum = vals.select(
        "grp",
        "xc",
        "c",
        F.sum("c").over(w_cum).cast("long").alias("cum_c"),
        F.sum("c").over(w_all).cast("long").alias("n"),
    )
    lo = F.floor(F.col("n") / 10).cast("long")
    hi = F.col("n") - lo
    keep = F.least(F.col("cum_c"), hi) - F.greatest(
        F.col("cum_c") - F.col("c"), lo
    )
    clipped = cum.select("grp", "xc", "n", keep.alias("keep"))
    agg = clipped.groupBy("grp").agg(
        F.max("n").alias("n"),
        F.sum(F.when(F.col("keep") > 0, F.col("keep")).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.sum(
            F.when(F.col("keep") > 0, F.col("xc") * F.col("keep")).otherwise(0)
        )
        .cast("long")
        .alias("s_kept"),
    )
    return agg.select(
        F.col("grp").alias("o_orderpriority"),
        F.col("n").alias("n_rows"),
        "n_kept",
        F.round(
            F.col("s_kept").cast("double") / F.col("n_kept") / 100.0, 6
        ).alias("trimmed_mean"),
    ).orderBy("o_orderpriority")
