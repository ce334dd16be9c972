"""Multi-touch attribution extras — round-9 batch 10.

Completes the attribution family (``events_attribution_linear`` splits
credit evenly, ``events_first_touch`` gives it all to the opener) with
the two models every marketing-analytics engine is asked for next:
simplified Shapley (credit = Σ over touch-sets containing the channel
of conversions(S)/|S| — the cooperative-game answer to "which channel
actually moved conversions") and exponential time decay (credit ∝
2^−Δdays, the recency-weighted model). Both are exact-integer
pipelines: set masks are bit arithmetic, 2^−Δ weights are scaled to
integer 2^(H−Δ), and every rational credit is floored to micro-units
BEFORE summation so parallel addition is order-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()

# channel → bit, fixed order (the attribution family's touch types)
_CHANNELS = (("view", 1), ("click", 2), ("signup", 4))


@q(
    "events_attribution_shapley",
    """WITH conv AS (
         SELECT user_id, min(ts) AS first_purchase
         FROM events WHERE event_type = 'purchase' GROUP BY user_id),
       masks AS (
         SELECT c.user_id,
                (max(CASE WHEN t.event_type = 'view' THEN 1 ELSE 0 END)
                 + max(CASE WHEN t.event_type = 'click' THEN 2 ELSE 0 END)
                 + max(CASE WHEN t.event_type = 'signup' THEN 4 ELSE 0 END)
                )::BIGINT AS mask
         FROM conv c JOIN events t
           ON t.user_id = c.user_id AND t.ts < c.first_purchase
          AND t.event_type IN ('view', 'click', 'signup')
         GROUP BY c.user_id),
       sets AS (
         SELECT mask, count(*)::BIGINT AS conv_s,
                bit_count(mask)::BIGINT AS set_size
         FROM masks WHERE mask > 0 GROUP BY mask),
       ch AS (SELECT * FROM (VALUES ('view', 1), ('click', 2),
                                    ('signup', 4)) AS t(channel, bit)),
       credited AS (
         SELECT ch.channel, s.conv_s,
                (s.conv_s * 1000000 // s.set_size)::BIGINT AS credit_micro
         FROM sets s JOIN ch ON (s.mask & ch.bit) <> 0)
       SELECT channel,
              sum(conv_s)::BIGINT AS n_users,
              round(sum(credit_micro)::DOUBLE / 1000000.0, 6) AS credit
       FROM credited GROUP BY channel ORDER BY channel""",
)
def events_attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified-Shapley multi-touch attribution: each converted user's
    distinct pre-first-purchase touch channels form a SET (a 3-bit
    mask); conversions aggregate per distinct set, and channel c's
    credit is Σ over sets containing c of conv(S)/|S| — the equal
    marginal split of the cooperative game under the standard
    "presence-only" simplification. conv(S)/|S| is floored to integer
    micro-units per SET (at most 2³−1 = 7 sets exist, so the flooring
    happens on the tiny set frame, then sums are exact). Shape: one
    user-grain purchase min + one touch join + one user-grain mask agg
    (two user_id shuffles — same as the proportion z-test), then ALL
    attribution math runs on the ≤7-row set frame crossed with the
    3-row channel table. At 100 TB nothing after the user-grain agg
    scales with data; the model is a constant-size contingency."""
    e = load_table(spark, sf_dir, "events")
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    touches = e.filter(
        F.col("event_type").isin([c for c, _ in _CHANNELS])
    ).select("user_id", "ts", "event_type")
    masks = (
        conv.join(touches, "user_id")
        .filter(F.col("ts") < F.col("first_purchase"))
        .groupBy("user_id")
        .agg(
            sum(
                (
                    F.max(
                        F.when(F.col("event_type") == c, b).otherwise(0)
                    )
                    for c, b in _CHANNELS
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("mask")
        )
    )
    sets = (
        masks.filter(F.col("mask") > 0)
        .groupBy("mask")
        .agg(F.count(F.lit(1)).cast("long").alias("conv_s"))
        .withColumn("set_size", F.bit_count(F.col("mask")).cast("long"))
    )
    ch = spark.createDataFrame(list(_CHANNELS), "channel string, bit int")
    credited = sets.join(
        F.broadcast(ch), F.expr("(mask & bit) <> 0")
    ).select(
        "channel",
        "conv_s",
        F.floor(F.col("conv_s") * 1000000 / F.col("set_size"))
        .cast("long")
        .alias("credit_micro"),
    )
    return (
        credited.groupBy("channel")
        .agg(
            F.sum("conv_s").cast("long").alias("n_users"),
            F.round(
                F.sum("credit_micro").cast("double") / 1000000.0, 6
            ).alias("credit"),
        )
        .orderBy("channel")
    )


_DECAY_HORIZON_DAYS = 7  # lookback window; weight = 2^-(days before conv)


@q(
    "events_attribution_time_decay",
    f"""WITH conv AS (
         SELECT event_id AS conv_id, user_id, epoch_us(ts)::BIGINT AS cus
         FROM events WHERE event_type = 'purchase'),
       touch AS (
         SELECT user_id, event_type, epoch_us(ts)::BIGINT AS tus
         FROM events WHERE event_type IN ('view', 'click', 'signup')),
       tj AS (
         SELECT c.conv_id, t.event_type,
                (1::BIGINT << ({_DECAY_HORIZON_DAYS - 1}
                   - (c.cus - t.tus) // 86400000000)) AS w_scaled
         FROM conv c JOIN touch t
           ON t.user_id = c.user_id
          AND t.tus < c.cus
          AND (c.cus - t.tus) // 86400000000 < {_DECAY_HORIZON_DAYS}),
       norm AS (
         SELECT conv_id, event_type, w_scaled,
                sum(w_scaled) OVER (PARTITION BY conv_id) AS total_w
         FROM tj),
       credited AS (
         SELECT conv_id, event_type,
                (w_scaled * 1000000 // total_w)::BIGINT AS credit_micro
         FROM norm)
       SELECT event_type AS channel,
              count(*)::BIGINT AS n_touches,
              count(DISTINCT conv_id)::BIGINT AS n_conversions_touched,
              round(sum(credit_micro)::DOUBLE / 1000000.0, 6) AS credit
       FROM credited GROUP BY event_type ORDER BY channel""",
)
def events_attribution_time_decay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exponential time-decay attribution: every touch within the 7-day
    lookback of a purchase earns weight 2^−Δdays (recency doubles
    credit), normalized per conversion. The half-life weights are kept
    EXACT by scaling to integers 2^(6−Δ) ∈ {{1..64}} (a shifted power
    of two, not a float), the per-conversion normalization is integer
    micro-flooring against the conversion's total scaled weight, and
    channel credits are exact int sums — fully hash-checkable. Shape:
    one user-keyed equi-join with a time-band predicate (the
    ``join_interval_binned`` family's shape), one per-conversion window
    for the normalizer (partitioned by conv_id — bounded by a user's
    7-day touch count), one channel-grain agg. All shuffles linear in
    touches; at 100 TB identical to the linear-attribution plan plus
    one integer shift."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    conv = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        "user_id",
        F.unix_micros("ts").alias("cus"),
    )
    touch = e.filter(
        F.col("event_type").isin([c for c, _ in _CHANNELS])
    ).select("user_id", "event_type", F.unix_micros("ts").alias("tus"))
    dd = (F.col("cus") - F.col("tus")) / F.lit(86400000000)
    ddays = F.floor(dd).cast("long")
    tj = (
        conv.join(touch, "user_id")
        .filter(
            (F.col("tus") < F.col("cus"))
            & (ddays < _DECAY_HORIZON_DAYS)
        )
        .select(
            "conv_id",
            "event_type",
            F.expr(
                f"shiftleft(1L, cast({_DECAY_HORIZON_DAYS - 1}"
                " - floor((cus - tus) / 86400000000) as int))"
            ).alias("w_scaled"),
        )
    )
    w = Window.partitionBy("conv_id")
    credited = tj.select(
        "conv_id",
        "event_type",
        F.floor(
            F.col("w_scaled") * 1000000 / F.sum("w_scaled").over(w)
        )
        .cast("long")
        .alias("credit_micro"),
    )
    return (
        credited.groupBy(F.col("event_type").alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.countDistinct("conv_id")
            .cast("long")
            .alias("n_conversions_touched"),
            F.round(
                F.sum("credit_micro").cast("double") / 1000000.0, 6
            ).alias("credit"),
        )
        .orderBy("channel")
    )


_MK_STEPS = 12  # truncated absorbing-chain horizon (micro-unit converged)
_MK_CHANNELS = ("click", "signup", "view")


def _markov_edges_sql() -> str:
    """Shared journey→edge CTEs: per user, pre-first-purchase channel
    touches in (ts, event_id) order; START enters the first touch, the
    last touch exits to CONV/DROP, touchless converters go START→CONV."""
    chans = ", ".join(f"'{c}'" for c in _MK_CHANNELS)
    return f"""conv AS (
         SELECT user_id, min(ts) AS fp FROM events
         WHERE event_type = 'purchase' GROUP BY user_id),
       t0 AS (
         SELECT e.user_id, e.ts, e.event_id, e.event_type, c.fp
         FROM events e LEFT JOIN conv c USING (user_id)
         WHERE e.event_type IN ({chans})
           AND (c.fp IS NULL OR e.ts < c.fp)),
       seq AS (
         SELECT user_id, event_type, fp,
                lead(event_type) OVER w AS nxt,
                row_number() OVER w AS rn
         FROM t0
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       term AS (
         SELECT user_id,
                CASE WHEN fp IS NULL THEN 'DROP' ELSE 'CONV' END AS terminal
         FROM seq GROUP BY user_id, fp),
       edges AS (
         SELECT s.event_type AS src, coalesce(s.nxt, t.terminal) AS dst
         FROM seq s JOIN term t USING (user_id)
         UNION ALL
         SELECT 'START', event_type FROM seq WHERE rn = 1
         UNION ALL
         SELECT 'START', 'CONV' FROM conv c
         WHERE NOT EXISTS (SELECT 1 FROM t0 WHERE t0.user_id = c.user_id)),
       trans AS (SELECT src, dst, count(*)::BIGINT AS n
                 FROM edges GROUP BY 1, 2),
       tot AS (SELECT src, sum(n)::BIGINT AS total FROM trans GROUP BY src)"""


def _markov_lane_ctes(lane: str, removed: str | None) -> str:
    """K unrolled DP steps for one lane (pagerank/kmeans idiom): p_k(s) =
    floor(Σ_t n(s,t)·p_{k-1}(t) / n(s)) in micro units, CONV pinned at
    1e6; a removed channel contributes 0 by excluding its dst rows (the
    denominator keeps them — redirected to DROP, the standard removal
    semantics)."""
    drop = f" AND t.dst <> '{removed}'" if removed else ""
    parts = [f"p_{lane}_0 AS (SELECT 'CONV' AS state, 1000000::BIGINT AS val)"]
    for k in range(1, _MK_STEPS + 1):
        parts.append(
            f"""p_{lane}_{k} AS (
         SELECT t.src AS state,
                (sum(t.n * p.val) // max(tt.total))::BIGINT AS val
         FROM trans t
         JOIN p_{lane}_{k - 1} p ON p.state = t.dst{drop}
         JOIN tot tt ON tt.src = t.src
         GROUP BY t.src
         UNION ALL SELECT 'CONV', 1000000::BIGINT)"""
        )
    return ",\n       ".join(parts)


def _markov_sql() -> str:
    lanes = [_markov_lane_ctes("full", None)]
    for c in _MK_CHANNELS:
        lanes.append(_markov_lane_ctes(c, c))
    start_val = (
        lambda lane: f"coalesce((SELECT val FROM p_{lane}_{_MK_STEPS} "
        f"WHERE state = 'START'), 0)"
    )
    per_channel = " UNION ALL ".join(
        f"SELECT '{c}' AS channel, {start_val(c)}::BIGINT AS p_removed"
        for c in _MK_CHANNELS
    )
    lanes_sql = ",\n       ".join(lanes)
    return f"""WITH {_markov_edges_sql()},
       {lanes_sql},
       base AS (
         SELECT greatest({start_val("full")}, 1)::BIGINT AS p_full,
                (SELECT count(*) FROM conv)::BIGINT AS n_conversions),
       rem AS (
         SELECT r.channel, b.p_full, b.n_conversions,
                ((b.p_full - least(r.p_removed, b.p_full)) * 1000000
                 // b.p_full)::BIGINT AS removal_micro
         FROM ({per_channel}) r CROSS JOIN base b),
       s AS (SELECT sum(removal_micro)::BIGINT AS sum_rem FROM rem)
       SELECT rem.channel,
              rem.n_conversions,
              round(rem.p_full / 1000000.0, 6) AS p_conv,
              round(rem.removal_micro / 1000000.0, 6) AS removal_effect,
              round((rem.removal_micro * 1000000
                     // greatest(s.sum_rem, 1)) / 1000000.0, 6)
                AS credit_share
       FROM rem, s ORDER BY rem.channel"""


@q("events_attribution_markov", _markov_sql())
def events_attribution_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution — the data-driven member that
    completes the attribution family (first-touch and linear split by
    position, time-decay by recency, Shapley by set membership; Markov
    credits each channel by how much conversion probability DISAPPEARS
    when journeys can no longer pass through it). First-order chain on
    the journey states (START, channels, CONV/DROP absorbing): exact
    integer transition counts feed a truncated DP (_MK_STEPS = 12 steps)
    in micro units with truncating division — the pagerank/kmeans
    fixed-point idiom, so both engines land identical integers at every
    step — and channel c's lane excludes transitions INTO c from
    numerators while denominators keep them (redirected to DROP, the
    standard removal semantics). removal_c = 1 − P_c/P_full; credit
    shares normalize removals. Scale: journeys need ONE user-keyed
    shuffle (window + rollup); everything after lives on the
    ≤(channels+3)² transition matrix — a bounded metadata pull (the
    states are a constant, not data) that the driver-side DP mirrors
    integer-for-integer with the unrolled oracle CTEs."""
    e = load_table(spark, sf_dir, "events")
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fp"))
    )
    t0 = (
        e.filter(F.col("event_type").isin(list(_MK_CHANNELS)))
        .join(conv, "user_id", "left")
        .filter(F.col("fp").isNull() | (F.col("ts") < F.col("fp")))
        .select("user_id", "ts", "event_id", "event_type", "fp")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t0.select(
        "user_id",
        "event_type",
        "fp",
        F.lead("event_type").over(w).alias("nxt"),
        F.row_number().over(w).alias("rn"),
    )
    terminal = F.when(F.col("fp").isNull(), "DROP").otherwise("CONV")
    edges = (
        seq.select(
            F.col("event_type").alias("src"),
            F.coalesce("nxt", terminal).alias("dst"),
        )
        .unionByName(
            seq.filter(F.col("rn") == 1).select(
                F.lit("START").alias("src"), F.col("event_type").alias("dst")
            )
        )
        .unionByName(
            conv.join(t0.select("user_id").distinct(), "user_id", "left_anti")
            .select(F.lit("START").alias("src"), F.lit("CONV").alias("dst"))
        )
    )
    trans = [
        (r["src"], r["dst"], r["n"])
        for r in edges.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()  # bounded: <= (channels+3)^2 rows, a constant grain
    ]
    n_conversions = conv.count()
    totals: dict = {}
    for src, _, n in trans:
        totals[src] = totals.get(src, 0) + n

    def dp(removed: str | None) -> int:
        p = {"CONV": 1000000}
        for _ in range(_MK_STEPS):
            nxt = {}
            for src, dst, n in trans:
                if removed is not None and dst == removed:
                    continue
                nxt[src] = nxt.get(src, 0) + n * p.get(dst, 0)
            p = {s: v // totals[s] for s, v in nxt.items()}
            p["CONV"] = 1000000
        return p.get("START", 0)

    p_full = max(dp(None), 1)
    removal = {
        c: (p_full - min(dp(c), p_full)) * 1000000 // p_full
        for c in _MK_CHANNELS
    }
    sum_rem = max(sum(removal.values()), 1)
    rows = [
        (
            c,
            n_conversions,
            round(p_full / 1000000.0, 6),
            round(removal[c] / 1000000.0, 6),
            round((removal[c] * 1000000 // sum_rem) / 1000000.0, 6),
        )
        for c in sorted(_MK_CHANNELS)
    ]
    return spark.createDataFrame(
        rows,
        "channel string, n_conversions long, p_conv double, "
        "removal_effect double, credit_share double",
    )
