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

from pyspark.sql import DataFrame, SparkSession
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
