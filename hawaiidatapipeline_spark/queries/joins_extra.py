"""Large-to-large non-equi joins, re-expressed as shuffled equi-joins.

queries/joins.py covers the broadcast-able range join (tiny band table).
This module covers the case broadcast can't touch: BOTH sides big — the
classic time-interval join — via bucket binning (operators/bucketing.py
``interval_join_binned``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.bucketing import interval_join_binned
from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()


@q(
    "join_interval_binned",
    """WITH iv AS (
         SELECT event_id AS interval_id, user_id,
                ts AS start_ts, ts + INTERVAL 30 MINUTE AS end_ts
         FROM events WHERE event_id % 10 = 0
       )
       SELECT iv.interval_id, count(*) AS n_events,
              round(sum(e.value::DECIMAL(18,6))::DOUBLE, 6) AS window_value
       FROM iv JOIN events e
         ON e.user_id = iv.user_id
        AND e.ts >= iv.start_ts AND e.ts < iv.end_ts
       GROUP BY iv.interval_id""",
)
def join_interval_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-interval event rollup where BOTH sides are fact-sized: every
    10th event opens a 30-minute window; count/sum the same user's events
    inside it. Executed as an equi-join on (user_id, time-bucket) — a
    plain shuffled hash join (no broadcast-nested-loop, no cartesian) —
    with the exact range predicate applied to candidates in-stage. The
    bin width (1800 s) equals the max interval length, so each interval
    lands in ≤2 buckets and each candidate pair meets exactly once."""
    e = load_table(spark, sf_dir, "events")
    intervals = e.filter(F.col("event_id") % 10 == 0).select(
        F.col("event_id").alias("interval_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end_ts"),
    )
    points = e.select("user_id", "ts", "value")
    joined = interval_join_binned(
        points, intervals, on="user_id", ts_col="ts", bin_seconds=1800
    )
    return joined.groupBy("interval_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        # decimal sum: exact/associative, so partition order can't move the
        # 6th digit (SURVEY.md §7 risk 1 flake class)
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6).alias(
            "window_value"
        ),
    )


@q(
    "join_fuzzy_blocked",
    """WITH dirty AS (
         SELECT c_custkey AS dirty_id,
                substring(c_name, 1, 17) || 'X' AS dirty_name
         FROM customer WHERE c_custkey % 5 = 0
       ),
       cands AS (
         SELECT d.dirty_id, d.dirty_name, c.c_custkey, c.c_name,
                levenshtein(d.dirty_name, c.c_name) AS dist
         FROM dirty d
         JOIN customer c
           ON substring(d.dirty_name, 1, 16) = substring(c.c_name, 1, 16)
         WHERE levenshtein(d.dirty_name, c.c_name) <= 2
       ),
       ranked AS (
         SELECT dirty_id, c_custkey, dist,
                row_number() OVER (PARTITION BY dirty_id
                                   ORDER BY dist, c_custkey) AS rnk
         FROM cands
       )
       SELECT dirty_id, c_custkey AS matched_custkey, dist
       FROM ranked WHERE rnk = 1""",
)
def join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy-match join — the record-linkage primitive: dirty
    names (deterministic one-char corruption of every 5th customer) are
    resolved against the clean table by edit distance, with candidates
    generated ONLY within a blocking key (shared 16-char prefix) so the
    join is an equi-join on the block — never name × name. Best match per
    dirty record by (distance, key) rank — deterministic even when
    several candidates tie at distance 1. At 100 TB the blocking key is
    the whole game (phonetic code, sorted-neighborhood window, or LSH
    band all slot into the same equi-join shape); the rank window runs
    over candidates only, not the corpus."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    dirty = c.filter(F.col("c_custkey") % 5 == 0).select(
        F.col("c_custkey").alias("dirty_id"),
        F.concat(F.substring("c_name", 1, 17), F.lit("X")).alias("dirty_name"),
    )
    cands = (
        dirty.join(
            c.select("c_custkey", "c_name"),
            F.substring("dirty_name", 1, 16) == F.substring("c_name", 1, 16),
        )
        .withColumn("dist", F.levenshtein("dirty_name", "c_name"))
        .filter(F.col("dist") <= 2)
    )
    w = Window.partitionBy("dirty_id").orderBy("dist", "c_custkey")
    return (
        cands.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("dirty_id", F.col("c_custkey").alias("matched_custkey"), "dist")
    )


@q(
    "join_interval_overlap",
    """WITH a AS (
         SELECT o_orderkey AS a_key, o_orderdate::DATE AS a_start,
                o_orderdate::DATE + (o_orderkey % 5 + 1)::INT AS a_end
         FROM orders WHERE o_orderpriority = '1-URGENT'),
       b AS (
         SELECT o_orderkey AS b_key, o_orderdate::DATE AS b_start,
                o_orderdate::DATE + (o_orderkey % 7 + 1)::INT AS b_end
         FROM orders WHERE o_orderpriority = '2-HIGH')
       SELECT count(*)::BIGINT AS n_pairs,
              sum(datediff('day', greatest(a_start, b_start),
                           least(a_end, b_end)) + 1)::BIGINT AS total_overlap_days
       FROM a JOIN b
         ON a_start <= b_end AND b_start <= a_end""",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval × interval overlap join (the genomics/billing-period
    shape, one step past ``join_interval_binned``'s point-in-interval):
    urgent-order activity windows against high-priority ones. The oracle
    is the O(n·m) theta join; the Spark plan is the dual-binned form —
    each interval explodes into the 7-day bins it touches (bounded:
    length ≤ 8 days → ≤ 2 bins), candidates meet through an EQUI-join on
    the bin key, and each qualifying pair is counted EXACTLY ONCE by
    attributing it to the single bin containing greatest(a_start,
    b_start) — no distinct over the pair stream, so matched pairs are
    consumed by the map-side partial aggregate and NOTHING pair-shaped
    is ever shuffled (the round-9 scaling probe caught the earlier
    distinct-based form going alpha2≈1.6: at a fixed fixture time span
    the pair set itself is quadratic in density, and shuffling it for
    dedup was the bottleneck; with bin attribution the only shuffle is
    the bin-keyed candidate join). At 100 TB real calendars grow with
    data volume, keeping per-bin density — and thus per-task pair
    enumeration — bounded; longer intervals only raise the bin fan-out
    linearly."""
    o = load_table(spark, sf_dir, "orders")

    def side(priority: str, mod: int, prefix: str) -> DataFrame:
        return o.filter(F.col("o_orderpriority") == priority).select(
            F.col("o_orderkey").alias(f"{prefix}_key"),
            F.to_date("o_orderdate").alias(f"{prefix}_start"),
            F.date_add(
                F.to_date("o_orderdate"),
                (F.col("o_orderkey") % mod + 1).cast("int"),
            ).alias(f"{prefix}_end"),
        )

    a = side("1-URGENT", 5, "a")
    b = side("2-HIGH", 7, "b")

    def binned(df: DataFrame, prefix: str) -> DataFrame:
        return df.withColumn(
            "bin",
            F.explode(
                F.sequence(
                    F.floor(F.unix_date(F.col(f"{prefix}_start")) / 7),
                    F.floor(F.unix_date(F.col(f"{prefix}_end")) / 7),
                )
            ),
        )

    pairs = (
        binned(a, "a")
        .join(binned(b, "b"), "bin")
        .filter(
            (F.col("a_start") <= F.col("b_end"))
            & (F.col("b_start") <= F.col("a_end"))
            # exactly-once attribution: a pair is emitted only from the
            # bin holding the overlap's left edge, so no dedup pass (and
            # no pair-stream shuffle) is needed
            & (
                F.col("bin")
                == F.floor(
                    F.unix_date(F.greatest("a_start", "b_start")) / 7
                )
            )
        )
        .select("a_key", "b_key", "a_start", "a_end", "b_start", "b_end")
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(
            F.datediff(
                F.least("a_end", "b_end"), F.greatest("a_start", "b_start")
            )
            + 1
        )
        .cast("long")
        .alias("total_overlap_days"),
    )
