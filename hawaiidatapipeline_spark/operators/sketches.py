"""Deterministic mergeable sketches.

Spark's built-in approximate aggregates (HLL++, percentile_approx) are
engine-internal: correct, mergeable, but not reproducible by another
engine, so they can only ever be rows-only-checked. This module provides
the deterministic counterpart used where VERIFIABILITY matters:

- ``histogram_quantile``: fixed-grid histogram quantiles. Two linear
  passes (per-group bounds, then bucket counts — counts are trivially
  mergeable across partitions/increments, which is the whole scale story
  of histogram sketches); the estimate is the upper edge of the bucket
  where the cumulative count crosses p·n. Error ≤ (max−min)/n_buckets.
  Every step is integer counts + one identical IEEE division chain, so an
  external engine reproduces the estimate bit-for-bit.
- ``kmv_distinct``: K-minimum-values distinct-count sketch over the
  portable 60-bit hash. State = the k smallest distinct hashes per group
  (mergeable: union then re-take k); estimate = (k−1)·2^60 / h_(k), the
  classic KMV estimator (rel. std. error ≈ 1/√(k−2)). Deterministic and
  engine-reproducible where HLL++ registers are not.
- ``bloom_build`` / ``bloom_prefilter_join``: explicit runtime filter —
  a bloom over the (small) dim key set, compiled into a pure-codegen
  predicate on the fact side, prunes fact rows BEFORE the join shuffle.
  Zero false negatives ⇒ results identical to the plain join (exact
  oracle); this is the mechanism behind engine-injected bloom runtime
  filters, surfaced as an operator the user controls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.dedup import portable_hash64

_HASH_SPACE = float(1 << 60)


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, k: int = 256
) -> DataFrame:
    """Per-group approximate distinct count via K-minimum-values.

    Returns (group, est_distinct). Groups with fewer than k distinct
    hashes report their exact distinct count (the sketch is exact below
    capacity — same contract as HLL's sparse mode).
    """
    hashed = (
        df.select(group_col, portable_hash64(F.col(value_col).cast("string"), 7).alias("_h"))
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy("_h")
    ranked = hashed.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_nd", F.count(F.lit(1)).over(Window.partitionBy(group_col))
    )
    kth = ranked.filter(
        (F.col("_rn") == k) | ((F.col("_nd") < k) & (F.col("_rn") == F.col("_nd")))
    )
    return kth.select(
        group_col,
        F.when(F.col("_nd") < k, F.col("_nd").cast("double"))
        .otherwise(F.round(F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.col("_h"), 6))
        .alias("est_distinct"),
    )


def bloom_build(
    df: DataFrame, key_col: str, n_words: int = 256, n_hashes: int = 3
) -> list[int]:
    """Build bloom filter words (n_words × 64 bits) over a key column.
    One explode + bit_or aggregation; the returned list is tiny (n_words
    longs) — a sketch, not a dataset collect."""
    m = n_words * 64
    hashes = df.select(
        F.explode(
            F.array(*[F.xxhash64(F.col(key_col), F.lit(j)) for j in range(n_hashes)])
        ).alias("_h")
    )
    bits = hashes.select(F.pmod("_h", F.lit(m)).alias("_bit")).select(
        (F.col("_bit") / 64).cast("int").alias("_w"),
        F.expr("shiftleft(1L, cast(_bit % 64 as int))").alias("_mask"),
    )
    rows = bits.groupBy("_w").agg(F.expr("bit_or(_mask)").alias("_bits")).collect()
    words = [0] * n_words
    for r in rows:
        words[r._w] = r._bits
    return words


def bloom_condition(key_expr: str, words: list[int], n_hashes: int = 3):
    """Pure-codegen membership predicate for keys against built bloom
    words — compiles to array literal + shift/mask expressions, no UDF."""
    m = len(words) * 64
    arr = "array(" + ",".join(f"{w}L" for w in words) + ")"
    tests = []
    for j in range(n_hashes):
        b = f"pmod(xxhash64({key_expr}, {j}), {m})"
        tests.append(
            f"(shiftright(element_at({arr}, cast({b} div 64 as int) + 1),"
            f" cast({b} % 64 as int)) & 1) = 1"
        )
    return F.expr(" AND ".join(tests))


def bloom_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "inner",
    n_words: int = 256,
    n_hashes: int = 3,
) -> DataFrame:
    """Join with an explicit bloom runtime filter: fact rows whose key
    cannot be in the dim key set are dropped BEFORE the join shuffle.
    False positives only ⇒ the subsequent join removes them and the result
    equals the plain join exactly."""
    words = bloom_build(dim, dim_key, n_words, n_hashes)
    pruned = fact.filter(bloom_condition(fact_key, words, n_hashes))
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], how)


def cms_bucket_pairs(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 64, seed_base: int = 23
) -> DataFrame:
    """(i, b) sketch coordinates for every row — the shared front half of
    the batch AND streaming count-min builds (grouping these by (i, b)
    with count() IS the sketch; in streaming, the counters are the
    streaming state and micro-batch merge is ordinary partial
    aggregation)."""
    key_s = F.col(key_col).cast("string")
    return df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        F.pmod(portable_hash64(key_s, seed_base + i), F.lit(width)).alias("b"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("ib")
    ).select("ib.i", "ib.b")


def count_min_heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    depth: int = 4,
    width: int = 64,
    seed_base: int = 23,
) -> DataFrame:
    """Heavy hitters via a count-min sketch over the portable hash.

    Sketch build is the 100 TB path: depth×width counters (a few KB),
    built with one map-side-combinable groupBy — the same merge that
    makes CMS work across partitions, increments, and streaming
    micro-batches. Estimates NEVER undercount, so every true heavy
    hitter survives the threshold (no false negatives; collisions can
    add false positives, which a second exact pass over the tiny
    survivor set would remove).

    Returns (key, true_cnt, est_cnt) for keys whose estimate reaches
    ``threshold``. The exact ``true_cnt`` column exists to expose the
    overestimate bound to the checker; at production scale you would
    probe the broadcast sketch with a candidate stream instead of
    re-counting every key.
    """
    pairs = cms_bucket_pairs(df, key_col, depth, width, seed_base)
    sketch = pairs.groupBy("i", "b").agg(F.count(F.lit(1)).alias("_c"))
    cand = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("true_cnt"))
    cand_buckets = cand.select(
        key_col,
        "true_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        F.pmod(
                            portable_hash64(F.col(key_col).cast("string"), seed_base + i),
                            F.lit(width),
                        ).alias("b"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("ib"),
    ).select(key_col, "true_cnt", "ib.i", "ib.b")
    est = (
        cand_buckets.join(F.broadcast(sketch), ["i", "b"])
        .groupBy(key_col, "true_cnt")
        .agg(F.min("_c").alias("est_cnt"))
    )
    return est.filter(F.col("est_cnt") >= threshold)


def histogram_quantile(
    df: DataFrame,
    group_col: str,
    value_col: str,
    p: float = 0.5,
    n_buckets: int = 1000,
) -> DataFrame:
    """Per-group approximate p-quantile via a fixed histogram grid.

    Returns (group, q_estimate, n, bucket_width). Degenerate groups
    (min == max) return that value exactly.
    """
    bounds = df.groupBy(group_col).agg(
        F.min(value_col).alias("_mn"),
        F.max(value_col).alias("_mx"),
        F.count(F.lit(1)).alias("_n"),
    )
    width = (F.col("_mx") - F.col("_mn")) / F.lit(float(n_buckets))
    with_b = (
        df.join(bounds, group_col)
        .withColumn("_w", width)
        .withColumn(
            "_b",
            F.when(F.col("_mx") == F.col("_mn"), F.lit(0)).otherwise(
                F.least(
                    F.floor((F.col(value_col) - F.col("_mn")) / F.col("_w")),
                    F.lit(n_buckets - 1),
                )
            ).cast("long"),
        )
    )
    counts = with_b.groupBy(group_col, "_mn", "_w", "_n", "_b").agg(
        F.count(F.lit(1)).alias("_c")
    )
    wspec = Window.partitionBy(group_col).orderBy("_b").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = counts.withColumn("_cum", F.sum("_c").over(wspec))
    # first bucket where cumulative count reaches ceil(p * n)
    target = F.ceil(F.lit(p) * F.col("_n"))
    hits = ranked.filter(F.col("_cum") >= target)
    first = hits.groupBy(group_col, "_mn", "_w", "_n").agg(F.min("_b").alias("_b_sel"))
    return first.select(
        group_col,
        F.round(F.col("_mn") + (F.col("_b_sel") + 1) * F.col("_w"), 6).alias(
            "q_estimate"
        ),
        F.col("_n").cast("long").alias("n"),
        F.round("_w", 6).alias("bucket_width"),
    )
