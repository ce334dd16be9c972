"""Deterministic, engine-portable sampling operators.

A training-data pipeline samples constantly — held-out eval splits,
per-source quotas, quality-weighted subsets. Naive ``rand()`` sampling is
non-reproducible across runs and engines; these operators derive all
randomness from the portable 60-bit md5 hash (operators/dedup.py:48), so
the SAME rows are selected on any engine, any cluster size, any retry.
That buys three things at 100 TB:

* **Reproducibility** — a re-run after a node failure selects identical
  rows; no lineage surprises.
* **Verifiability** — DuckDB can recompute the exact selection, so the
  driver's hash gate checks sampling *exactly*, not just row counts.
* **No coordination** — every variant is either map-only (Bernoulli) or
  one bounded shuffle (stratified window / global top-k); no driver-side
  state, no two-pass count.

Reference parity: the SODA API exposes no sampling verb; this family is
part of the "operations a large-scale training-data pipeline needs"
mandate (SURVEY.md §2.L).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.dedup import portable_hash64

#: Modulus for the Bernoulli keep-decision: hash % 10_000 < fraction_bp.
_BP = 10_000

#: Prime modulus folding the 60-bit hash into a small uniform integer for
#: the weighted-priority key (keeps the integer product inside int64).
_U_MOD = 1_000_003

#: Scale factor for the integer priority ratio u/w.
_U_SCALE = 100_000_000


def bernoulli_sample(df: DataFrame, key_col: str, fraction_bp: int, seed: int = 11) -> DataFrame:
    """Keep each row iff hash(key) mod 10000 < ``fraction_bp`` (basis
    points: 1000 = 10%). Map-only — no shuffle, no state; at 100 TB this
    is a pure scan-side filter that composes with column pruning."""
    h = portable_hash64(F.col(key_col).cast("string"), seed)
    return df.filter(F.pmod(h, F.lit(_BP)) < F.lit(fraction_bp))


def stratified_fixed_n(
    df: DataFrame, stratum_col: str, key_col: str, n_per_stratum: int, seed: int = 13
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum: rank rows inside each
    stratum by (hash, key) and keep the first n. One shuffle on the
    stratum key; the rank is a streaming window (no buffering beyond the
    frame). For very hot strata at 100 TB, pre-filter with a generous
    ``bernoulli_sample`` (p ≈ 10·n/|stratum|) before ranking so the hot
    partition never materializes the full stratum."""
    h = portable_hash64(F.col(key_col).cast("string"), seed)
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def weighted_priority_sample(
    df: DataFrame, key_col: str, weight_cents, k: int, seed: int = 17
) -> DataFrame:
    """Weighted sample of k rows WITHOUT replacement: every row draws a
    deterministic uniform u = (hash mod p) + 1 and is ranked by the
    integer priority u·SCALE div w — smaller is better, so heavier rows
    win more often (rank-monotone integer variant of Efraimidis–Spirakis
    A-ES; transcendental-free on purpose, so DuckDB reproduces the exact
    selection bit-for-bit). ``weight_cents`` must be a positive integer
    Column. Executes as TakeOrdered (per-partition top-k, then a k-row
    merge on the driver) — no global sort, no full shuffle."""
    u = F.pmod(portable_hash64(F.col(key_col).cast("string"), seed), F.lit(_U_MOD)) + 1
    return (
        df.withColumn("_u", u)
        .withColumn("_w", weight_cents)
        .withColumn("_priority", F.expr(f"div(_u * {_U_SCALE}L, _w)"))
        .drop("_u", "_w")
        .orderBy(F.col("_priority").asc(), F.col(key_col).asc())
        .limit(k)
    )
