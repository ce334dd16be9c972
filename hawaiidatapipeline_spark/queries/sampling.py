"""Deterministic sampling queries — Bernoulli, stratified, weighted.

Every selection is derived from the portable md5 hash, so the DuckDB
oracle recomputes the EXACT row set: sampling here is hash-verified, not
rows-only. See operators/sampling.py for the scale arguments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.sampling import (
    bernoulli_sample,
    stratified_fixed_n,
    weighted_priority_sample,
)
from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()

# DuckDB twin of operators/dedup.py:48 portable_hash64.
_H = "('0x' || substring(md5('{seed}:' || {col}::VARCHAR), 1, 15))::BIGINT"


@q(
    "sample_bernoulli",
    f"""SELECT o_orderkey, o_custkey, o_totalprice
       FROM orders
       WHERE {_H.format(seed=11, col='o_orderkey')} % 10000 < 1000""",
)
def sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% Bernoulli sample, reproducible across engines/runs/cluster
    sizes. Map-only: at 100 TB this is a scan-side filter — no shuffle,
    no driver state, and re-runs after failures pick identical rows."""
    o = load_table(spark, sf_dir, "orders")
    return bernoulli_sample(o, "o_orderkey", fraction_bp=1000, seed=11).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@q(
    "sample_stratified",
    f"""WITH ranked AS (
         SELECT o_orderstatus, o_orderkey, o_totalprice,
                row_number() OVER (
                  PARTITION BY o_orderstatus
                  ORDER BY {_H.format(seed=13, col='o_orderkey')}, o_orderkey
                ) AS rn
         FROM orders
       )
       SELECT o_orderstatus, o_orderkey, o_totalprice
       FROM ranked WHERE rn <= 200""",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly min(200, |stratum|) orders per order-status: per-source /
    per-language quota sampling for corpus mixing. One shuffle on the
    stratum key; hash-rank inside each stratum keeps the pick stable as
    data grows (a new row displaces at most one old pick)."""
    o = load_table(spark, sf_dir, "orders")
    return stratified_fixed_n(o, "o_orderstatus", "o_orderkey", 200, seed=13).select(
        "o_orderstatus", "o_orderkey", "o_totalprice"
    )


@q(
    "sample_weighted",
    f"""SELECT o_orderkey, o_totalprice, priority
       FROM (
         SELECT o_orderkey, o_totalprice,
                (({_H.format(seed=17, col='o_orderkey')} % 1000003 + 1) * 100000000)
                  // floor(o_totalprice * 100 + 0.5)::BIGINT AS priority
         FROM orders
       )
       ORDER BY priority, o_orderkey
       LIMIT 150""",
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """150 orders sampled WITHOUT replacement with probability increasing
    in o_totalprice (quality-weighted corpus selection). Integer-only
    priority u·SCALE div w — a rank-monotone Efraimidis–Spirakis variant
    chosen so both engines agree bit-for-bit (no pow/log). Spark executes
    the sort+limit as TakeOrdered: per-partition top-k then a 150-row
    driver merge — no global sort at any scale."""
    o = load_table(spark, sf_dir, "orders")
    w_cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    picked = weighted_priority_sample(o, "o_orderkey", w_cents, k=150, seed=17)
    return picked.select("o_orderkey", "o_totalprice", F.col("_priority").alias("priority"))
