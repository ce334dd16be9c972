"""Flagship query — the M0 end-to-end slice (SURVEY.md §7 M0).

TPC-H-Q1-shaped pricing summary over ``lineitem``:
scan → filter (pushed to Parquet) → project → hash-aggregate (partial+final,
map-side combine) → sort. The whole plan stays inside whole-stage codegen;
at 100 TB the only shuffle is the 6-row-out aggregation exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.registry import load_table

CUTOFF = "1998-09-02"


def _davg(col: str):
    """Order-independent 6-dp average of an exact-decimal-valued column:
    exact DECIMAL sum, one final double division — bit-identical across
    engines and partitionings."""
    return F.round(
        F.sum(F.col(col).cast("decimal(18,6)")).cast("double") / F.count(F.lit(1)), 6
    )


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit(CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 6).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias(
                "sum_disc_price"
            ),
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
                ),
                6,
            ).alias("sum_charge"),
            # Exact decimal sums ÷ count: the averaged columns hold exact
            # 2-dp values, so a float avg can land ON a 6-dp rounding
            # boundary where partial-sum ORDER flips the last digit vs the
            # oracle. Decimal sums make both engines divide identical
            # operands (SURVEY.md §7 risk 1).
            _davg("l_quantity").alias("avg_qty"),
            _davg("l_extendedprice").alias("avg_price"),
            _davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_SQL = f"""
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 6)                                          AS sum_qty,
  round(sum(l_extendedprice), 6)                                     AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 6)                  AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6)    AS sum_charge,
  round(sum(l_quantity::DECIMAL(18,6))::DOUBLE / count(*), 6)       AS avg_qty,
  round(sum(l_extendedprice::DECIMAL(18,6))::DOUBLE / count(*), 6)   AS avg_price,
  round(sum(l_discount::DECIMAL(18,6))::DOUBLE / count(*), 6)        AS avg_disc,
  count(*)                                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

QUERIES = {"pricing_summary": pricing_summary}
ORACLES = {"pricing_summary": PRICING_SUMMARY_SQL}
