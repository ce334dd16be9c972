"""Bucketed tables: pre-shuffled storage for co-located joins
(SURVEY.md §4.2; [NS] 100 TB design).

Writing both fact tables bucketed by the join key means the expensive
fact-fact join (lineitem⋈orders on orderkey) needs NO exchange at query
time — each task reads matching buckets from both sides. At 100 TB this
converts every repeated join on the canonical key from a full two-sided
shuffle into a local merge: the single biggest recurring saving in a star
schema, paid once at write time.

Bucketed writes go through ``saveAsTable`` (bucket metadata lives in the
session catalog / warehouse dir; plain ``parquet(path)`` cannot record it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Materialize a table bucketed (and optionally sorted) by the join key."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed on the same key with the same bucket count —
    planner elides both exchanges (asserted in tests/test_skew.py)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
