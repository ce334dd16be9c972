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


def interval_join_binned(
    points,
    intervals,
    on: str,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bin_seconds: int = 1800,
):
    """Point-in-interval join between two LARGE tables, as an equi-join.

    Spark plans a raw ``ts BETWEEN start AND end`` predicate between two
    big tables as a broadcast-nested-loop (driver OOM) or cartesian —
    both non-starters at 100 TB. The standard fix: bin time into buckets
    of width >= the max interval length, register each interval under its
    start and end buckets (<= 2 copies), give each point its single
    bucket, equi-join on (key, bucket) — a plain shuffled hash join that
    scales like any other — then apply the exact range predicate to the
    candidates. Each (point, interval) pair meets in exactly one bucket
    (the point's), so no dedup pass is needed.

    ``bin_seconds`` MUST be >= the longest interval, else matches are
    lost; skewed hot buckets are diluted by the partition key ``on``
    being part of the join key (plus AQE skew splitting).
    """
    from pyspark.sql import functions as F

    b = F.lit(int(bin_seconds))
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor(F.unix_timestamp(start_col) / b),
                    F.floor(F.unix_timestamp(end_col) / b),
                )
            )
        ),
    )
    pt = points.withColumn("_b", F.floor(F.unix_timestamp(ts_col) / b))
    return pt.join(iv, [on, "_b"]).filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    ).drop("_b")
