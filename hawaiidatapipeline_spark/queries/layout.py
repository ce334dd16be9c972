"""Data-layout queries: Z-order key computation (hash-verified) and
bucketed-table co-located joins (the shuffle-elimination layout)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.layout import zvalue, zvalue_sql
from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.queries.sources import _scratch
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()


@q(
    "layout_zorder_key",
    f"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
              {zvalue_sql('l_partkey', 'l_suppkey')} AS zval
       FROM lineitem""",
)
def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-curve) clustering key over (l_partkey, l_suppkey) — the
    sort key behind multi-dimensional file skipping (Delta OPTIMIZE
    ZORDER BY, rebuilt from shift/mask expressions). Map-only and pure
    codegen; the layout rewrite itself (range-partition + sort by this
    key) is exercised and MEASURED in tests/test_layout.py: row-group
    stats prune a 2-D box query several-fold better than natural order."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        zvalue(F.col("l_partkey"), F.col("l_suppkey")).alias("zval"),
    )


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 8
) -> DataFrame:
    """Persist ``df`` as a parquet table hash-bucketed (and bucket-sorted)
    by ``key``. Every row with the same key hash lands in the same bucket
    file index on every table written with the same ``n_buckets`` — the
    storage-layout contract that lets Catalyst drop BOTH shuffle exchanges
    from a subsequent equi-join on the bucket key. At 100 TB this is the
    difference between re-shuffling the fact table on every join and
    shuffling it exactly once, at write time.

    The pre-write ``repartition(n_buckets, key)`` aligns write tasks with
    bucket ids (same HashPartitioning), so each bucket is exactly ONE
    file — without it every task emits a file per bucket it touches
    (tasks × buckets small files) and Spark must re-Sort bucket reads
    before a merge join instead of trusting the ``sortBy`` order."""
    spark = df.sparkSession
    (
        df.repartition(n_buckets, F.col(key))
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", _scratch(table))
        .saveAsTable(table)
    )
    return spark.table(table)


@q(
    "scan_bucketed_join",
    """SELECT c_mktsegment, count(*) AS n, sum(o_orderkey)::BIGINT AS key_sum
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY c_mktsegment""",
)
def scan_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join over bucketed tables: both sides are written
    ``bucketBy(8, custkey)`` and the sort-merge join (forced via the MERGE
    hint so the tiny fixture dim cannot demote to broadcast) then runs with
    ZERO shuffle exchanges on either input — bucket i of orders joins
    bucket i of customer in place; the only exchange left in the plan is
    the few-row final aggregation. tests/test_bucketed.py asserts the
    executed join subplan is exchange-free; the oracle proves the layout
    changes nothing about the result. This is the pre-shuffled fact/dim
    layout a 100 TB deployment uses for repeated joins on the same key."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    bo = write_bucketed(o, "bk_orders", "o_custkey")
    bc = write_bucketed(c, "bk_customer", "c_custkey")
    return (
        bo.hint("merge")
        .join(bc, bo.o_custkey == bc.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").alias("key_sum"),
        )
    )


@q(
    "sink_sorted_export",
    """SELECT l_orderkey, l_linenumber, l_shipdate,
              round(l_extendedprice, 6) AS price
       FROM lineitem""",
)
def sink_sorted_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Globally range-sorted export: ``repartitionByRange`` splits the
    time axis into contiguous slices (one sampling pass picks the
    boundaries) and ``sortWithinPartitions`` orders rows inside each, so
    the written files carry DISJOINT min/max ranges on l_shipdate —
    parquet footer stats then prune time-window scans to the few files
    that overlap, the 1-D counterpart of the Z-order layout.
    tests/test_bucketed.py measures the disjointness; the oracle proves
    the rewrite moves rows without changing them."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        F.round("l_extendedprice", 6).alias("price"),
    )
    path = _scratch("lineitem_sorted")
    (
        li.repartitionByRange(8, F.col("l_shipdate"))
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(path)
    )
    return spark.read.parquet(path)
