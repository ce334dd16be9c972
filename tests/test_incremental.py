"""Incremental aggregate merge must equal the direct full aggregate."""

from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries.analytics import etl_incremental_agg
from hawaiidatapipeline_spark.registry import load_table

from .conftest import SF0001


def test_merged_partials_equal_full_aggregate(spark):
    merged = {r["o_orderpriority"]: r for r in etl_incremental_agg(spark, SF0001).collect()}
    full = {
        r["o_orderpriority"]: r
        for r in load_table(spark, SF0001, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
            F.min("o_orderdate").alias("first_dt"),
            F.max("o_orderdate").alias("last_dt"),
        )
        .collect()
    }
    assert set(merged) == set(full)
    for k in full:
        assert merged[k]["n"] == full[k]["n"]
        assert merged[k]["total"] == full[k]["total"]
        assert merged[k]["first_dt"] == full[k]["first_dt"]
        assert merged[k]["last_dt"] == full[k]["last_dt"]
