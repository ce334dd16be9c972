"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()``
returns every checked operator (SURVEY.md §2) as (spark, sf_dir) -> DataFrame;
``oracle_sql()`` the DuckDB-equivalent SQL for exact-oracle entries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    from hawaiidatapipeline_spark.queries.core import pricing_summary

    return pricing_summary(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from hawaiidatapipeline_spark.queries import collect

    return collect()[0]


def oracle_sql() -> dict[str, str]:
    from hawaiidatapipeline_spark.queries import collect

    return collect()[1]
