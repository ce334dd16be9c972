"""Data-layout queries: Z-order key computation (hash-verified)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.layout import zvalue, zvalue_sql
from hawaiidatapipeline_spark.queries._registry import new_module_registry
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
