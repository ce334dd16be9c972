"""Dataset registry — the reference's portal catalog, reborn.

The reference listed/searched a Socrata portal's dataset catalog and fetched
datasets by id (SURVEY.md §2.A ``catalog_list``; [PK-HDP]). Here the catalog
is the set of fixture Parquet tables under a scale-factor directory; each is
loadable as a DataFrame and registrable as a temp view so the SQL and
DataFrame entry points are interchangeable (SURVEY.md §3.2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from hawaiidatapipeline_spark.session import prepare_session

# The ten fixture tables (TESTDATA.md / FIXTURES.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one catalog table. Schema comes from the Parquet footer; filters
    and projections applied by callers push down to the scan (Catalyst).

    ``events.ts`` is physically TIMESTAMP(NANOS); Spark's reader has no nanos
    type, so it's read as long (``nanosAsLong`` conf in session.py) and
    converted here to a µs timestamp (truncation — same as DuckDB's ns→µs)."""
    prepare_session(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view of the same name; returns the dict.

    This is the engine-side 'catalog': after calling, ``spark.sql`` sees the
    same relations the DataFrame API does.
    """
    out = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog listing as a DataFrame: name + column count + row count.

    Mirrors the reference's portal catalog list/search (clients filtered this
    by name substring). Row counts come from Parquet footer metadata via a
    count aggregate — metadata-only, no full scan.
    """
    rows = []
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        rows.append((name, len(df.columns), df.count()))
    return spark.createDataFrame(rows, "table_name string, n_columns int, n_rows bigint")
