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

    ``events.ts`` normalization (fixture shape has drifted across rounds):
    - TIMESTAMP(NANOS) fixtures read as long (``nanosAsLong`` conf in
      session.py) → rebuilt as µs timestamps (truncation, same as DuckDB);
    - tz-naive TIMESTAMP(MICROS) fixtures read as TIMESTAMP_NTZ in Spark 4
      (``inferTimestampNTZ``) → cast to TIMESTAMP. The session timezone is
      pinned UTC, so the cast is exact and matches DuckDB's reading.
    Event-time ops (``unix_micros``, ``withWatermark``) require TIMESTAMP,
    so every downstream consumer relies on this normalization."""
    prepare_session(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_event_time(df)
    return df


def normalize_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to TIMESTAMP (µs, UTC session TZ).

    Accepts the three physical shapes the events fixture has shipped with:
    long nanos (legacy nanosAsLong read), TIMESTAMP_NTZ (tz-naive µs under
    Spark 4's NTZ inference), or already-TIMESTAMP (no-op)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    dtype = df.schema[col].dataType
    if isinstance(dtype, LongType):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if isinstance(dtype, TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
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


# Portal-style category tags — the reference portal's catalog exposed a
# category facet and column metadata as searchable fields alongside the
# dataset name; this is that metadata for the fixture corpus.
TABLE_CATEGORIES = {
    "region": "reference",
    "nation": "reference",
    "customer": "directory",
    "supplier": "directory",
    "part": "commerce",
    "orders": "commerce",
    "lineitem": "commerce",
    "events": "telemetry",
    "documents": "corpus",
    "embeddings": "ml-features",
}


def catalog_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog with full search metadata: category tag and the column-name
    list (comma-joined) per dataset — the inputs to Engine.search's
    name/category/columns fields. Schema comes from the Parquet footer, so
    the columns field is always live metadata, never a stale sidecar."""
    rows = []
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        rows.append(
            (name, TABLE_CATEGORIES[name], len(df.columns), df.count(), ",".join(df.columns))
        )
    return spark.createDataFrame(
        rows,
        "table_name string, category string, n_columns int, n_rows bigint, column_names string",
    )
