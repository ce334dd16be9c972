"""Spark 4 Python DataSource for SODA — DISTRIBUTED paged ingestion.

`sources/ingest.py` lands pages from the driver (bounded by one ingester's
network throughput). This module goes further using the Python DataSource
API (pyspark.sql.datasource, Spark 4): the page range is split into
``InputPartition``s up front, and EACH EXECUTOR TASK fetches its own
``$limit/$offset`` window directly — ingestion bandwidth scales with the
cluster, the true 100 TB shape for a paged REST source.

    spark.dataSource.register(SodaDataSource)
    df = (spark.read.format("soda")
          .schema("id bigint, name string, val double")
          .option("base_url", "https://data.hawaii.gov")
          .option("dataset_id", "abcd-1234")
          .option("total_rows", "250000")
          .option("page_size", "1000")
          .load())

``total_rows`` bounds the page plan (SODA exposes it via
``SELECT count(*)``; the caller supplies it so planning needs no I/O).
Fields are parsed from the JSON page by name, in schema order; SODA returns
strings over the wire, so values are cast to the declared type.
Tested end-to-end against the loopback stub server (tests/test_ingest.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


@dataclass
class PagePartition(InputPartition):
    offset: int
    limit: int


class SodaDataSource(DataSource):
    """DataSource V2 (Python) over the SODA ``$limit/$offset`` protocol."""

    @classmethod
    def name(cls) -> str:
        return "soda"

    def schema(self):
        if "schema" in self.options:
            return self.options["schema"]
        raise ValueError(
            "soda datasource requires an explicit schema "
            "(.schema(...) or .option('schema', ...))"
        )

    def reader(self, schema) -> "SodaReader":
        return SodaReader(schema, self.options)


class SodaReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema_ = schema
        self.options = options
        self.total_rows = int(options.get("total_rows", 0))
        self.page_size = int(options.get("page_size", 1000))
        if self.total_rows <= 0:
            raise ValueError("soda datasource requires option total_rows > 0")

    def partitions(self):
        return [
            PagePartition(off, min(self.page_size, self.total_rows - off))
            for off in range(0, self.total_rows, self.page_size)
        ]

    def read(self, partition: PagePartition):
        # Runs ON THE EXECUTOR: each task pulls exactly its page window.
        from hawaiidatapipeline_spark.sources.ingest import http_page_fetcher

        fetch = http_page_fetcher(
            self.options.get("domain", ""),
            self.options["dataset_id"],
            app_token=self.options.get("app_token"),
            base_url=self.options.get("base_url"),
        )
        rows = fetch(partition.offset, partition.limit)
        fields = [(f.name, f.dataType) for f in self.schema_.fields]
        for row in rows:
            yield tuple(_coerce(row.get(name), dt) for name, dt in fields)


def _coerce(value, dtype):
    """SODA serializes numbers as JSON strings; cast to the declared type."""
    if value is None:
        return None
    t = dtype.typeName()
    if t in ("long", "integer", "short", "byte"):
        return int(value)
    if t in ("double", "float"):
        return float(value)
    if t == "boolean":
        return value in (True, "true", "True", "1")
    return str(value)
