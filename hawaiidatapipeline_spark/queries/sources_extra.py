"""Additional source/sink formats and the Arrow-native UDF tier.

Rounds out SURVEY.md §2.A/§2.K: ORC (Spark-native columnar alternative to
Parquet), plain-text line files (the lowest-common-denominator landing
format), and ``mapInArrow`` — the zero-copy Arrow batch tier below
pandas UDFs (no pandas conversion at all; pyarrow.compute kernels are
C++-vectorized)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.queries.sources import _scratch
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()


@q("scan_orc_roundtrip", "SELECT s_suppkey, s_name, s_nationkey FROM supplier")
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source — Spark's second native columnar format (footer
    schema, predicate pushdown, same scan machinery as Parquet)."""
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    path = _scratch("supplier_orc")
    s.write.mode("overwrite").orc(path)
    return spark.read.orc(path).select("s_suppkey", "s_name", "s_nationkey")


@q(
    "scan_text_lines",
    """SELECT n_nationkey, n_name FROM nation""",
)
def scan_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain-text line sink + source: one delimited line per row, parsed
    back with split — the lowest-common-denominator landing format (log
    shipping, legacy feeds); schema applied at parse, not at storage."""
    n = load_table(spark, sf_dir, "nation")
    path = _scratch("nation_text")
    n.select(
        F.concat_ws("|", F.col("n_nationkey").cast("string"), "n_name").alias("value")
    ).write.mode("overwrite").text(path)
    lines = spark.read.text(path)
    parts = F.split("value", r"\|")
    return lines.select(
        F.element_at(parts, 1).cast("int").alias("n_nationkey"),
        F.element_at(parts, 2).alias("n_name"),
    )


@q(
    "udf_arrow_batch",
    """SELECT doc_id, upper(lang) AS lang_u, length(text)::INT AS n_chars
       FROM documents""",
)
def udf_arrow_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` — the Arrow-native UDF tier (SURVEY.md §2.K): record
    batches flow straight into pyarrow.compute kernels with no pandas
    conversion; the fastest Python tier for byte/string-level work."""
    import pyarrow as pa
    import pyarrow.compute as pc

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")

    def fn(batches):
        for batch in batches:
            t = pa.Table.from_batches([batch])
            yield pa.RecordBatch.from_arrays(
                [
                    t.column("doc_id").combine_chunks(),
                    pc.utf8_upper(t.column("lang").combine_chunks()),
                    pc.cast(pc.utf8_length(t.column("text").combine_chunks()), pa.int32()),
                ],
                names=["doc_id", "lang_u", "n_chars"],
            )

    return d.mapInArrow(fn, "doc_id bigint, lang_u string, n_chars int")
