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
    "scan_csv_malformed",
    "SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def scan_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record policy: the landing dir gains a file of broken rows
    (wrong arity, non-numeric keys, truncated lines — what real feeds
    deliver); ``mode=DROPMALFORMED`` under an explicit schema drops exactly
    those, so the surviving rows equal the clean table. The PERMISSIVE/
    corrupt-record-column variant is the audit-trail alternative when
    dropped rows must be accounted for."""
    import os

    n = load_table(spark, sf_dir, "nation")
    path = _scratch("nation_csv_dirty")
    n.select("n_nationkey", "n_name", "n_regionkey").write.mode("overwrite").csv(path)
    with open(os.path.join(path, "part-malformed.csv"), "w") as fh:
        fh.write("not_a_number,BROKEN,7\n")  # type error in int column -> dropped
        fh.write("99,TOO,3,MANY,COLUMNS\n")  # arity too high -> dropped
        fh.write("100\n")                    # truncated line -> dropped
        # all-empty line: arity matches so it parses to (null,null,null) and
        # DROPMALFORMED keeps it — the isNotNull filter below is the policy
        # decision a real pipeline makes about empty-but-parseable rows
        fh.write(",,\n")
    return (
        spark.read.schema("n_nationkey int, n_name string, n_regionkey int")
        .option("mode", "DROPMALFORMED")
        .csv(path)
        .filter(F.col("n_nationkey").isNotNull())
        .select("n_nationkey", "n_name", "n_regionkey")
    )


@q(
    "scan_schema_evolution",
    """WITH v1 AS (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 10),
       v2 AS (SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_nationkey >= 10)
       SELECT n_nationkey, n_name, NULL::INT AS n_regionkey FROM v1
       UNION ALL
       SELECT n_nationkey, n_name, n_regionkey FROM v2""",
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: two parquet generations (v2 adds a column)
    under one prefix, read with ``mergeSchema`` — old files surface NULL for
    the new column. The append-only evolution story every long-lived landing
    zone needs; at scale mergeSchema is planning-time footer work only."""
    n = load_table(spark, sf_dir, "nation")
    path = _scratch("nation_evolving")
    n.filter(F.col("n_nationkey") < 10).select("n_nationkey", "n_name").write.mode(
        "overwrite"
    ).parquet(path + "/gen=1")
    n.filter(F.col("n_nationkey") >= 10).select(
        "n_nationkey", "n_name", "n_regionkey"
    ).write.mode("overwrite").parquet(path + "/gen=2")
    return (
        spark.read.option("mergeSchema", True)
        .parquet(path)
        .select("n_nationkey", "n_name", F.col("n_regionkey").cast("int"))
    )


@q(
    "udf_cogrouped_map",
    """WITH p AS (
         SELECT user_id, count(*) AS n_purchases, round(sum(value), 6) AS purchase_value
         FROM events WHERE event_type = 'purchase' GROUP BY user_id
       ),
       c AS (
         SELECT user_id, count(*) AS n_clicks
         FROM events WHERE event_type = 'click' GROUP BY user_id
       )
       SELECT coalesce(p.user_id, c.user_id) AS user_id,
              coalesce(n_purchases, 0)::BIGINT AS n_purchases,
              coalesce(round(purchase_value, 6), 0.0) AS purchase_value,
              coalesce(n_clicks, 0)::BIGINT AS n_clicks
       FROM p FULL OUTER JOIN c ON p.user_id = c.user_id""",
)
def udf_cogrouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``cogroup(...).applyInPandas`` — the two-sided grouped-map tier
    (SURVEY.md §2.K): both groups for a key arrive as pandas frames in one
    call, the escape hatch for per-key merge logic no single-input UDF can
    express (custom as-of matching, per-key reconciliation). Shuffles both
    sides on the key once — same cost shape as a join."""
    import pandas as pd

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "value")
    clicks = e.filter(F.col("event_type") == "click").select("user_id")

    def merge(key, p: pd.DataFrame, c: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_purchases": [len(p)],
                "purchase_value": [round(float(p["value"].sum()), 6) if len(p) else 0.0],
                "n_clicks": [len(c)],
            }
        )

    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(
            merge,
            "user_id bigint, n_purchases bigint, purchase_value double, n_clicks bigint",
        )
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


@q("scan_xml_roundtrip", "SELECT s_suppkey, s_name, s_nationkey FROM supplier")
def scan_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink + source — Spark 4's NATIVE XML support (spark-xml merged
    upstream; no external package). Open-data portals still publish XML
    feeds; the rowTag contract maps one element per record with schema'd
    child parsing, same as the schema'd CSV/JSON paths. Roundtrip must be
    lossless: the oracle reads the original table."""
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    path = _scratch("supplier_xml")
    s.write.mode("overwrite").format("xml").option("rowTag", "supplier").save(path)
    return (
        spark.read.format("xml")
        .option("rowTag", "supplier")
        .schema("s_suppkey bigint, s_name string, s_nationkey bigint")
        .load(path)
    )


@q(
    "fn_variant_json",
    """SELECT event_id,
              json_extract(props, '$.k')::BIGINT AS k,
              (json_extract(props, '$.k')::BIGINT % 10 = 0) AS k_mod10
       FROM events WHERE event_id < 2000""",
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT for semi-structured data: ``parse_json`` ingests the
    props JSON once into the binary VARIANT encoding, then ``variant_get``
    extracts typed paths WITHOUT re-parsing text per access — the
    schema-on-read answer for 100 TB of heterogeneous event payloads
    (vs. from_json's rigid schema or repeated get_json_object scans).
    DuckDB oracle extracts the same typed paths from the raw JSON."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "bigint")
    return e.select(
        "event_id",
        k.alias("k"),
        (k % 10 == 0).alias("k_mod10"),
    )
