"""UDF / UDAF / UDTF surface (SURVEY.md §2.K).

The reference's analog was arbitrary Ruby blocks over row hashes. Ours is
the PySpark UDF ladder, demonstrated worst-to-best:

- row-at-a-time Python UDF (``udf_python_scalar``) — the SLOW path, shown
  once for completeness; per-row Python serialization, never for hot paths;
- Arrow-vectorized pandas UDFs (scalar + grouped-agg) — batch transfer,
  10-100× faster;
- ``applyInPandas`` grouped-map — per-group pandas transforms;
- Spark 4 Python UDTF — one row in, many typed rows out.

Every checked query computes something SQL-expressible so the DuckDB oracle
stays exact (the oracle validates semantics; the Spark plan validates the
UDF machinery).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf
from pyspark.sql.types import DoubleType, StringType

from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()


@q(
    "udf_python_scalar",
    """SELECT l_orderkey, l_linenumber,
              CASE WHEN l_discount < 0.02 THEN 'none'
                   WHEN l_discount < 0.05 THEN 'small'
                   WHEN l_discount < 0.08 THEN 'medium'
                   ELSE 'large' END AS discount_band
       FROM lineitem""",
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — deliberately the slow path (each row crosses
    the JVM↔Python boundary); kept tiny and off every hot path."""

    @udf(returnType=StringType())
    def band(discount: float) -> str:
        if discount < 0.02:
            return "none"
        if discount < 0.05:
            return "small"
        if discount < 0.08:
            return "medium"
        return "large"

    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_linenumber", band("l_discount").alias("discount_band"))


@q(
    "udf_pandas_scalar",
    """SELECT l_orderkey, l_linenumber,
              round(l_extendedprice * (1 - l_discount), 6) AS net_price
       FROM lineitem""",
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF: whole Arrow batches cross the boundary,
    numpy does the arithmetic (SNIPPETS.md [2] pattern)."""

    @pandas_udf(DoubleType())
    def net_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return (price * (1.0 - discount)).round(6)

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", net_price("l_extendedprice", "l_discount").alias("net_price")
    )


@q(
    "udf_grouped_map",
    """SELECT event_id, user_id,
              round((value - avg(value) OVER (PARTITION BY user_id))
                    / stddev_samp(value) OVER (PARTITION BY user_id), 6) AS norm_value
       FROM events""",
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map normalize (v - mean)/std per user via ``applyInPandas``
    (SNIPPETS.md [1] pattern; pandas ``std`` is ddof=1 = stddev_samp)."""

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "norm_value": ((v - v.mean()) / v.std()).round(6),
            }
        )

    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").applyInPandas(
        normalize, "event_id bigint, user_id bigint, norm_value double"
    )


@q(
    "udf_grouped_agg",
    """WITH centered AS (
         SELECT user_id, value,
                avg(value) OVER (PARTITION BY user_id) AS m
         FROM events)
       SELECT user_id, round(avg(abs(value - m)), 6) AS mean_abs_dev
       FROM centered GROUP BY user_id""",
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom pandas UDAF (mean absolute deviation) — a grouped-agg pandas
    UDF usable in ``agg()`` and over windows."""

    @pandas_udf("double")
    def mean_abs_dev(v: pd.Series) -> float:
        return float(round((v - v.mean()).abs().mean(), 6))

    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(mean_abs_dev("value").alias("mean_abs_dev"))


@q(
    "udtf_python",
    """WITH tok AS (
         SELECT doc_id,
                unnest(string_split(text, ' ')) AS token,
                generate_subscripts(string_split(text, ' '), 1) AS pos
         FROM documents WHERE doc_id < 50)
       SELECT t1.doc_id,
              t1.pos::BIGINT AS pos,
              t1.token || ' ' || t2.token || ' ' || t3.token AS shingle
       FROM tok t1
       JOIN tok t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
       JOIN tok t3 ON t1.doc_id = t3.doc_id AND t3.pos = t1.pos + 2""",
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4): word-trigram shingle generator — one document
    row in, many (pos, shingle) rows out. The building block minhash dedup
    consumes at scale."""

    @udtf(returnType="pos bigint, shingle string")
    class ShingleGen:
        def eval(self, text: str):
            toks = text.split(" ")
            for i in range(len(toks) - 2):
                yield i + 1, " ".join(toks[i : i + 3])

    spark.udtf.register("shingle_gen", ShingleGen)
    load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).createOrReplaceTempView(
        "docs_for_udtf"
    )
    return spark.sql(
        """SELECT d.doc_id, s.pos, s.shingle
           FROM docs_for_udtf d, LATERAL shingle_gen(d.text) s"""
    )
