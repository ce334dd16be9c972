"""Embedding-column extras: int8 quantization.

Vector storage is a first-order cost at corpus scale: float32×64 dims is
256 B/row; symmetric int8 cuts it 4× with bounded reconstruction error
(≤ scale/2 per element). The whole computation is float→double widening
(exact), one IEEE division chain, and floor(x+0.5) — identical on both
engines, so even the quantized codes hash-match the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()


@q(
    "emb_quantize_int8",
    """WITH scaled AS (
         SELECT vec_id, embedding,
                list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0 AS scale
         FROM embeddings
       )
       SELECT vec_id,
              round(scale, 6) AS scale,
              CASE WHEN scale = 0
                   THEN array_to_string(list_transform(embedding, x -> '0'), '|')
                   ELSE array_to_string(
                          list_transform(embedding,
                                         x -> floor(x::DOUBLE / scale + 0.5)::BIGINT::VARCHAR),
                          '|')
              END AS codes
       FROM scaled""",
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector symmetric int8 quantization: scale = max|x|/127, code =
    floor(x/scale + 0.5). Map-only (no shuffle, no state) — at 100 TB this
    is a scan-rewrite pass that shrinks the vector column 4× before any
    ANN index build; codes reconstruct to within scale/2 per element
    (asserted in tests/test_emb_extra.py). floor(x+0.5) is used instead of
    round() because the engines disagree on rounding mode, and float→
    double widening keeps every arithmetic step bit-identical."""
    e = load_table(spark, sf_dir, "embeddings")
    scale = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double")))) / F.lit(127.0)
    scaled = e.withColumn("_scale", scale)
    codes = F.when(
        F.col("_scale") == 0,
        F.concat_ws("|", F.transform("embedding", lambda x: F.lit("0"))),
    ).otherwise(
        F.concat_ws(
            "|",
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") / F.col("_scale") + 0.5)
                .cast("long")
                .cast("string"),
            ),
        )
    )
    return scaled.select(
        "vec_id",
        F.round("_scale", 6).alias("scale"),
        codes.alias("codes"),
    )


@q(
    "emb_label_centroids",
    """WITH ex AS (
         SELECT label,
                unnest(generate_series(0, len(embedding) - 1)) AS dim,
                unnest(embedding) AS x
         FROM embeddings
       )
       SELECT label, dim,
              round((sum(x::DECIMAL(18,9)) / count(*))::DOUBLE, 6) AS centroid,
              count(*) AS n_vecs
       FROM ex GROUP BY label, dim""",
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column — the vector aggregation
    behind semantic clustering profiles, IVF coarse-quantizer seeding, and
    class-prototype classification. posexplode + one partial-aggregated
    groupBy on (label, dim): shuffle volume is labels × dims, independent
    of corpus size. Sums run in exact DECIMAL so partition order cannot
    move the 6th digit (the avg-flake class); the per-dim division happens
    once on identical operands in both engines."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select("label", F.posexplode("embedding").alias("dim", "x"))
    return (
        ex.groupBy("label", "dim")
        .agg(
            F.round(
                (F.sum(F.col("x").cast("decimal(18,9)")) / F.count(F.lit(1))).cast(
                    "double"
                ),
                6,
            ).alias("centroid"),
            F.count(F.lit(1)).alias("n_vecs"),
        )
    )


@q(
    "llm_cosine_topk_sharded",
    """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos_sim
       FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       ORDER BY cos_sim DESC, vec_a, vec_b
       LIMIT 20""",
)
def llm_cosine_topk_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-20 cosine pairs via the P×S cogrouped-GEMM grid
    (operators/similarity.py cosine_topk_gemm_sharded) — the same answer
    as llm_cosine_topk with NO driver-side index build: probes hash into
    P blocks, the index into S shards, each (block, shard) cell runs one
    bounded numpy GEMM and emits local top-k. The 100 TB path when the
    index outgrows a broadcast; per-task memory tunes via P and S."""
    from hawaiidatapipeline_spark.operators.similarity import (
        as_double_vec,
        cosine_topk_gemm_sharded,
    )

    e = as_double_vec(load_table(spark, sf_dir, "embeddings"))
    top = cosine_topk_gemm_sharded(e, k=20, n_shards=4, n_probe_blocks=2)
    return top.select("vec_a", "vec_b", F.round("cos_sim", 6).alias("cos_sim"))
