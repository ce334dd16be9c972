"""Scale-path extras: operators whose whole point is the 100 TB plan shape.

Round-9 batch 4 — four operators where the naive formulation works on a
laptop and dies on a cluster, implemented in their scale-safe shape with
the naive shape as the DuckDB oracle:

- ``etl_compaction_plan``   — small-file compaction bin-packing (the
  maintenance job every partitioned lake table needs);
- ``join_spatial_grid``     — grid-bucketed point-in-box spatial join
  (equi-join on cell keys instead of an O(n·m) theta join);
- ``llm_feature_hashing``   — hashing-trick featurization collision audit
  (fixed-width feature space with no vocabulary broadcast);
- ``emb_mips_topk``         — exact maximum-inner-product top-k pairs via
  the blocked-GEMM layout (dot-product retrieval where cosine's norm
  division is semantically wrong).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()


def _ph(expr: str, seed) -> str:
    """DuckDB twin of operators/dedup.py portable_hash64."""
    return f"('0x' || substring(md5('{seed}:' || {expr}), 1, 15))::BIGINT"


_COMPACT_TARGET = 262144  # 256 KiB at fixture scale; 512 MB-1 GB in production


@q(
    "etl_compaction_plan",
    f"""WITH parts AS (
         SELECT date_trunc('day', ts)::DATE AS d,
                sum(32 + strlen(event_type)
                       + coalesce(strlen(props), 0))::BIGINT AS bytes_est
         FROM events GROUP BY 1),
       packed AS (
         SELECT d, bytes_est,
                coalesce(sum(bytes_est) OVER (ORDER BY d
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0)::BIGINT AS cum_prev
         FROM parts)
       SELECT (cum_prev // {_COMPACT_TARGET})::BIGINT AS file_id,
              count(*) AS n_partitions,
              sum(bytes_est)::BIGINT AS total_bytes,
              min(d) AS first_day, max(d) AS last_day
       FROM packed GROUP BY 1 ORDER BY file_id""",
)
def etl_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner: estimate each day-partition's byte
    weight, then bin-pack consecutive days into target-sized output files
    by bucketing the EXCLUSIVE running total (a partition is assigned to
    the file where it starts — the streaming bin-packing rule, computable
    in one window pass with no driver loop; partitions larger than the
    target keep a file to themselves). This is the maintenance job that
    keeps a lake table's file count bounded: without it a year of hourly
    micro-batches is ~10⁴ files per partition and scan planning dominates
    query time. Scale note: one partial-aggregated pass over the facts to
    size partitions, then a single ordered window over the PARTITION
    table (one row per day) — the plan is metadata-sized, never
    data-sized; at 100 TB the same plan runs off the file manifest."""
    e = load_table(spark, sf_dir, "events")
    parts = e.groupBy(F.to_date(F.date_trunc("day", F.col("ts"))).alias("d")).agg(
        F.sum(
            F.lit(32)
            + F.octet_length("event_type")
            + F.coalesce(F.octet_length("props"), F.lit(0))
        )
        .cast("long")
        .alias("bytes_est")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    packed = parts.select(
        "d",
        "bytes_est",
        F.coalesce(F.sum("bytes_est").over(w), F.lit(0)).cast("long").alias("cum_prev"),
    )
    return (
        packed.groupBy(
            F.floor(F.col("cum_prev") / _COMPACT_TARGET).cast("long").alias("file_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_partitions"),
            F.sum("bytes_est").cast("long").alias("total_bytes"),
            F.min("d").alias("first_day"),
            F.max("d").alias("last_day"),
        )
        .orderBy("file_id")
    )


@q(
    "join_spatial_grid",
    """WITH pts AS (
         SELECT c_custkey,
                (c_custkey % 180 - 90) + 0.25::DOUBLE AS lat,
                ((7 * c_custkey) % 360 - 180) + 0.25::DOUBLE AS lon
         FROM customer),
       boxes AS (
         SELECT n_nationkey, n_name,
                ((n_nationkey * 7) % 160) - 85 AS lat_min,
                ((n_nationkey * 7) % 160) - 77 AS lat_max,
                ((n_nationkey * 13) % 340) - 175 AS lon_min,
                ((n_nationkey * 13) % 340) - 163 AS lon_max
         FROM nation)
       SELECT b.n_nationkey, b.n_name, count(p.c_custkey)::BIGINT AS n_points
       FROM boxes b
       LEFT JOIN pts p
         ON p.lat >= b.lat_min AND p.lat <= b.lat_max
        AND p.lon >= b.lon_min AND p.lon <= b.lon_max
       GROUP BY b.n_nationkey, b.n_name
       ORDER BY b.n_nationkey""",
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed spatial join: customers-as-points counted into each
    nation's bounding box. The oracle is the direct theta join (every
    point against every box — O(n·m) comparisons); the Spark plan is the
    scale shape: tile space into 4° cells, explode each box into the
    cells it covers (bounded: ≤ 3×4 cells per box here), give each point
    its single containing cell, EQUI-join on the cell key, then apply
    the exact containment predicate. Pair generation becomes a hash
    shuffle on cell keys — at 100 TB this is the difference between a
    broadcast-nested-loop over every point and a partitioned join that
    only compares points to boxes overlapping their tile (the standard
    PostGIS/GeoSpark bin-join). Boxes missing every point are restored
    by a broadcast left join so the output enumerates all 25 nations."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") % 180 - 90) + 0.25).alias("lat"),
        (((7 * F.col("c_custkey")) % 360 - 180) + 0.25).alias("lon"),
    ).withColumn("clat", F.floor(F.col("lat") / 4).cast("long")).withColumn(
        "clon", F.floor(F.col("lon") / 4).cast("long")
    )
    boxes = n.select(
        "n_nationkey",
        "n_name",
        (((F.col("n_nationkey") * 7) % 160) - 85).alias("lat_min"),
        (((F.col("n_nationkey") * 7) % 160) - 77).alias("lat_max"),
        (((F.col("n_nationkey") * 13) % 340) - 175).alias("lon_min"),
        (((F.col("n_nationkey") * 13) % 340) - 163).alias("lon_max"),
    )
    cells = boxes.select(
        "n_nationkey",
        "lat_min",
        "lat_max",
        "lon_min",
        "lon_max",
        F.explode(
            F.sequence(
                F.floor(F.col("lat_min") / 4).cast("long"),
                F.floor(F.col("lat_max") / 4).cast("long"),
            )
        ).alias("clat"),
    ).select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col("lon_min") / 4).cast("long"),
                F.floor(F.col("lon_max") / 4).cast("long"),
            )
        ).alias("clon"),
    )
    hits = (
        pts.join(cells, ["clat", "clon"])
        .filter(
            (F.col("lat") >= F.col("lat_min"))
            & (F.col("lat") <= F.col("lat_max"))
            & (F.col("lon") >= F.col("lon_min"))
            & (F.col("lon") <= F.col("lon_max"))
        )
        .groupBy("n_nationkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    return (
        boxes.select("n_nationkey", "n_name")
        .join(F.broadcast(hits), "n_nationkey", "left")
        .select(
            "n_nationkey",
            "n_name",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_points"),
        )
        .orderBy("n_nationkey")
    )


@q(
    "llm_feature_hashing",
    f"""WITH tok AS (
         SELECT unnest(string_split(text, ' ')) AS token FROM documents),
       hashed AS (
         SELECT token,
                {_ph('token', 11)} % 256 AS bucket,
                CASE WHEN {_ph('token', 12)} % 2 = 0 THEN 1 ELSE -1 END AS sgn
         FROM tok)
       SELECT bucket,
              count(*)::BIGINT AS tf_total,
              count(DISTINCT token)::BIGINT AS n_tokens,
              sum(sgn)::BIGINT AS signed_sum
       FROM hashed GROUP BY bucket
       ORDER BY tf_total DESC, bucket LIMIT 20""",
)
def llm_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization audit: every token is mapped to one of
    256 feature buckets by the portable content hash, with a second hash
    choosing the ±1 sign (Weinberger et al.'s signed feature hashing —
    the sign makes collision noise zero-mean). The output is the bucket
    load profile: total term frequency, distinct colliding tokens, and
    the signed sum per hottest bucket — the audit a feature-hashing
    pipeline runs to size its bucket count before training. Scale note:
    this is the vocabulary-free featurizer — no token→index dictionary
    is ever built or broadcast (the step that kills naive bag-of-words
    at 100 TB); cost is the token explode plus ONE partial-aggregated
    shuffle on a 1-byte bucket key."""
    from hawaiidatapipeline_spark.operators.dedup import portable_hash64

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("token"))
    hashed = tok.select(
        "token",
        F.pmod(portable_hash64(F.col("token"), 11), F.lit(256)).alias("bucket"),
        F.when(
            F.pmod(portable_hash64(F.col("token"), 12), F.lit(2)) == 0, 1
        ).otherwise(-1).alias("sgn"),
    )
    return (
        hashed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf_total"),
            F.count_distinct("token").cast("long").alias("n_tokens"),
            F.sum("sgn").cast("long").alias("signed_sum"),
        )
        .orderBy(F.col("tf_total").desc(), "bucket")
        .limit(20)
    )


@q(
    "emb_mips_topk",
    """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              round(list_inner_product(a.embedding::DOUBLE[],
                                       b.embedding::DOUBLE[]), 6) AS dot
       FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       ORDER BY dot DESC, vec_a, vec_b
       LIMIT 20""",
)
def emb_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 pairs by RAW inner product (maximum-inner-product search) —
    the retrieval metric for models trained with dot-product scoring,
    where the vector norm carries meaning (popularity, confidence) and
    cosine's normalization would discard it. Runs the blocked-GEMM
    operator without the normalization step (operators/similarity.py
    inner_topk_gemm): broadcast candidate matrix, one numpy matmul per
    Arrow batch, n·k shuffle volume; the size gate falls back to the
    pure-JVM exact pair scan rather than silently substituting an
    approximation (MIPS needs an augmentation transform before any LSH
    applies)."""
    from hawaiidatapipeline_spark.operators.similarity import as_double_vec, inner_topk_gemm

    e = as_double_vec(load_table(spark, sf_dir, "embeddings"))
    top = inner_topk_gemm(e, k=20, vec_col="emb")
    return top.select("vec_a", "vec_b", F.round("dot", 6).alias("dot"))
