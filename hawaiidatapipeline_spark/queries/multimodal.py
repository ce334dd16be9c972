"""Multimodal decode checked queries ([NS] mandate).

These prove the REAL decode path, not just plumbing: payloads are genuine
BMP / PCM-WAV bytes generated on executors from a closed-form formula of
the id, Spark decodes them with the stdlib+numpy codecs
(sources/multimodal.py), and the DuckDB oracle computes the same stats
directly from the formula — so a decoder that mishandles BMP's bottom-up
row order, BGR byte order, row padding, or WAV framing hash-mismatches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()


@q(
    "multimodal_image_decode",
    """WITH dims AS (
         SELECT doc_id AS id, 16 + doc_id % 8 AS w, 8 + doc_id % 5 AS h
         FROM documents
       ),
       rws AS (SELECT id, unnest(generate_series(0, h - 1)) AS r FROM dims),
       mr AS (SELECT id, round(avg((id + r) % 256), 6) AS mean_r
              FROM rws GROUP BY id)
       SELECT d.id,
              d.w::INT AS width,
              d.h::INT AS height,
              (d.id % 256)::INT AS top_left_r,
              mr.mean_r::DOUBLE AS mean_r,
              ((3 * d.id) % 256)::DOUBLE AS mean_g,
              ((7 * d.id) % 256)::DOUBLE AS mean_b
       FROM dims d JOIN mr ON d.id = mr.id""",
)
def multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BMP encode → Arrow-batched decode → per-image stats. top_left_r
    catches a missed bottom-up flip; mean_g/mean_b catch RGB/BGR swaps;
    the oracle recomputes every stat from the generator formula."""
    from hawaiidatapipeline_spark.sources.multimodal import (
        image_stats,
        synthetic_image_blobs,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return image_stats(synthetic_image_blobs(d))


@q(
    "multimodal_decode_tolerant",
    """WITH dims AS (
         SELECT doc_id AS id, 16 + doc_id % 8 AS w, 8 + doc_id % 5 AS h
         FROM documents
       ),
       rws AS (SELECT id, unnest(generate_series(0, h - 1)) AS r FROM dims),
       mr AS (SELECT id, round(avg((id + r) % 256), 6) AS mean_r
              FROM rws GROUP BY id)
       SELECT d.id,
              CASE WHEN d.id % 2 = 0 THEN d.w::INT END AS width,
              CASE WHEN d.id % 2 = 0 THEN d.h::INT END AS height,
              CASE WHEN d.id % 2 = 0 THEN (d.id % 256)::INT END AS top_left_r,
              CASE WHEN d.id % 2 = 0 THEN mr.mean_r::DOUBLE END AS mean_r,
              CASE WHEN d.id % 2 = 0 THEN ((3 * d.id) % 256)::DOUBLE END AS mean_g,
              CASE WHEN d.id % 2 = 0 THEN ((7 * d.id) % 256)::DOUBLE END AS mean_b,
              (d.id % 2 = 1) AS decode_failed
       FROM dims d JOIN mr ON d.id = mr.id""",
)
def multimodal_decode_tolerant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capability-probe degrade path (VERDICT r2 item 9): odd-id payloads are
    swapped for JPEG-magic bytes no codec in this container can decode;
    ``image_stats_tolerant`` must emit typed NULLs + a decode_failed flag
    for them while even-id BMPs decode exactly — one stage, no task
    failures. The flag (not the raw error text) is oracle-checked because
    the message wording is environment-specific by design."""
    from pyspark.sql import functions as F

    from hawaiidatapipeline_spark.sources.multimodal import (
        image_stats_tolerant,
        synthetic_image_blobs,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    blobs = synthetic_image_blobs(d).withColumn(
        "payload",
        F.when(
            F.col("id") % 2 == 1,
            F.lit(b"\xff\xd8\xff\xe0\x00\x10JFIF-not-really"),
        ).otherwise(F.col("payload")),
    )
    return image_stats_tolerant(blobs).select(
        "id", "width", "height", "top_left_r", "mean_r", "mean_g", "mean_b",
        F.col("decode_error").isNotNull().alias("decode_failed"),
    )


@q(
    "multimodal_audio_decode",
    """WITH dims AS (
         SELECT doc_id AS id, 800 + 8 * (doc_id % 100) AS n FROM documents
       ),
       idx AS (SELECT id, unnest(generate_series(0, n - 1)) AS i FROM dims),
       r AS (SELECT id,
                    round(sqrt(avg((((id + i) % 200 - 100)
                                    * ((id + i) % 200 - 100))::DOUBLE)), 6) AS rms
             FROM idx GROUP BY id)
       SELECT d.id,
              d.n::BIGINT AS n_samples,
              8000::INT AS sample_rate,
              (d.n // 8)::BIGINT AS duration_ms,
              (d.id % 200 - 100)::INT AS first_sample,
              r.rms
       FROM dims d JOIN r ON d.id = r.id""",
)
def multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCM-WAV encode → stdlib wave decode → duration / first-sample / RMS.
    Position-dependent samples make truncated or offset reads visible; the
    oracle recomputes the RMS from the generator formula."""
    from hawaiidatapipeline_spark.sources.multimodal import (
        audio_stats,
        synthetic_audio_blobs,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return audio_stats(synthetic_audio_blobs(d))


@q(
    "multimodal_video_frames",
    """WITH v AS (SELECT doc_id AS id, 3 + doc_id % 4 AS n FROM documents),
       s AS (SELECT id, n, unnest(generate_series(0, n - 1, 2)) AS f FROM v),
       agg AS (SELECT id, count(*) AS n_sampled,
                      round(avg((id + 11 * f) % 256), 6) AS mean_r,
                      round(avg((3 * id + 5 * f) % 256), 6) AS mean_g,
                      round(avg((7 * id + f) % 256), 6) AS mean_b
               FROM s GROUP BY id)
       SELECT v.id, v.n::INT AS n_frames, agg.n_sampled::INT AS n_sampled,
              agg.mean_r, agg.mean_g, agg.mean_b
       FROM v JOIN agg ON v.id = agg.id""",
)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAWV encode → real container decode → every-2nd-frame stride →
    stats over the sampled frames only. The decode→frame-sample→aggregate
    plumbing of a video training pipeline, Arrow-batched on executors
    (map-only, zero shuffles); frame-dependent colors make a wrong stride
    change the means, and the oracle recomputes them in closed form."""
    from hawaiidatapipeline_spark.sources.multimodal import (
        synthetic_video_blobs,
        video_frame_stats,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return video_frame_stats(synthetic_video_blobs(d), every_k=2)


@q(
    "multimodal_image_resize",
    """WITH dims AS (SELECT doc_id AS id, 16 + doc_id % 8 AS w,
                            8 + doc_id % 5 AS h
                     FROM documents),
       sel AS (SELECT id, h, unnest(generate_series(0, 7)) AS i FROM dims),
       mr AS (SELECT id, round(avg((id + (i * h) // 8) % 256), 6) AS mean_r
              FROM sel GROUP BY id)
       SELECT d.id, 8::INT AS out_width, 8::INT AS out_height,
              (d.id % 256)::INT AS top_left_r,
              mr.mean_r,
              ((3 * d.id) % 256)::DOUBLE AS mean_g,
              ((7 * d.id) % 256)::DOUBLE AS mean_b
       FROM dims d JOIN mr ON d.id = mr.id""",
)
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BMP decode → nearest-neighbor resize to 8×8 → stats over the
    RESIZED pixels (the normalize-before-model step). The (r_out·h)//8
    row map is exact integer arithmetic, so the oracle states exactly
    which source rows survive and reproduces the post-resize means;
    map-only Arrow batches, zero shuffles."""
    from hawaiidatapipeline_spark.sources.multimodal import (
        image_resize_stats,
        synthetic_image_blobs,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return image_resize_stats(synthetic_image_blobs(d), out_h=8, out_w=8)


@q(
    "multimodal_image_dhash",
    """WITH dims AS (
         SELECT doc_id AS id, 16 + doc_id % 8 AS w, 8 + doc_id % 5 AS h
         FROM documents),
       g AS (SELECT id, h, w, unnest(generate_series(0, 8)) AS r FROM dims),
       gray AS (SELECT id, r,
                       (299 * ((id + (r * h) // 9) % 256)
                        + 587 * ((3 * id) % 256)
                        + 114 * ((7 * id) % 256)) // 1000 AS gy
                FROM g),
       bits AS (SELECT a.id,
                       CASE WHEN a.gy < b.gy
                            THEN power(2, a.r)::BIGINT ELSE 0 END AS bit
                FROM gray a JOIN gray b ON b.id = a.id AND b.r = a.r + 1
                WHERE a.r < 8),
       ph AS (SELECT id, sum(bit)::BIGINT AS dhash FROM bits GROUP BY id)
       SELECT d.id, d.w::INT AS width, d.h::INT AS height, p.dhash,
              count(*) OVER (PARTITION BY p.dhash) AS n_bucket
       FROM ph p JOIN dims d ON d.id = p.id
       ORDER BY d.id""",
)
def multimodal_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup: decode → integer-luma grayscale →
    nearest-resize row profile → difference hash → bucket by hash (the
    near-identical-image analog of llm_dedup_exact; re-encoded or
    slightly-cropped copies land in the same bucket, which a byte-md5
    never finds). n_bucket is each image's bucket population — the dedup
    candidate count. The decode/resize/hash pipeline is real Arrow-batched
    mapInPandas (sources/multimodal.image_dhash); the closed-form
    synthetic corpus lets the oracle recompute every bit. Scale: map-only
    hash + one window on the 64-bit hash key — the image twin of the
    minhash bucket join, linear in blobs."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hawaiidatapipeline_spark.sources.multimodal import (
        image_dhash,
        synthetic_image_blobs,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    ph = image_dhash(synthetic_image_blobs(d))
    return ph.withColumn(
        "n_bucket",
        F.count(F.lit(1)).over(Window.partitionBy("dhash")),
    ).orderBy("id")


@q(
    "multimodal_frame_dedup",
    """WITH grid AS (
         SELECT doc_id AS id, unnest(generate_series(0, 2 + doc_id % 4)) AS f
         FROM documents),
       fps AS (
         SELECT id, f,
                ((id + 11 * f) % 256) * 65536
                + ((3 * id + 5 * f) % 256) * 256
                + ((7 * id + f) % 256) AS fp
         FROM grid),
       buckets AS (
         SELECT fp, count(*)::BIGINT AS n_frames,
                count(DISTINCT id)::BIGINT AS n_videos,
                min(id)::BIGINT AS min_video, max(id)::BIGINT AS max_video
         FROM fps GROUP BY fp)
       SELECT fp AS fingerprint, n_frames, n_videos, min_video, max_video
       FROM buckets WHERE n_videos >= 2
       ORDER BY fingerprint""",
)
def multimodal_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-video duplicate-frame detection — the video analog of
    ``llm_dedup_exact``: every frame of every video is decoded
    (Arrow-batched, REAL RAWV container parse) and fingerprinted, then
    fingerprints bucket across videos; buckets spanning ≥2 videos are
    the shared-content groups (re-uploads, intros/outros, stock
    footage) a video training pipeline drops or down-weights before
    sampling clips. The synthetic corpus plants true cross-video dups
    (ids 256 apart repeat frame colors), so the query output is
    non-trivial and the oracle recomputes every fingerprint in closed
    form. Shape: map-only decode+fingerprint (one row per frame — the
    only pass that touches pixels), then ONE shuffle on the fingerprint
    key with map-side partial aggregation; at 100 TB this is the exact
    shape of hash dedup, with pixel I/O confined to the linear decode
    map."""
    from pyspark.sql import functions as F

    from hawaiidatapipeline_spark.sources.multimodal import (
        synthetic_video_blobs,
        video_frame_fingerprints,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    fps = video_frame_fingerprints(synthetic_video_blobs(d), every_k=1)
    buckets = fps.groupBy("fp").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        F.countDistinct("id").cast("long").alias("n_videos"),
        F.min("id").cast("long").alias("min_video"),
        F.max("id").cast("long").alias("max_video"),
    )
    return (
        buckets.filter(F.col("n_videos") >= 2)
        .select(
            F.col("fp").alias("fingerprint"),
            "n_frames",
            "n_videos",
            "min_video",
            "max_video",
        )
        .orderBy("fingerprint")
    )


_VAD_FRAME = 160  # 20 ms at 8 kHz
_VAD_THRESH_MEANSQ = 3330  # active when sum_sq >= thresh * n_samples


@q(
    "multimodal_audio_vad",
    f"""WITH dims AS (
         SELECT doc_id AS id, 800 + 8 * (doc_id % 100) AS n
         FROM documents),
       samples AS (
         SELECT id, unnest(generate_series(0, n - 1)) AS i FROM dims),
       frames AS (
         SELECT id, (i // {_VAD_FRAME})::INT AS f,
                count(*)::BIGINT AS n_samples,
                sum(((id + i) % 200 - 100) * ((id + i) % 200 - 100))::BIGINT
                  AS sum_sq
         FROM samples GROUP BY id, (i // {_VAD_FRAME})::INT),
       flagged AS (
         SELECT id, f, n_samples, sum_sq,
                CASE WHEN sum_sq >= {_VAD_THRESH_MEANSQ} * n_samples
                     THEN 1 ELSE 0 END AS active
         FROM frames)
       SELECT id, count(*)::BIGINT AS n_frames,
              sum(active)::BIGINT AS n_active,
              sum(sum_sq)::BIGINT AS total_energy,
              round(sum(active)::DOUBLE * 100.0 / count(*), 6) AS active_pct
       FROM flagged GROUP BY id ORDER BY id""",
)
def multimodal_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-based voice-activity detection plumbing: REAL WAV decode →
    20 ms frame split → exact integer frame energies (Σ sample², one
    row per frame out of the Arrow batch) → SQL-side activity threshold
    on the EXACT integer comparison sum_sq ≥ thresh·n (the policy lives
    in the plan, not the decode map, so tuning it re-runs only
    metadata-sized work) → per-clip activity profile. This is the
    segmentation front-end an audio training pipeline runs before
    transcription/feature extraction; the closed-form synthetic corpus
    lets the oracle recompute every frame energy. The trailing partial
    frame keeps its true sample count, so a decoder that pads or
    truncates frames changes n_samples and fails the hash. Shape:
    map-only decode+energy (linear in samples), one (clip, frame)
    partial agg, one clip-grain rollup — pixel/sample I/O never
    shuffles."""
    from pyspark.sql import functions as F

    from hawaiidatapipeline_spark.sources.multimodal import (
        audio_frame_energies,
        synthetic_audio_blobs,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    frames = audio_frame_energies(
        synthetic_audio_blobs(d), frame=_VAD_FRAME
    )
    flagged = frames.withColumn(
        "active",
        F.when(
            F.col("sum_sq") >= _VAD_THRESH_MEANSQ * F.col("n_samples"), 1
        ).otherwise(0),
    )
    return (
        flagged.groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_frames"),
            F.sum("active").cast("long").alias("n_active"),
            F.sum("sum_sq").cast("long").alias("total_energy"),
            F.round(
                F.sum("active").cast("double") * 100.0 / F.count(F.lit(1)), 6
            ).alias("active_pct"),
        )
        .orderBy("id")
    )
