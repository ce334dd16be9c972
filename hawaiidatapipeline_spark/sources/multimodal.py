"""Multimodal columns ([NS] mandate): image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched Python.

Schema convention: every blob travels as
    (id bigint, modality string, payload binary, meta struct<...>)
so 100 TB of mixed media shards like any other table — the payload is never
interpreted by the JVM, only moved; per-modality processing happens in
``mapInPandas`` where whole Arrow batches of bytes hit Python at once.

The real decoders (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode step is stubbed (``NotImplementedError`` with a clear marker) and a
deterministic fake feature extractor stands in — the Spark-side plumbing
(schemas, batch iteration, partitioning) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BLOB_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("modality", StringType()),  # text | image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("modality", StringType()),
        StructField("byte_len", LongType()),
        StructField("content_md5", StringType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def documents_as_blobs(documents: DataFrame) -> DataFrame:
    """Stand-in blob table: encode document text as utf-8 payloads. With real
    media, this column comes straight from the landing zone (e.g. parquet of
    downloaded bytes) — identical schema, identical downstream plan."""
    return documents.select(
        F.col("doc_id").alias("id"),
        F.lit("text").alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "object":
    """STUB — image decode requires PIL/libjpeg, not present in this
    container. The mapInPandas harness calling this is real; swap this
    function for the PIL call in a full environment."""
    raise NotImplementedError("image decode stubbed: PIL not available in container")


def decode_audio(payload: bytes) -> "object":
    """STUB — audio decode requires ffmpeg/soundfile (see decode_image)."""
    raise NotImplementedError("audio decode stubbed: ffmpeg not available in container")


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a per-blob embedding: first ``dim`` bytes
    scaled to [0,1] (zero-padded). Replaces the model forward pass; same
    shape, same batch flow."""
    head = payload[:dim]
    vals = [b / 255.0 for b in head] + [0.0] * (dim - len(head))
    return vals


def extract_features(blobs: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Each mapInPandas batch receives a pandas DataFrame whose ``payload``
    column holds raw bytes — the exact shape a real decoder/model consumes
    (decode → resize/frame-sample → forward pass). Runs the fake extractor;
    md5 + byte length are real.
    """
    import hashlib

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "modality": pdf["modality"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "content_md5": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                    "features": payloads.map(lambda b: _fake_features(b, dim)),
                }
            )

    return blobs.mapInPandas(run, FEATURE_SCHEMA)
