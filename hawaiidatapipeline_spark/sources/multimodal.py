"""Multimodal columns ([NS] mandate): image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched Python.

Schema convention: every blob travels as
    (id bigint, modality string, payload binary, meta struct<...>)
so 100 TB of mixed media shards like any other table — the payload is never
interpreted by the JVM, only moved; per-modality processing happens in
``mapInPandas`` where whole Arrow batches of bytes hit Python at once.

Decoders: formats parseable with stdlib+numpy are decoded FOR REAL —
24-bit BMP and binary PPM (P6) images (struct + numpy), PCM WAV audio
(stdlib ``wave``), and a raw concatenated-frame video container for the
frame-sampling path. Compressed formats (JPEG/PNG/MP3/MP4) genuinely need
libjpeg/ffmpeg, absent from this container, and raise ``NotImplementedError``
with a clear marker; ``decode_image``/``decode_audio`` sniff magic bytes and
route. The Spark-side plumbing (schemas, Arrow batch iteration,
partitioning) is identical either way.
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


# ------------------------------------------------------------- real codecs
# stdlib + numpy only; these run inside Arrow batches on executors.


def encode_bmp(rgb) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit uncompressed BMP (BI_RGB, bottom-up
    rows, BGR byte order, rows padded to 4 bytes — the classic Windows DIB
    layout)."""
    import struct

    import numpy as np

    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    row_size = (w * 3 + 3) & ~3
    image_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + image_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes):
    """24-bit BI_RGB BMP → (H, W, 3) uint8 RGB numpy array."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    header_size, w, h, _planes, bitcount, compression = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if bitcount != 24 or compression != 0:
        raise NotImplementedError(
            f"BMP variant not supported (bitcount={bitcount}, compression={compression})"
        )
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_size * h, offset=data_offset)
    img = rows.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR→RGB
    return img[::-1] if bottom_up else img


def encode_ppm(rgb) -> bytes:
    """(H, W, 3) uint8 RGB → binary PPM (P6)."""
    import numpy as np

    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    return f"P6\n{w} {h}\n255\n".encode() + rgb.tobytes()


def decode_ppm(payload: bytes):
    """Binary PPM (P6) → (H, W, 3) uint8 RGB numpy array."""
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval as whitespace-separated tokens
    pos, fields = 2, []
    while len(fields) < 3:
        while payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM supported")
    return np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=pos).reshape(h, w, 3)


def encode_wav_pcm16(samples, sample_rate: int = 8000) -> bytes:
    """int16 samples (n,) or (n, channels) → PCM WAV bytes (stdlib wave)."""
    import io
    import wave

    import numpy as np

    samples = np.asarray(samples, dtype="<i2")
    channels = 1 if samples.ndim == 1 else samples.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as fh:
        fh.setnchannels(channels)
        fh.setsampwidth(2)
        fh.setframerate(sample_rate)
        fh.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes):
    """PCM WAV → ((n_samples, channels) int16 numpy array, sample_rate)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as fh:
        if fh.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM WAV supported")
        n, ch, rate = fh.getnframes(), fh.getnchannels(), fh.getframerate()
        data = np.frombuffer(fh.readframes(n), dtype="<i2").reshape(n, ch)
    return data, rate


RAWV_MAGIC = b"RAWV"


def encode_rawv(frames) -> bytes:
    """List of (H, W, 3) uint8 RGB frames (same shape) → RAWV container:
    magic + uint16 (n_frames, h, w) + concatenated raw RGB frames. Stands in
    for a real video container so the frame-sampling PLUMBING is exercised
    end-to-end; real MP4/MKV demuxing needs ffmpeg (stubbed below)."""
    import struct

    import numpy as np

    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w, _ = frames[0].shape
    return (
        RAWV_MAGIC
        + struct.pack("<HHH", len(frames), h, w)
        + b"".join(f.tobytes() for f in frames)
    )


def decode_rawv(payload: bytes):
    """RAWV container → (n_frames, H, W, 3) uint8 numpy array."""
    import struct

    import numpy as np

    if payload[:4] != RAWV_MAGIC:
        raise ValueError("not a RAWV payload")
    n, h, w = struct.unpack_from("<HHH", payload, 4)
    return np.frombuffer(payload, dtype=np.uint8, count=n * h * w * 3, offset=10).reshape(
        n, h, w, 3
    )


def sample_frames(payload: bytes, every_k: int = 2):
    """Frame sampling over a RAWV payload: every k-th frame (numpy stride —
    no copy of skipped frames)."""
    return decode_rawv(payload)[::every_k]


def resize_nearest(img, out_h: int, out_w: int):
    """Nearest-neighbor resize, pure numpy index arithmetic — the cheap
    deterministic down/up-sample step before a model forward pass."""
    import numpy as np

    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return img[rows][:, cols]


import functools


@functools.lru_cache(maxsize=1)
def codec_capabilities() -> dict[str, bool]:
    """Probe which codecs this environment can actually run. The stdlib
    codecs are always on; JPEG/PNG light up when PIL is importable and
    compressed audio/video when ffmpeg is on PATH — so the same pipeline
    code degrades gracefully here and decodes fully on a real cluster
    image.

    Cached per process (ADVICE r3 item 2): decode_image consults this per
    payload, and the probe re-imported PIL + scanned PATH for ffmpeg on
    every non-BMP/PPM row of a tolerant decode. One probe per executor
    worker is enough — capabilities don't change mid-job. Callers must
    treat the returned dict as read-only (it is the cached instance)."""
    import shutil

    caps = {"bmp": True, "ppm": True, "wav_pcm16": True, "rawv": True}
    try:
        import PIL.Image  # noqa: F401

        caps["jpeg"] = caps["png"] = True
    except ImportError:
        caps["jpeg"] = caps["png"] = False
    caps["ffmpeg"] = shutil.which("ffmpeg") is not None
    return caps


def decode_image(payload: bytes):
    """Image decode by magic-byte sniffing: BMP and PPM decode for real
    (stdlib+numpy); compressed formats decode via PIL when available and
    raise otherwise — libjpeg/libpng are not in this container."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if codec_capabilities()["jpeg"]:
        import io

        import numpy as np
        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    raise NotImplementedError(
        "compressed image decode stubbed: PIL/libjpeg not available in container"
    )


def decode_audio(payload: bytes):
    """Audio decode: PCM WAV decodes for real; compressed audio raises
    (ffmpeg/soundfile not in container)."""
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    raise NotImplementedError(
        "compressed audio decode stubbed: ffmpeg not available in container"
    )


def try_decode_image(payload: bytes):
    """Capability-gated decode: (image, None) on success, (None, reason) when
    the payload needs a codec this environment lacks or is malformed. Lets
    pipelines keep flowing with typed NULLs instead of dying mid-job — at
    100 TB a single exotic blob must not kill a stage."""
    try:
        return decode_image(payload), None
    except Exception as e:
        return None, f"{type(e).__name__}: {e}"


def synthetic_image_blobs(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic BMP blobs generated ON EXECUTORS from an id column:
    height 8+(id%5), width 16+(id%8); red varies by row ((id+row)%256 — so
    a decoder that forgets BMP's bottom-up row order returns a wrong
    top-left pixel), green/blue are flat ((3id)%256, (7id)%256 — catches
    BGR/RGB channel swaps). Closed-form content ⇒ decode results are
    exactly predictable by the SQL oracle."""
    import numpy as np

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = []
            for i in pdf[id_col].astype("int64"):
                h, w = 8 + int(i) % 5, 16 + int(i) % 8
                rgb = np.empty((h, w, 3), dtype=np.uint8)
                rgb[:, :, 0] = ((int(i) + np.arange(h)) % 256)[:, None]
                rgb[:, :, 1] = (3 * int(i)) % 256
                rgb[:, :, 2] = (7 * int(i)) % 256
                payloads.append(encode_bmp(rgb))
            yield pd.DataFrame({"id": pdf[id_col].astype("int64"), "payload": payloads})

    return ids.select(id_col).mapInPandas(gen, "id bigint, payload binary").select(
        "id",
        F.lit("image").alias("modality"),
        "payload",
        F.struct(
            F.lit("image/bmp").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def synthetic_audio_blobs(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PCM WAV blobs from an id column: 8 kHz mono,
    n = 800 + 8·(id%100) samples (exact integer duration_ms = n/8),
    sample[i] = ((id + i) % 200) − 100 — position-dependent, so truncated
    or offset reads change the decoded stats."""
    import numpy as np

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = []
            for i in pdf[id_col].astype("int64"):
                n = 800 + 8 * (int(i) % 100)
                samples = ((int(i) + np.arange(n)) % 200 - 100).astype("<i2")
                payloads.append(encode_wav_pcm16(samples, sample_rate=8000))
            yield pd.DataFrame({"id": pdf[id_col].astype("int64"), "payload": payloads})

    return ids.select(id_col).mapInPandas(gen, "id bigint, payload binary").select(
        "id",
        F.lit("audio").alias("modality"),
        "payload",
        F.struct(
            F.lit("audio/wav").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def image_stats(blobs: DataFrame) -> DataFrame:
    """REAL image decode per Arrow batch → per-image stats: dimensions,
    top-left red value (orientation-sensitive), per-channel means."""
    import numpy as np

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {k: [] for k in ("id", "width", "height", "top_left_r", "mean_r", "mean_g", "mean_b")}
            for i, payload in zip(pdf["id"], pdf["payload"]):
                img = decode_image(bytes(payload))
                out["id"].append(int(i))
                out["height"].append(img.shape[0])
                out["width"].append(img.shape[1])
                out["top_left_r"].append(int(img[0, 0, 0]))
                means = img.reshape(-1, 3).mean(axis=0, dtype=np.float64)
                out["mean_r"].append(round(float(means[0]), 6))
                out["mean_g"].append(round(float(means[1]), 6))
                out["mean_b"].append(round(float(means[2]), 6))
            yield pd.DataFrame(out)

    return blobs.select("id", "payload").mapInPandas(
        run,
        "id bigint, width int, height int, top_left_r int, "
        "mean_r double, mean_g double, mean_b double",
    )


def image_stats_tolerant(blobs: DataFrame) -> DataFrame:
    """Like image_stats, but undecodable payloads (missing codec, corrupt
    bytes) yield a row of typed NULLs plus a ``decode_error`` reason instead
    of failing the task — the capability-probe degrade path. Downstream
    filters on ``decode_error IS NULL`` keep the clean subset; the error
    column doubles as the quarantine report."""

    import numpy as np

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cols = ("id", "width", "height", "top_left_r", "mean_r", "mean_g", "mean_b", "decode_error")
            out = {k: [] for k in cols}
            for i, payload in zip(pdf["id"], pdf["payload"]):
                img, err = try_decode_image(bytes(payload))
                out["id"].append(int(i))
                out["decode_error"].append(err)
                if img is None:
                    for k in ("width", "height", "top_left_r", "mean_r", "mean_g", "mean_b"):
                        out[k].append(None)
                    continue
                out["height"].append(img.shape[0])
                out["width"].append(img.shape[1])
                out["top_left_r"].append(int(img[0, 0, 0]))
                means = img.reshape(-1, 3).mean(axis=0, dtype=np.float64)
                out["mean_r"].append(round(float(means[0]), 6))
                out["mean_g"].append(round(float(means[1]), 6))
                out["mean_b"].append(round(float(means[2]), 6))
            yield pd.DataFrame(out)

    return blobs.select("id", "payload").mapInPandas(
        run,
        "id bigint, width int, height int, top_left_r int, "
        "mean_r double, mean_g double, mean_b double, decode_error string",
    )


def audio_stats(blobs: DataFrame) -> DataFrame:
    """REAL WAV decode per Arrow batch → duration, first sample, RMS."""
    import math

    import numpy as np

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {k: [] for k in ("id", "n_samples", "sample_rate", "duration_ms", "first_sample", "rms")}
            for i, payload in zip(pdf["id"], pdf["payload"]):
                data, rate = decode_audio(bytes(payload))
                mono = data[:, 0].astype(np.float64)
                out["id"].append(int(i))
                out["n_samples"].append(data.shape[0])
                out["sample_rate"].append(rate)
                out["duration_ms"].append(data.shape[0] * 1000 // rate)
                out["first_sample"].append(int(data[0, 0]))
                out["rms"].append(round(math.sqrt(float((mono**2).mean())), 6))
            yield pd.DataFrame(out)

    return blobs.select("id", "payload").mapInPandas(
        run,
        "id bigint, n_samples bigint, sample_rate int, duration_ms bigint, "
        "first_sample int, rms double",
    )


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a per-blob embedding: first ``dim`` bytes
    scaled to [0,1] (zero-padded). Replaces the model forward pass; same
    shape, same batch flow."""
    head = payload[:dim]
    vals = [b / 255.0 for b in head] + [0.0] * (dim - len(head))
    return vals


def audio_clipping_stats(blobs: DataFrame, threshold: int = 95) -> DataFrame:
    """REAL WAV decode per Arrow batch → clipping audit: samples at or
    beyond ±threshold counted per clip (int16 domain; the synthetic
    fixture's amplitude is ±100, so threshold 95 exercises both rails).
    Map-only — samples never leave the executor, only (id, counts)."""
    import numpy as np

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {k: [] for k in ("id", "n_samples", "n_clipped")}
            for i, payload in zip(pdf["id"], pdf["payload"]):
                data, _rate = decode_audio(bytes(payload))
                mono = data[:, 0].astype(np.int64)
                out["id"].append(int(i))
                out["n_samples"].append(int(data.shape[0]))
                out["n_clipped"].append(int((np.abs(mono) >= threshold).sum()))
            yield pd.DataFrame(out)

    return blobs.select("id", "payload").mapInPandas(
        run, "id bigint, n_samples bigint, n_clipped bigint"
    )


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


def synthetic_video_blobs(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic RAWV video blobs generated on executors: 3+(id%4)
    frames of 4×5 RGB, each frame f a flat color (R=(id+11f)%256,
    G=(3id+5f)%256, B=(7id+f)%256) — frame-dependent content, so a
    stride that drops or duplicates frames changes the sampled stats.
    Closed-form ⇒ the SQL oracle reproduces every stat exactly."""
    import numpy as np

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = []
            for i in pdf[id_col].astype("int64"):
                i = int(i)
                frames = []
                for f in range(3 + i % 4):
                    rgb = np.empty((4, 5, 3), dtype=np.uint8)
                    rgb[:, :, 0] = (i + 11 * f) % 256
                    rgb[:, :, 1] = (3 * i + 5 * f) % 256
                    rgb[:, :, 2] = (7 * i + f) % 256
                    frames.append(rgb)
                payloads.append(encode_rawv(frames))
            yield pd.DataFrame({"id": pdf[id_col].astype("int64"), "payload": payloads})

    return ids.select(id_col).mapInPandas(gen, "id bigint, payload binary").select(
        "id",
        F.lit("video").alias("modality"),
        "payload",
        F.struct(
            F.lit("video/x-rawv").alias("mime"),
            F.lit(5).cast("int").alias("width"),
            F.lit(4).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def video_frame_stats(blobs: DataFrame, every_k: int = 2) -> DataFrame:
    """REAL RAWV decode per Arrow batch → every-k-th-frame sampling
    (numpy stride, skipped frames never copied) → per-video stats over
    the SAMPLED frames only. This is the decode→frame-sample→aggregate
    plumbing a video training pipeline runs before a model forward pass;
    swap ``decode_rawv`` for an ffmpeg demux on a cluster image with the
    codec present (capability-gated like JPEG in ``decode_image``)."""
    import numpy as np

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {k: [] for k in ("id", "n_frames", "n_sampled", "mean_r", "mean_g", "mean_b")}
            for i, payload in zip(pdf["id"], pdf["payload"]):
                video = decode_rawv(bytes(payload))
                sampled = video[::every_k]
                means = sampled.reshape(-1, 3).mean(axis=0, dtype=np.float64)
                out["id"].append(int(i))
                out["n_frames"].append(video.shape[0])
                out["n_sampled"].append(sampled.shape[0])
                out["mean_r"].append(round(float(means[0]), 6))
                out["mean_g"].append(round(float(means[1]), 6))
                out["mean_b"].append(round(float(means[2]), 6))
            yield pd.DataFrame(out)

    return blobs.select("id", "payload").mapInPandas(
        run,
        "id bigint, n_frames int, n_sampled int, mean_r double, mean_g double, mean_b double",
    )


def image_resize_stats(blobs: DataFrame, out_h: int = 8, out_w: int = 8) -> DataFrame:
    """REAL decode → nearest-neighbor resize to (out_h, out_w) → stats
    over the RESIZED pixels — the normalize-before-model step. The row
    map (r_out·h)//out_h is exact integer arithmetic, so the oracle can
    state which source rows survive and what the post-resize means are."""
    import numpy as np

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {k: [] for k in ("id", "out_width", "out_height", "top_left_r", "mean_r", "mean_g", "mean_b")}
            for i, payload in zip(pdf["id"], pdf["payload"]):
                img = resize_nearest(decode_image(bytes(payload)), out_h, out_w)
                means = img.reshape(-1, 3).mean(axis=0, dtype=np.float64)
                out["id"].append(int(i))
                out["out_height"].append(img.shape[0])
                out["out_width"].append(img.shape[1])
                out["top_left_r"].append(int(img[0, 0, 0]))
                out["mean_r"].append(round(float(means[0]), 6))
                out["mean_g"].append(round(float(means[1]), 6))
                out["mean_b"].append(round(float(means[2]), 6))
            yield pd.DataFrame(out)

    return blobs.select("id", "payload").mapInPandas(
        run,
        "id bigint, out_width int, out_height int, top_left_r int, "
        "mean_r double, mean_g double, mean_b double",
    )


def image_dhash(blobs: DataFrame) -> DataFrame:
    """Row-profile difference hash over decoded images — the perceptual-
    hash primitive behind near-identical image dedup (crop/re-encode
    survivors share most bits). Pipeline per blob: BMP decode → integer
    luma grayscale ((299R + 587G + 114B) // 1000, exact int — no float
    weights) → nearest-resize the row profile to 9 samples
    ((r·h)//9, the resize_nearest contract) → bit r set iff
    gray[r] < gray[r+1]. The synthetic corpus varies only by row, so the
    hash is 8 bits (one per adjacent row pair) — declared; real images
    extend the same plumbing to the full 8x8 grid. Arrow-batched
    mapInPandas; closed-form content keeps it SQL-oracle-checkable."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                img = decode_bmp(bytes(payload))
                h, w = img.shape[:2]
                prof = resize_nearest(img, 9, 1).astype("int64")
                gy = (
                    299 * prof[:, 0, 0] + 587 * prof[:, 0, 1] + 114 * prof[:, 0, 2]
                ) // 1000
                bits = sum(1 << r for r in range(8) if gy[r] < gy[r + 1])
                out.append((int(i), int(w), int(h), int(bits)))
            yield pd.DataFrame(out, columns=["id", "width", "height", "dhash"])

    return blobs.select("id", "payload").mapInPandas(
        run, "id bigint, width int, height int, dhash bigint"
    )


def video_frame_fingerprints(blobs: DataFrame, every_k: int = 1) -> DataFrame:
    """REAL RAWV decode → per-sampled-frame exact fingerprint: the
    top-left pixel packed as R·65536 + G·256 + B (int). For exact-dup
    detection the fingerprint must be a deterministic pure function of
    the decoded pixels — the packed corner pixel is that, and a decoder
    that misorders planes/rows scrambles it (the full-pixel decode
    correctness is guarded separately by image/video stats queries). On
    a cluster image with real codecs, swap in an md5 of the frame
    buffer; the Spark-side shape (Arrow-batched mapInPandas, one row
    per sampled frame) is identical."""
    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {"id": [], "f": [], "fp": []}
            for i, payload in zip(pdf["id"], pdf["payload"]):
                video = decode_rawv(bytes(payload))
                for f in range(0, video.shape[0], every_k):
                    px = video[f, 0, 0]
                    out["id"].append(int(i))
                    out["f"].append(f)
                    out["fp"].append(
                        int(px[0]) * 65536 + int(px[1]) * 256 + int(px[2])
                    )
            yield pd.DataFrame(out)

    return blobs.select("id", "payload").mapInPandas(
        run, "id bigint, f int, fp bigint"
    )


def audio_frame_energies(blobs: DataFrame, frame: int = 160) -> DataFrame:
    """REAL WAV decode → fixed-length frame split → per-frame energy
    (sum of squared int16 samples — exact integers). One row per frame;
    the VAD/segmentation front-end of an audio training pipeline (the
    threshold decision runs SQL-side so the policy is swappable without
    touching the decode map). The trailing partial frame is kept with
    its true sample count so duration accounting stays exact."""
    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {"id": [], "f": [], "n_samples": [], "sum_sq": []}
            for i, payload in zip(pdf["id"], pdf["payload"]):
                samples, _rate = decode_wav(bytes(payload))
                n = len(samples)
                for f in range(0, (n + frame - 1) // frame):
                    seg = samples[f * frame : (f + 1) * frame]
                    out["id"].append(int(i))
                    out["f"].append(f)
                    out["n_samples"].append(len(seg))
                    out["sum_sq"].append(
                        int((seg.astype("int64") ** 2).sum())
                    )
            yield pd.DataFrame(out)

    return blobs.select("id", "payload").mapInPandas(
        run, "id bigint, f int, n_samples int, sum_sq bigint"
    )


def video_scene_deltas(blobs: DataFrame) -> DataFrame:
    """REAL RAWV decode → consecutive-frame pixel deltas: for each frame
    pair (f−1, f) the EXACT integer sum of |ΔR|+|ΔG|+|ΔB| over all
    pixels (int64 numpy, no float) plus the pixel count — the scene-cut
    primitive (a cut is a pair whose per-pixel delta clears a policy
    threshold, applied SQL-side so tuning re-runs metadata-sized work
    only). One output row per frame pair; pixels never leave the decode
    map."""
    import numpy as np

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {k: [] for k in ("id", "f", "n_pixels", "delta_sum")}
            for i, payload in zip(pdf["id"], pdf["payload"]):
                video = decode_rawv(bytes(payload)).astype(np.int64)
                n_px = video.shape[1] * video.shape[2]
                for f in range(1, video.shape[0]):
                    d = np.abs(video[f] - video[f - 1]).sum()
                    out["id"].append(int(i))
                    out["f"].append(f)
                    out["n_pixels"].append(int(n_px))
                    out["delta_sum"].append(int(d))
            yield pd.DataFrame(out)

    return blobs.select("id", "payload").mapInPandas(
        run, "id bigint, f int, n_pixels bigint, delta_sum bigint"
    )


def image_patch_stats(blobs: DataFrame, patch: int = 4) -> DataFrame:
    """REAL image decode → non-overlapping ``patch``×``patch`` tile
    grid (full tiles only — the ViT-style patchify a vision training
    pipeline runs before embedding): one row per tile with exact
    integer per-channel pixel sums. Edge remainders are dropped the
    way a patchifier crops; tile means are derived SQL-side so the
    normalization policy lives in the plan. Pixels never leave the
    decode map — only tile-grain sums do (patch² compression before
    the first shuffle)."""
    import numpy as np

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {
                k: []
                for k in ("id", "py", "px", "n_px", "sum_r", "sum_g", "sum_b")
            }
            for i, payload in zip(pdf["id"], pdf["payload"]):
                img = decode_image(bytes(payload)).astype("int64")
                h, w = img.shape[0], img.shape[1]
                for py in range(h // patch):
                    for px in range(w // patch):
                        tile = img[
                            py * patch : (py + 1) * patch,
                            px * patch : (px + 1) * patch,
                        ]
                        out["id"].append(int(i))
                        out["py"].append(py)
                        out["px"].append(px)
                        out["n_px"].append(patch * patch)
                        out["sum_r"].append(int(tile[:, :, 0].sum()))
                        out["sum_g"].append(int(tile[:, :, 1].sum()))
                        out["sum_b"].append(int(tile[:, :, 2].sum()))
            yield pd.DataFrame(out)

    return blobs.select("id", "payload").mapInPandas(
        run,
        "id bigint, py int, px int, n_px bigint, "
        "sum_r bigint, sum_g bigint, sum_b bigint",
    )
