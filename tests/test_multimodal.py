"""Multimodal codecs and decode operators (sources/multimodal.py):
byte-exact roundtrips for the stdlib+numpy codecs, honest raises for
compressed formats, and the Arrow-batched stats operators."""

import numpy as np
import pytest

from hawaiidatapipeline_spark.sources.multimodal import (
    decode_audio,
    decode_bmp,
    decode_image,
    decode_ppm,
    decode_rawv,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_rawv,
    encode_wav_pcm16,
    resize_nearest,
    sample_frames,
)


def _rand_img(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_bmp_roundtrip_including_row_padding():
    # w=5 -> 15-byte rows padded to 16: exercises the 4-byte row alignment
    for h, w in [(3, 5), (8, 16), (1, 1), (7, 4)]:
        img = _rand_img(h, w, seed=h * 100 + w)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_bmp_orientation_and_channels():
    # distinct corner values prove bottom-up flip and BGR->RGB both happen
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[0, 0] = (10, 20, 30)
    img[1, 1] = (40, 50, 60)
    out = decode_bmp(encode_bmp(img))
    assert tuple(out[0, 0]) == (10, 20, 30) and tuple(out[1, 1]) == (40, 50, 60)


def test_ppm_roundtrip_and_comment_header():
    img = _rand_img(4, 6, seed=3)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    with_comment = b"P6\n# a comment\n6 4\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(with_comment), img)


def test_wav_roundtrip_mono_and_stereo():
    mono = (np.arange(100) % 200 - 100).astype("<i2")
    data, rate = decode_wav(encode_wav_pcm16(mono, 8000))
    assert rate == 8000 and np.array_equal(data[:, 0], mono)
    stereo = np.stack([mono, mono[::-1]], axis=1)
    data2, _ = decode_wav(encode_wav_pcm16(stereo, 16000))
    assert np.array_equal(data2, stereo)


def test_rawv_frame_sampling():
    frames = [np.full((2, 3, 3), i, dtype=np.uint8) for i in range(10)]
    vid = encode_rawv(frames)
    assert decode_rawv(vid).shape == (10, 2, 3, 3)
    sampled = sample_frames(vid, every_k=3)
    assert [int(f[0, 0, 0]) for f in sampled] == [0, 3, 6, 9]


def test_resize_nearest():
    img = _rand_img(8, 8, seed=5)
    up = resize_nearest(img, 16, 16)
    assert up.shape == (16, 16, 3)
    assert np.array_equal(up[::2, ::2], img)  # every source pixel survives
    down = resize_nearest(img, 4, 4)
    assert np.array_equal(down, img[::2, ::2])


def test_compressed_formats_raise_honestly():
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        decode_audio(b"ID3\x04....")


def test_decode_image_sniffs_formats():
    img = _rand_img(3, 3, seed=9)
    assert np.array_equal(decode_image(encode_bmp(img)), img)
    assert np.array_equal(decode_image(encode_ppm(img)), img)


def test_image_stats_operator_matches_formula(spark):
    from hawaiidatapipeline_spark.sources.multimodal import (
        image_stats,
        synthetic_image_blobs,
    )

    ids = spark.range(0, 50).withColumnRenamed("id", "doc_id")
    rows = {r.id: r for r in image_stats(synthetic_image_blobs(ids)).collect()}
    assert len(rows) == 50
    for i in range(50):
        r = rows[i]
        assert (r.width, r.height) == (16 + i % 8, 8 + i % 5)
        assert r.top_left_r == i % 256
        assert r.mean_g == (3 * i) % 256
        expected_mean_r = round(sum((i + k) % 256 for k in range(r.height)) / r.height, 6)
        assert abs(r.mean_r - expected_mean_r) < 1e-9


def test_codec_capabilities_probe():
    from hawaiidatapipeline_spark.sources.multimodal import codec_capabilities

    caps = codec_capabilities()
    assert caps["bmp"] and caps["ppm"] and caps["wav_pcm16"] and caps["rawv"]
    assert isinstance(caps["jpeg"], bool) and isinstance(caps["ffmpeg"], bool)


def test_try_decode_image_degrades_instead_of_raising():
    from hawaiidatapipeline_spark.sources.multimodal import try_decode_image

    img = _rand_img(3, 4, seed=11)
    decoded, err = try_decode_image(encode_bmp(img))
    assert err is None and np.array_equal(decoded, img)
    decoded, err = try_decode_image(b"\xff\xd8\xff\xe0 not a real jpeg")
    assert decoded is None and err  # reason string, no raise
    decoded, err = try_decode_image(b"BM corrupt header")
    assert decoded is None and err  # malformed payloads degrade too


def test_image_stats_tolerant_mixes_null_and_real_rows(spark):
    from pyspark.sql import functions as F

    from hawaiidatapipeline_spark.sources.multimodal import (
        image_stats_tolerant,
        synthetic_image_blobs,
    )

    ids = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    blobs = synthetic_image_blobs(ids).withColumn(
        "payload",
        F.when(F.col("id") % 2 == 1, F.lit(b"\xff\xd8\xff\xe0fake")).otherwise(
            F.col("payload")
        ),
    )
    rows = {r.id: r for r in image_stats_tolerant(blobs).collect()}
    assert len(rows) == 40
    for i in range(40):
        r = rows[i]
        if i % 2 == 1:
            assert r.decode_error and r.width is None and r.mean_r is None
        else:
            assert r.decode_error is None
            assert (r.width, r.height) == (16 + i % 8, 8 + i % 5)
            assert r.top_left_r == i % 256


def test_audio_stats_operator_matches_formula(spark):
    from hawaiidatapipeline_spark.sources.multimodal import (
        audio_stats,
        synthetic_audio_blobs,
    )

    ids = spark.range(0, 20).withColumnRenamed("id", "doc_id")
    rows = {r.id: r for r in audio_stats(synthetic_audio_blobs(ids)).collect()}
    for i in range(20):
        r = rows[i]
        n = 800 + 8 * (i % 100)
        assert r.n_samples == n and r.duration_ms == n // 8
        assert r.first_sample == i % 200 - 100
        expected_rms = round(
            (sum(((i + k) % 200 - 100) ** 2 for k in range(n)) / n) ** 0.5, 6
        )
        assert abs(r.rms - expected_rms) < 1e-9
