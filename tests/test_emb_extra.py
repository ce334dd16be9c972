"""Int8 quantization reconstruction bound."""

from hawaiidatapipeline_spark.queries.emb_extra import emb_quantize_int8
from hawaiidatapipeline_spark.registry import load_table

from .conftest import SF0001


def test_quantize_codes_fit_int8_and_reconstruct(spark):
    e = load_table(spark, SF0001, "embeddings")
    out = emb_quantize_int8(spark, SF0001)
    rows = {r["vec_id"]: r for r in out.collect()}
    orig = {r["vec_id"]: r["embedding"] for r in e.collect()}
    assert set(rows) == set(orig)
    checked = 0
    for vid, r in rows.items():
        codes = [int(c) for c in r["codes"].split("|")]
        assert len(codes) == len(orig[vid])
        assert all(-127 <= c <= 127 for c in codes)
        # reconstruction error bounded by half a quantization step
        # (r.scale is rounded to 6dp for the gate; rebuild it exactly)
        scale = max(abs(float(x)) for x in orig[vid]) / 127.0
        if scale == 0:
            continue
        for c, x in zip(codes, orig[vid]):
            assert abs(c * scale - float(x)) <= scale / 2 + 1e-12
        checked += 1
    assert checked > 0
