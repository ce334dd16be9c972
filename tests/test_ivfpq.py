"""IVF-PQ composition invariants (queries/ivfpq.py) on the sf0.001 fixture.

The oracle hash proves engine-equivalence; these tests prove the CLAIMS the
docstrings make — residual coding is strictly tighter, and the cell pruning
actually prunes (the scale property the composition exists for).
"""

from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries.emb_extra import (
    _ADC_STRIDE,
    _kmeans_assign,
    _pq_train,
)
from hawaiidatapipeline_spark.queries.ivfpq import (
    _residual_pq_assign,
    emb_ivfpq_recall_report,
    emb_ivfpq_topk,
)

from .conftest import SF0001


def test_residual_codes_quantize_tighter_than_raw(spark):
    """The point of residual PQ: subtracting the coarse centroid
    concentrates the distribution, so the same codebook budget must yield
    strictly lower TOTAL quantization error than raw-vector PQ."""
    _, raw_assign, _ = _pq_train(spark, SF0001)
    raw_err = raw_assign.agg(F.sum("dist")).collect()[0][0]
    res_err = (
        _residual_pq_assign(spark, SF0001).agg(F.sum("dist")).collect()[0][0]
    )
    assert res_err < raw_err, (raw_err, res_err)


def test_ivfpq_topk_neighbors_share_the_probe_cell(spark):
    """nprobe=1 means every returned neighbor sits in the probe's coarse
    cell — the invariant that makes the scan cell-sized at 10^9 vectors."""
    _, coarse, _ = _kmeans_assign(spark, SF0001)
    cells = {r["vec_id"]: r["cid"] for r in coarse.collect()}
    rows = emb_ivfpq_topk(spark, SF0001).collect()
    assert rows, "fixture must produce at least one probe with neighbors"
    for r in rows:
        assert cells[r["neighbor_id"]] == r["cell"] == cells[r["probe_id"]]


def test_ivfpq_candidate_volume_is_cell_sized(spark):
    """n_cand per probe must equal (probe's cell population - 1): the ADC
    join scored exactly the cell-mates, nothing else — the candidate
    economics the recall report's scanned-fraction dial is built on."""
    _, coarse, _ = _kmeans_assign(spark, SF0001)
    sizes = {
        r["cid"]: r["n"]
        for r in coarse.groupBy("cid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = sum(sizes.values())
    report = emb_ivfpq_recall_report(spark, SF0001).collect()
    probes = coarse.filter(F.col("vec_id") % _ADC_STRIDE == 0).count()
    assert len(report) == probes
    for r in report:
        assert r["n_cand"] == sizes[r["cell"]] - 1
        assert r["n_cand"] < total - 1  # strictly pruned vs full-scan ADC
        assert 0.0 <= r["recall_at_10"] <= 1.0
