"""Round-15 optimization tests: the vectorized-native Lloyd trainers.

Pins (VERDICT r14 #7) that every frame the trainers pull through the
driver is broadcast-sized — exactly the rows the old join form already
round-tripped via F.broadcast — and that the numpy argmin implements the
same (dist, cid) lexicographic total order the SQL window used,
including across centroid blocks.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries import emb_extra
from hawaiidatapipeline_spark.queries.emb_extra import (
    _KM_K,
    _KM_TARGET,
    _PQ_K,
    _PQ_M_DIMS,
    _km_train_np,
    _nearest_block,
    _pq_train_rounds_np,
    _quant_arrays,
)

SF0001 = "/root/testdata/sf0.001"


def test_nearest_block_tie_breaks_to_lowest_cid():
    # two centroids equidistant from the query: the (dist, cid) order
    # must pick the EARLIER row (lowest cid), like ORDER BY dist, cid
    Q = np.array([[0, 0]], dtype=np.int64)
    C = np.array([[1, 0], [0, 1], [2, 0]], dtype=np.int64)  # d2 = 1, 1, 4
    bi, bd = _nearest_block(Q, C)
    assert bi.tolist() == [0] and bd.tolist() == [1]


def test_nearest_block_tie_breaks_across_blocks(monkeypatch):
    # a later BLOCK reaching the same distance must NOT steal the win:
    # only strictly smaller distances update the running best
    monkeypatch.setattr(emb_extra, "_KM_CID_BLOCK", 2)
    Q = np.array([[0, 0], [10, 0]], dtype=np.int64)
    C = np.array([[1, 0], [3, 0], [0, 1], [10, 1]], dtype=np.int64)
    bi, bd = _nearest_block(Q, C)
    # row 0: d2 = 1, 9, 1, 101 -> tie between cid 0 and cid 2 -> cid 0
    # row 1: d2 = 81, 49, 100, 1 -> cid 3 (a later block CAN win strictly)
    assert bi.tolist() == [0, 3]
    assert bd.tolist() == [1, 1]


def test_kmeans_driver_collect_is_broadcast_sized(spark):
    qarr = _quant_arrays(spark, SF0001)
    n = qarr.count()
    k = max(_KM_K, math.ceil(n / _KM_TARGET))
    (pc, pC), (fc, fC) = _km_train_np(qarr, k)
    # the driver holds at most K centroid rows of d values per round —
    # the same K*d cells F.broadcast(centroids) pulled through the
    # driver in the old join form; NEVER corpus-sized
    for cids, C in ((pc, pC), (fc, fC)):
        assert len(cids) <= k
        assert all(len(row) == 64 for row in C)
        assert sorted(cids) == list(cids)


def test_pq_driver_collect_is_codebook_sized(spark):
    qarr = _quant_arrays(spark, SF0001)
    prev, fin = _pq_train_rounds_np(qarr)
    for cents in (prev, fin):
        assert len(cents) == 64 // _PQ_M_DIMS  # M subspaces
        for cids, C in cents:
            assert len(cids) <= _PQ_K  # k rows per codebook
            assert all(len(row) == _PQ_M_DIMS for row in C)
            assert sorted(cids) == list(cids)


def test_qc_weight_vector_is_local_relation(spark):
    from hawaiidatapipeline_spark.queries.round12_extra import (
        _DSIR_B,
        _qc_train,
    )
    from hawaiidatapipeline_spark.registry import load_table

    d = load_table(spark, SF0001, "documents")
    dense, lab, n, w, scores = _qc_train(spark, d)
    # the weight vector is <= B + 1 rows at any corpus size and is now a
    # driver-created relation (PySpark parallelizes local rows as an
    # ExistingRDD): it is never COMPUTED by a distributed plan, so no
    # per-round weight materialize/broadcast-build job exists
    assert w.count() <= _DSIR_B + 1
    plan = w._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan or "Scan ExistingRDD" in plan
    assert "Exchange" not in plan and "Join" not in plan


def test_kmeans_assign_matches_old_join_form(spark):
    """The numpy assignment must equal the d-keyed join + window argmin
    it replaced — recomputed here in the old relational form."""
    from pyspark.sql import Window

    from hawaiidatapipeline_spark.queries.emb_extra import _kmeans_assign

    qv, assign, cent = _kmeans_assign(spark, SF0001)
    dists = (
        qv.join(F.broadcast(cent.withColumnRenamed("cid", "ccid")), "d")
        .groupBy("vec_id", "ccid")
        .agg(
            F.sum(
                (F.col("q") - F.col("cq")) * (F.col("q") - F.col("cq"))
            ).alias("dist")
        )
    )
    # NOTE: cent is c_R while assign pairs with c_{R-1}; run ONE more
    # argmin against c_R on both paths to compare like with like
    w = Window.partitionBy("vec_id").orderBy("dist", "ccid")
    old_next = (
        dists.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("ccid").alias("cid"))
    )
    rows = {r["vec_id"]: r["cid"] for r in old_next.collect()}
    qarr = _quant_arrays(spark, SF0001)
    cent_rows = sorted(
        ((r["cid"], r["d"], r["cq"]) for r in cent.collect())
    )
    by_cid: dict = {}
    for cid, d, cq in cent_rows:
        by_cid.setdefault(cid, {})[d] = cq
    cids = sorted(by_cid)
    C = [[by_cid[c][d] for d in sorted(by_cid[c])] for c in cids]
    new = {
        r["vec_id"]: r["cid"]
        for r in emb_extra._km_assign_np(qarr, cids, C).collect()
    }
    assert new == rows
