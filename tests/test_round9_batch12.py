"""Invariant tests for the round-9 batch-12 queries (MMR re-rank,
erasure planner, deterministic UUID, windowed KMV distinct)."""

import hashlib
import math
from collections import defaultdict

import numpy as np

from hawaiidatapipeline_spark.queries import (
    emb_extra,
    functions as fn_queries,
    sketches_extra,
    warehouse_extra,
)
from hawaiidatapipeline_spark.registry import load_table

from .conftest import SF0001


def test_mmr_rerank_matches_greedy_fold(spark):
    rows = load_table(spark, SF0001, "embeddings").collect()
    q = {
        r["vec_id"]: np.round(
            np.array(r["embedding"], dtype=np.float64) * 1000
        ).astype(np.int64)
        for r in rows
    }
    out = emb_extra.QUERIES["emb_mmr_rerank"](spark, SF0001).collect()
    probes = sorted(v for v in q if v % emb_extra._HAM_PROBE_MOD == 0)
    got = defaultdict(list)
    for r in out:
        got[r["probe_id"]].append((r["rank"], r["picked_id"], r["rel"]))
    assert sorted(got) == probes
    for p in probes:
        rel = {
            v: int(np.dot(q[p], qv)) for v, qv in q.items() if v != p
        }
        pool = sorted(rel, key=lambda v: (-rel[v], v))[: emb_extra._MMR_POOL]
        sel = []
        # round 1: pure relevance argmax
        first = min(pool, key=lambda v: (-rel[v], v))
        sel.append(first)
        for _ in range(2, emb_extra._MMR_K + 1):
            best = None
            for c in pool:
                if c in sel:
                    continue
                msim = max(int(np.dot(q[c], q[s])) for s in sel)
                score = rel[c] - msim
                key = (-score, c)
                if best is None or key < best[0]:
                    best = (key, c)
            sel.append(best[1])
        expect = [(i + 1, v, rel[v]) for i, v in enumerate(sel)]
        assert sorted(got[p]) == expect
    # diversity property: picked sets are distinct ids
    for p, lst in got.items():
        ids = [v for _, v, _ in lst]
        assert len(set(ids)) == len(ids) == emb_extra._MMR_K


def test_erasure_plan_conserves_rows_and_flags(spark):
    rows = load_table(spark, SF0001, "events").collect()
    per_day = defaultdict(lambda: [0, 0])
    for r in rows:
        d = r["ts"].date()
        per_day[d][0] += 1
        if r["user_id"] % warehouse_extra._ERASURE_MOD == 0:
            per_day[d][1] += 1
    out = warehouse_extra.QUERIES["etl_erasure_plan"](spark, SF0001).collect()
    assert len(out) == len(per_day)
    for r in out:
        n, e = per_day[r["partition_day"]]
        assert r["n_rows"] == n
        assert r["n_erase"] == e
        assert r["n_kept"] == n - e
        assert r["rewrite_required"] == (1 if e > 0 else 0)
        assert r["bytes_erased"] <= r["bytes_total"]
    assert sum(r["n_rows"] for r in out) == len(rows)


def test_uuid_layout_and_determinism(spark):
    out = fn_queries.QUERIES["fn_uuid_deterministic"](spark, SF0001).collect()
    assert len(out) == 10
    assert out[0]["n_keys"] == out[0]["n_distinct"]  # no collisions
    for r in out:
        u = r["uuid3"]
        parts = u.split("-")
        assert [len(p) for p in parts] == [8, 4, 4, 4, 12]
        assert parts[2][0] == "3"  # version nibble
        assert parts[3][0] in "89ab"  # RFC 4122 variant
        # reproducible from the namespaced md5
        hx = hashlib.md5(f"hdp-ns:{r['c_custkey']}".encode()).hexdigest()
        assert parts[0] == hx[0:8]
        assert parts[1] == hx[8:12]
        assert parts[2][1:] == hx[13:16]
        assert parts[3][1:] == hx[17:20]
        assert parts[4] == hx[20:32]


def test_window_kmv_matches_fold_and_small_windows_exact(spark):
    from hawaiidatapipeline_spark.operators.dedup import portable_hash64
    from pyspark.sql import functions as F

    e = load_table(spark, SF0001, "events")
    hashed = e.select(
        F.floor(F.unix_micros("ts") / 21600000000).cast("long").alias("w"),
        "user_id",
        portable_hash64(F.col("user_id").cast("string"), 7).alias("h"),
    ).collect()
    per_w = defaultdict(set)
    users = defaultdict(set)
    for r in hashed:
        per_w[r["w"]].add(r["h"])
        users[r["w"]].add(r["user_id"])
    k = sketches_extra._WKMV_K
    out = sketches_extra.QUERIES["ts_window_distinct_kmv"](spark, SF0001).collect()
    assert len(out) == len(per_w)
    for r in out:
        hs = sorted(per_w[r["window_id"]])
        nd = len(hs)
        assert r["exact_distinct"] == len(users[r["window_id"]])
        if nd < k:
            # small windows: the sketch IS the exact count
            assert r["est_distinct"] == float(nd)
            assert r["est_distinct"] == r["exact_distinct"]
        else:
            est = (k - 1) * 1152921504606846976.0 / hs[k - 1]
            assert r["est_distinct"] == round(est, 6)
