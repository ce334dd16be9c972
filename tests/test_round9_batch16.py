"""Invariant tests for the round-9 batch-16 queries (SRP recall audit,
Hill tail-index estimator)."""

import hashlib
import math
from collections import Counter

import numpy as np

from hawaiidatapipeline_spark.queries import analytics, emb_extra
from hawaiidatapipeline_spark.registry import load_table

from .conftest import SF0001


def _ph(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_srp_recall_matches_numpy_fold(spark):
    rows = load_table(spark, SF0001, "embeddings").collect()
    q = {
        r["vec_id"]: np.round(
            np.array(r["embedding"], dtype=np.float64) * 1000
        ).astype(np.int64)
        for r in rows
    }
    planes = np.array(
        [
            [1 if _ph(f"srp:{j}:{d}") % 2 == 0 else -1 for d in range(64)]
            for j in range(emb_extra._SRP_BITS)
        ],
        dtype=np.int64,
    )
    sigs = {}
    for vid, v in q.items():
        dots = planes @ v
        sigs[vid] = sum(1 << j for j in range(len(dots)) if dots[j] > 0)
    k = emb_extra._HAM_K
    out = emb_extra.QUERIES["emb_srp_recall_report"](spark, SF0001).collect()
    probes = sorted(v for v in q if v % emb_extra._HAM_PROBE_MOD == 0)
    assert [r["probe_id"] for r in out] == probes
    for r in out:
        p = r["probe_id"]
        rel = sorted(
            (-int(np.dot(q[p], qv)), v) for v, qv in q.items() if v != p
        )
        gt = {v for _, v in rel[:k]}
        cand = [
            (d, v) for d, v in rel if sigs[v] == sigs[p]
        ]
        ann = {v for _, v in cand[:k]}
        assert r["n_candidates"] == len(cand)
        assert r["n_hits"] == len(gt & ann)
        assert r[f"recall_at_{k}"] == round(len(gt & ann) / k, 6)
    # the audit's reason to exist: candidates ≪ corpus for ≥1 probe
    assert any(r["n_candidates"] < len(q) - 1 for r in out)


def test_hill_alpha_matches_fold_and_is_positive(spark):
    rows = load_table(spark, SF0001, "events").collect()
    counts = Counter(r["user_id"] for r in rows)
    tail = sorted(
        counts.items(), key=lambda kv: (-kv[1], kv[0])
    )[: analytics._HILL_TOPK]
    xs = [n for _, n in tail]
    x_min = min(xs)
    sum_nano = sum(
        math.floor(math.log(x / x_min) * 1e9) for x in xs
    )
    alpha = len(xs) / (sum_nano / 1e9)
    row = analytics.QUERIES["events_power_law_hill"](spark, SF0001).collect()[0]
    assert row["tail_size"] == len(xs)
    assert row["x_min"] == x_min
    assert row["hill_alpha"] == round(alpha, 6)
    assert row["hill_alpha"] > 0
