"""Invariant tests for the round-9 batch-17 queries (Gini/Lorenz
concentration, nearest-centroid confusion)."""

import math
from collections import defaultdict

import numpy as np

from hawaiidatapipeline_spark.queries import aggregates, emb_extra
from hawaiidatapipeline_spark.registry import load_table

from .conftest import SF0001


def test_gini_lorenz_matches_sorted_fold(spark):
    orders = load_table(spark, SF0001, "orders").collect()
    per_cust = defaultdict(int)
    for r in orders:
        per_cust[r["o_custkey"]] += math.floor(r["o_totalprice"] * 100)
    xs = sorted(per_cust.values())
    n = len(xs)
    total = sum(xs)
    gini = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs)) / (
        n * total
    )
    out = aggregates.QUERIES["agg_gini_lorenz"](spark, SF0001).collect()
    assert [r["decile"] for r in out] == list(range(1, 11))
    for r in out:
        assert r["gini"] == round(gini, 6)
    assert 0.0 <= out[0]["gini"] <= 1.0
    # Lorenz curve: increasing, below the diagonal, ends at 100%
    pcts = [r["cum_revenue_pct"] for r in out]
    assert pcts == sorted(pcts)
    assert pcts[-1] == 100.0
    for r in out[:-1]:
        assert r["cum_revenue_pct"] <= r["decile"] * 10.0 + 1e-6
    # decile boundary definition: cum share at the last customer whose
    # cumulative rank falls in the decile
    k = (n * 10 - 1) // 10  # customers inside decile 1..? sanity only
    assert 0 < k < n


def test_nearest_centroid_confusion_matches_numpy(spark):
    rows = load_table(spark, SF0001, "embeddings").collect()
    q = {
        r["vec_id"]: (
            r["label"],
            np.round(
                np.array(r["embedding"], dtype=np.float64) * 1000
            ).astype(np.int64),
        )
        for r in rows
    }
    sums = defaultdict(lambda: [0, None])
    for vid, (lab, v) in q.items():
        if vid % 2 == 0:
            s = sums[lab]
            s[0] += 1
            s[1] = v.copy() if s[1] is None else s[1] + v
    cents = {
        lab: np.floor(v[1] * 1.0 / v[0]).astype(np.int64)
        for lab, v in sums.items()
    }
    conf = defaultdict(int)
    n_eval = n_correct = 0
    for vid, (lab, v) in q.items():
        if vid % 2 == 0:
            continue
        best = min(
            (int(((v - c) ** 2).sum()), plab) for plab, c in cents.items()
        )
        conf[(lab, best[1])] += 1
        n_eval += 1
        if best[1] == lab:
            n_correct += 1
    out = emb_extra.QUERIES["emb_nearest_centroid_confusion"](
        spark, SF0001
    ).collect()
    got = {(r["true_label"], r["pred_label"]): r["n"] for r in out}
    assert got == dict(conf)
    acc = round(n_correct / n_eval, 6)
    assert all(r["overall_accuracy"] == acc for r in out)
    assert sum(got.values()) == n_eval
