"""Invariant tests for the round-9 batch-15 queries (revenue bridge,
Wasserstein drift, Mann-Kendall, k-NN distance outliers)."""

import math
from collections import Counter, defaultdict
from datetime import datetime

import numpy as np

from hawaiidatapipeline_spark.queries import (
    causal_extra,
    emb_extra,
    metrics_extra,
    warehouse_extra,
)
from hawaiidatapipeline_spark.registry import load_table

from .conftest import SF0001

_SPLIT98 = datetime(1998, 1, 1)


def test_revenue_bridge_reconciles_exactly(spark):
    """volume_effect + rate_effect must equal delta_total per segment
    (the bridge's defining identity), and the cells must match a fold."""
    orders = load_table(spark, SF0001, "orders").collect()
    cells = defaultdict(lambda: [0, 0, 0, 0])  # n0, n1, s0, s1
    for r in orders:
        c = cells[r["o_orderpriority"]]
        cents = math.floor(r["o_totalprice"] * 100)
        if r["o_orderdate"] < _SPLIT98:
            c[0] += 1
            c[2] += cents
        else:
            c[1] += 1
            c[3] += cents
    out = causal_extra.QUERIES["events_revenue_bridge"](spark, SF0001).collect()
    assert len(out) == len(cells)
    for r in out:
        n0, n1, s0, s1 = cells[r["segment"]]
        assert (r["n_orders_pre"], r["n_orders_post"]) == (n0, n1)
        assert r["rev_pre"] == round(s0 / 100.0, 6)
        assert r["delta_total"] == round((s1 - s0) / 100.0, 6)
        # the reconciliation identity (allow 6-dp rounding slack only)
        assert abs(
            r["volume_effect"] + r["rate_effect"] - r["delta_total"]
        ) < 2e-6
        # both periods populated on this fixture
        assert n0 > 0 and n1 > 0


def test_wasserstein_matches_scipy_style_fold(spark):
    orders = load_table(spark, SF0001, "orders").collect()
    pre = sorted(
        math.floor(r["o_totalprice"])
        for r in orders
        if r["o_orderdate"] < _SPLIT98
    )
    post = sorted(
        math.floor(r["o_totalprice"])
        for r in orders
        if r["o_orderdate"] >= _SPLIT98
    )
    na, nb = len(pre), len(post)
    ca, cb = Counter(pre), Counter(post)
    vals = sorted(set(pre) | set(post))
    cum_a = cum_b = 0
    total_micro = 0
    for v, nxt in zip(vals, vals[1:]):
        cum_a += ca.get(v, 0)
        cum_b += cb.get(v, 0)
        total_micro += math.floor(
            abs(cum_a * nb - cum_b * na) * (nxt - v) * 1e6 / (na * nb)
        )
    row = warehouse_extra.QUERIES["dq_wasserstein_drift"](
        spark, SF0001
    ).collect()[0]
    assert (row["n_pre"], row["n_post"]) == (na, nb)
    assert row["n_value_steps"] == len(vals) - 1
    assert row["wasserstein_1"] == round(total_micro / 1e6, 6)
    # W1 is bounded by the value range
    assert 0.0 <= row["wasserstein_1"] <= vals[-1] - vals[0]


def test_mann_kendall_matches_pair_fold(spark):
    rows = load_table(spark, SF0001, "events").collect()
    daily = Counter(r["ts"].date() for r in rows)
    days = sorted(daily)
    xs = [daily[d] for d in days]
    n = len(xs)
    s = sum(
        (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    tie_adj = sum(
        t * (t - 1) * (2 * t + 5)
        for t in Counter(xs).values()
        if t > 1
    )
    var_s = (n * (n - 1) * (2 * n + 5) - tie_adj) / 18.0
    if s > 0:
        z = (s - 1) / math.sqrt(var_s)
    elif s < 0:
        z = (s + 1) / math.sqrt(var_s)
    else:
        z = 0.0
    row = metrics_extra.QUERIES["ts_mann_kendall"](spark, SF0001).collect()[0]
    assert row["n_days"] == n
    assert row["n_pairs"] == n * (n - 1) // 2
    assert row["s_statistic"] == s
    assert row["var_s"] == round(var_s, 6)
    assert row["z_stat"] == round(z, 6)


def test_knn_outliers_match_numpy_fold(spark):
    rows = load_table(spark, SF0001, "embeddings").collect()
    q = {
        r["vec_id"]: np.round(
            np.array(r["embedding"], dtype=np.float64) * 1000
        ).astype(np.int64)
        for r in rows
    }
    k = emb_extra._OUTLIER_KNN_K
    kth = {}
    for a, qa in q.items():
        dists = sorted(
            (int(((qa - qb) ** 2).sum()), b)
            for b, qb in q.items()
            if b != a
        )
        kth[a] = dists[k - 1][0]
    want = sorted(((-d, v) for v, d in kth.items()))[:20]
    out = emb_extra.QUERIES["emb_knn_dist_outliers"](spark, SF0001).collect()
    assert [
        (-r[f"knn{k}_dist2_milli"], r["vec_id"]) for r in out
    ] == want
    # outliers are strictly the global maxima of the kth-NN distance
    assert all(r[f"knn{k}_dist2_milli"] > 0 for r in out)
