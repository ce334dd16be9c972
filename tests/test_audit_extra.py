"""Semantic invariants for the round-8 audit/segmentation/curation family
(queries/audit_extra.py) — beyond the oracle hash check: conservation
laws, range bounds, and numpy cross-checks for the linear-algebra ops."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries import collect
from hawaiidatapipeline_spark.registry import load_table

from .conftest import SF0001


@pytest.fixture(scope="module")
def registry():
    return collect()[0]


def test_rfm_conserves_users_and_bounds(spark, registry):
    """Every user lands in exactly one (r,f,m) cell; quintile labels stay
    in 1..5; total monetary equals the corpus total in exact cents."""
    out = registry["events_rfm_segmentation"](spark, SF0001).collect()
    e = load_table(spark, SF0001, "events")
    n_users = e.select("user_id").distinct().count()
    total_cents = e.agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
    ).collect()[0][0]
    assert sum(r["n_users"] for r in out) == n_users
    assert sum(r["monetary_cents"] for r in out) == total_cents
    for r in out:
        assert 1 <= r["r_q"] <= 5 and 1 <= r["f_q"] <= 5 and 1 <= r["m_q"] <= 5


def test_completeness_fractions_bounded(spark, registry):
    out = registry["dq_completeness_matrix"](spark, SF0001).collect()
    n = load_table(spark, SF0001, "events").count()
    assert {r["col"] for r in out} == {"event_type", "props", "value", "ts", "user_id"}
    for r in out:
        assert 0 <= r["n_null"] + r["n_blank"] <= n
        assert 0.0 <= r["pct_filled"] <= 1.0


def test_reconciliation_covers_every_ordered_order(spark, registry):
    """Bucket counts partition the joined orders: within-1% and over-10%
    are disjoint subsets of n_orders, and n_orders sums to the number of
    orders that have lineitems."""
    out = registry["dq_order_total_reconciliation"](spark, SF0001).collect()
    o = load_table(spark, SF0001, "orders")
    li = load_table(spark, SF0001, "lineitem")
    joined = o.join(li.select("l_orderkey").distinct(),
                    o.o_orderkey == F.col("l_orderkey")).count()
    assert sum(r["n_orders"] for r in out) == joined
    for r in out:
        assert r["n_within_1pct"] + r["n_over_10pct"] <= r["n_orders"]
        assert r["rel_gap_total"] >= 0.0


def test_vocab_coverage_monotone(spark, registry):
    out = registry["llm_vocab_coverage_curve"](spark, SF0001).collect()
    ks = [r["k"] for r in out]
    assert ks == sorted(ks)
    covs = [r["coverage"] for r in out]
    assert all(a <= b for a, b in zip(covs, covs[1:]))
    assert all(0.0 < c <= 1.0 for c in covs)


def _emb_matrix(spark) -> np.ndarray:
    rows = (
        load_table(spark, SF0001, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    return np.array(
        [r["embedding"] for r in sorted(rows, key=lambda r: r["vec_id"])],
        dtype=np.float64,
    )


def test_covariance_topk_matches_numpy(spark, registry):
    """The exact integer co-moment covariance agrees with numpy's float
    covariance to quantization error, and the pairs really are the
    global top-|cov| set."""
    out = registry["emb_covariance_topk"](spark, SF0001).collect()
    X = _emb_matrix(spark)
    n = X.shape[0]
    c_np = np.cov(X, rowvar=False, bias=True)  # biased = /n, our n² form
    got_abs = []
    for r in out:
        assert abs(r["cov"] - c_np[r["i"], r["j"]]) < 1e-5
        got_abs.append(abs(c_np[r["i"], r["j"]]))
    # top-20 by |cov|: the smallest returned |cov| must be >= the 20th
    # largest off-diagonal |cov| in numpy (tolerance for micro-unit grid)
    iu = np.triu_indices_from(c_np, k=1)
    top20 = np.sort(np.abs(c_np[iu]))[-20:]
    assert min(got_abs) >= top20.min() - 1e-5
    assert n == 500  # sf0.001 embeddings fixture size


def test_pca_direction_matches_numpy(spark, registry):
    """The 10-squaring integer iterate (S^1024 up to scale) must land
    within a few degrees of numpy's exact dominant eigenvector of the
    second-moment matrix (|cosine| > 0.99) — proof the fixed-point
    arithmetic converges to the real principal axis, not just to a
    hash-stable artifact."""
    out = registry["emb_pca_power_iteration"](spark, SF0001).collect()
    w = np.array([r["w"] for r in sorted(out, key=lambda r: r["i"])], dtype=np.float64)
    X = _emb_matrix(spark)
    s = X.T @ X
    evals, evecs = np.linalg.eigh(s)
    top = evecs[:, np.argmax(evals)]
    cos = abs(w @ top) / (np.linalg.norm(w) * np.linalg.norm(top))
    assert cos > 0.99, f"|cos(power-iter, numpy top eigvec)| = {cos:.4f}"


def test_inter_arrival_gaps_positive(spark, registry):
    out = registry["events_inter_arrival_stats"](spark, SF0001).collect()
    for r in out:
        assert r["min_gap_s"] >= 0.0
        assert r["min_gap_s"] <= r["median_gap_s"] <= r["p90_gap_s"] <= r["max_gap_s"]
        assert r["n_gaps"] > 0


def test_wow_growth_consistent(spark, registry):
    out = registry["ts_wow_growth"](spark, SF0001).collect()
    for r in out:
        expect = (r["n"] - r["prev_n"]) / r["prev_n"]
        assert abs(r["wow_growth"] - round(expect, 6)) < 1e-9


def test_attribution_credit_conserved(spark, registry):
    """Total linear-attribution credit cannot exceed the number of
    credited conversions (each conversion distributes exactly 1.0 of
    credit, minus micro-unit truncation dust), and every touch type's
    credit is nonnegative."""
    out = registry["events_attribution_linear"](spark, SF0001).collect()
    total_credit = sum(r["credit"] for r in out)
    # ground truth: purchases with >=1 view/click/signup in the prior 24 h
    e = load_table(spark, SF0001, "events")
    conv = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("cid"), F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"))
    touch = e.filter(F.col("event_type").isin("view", "click", "signup"))
    n_credited = (
        conv.join(
            touch,
            (F.col("cu") == touch.user_id)
            & (touch.ts < F.col("cts"))
            & (touch.ts >= F.col("cts") - F.expr("INTERVAL 24 HOURS")),
        )
        .select("cid").distinct().count()
    )
    # each credited conversion hands out exactly 1.0 of credit, minus
    # micro-unit truncation dust (< n_touches * 1e-6)
    assert n_credited - 0.05 < total_credit <= n_credited + 1e-6
    for r in out:
        assert r["credit"] >= 0.0 and r["n_touches"] >= r["n_conversions_touched"]


def test_jaccard_bounds_and_symmetric_sizes(spark, registry):
    out = registry["events_user_overlap_jaccard"](spark, SF0001).collect()
    for r in out:
        assert 0.0 <= r["jaccard"] <= 1.0
        assert r["n_inter"] <= min(r["n_a"], r["n_b"])
        assert r["type_a"] < r["type_b"]


def test_centroid_margin_counts_bounded(spark, registry):
    out = registry["emb_centroid_margin"](spark, SF0001).collect()
    from hawaiidatapipeline_spark.registry import load_table as lt
    n_total = lt(spark, SF0001, "embeddings").count()
    assert sum(r["n_vecs"] for r in out) == n_total
    for r in out:
        assert 0 <= r["n_separable"] <= r["n_vecs"]


def test_pq_codes_cover_corpus_and_range(spark, registry):
    """Every packed code is a valid 8x2-bit word, populations are
    positive, the top-20 cannot exceed the corpus, and quantization
    errors are nonnegative."""
    out = registry["emb_pq_codes"](spark, SF0001).collect()
    n_total = load_table(spark, SF0001, "embeddings").count()
    assert 0 < len(out) <= 20
    assert sum(r["n_vecs"] for r in out) <= n_total
    for r in out:
        assert 0 <= r["packed_code"] < 4 ** 8
        assert r["n_vecs"] > 0 and r["avg_q_err"] >= 0.0


def test_pq_adc_ranking_is_topk_per_probe(spark, registry):
    """Every probe gets exactly top-3 ranked 1..3 with nondecreasing ADC
    distance, never itself as a neighbor."""
    out = registry["emb_pq_adc_topk"](spark, SF0001).collect()
    per = {}
    for r in out:
        per.setdefault(r["probe_id"], []).append(r)
    for pid, rows in per.items():
        rows.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
        d = [r["adc_d2"] for r in rows]
        assert d == sorted(d)
        assert all(r["neighbor_id"] != pid for r in rows)
        assert all(r["adc_d2"] >= 0 for r in rows)


def test_incremental_lsh_pairs_touch_the_batch(spark, registry):
    """Every emitted pair involves at least one new-batch doc (id % 10
    == 0), pair_kind is consistent with membership, ids are ordered, and
    the estimator stays in [tau, 1]."""
    out = registry["llm_dedup_incremental_lsh"](spark, SF0001).collect()
    assert out, "fixture is built to contain near-dup pairs"
    for r in out:
        is_new = (r["doc_a"] % 10 == 0, r["doc_b"] % 10 == 0)
        assert any(is_new)
        assert r["pair_kind"] == ("new_vs_new" if all(is_new) else "new_vs_corpus")
        assert r["doc_a"] < r["doc_b"]
        assert 0.6 <= r["est_jaccard"] <= 1.0


def test_pq_recall_bounds(spark, registry):
    """Recall is n_hits/10 with n_hits in 0..10, one row per strided
    probe, and the fixture codebooks must retrieve a nonzero share of
    true neighbors overall."""
    out = registry["emb_pq_recall_report"](spark, SF0001).collect()
    n_probes = (
        load_table(spark, SF0001, "embeddings")
        .filter("vec_id % 31 = 0").count()
    )
    assert len(out) == n_probes
    for r in out:
        assert 0 <= r["n_hits"] <= 10
        assert abs(r["recall_at_10"] - r["n_hits"] / 10) < 1e-9
    assert sum(r["n_hits"] for r in out) > 0
