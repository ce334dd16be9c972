"""Statistical and determinism properties of the sampling operators."""

import pyspark.sql.functions as F

from hawaiidatapipeline_spark.operators.sampling import (
    bernoulli_sample,
    stratified_fixed_n,
    weighted_priority_sample,
)
from hawaiidatapipeline_spark.registry import load_table

from .conftest import SF0001


def test_bernoulli_fraction_and_determinism(spark):
    o = load_table(spark, SF0001, "orders")
    total = o.count()
    s1 = bernoulli_sample(o, "o_orderkey", fraction_bp=1000, seed=11)
    n1 = s1.count()
    # 10% +- 2pp at 15k rows
    assert abs(n1 / total - 0.10) < 0.02
    # identical selection on re-run (hash-derived, no rand())
    n2 = bernoulli_sample(o, "o_orderkey", fraction_bp=1000, seed=11).count()
    assert n1 == n2
    # different seed -> different (but similar-sized) selection
    s3 = bernoulli_sample(o, "o_orderkey", fraction_bp=1000, seed=12)
    assert s3.join(s1, "o_orderkey", "left_semi").count() < n1


def test_stratified_exact_quota(spark):
    o = load_table(spark, SF0001, "orders")
    sizes = dict(o.groupBy("o_orderstatus").count().collect())
    got = (
        stratified_fixed_n(o, "o_orderstatus", "o_orderkey", 200, seed=13)
        .groupBy("o_orderstatus")
        .count()
        .collect()
    )
    for row in got:
        assert row["count"] == min(200, sizes[row["o_orderstatus"]])
    assert {r["o_orderstatus"] for r in got} == set(sizes)


def test_weighted_sample_prefers_heavy_rows(spark):
    o = load_table(spark, SF0001, "orders")
    w = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    picked = weighted_priority_sample(o, "o_orderkey", w, k=150, seed=17)
    assert picked.count() == 150
    mean_all = o.agg(F.avg("o_totalprice")).first()[0]
    mean_picked = picked.agg(F.avg("o_totalprice")).first()[0]
    # weight-proportional selection must skew the sample mean upward
    assert mean_picked > mean_all * 1.15


def test_bernoulli_membership_is_append_stable(spark):
    """Adding new rows never changes old rows' membership — the property
    that makes hash sampling safe for growing corpora (a re-frozen sample
    after ingest only ADDS rows; no training doc silently drops out)."""
    o = load_table(spark, SF0001, "orders")
    old = o.filter(F.col("o_orderkey") % 3 != 0)
    s_old = {r["o_orderkey"] for r in bernoulli_sample(old, "o_orderkey", 1000).collect()}
    s_all = {r["o_orderkey"] for r in bernoulli_sample(o, "o_orderkey", 1000).collect()}
    old_keys = {r["o_orderkey"] for r in old.select("o_orderkey").collect()}
    assert s_all & old_keys == s_old


def test_stratified_append_displaces_at_most_one_per_stratum(spark):
    """Appending one row to a stratum changes that stratum's selection by
    at most one displacement (hash-rank stability claim in the operator
    docstring)."""
    o = load_table(spark, SF0001, "orders")
    base = o.filter(F.col("o_orderkey") != 7)
    sel_base = {
        (r["o_orderstatus"], r["o_orderkey"])
        for r in stratified_fixed_n(base, "o_orderstatus", "o_orderkey", 50).collect()
    }
    sel_full = {
        (r["o_orderstatus"], r["o_orderkey"])
        for r in stratified_fixed_n(o, "o_orderstatus", "o_orderkey", 50).collect()
    }
    # symmetric difference is 0 (new row ranked below cut) or 2 (new row
    # entered, one displaced)
    assert len(sel_base ^ sel_full) <= 2
