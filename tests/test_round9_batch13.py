"""Invariant tests for the round-9 batch-13 queries (domain
reweighting, inclusion dependencies, bot scoring). The streaming KMV
sink is covered in tests/test_streaming.py."""

import math
from collections import Counter, defaultdict

from hawaiidatapipeline_spark.queries import (
    analytics,
    training_extra,
    warehouse_extra,
)
from hawaiidatapipeline_spark.registry import load_table

from .conftest import SF0001


def test_domain_reweight_matches_fold_and_sums_to_one(spark):
    docs = load_table(spark, SF0001, "documents").collect()
    c1 = Counter()
    toks_by_src = defaultdict(list)
    for r in docs:
        ws = r["text"].lower().split(" ")
        c1.update(ws)
        toks_by_src[r["source"]].extend(ws)
    t, v = sum(c1.values()), len(c1)
    losses = {}
    for s, ws in toks_by_src.items():
        nll = sum(
            math.floor((math.log(t + v) - math.log(c1[w] + 1)) * 1e6)
            for w in ws
        )
        losses[s] = (len(ws), nll / len(ws) / 1e6)
    min_loss = min(l for _, l in losses.values())
    t_micro = {
        s: math.floor(math.exp(l - min_loss) * 1e6)
        for s, (_, l) in losses.items()
    }
    z = sum(t_micro.values())
    out = training_extra.QUERIES["llm_domain_reweight_step"](
        spark, SF0001
    ).collect()
    assert len(out) == len(losses)
    for r in out:
        n_tok, loss = losses[r["source"]]
        assert r["n_tokens"] == n_tok
        assert r["avg_nll"] == round(loss, 6)
        assert r["weight_new"] == round(t_micro[r["source"]] / z, 6)
    # multiplicative-weights sanity: normalized, hard domains upweighted
    total_w = sum(r["weight_new"] for r in out)
    assert abs(total_w - 1.0) < 1e-4
    by_loss = sorted(out, key=lambda r: r["avg_nll"])
    assert by_loss[0]["weight_new"] <= by_loss[-1]["weight_new"]


def test_inclusion_dependencies_true_fks_and_orphans(spark):
    out = {
        r["dependency"]: r
        for r in warehouse_extra.QUERIES["dq_inclusion_dependencies"](
            spark, SF0001
        ).collect()
    }
    assert len(out) == 6
    # the schema's true FKs are total containments
    for dep in (
        "lineitem.l_orderkey->orders.o_orderkey",
        "orders.o_custkey->customer.c_custkey",
        "customer.c_nationkey->nation.n_nationkey",
        "lineitem.l_suppkey->supplier.s_suppkey",
    ):
        assert out[dep]["fk_candidate"] == 1
        assert out[dep]["containment_pct"] == 100.0
    # counts replayed from raw data for one pair
    li = load_table(spark, SF0001, "lineitem").collect()
    orders = load_table(spark, SF0001, "orders").collect()
    li_keys = {r["l_orderkey"] for r in li}
    o_keys = {r["o_orderkey"] for r in orders}
    dep = out["orders.o_orderkey->lineitem.l_orderkey"]
    assert dep["n_child"] == len(o_keys)
    assert dep["n_contained"] == len(o_keys & li_keys)
    c_keys = {r["c_custkey"] for r in load_table(spark, SF0001, "customer").collect()}
    oc_keys = {r["o_custkey"] for r in orders}
    dep2 = out["customer.c_custkey->orders.o_custkey"]
    assert dep2["n_contained"] == len(c_keys & oc_keys)
    assert dep2["fk_candidate"] == (1 if c_keys <= oc_keys else 0)


def test_bot_score_matches_cv_fold(spark):
    rows = load_table(spark, SF0001, "events").collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(int(r["ts"].timestamp() * 1e6))
    expected = {}
    for u, ts in by_user.items():
        ts.sort()
        gaps = [(b - a) // 1000000 for a, b in zip(ts, ts[1:])]
        if len(gaps) < 10:
            continue
        sg = sum(gaps)
        if sg <= 0:
            continue
        sgg = sum(g * g for g in gaps)
        n = len(gaps)
        cv = math.sqrt(max(n * sgg - sg * sg, 0)) / sg
        expected[u] = (n, round(sg / n, 6), round(cv, 6))
    want = sorted(
        ((cv, u) for u, (_, _, cv) in expected.items())
    )[:20]
    out = analytics.QUERIES["events_bot_score"](spark, SF0001).collect()
    assert [(r["gap_cv"], r["user_id"]) for r in out] == want
    for r in out:
        n, mean_gap, cv = expected[r["user_id"]]
        assert r["n_gaps"] == n
        assert r["mean_gap_s"] == mean_gap
        assert r["gap_cv"] >= 0.0
