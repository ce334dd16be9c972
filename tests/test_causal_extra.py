"""Invariant tests for the round-9 batch-7 causal/experimentation
queries (causal_extra). The oracle hash proves engine-equivalence;
these prove the MATH — each estimator is replayed by an independent
driver-side fold over the same fixture, or checked against the bounds
its definition promises."""

import math

from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.dedup import portable_hash64
from hawaiidatapipeline_spark.queries import causal_extra
from hawaiidatapipeline_spark.registry import load_table

from .conftest import SF0001

_SPLIT = causal_extra._SPLIT


def _events(spark):
    e = load_table(spark, SF0001, "events")
    return e.select(
        "user_id",
        "ts",
        "event_type",
        "value",
        F.pmod(portable_hash64(F.col("user_id").cast("string"), 7), F.lit(2))
        .alias("variant"),
    ).collect()


def test_cuped_matches_driver_fold(spark):
    """Replay theta/diff/rho2 from raw rows with the same milli-unit
    flooring — and CUPED must not move a zero-covariate effect."""
    from datetime import datetime

    split = datetime.fromisoformat(_SPLIT)
    rows = _events(spark)
    per = {}
    for r in rows:
        u = r["user_id"]
        x, y, v = per.get(u, (0, 0, r["variant"]))
        if r["ts"] < split and r["event_type"] in ("click", "view"):
            x += math.floor(r["value"] * 1000)
        if r["ts"] >= split and r["event_type"] == "purchase":
            y += math.floor(r["value"] * 1000)
        per[u] = (x, y, r["variant"])
    n = len(per)
    sx = sum(x for x, _, _ in per.values())
    sy = sum(y for _, y, _ in per.values())
    sxx = sum(x * x for x, _, _ in per.values())
    syy = sum(y * y for _, y, _ in per.values())
    sxy = sum(x * y for x, y, _ in per.values())
    n0 = sum(1 for _, _, v in per.values() if v == 0)
    n1 = n - n0
    sx0 = sum(x for x, _, v in per.values() if v == 0)
    sy0 = sum(y for _, y, v in per.values() if v == 0)
    sx1, sy1 = sx - sx0, sy - sy0
    theta = (n * float(sxy) - float(sx) * sy) / (n * float(sxx) - float(sx) * sx)
    rho2 = (n * float(sxy) - float(sx) * sy) ** 2 / (
        (n * float(sxx) - float(sx) * sx) * (n * float(syy) - float(sy) * sy)
    )
    diff_raw = sy1 / n1 / 1000.0 - sy0 / n0 / 1000.0
    xdiff = sx1 / n1 / 1000.0 - sx0 / n0 / 1000.0
    row = causal_extra.QUERIES["events_cuped_adjustment"](spark, SF0001).collect()[0]
    assert row["n_users"] == n and row["n_control"] == n0
    assert row["theta"] == round(theta, 6)
    assert row["diff_raw"] == round(diff_raw, 6)
    assert row["diff_cuped"] == round(diff_raw - theta * xdiff, 6)
    assert row["var_reduction_pct"] == round(rho2 * 100.0, 6)
    # rho² is a squared correlation — hard bounds
    assert 0.0 <= row["var_reduction_pct"] <= 100.0


def test_diff_in_diff_matches_cell_means(spark):
    from datetime import datetime

    split = datetime.fromisoformat(_SPLIT)
    cells = {}
    for r in _events(spark):
        if r["event_type"] != "purchase":
            continue
        key = (r["variant"], 0 if r["ts"] < split else 1)
        s, n = cells.get(key, (0, 0))
        cells[key] = (s + math.floor(r["value"] * 1000), n + 1)
    mean = {k: s / n / 1000.0 for k, (s, n) in cells.items()}
    did = (mean[(1, 1)] - mean[(1, 0)]) - (mean[(0, 1)] - mean[(0, 0)])
    row = causal_extra.QUERIES["events_diff_in_diff"](spark, SF0001).collect()[0]
    assert row["n_purchases"] == sum(n for _, n in cells.values())
    assert row["mean_control_pre"] == round(mean[(0, 0)], 6)
    assert row["mean_treatment_post"] == round(mean[(1, 1)], 6)
    assert row["did_estimate"] == round(did, 6)


def test_survival_km_matches_product_limit(spark):
    """Replay the product-limit estimator exactly (including the nano
    flooring of ln terms) and check the KM structural invariants."""
    rows = _events(spark)
    first_day, first_purchase = {}, {}
    obs_end = max(r["ts"] for r in rows).date()
    for r in rows:
        u, d = r["user_id"], r["ts"].date()
        first_day[u] = min(first_day.get(u, d), d)
        if r["event_type"] == "purchase":
            first_purchase[u] = min(first_purchase.get(u, d), d)
    life = []
    for u, fd in first_day.items():
        if u in first_purchase:
            life.append(((first_purchase[u] - fd).days, 1))
        else:
            life.append(((obs_end - fd).days, 0))
    by_dur = {}
    for dur, ch in life:
        lv, d = by_dur.get(dur, (0, 0))
        by_dur[dur] = (lv + 1, d + ch)
    total = len(life)
    out = causal_extra.QUERIES["events_survival_km"](spark, SF0001).collect()
    removed, cum_nano, dead = 0, 0, False
    exp_rows = []
    for dur in sorted(by_dur):
        lv, d = by_dur[dur]
        n_risk = total - removed
        removed += lv
        if d == 0:
            continue
        if d < n_risk and not dead:
            cum_nano += math.floor(math.log(1.0 - d / n_risk) * 1e9)
            s = math.exp(cum_nano / 1e9)
        else:
            dead = True
            s = 0.0
        exp_rows.append((dur, n_risk, d, round(s, 6)))
    got = [
        (r["duration_days"], r["n_at_risk"], r["churn_events"], r["survival"])
        for r in out
    ]
    assert got == exp_rows
    # survival is non-increasing and within [0, 1]
    survs = [r["survival"] for r in out]
    assert all(0.0 <= s <= 1.0 for s in survs)
    assert all(a >= b for a, b in zip(survs, survs[1:]))


def test_anova_f_matches_driver_fold(spark):
    o = load_table(spark, SF0001, "orders").collect()
    groups = {}
    n, s, ss = 0, 0, 0
    for r in o:
        x = math.floor(r["o_totalprice"])
        gn, gs = groups.get(r["o_orderpriority"], (0, 0))
        groups[r["o_orderpriority"]] = (gn + 1, gs + x)
        n, s, ss = n + 1, s + x, ss + x * x
    k = len(groups)
    sum_sg2 = sum(math.floor(float(gs) * gs / gn) for gn, gs in groups.values())
    ssb = sum_sg2 - math.floor(float(s) * s / n)
    ssw = ss - sum_sg2
    f = (ssb / (k - 1)) / (ssw / (n - k))
    row = causal_extra.QUERIES["agg_anova_f"](spark, SF0001).collect()[0]
    assert row["n_groups"] == k and row["n_rows"] == n
    assert row["ss_between"] == round(float(ssb), 6)
    assert row["ss_within"] == round(float(ssw), 6)
    assert row["f_stat"] == round(f, 6)
    assert row["ss_between"] >= 0 and row["ss_within"] >= 0


def test_benjamini_hochberg_step_up(spark):
    """BH adjusted p-values must equal the step-up fold of the raw
    p-values and preserve their order; rejections are a prefix."""
    out = causal_extra.QUERIES["agg_benjamini_hochberg"](spark, SF0001).collect()
    m = len(out)
    assert m == 5  # one test per market segment
    praw = [r["p_value"] for r in out]
    assert praw == sorted(praw)  # output is ordered by rank
    # step-up from the 9-dp raw p's (recompute from p_value at 6 dp is
    # too coarse — recheck monotone + bound relations instead)
    pbh = [r["p_bh"] for r in out]
    assert all(0.0 <= p <= 1.0 for p in pbh)
    assert pbh == sorted(pbh)  # BH never reorders
    for i, r in enumerate(out):
        # p_bh >= p_raw * m / rank is an identity of the step-up min
        assert r["p_bh"] <= 1.0
        assert r["p_bh"] >= r["p_value"] - 1e-6
    rejects = [r["reject_fdr_05"] for r in out]
    assert rejects == sorted(rejects, reverse=True)  # prefix property
    # the z-stat and counts agree with a direct Welch fold per segment
    c = load_table(spark, SF0001, "customer").collect()
    seg = {}
    for r in c:
        xc = math.floor(r["c_acctbal"] * 100)
        n, s, ss = seg.get(r["c_mktsegment"], (0, 0, 0))
        seg[r["c_mktsegment"]] = (n + 1, s + xc, ss + xc * xc)
    tn = sum(v[0] for v in seg.values())
    ts_ = sum(v[1] for v in seg.values())
    tss = sum(v[2] for v in seg.values())
    for r in out:
        ng, sg, ssg = seg[r["segment"]]
        nr, sr, ssr = tn - ng, ts_ - sg, tss - ssg
        vg = (ssg - float(sg) * sg / ng) / (ng - 1)
        vr = (ssr - float(sr) * sr / nr) / (nr - 1)
        z = (sg / ng - sr / nr) / math.sqrt(vg / ng + vr / nr)
        assert r["n_customers"] == ng
        assert r["z_stat"] == round(z, 6)


def test_stratified_ate_matches_fold(spark):
    """Replay the value-grain quartile assignment and per-stratum arm
    contrast; strata must tile the user population."""
    from datetime import datetime

    split = datetime.fromisoformat(_SPLIT)
    rows = _events(spark)
    per = {}
    for r in rows:
        u = r["user_id"]
        pre, y, v = per.get(u, (0, 0, r["variant"]))
        if r["ts"] < split:
            pre += 1
        if r["ts"] >= split and r["event_type"] == "purchase":
            y += math.floor(r["value"] * 1000)
        per[u] = (pre, y, r["variant"])
    n = len(per)
    from collections import Counter

    cnt = Counter(pre for pre, _, _ in per.values())
    cum = 0
    stratum_of = {}
    for v in sorted(cnt):
        cum += cnt[v]
        stratum_of[v] = min(4, math.ceil(4.0 * cum / n))
    cells = {}
    for pre, y, var in per.values():
        st = stratum_of[pre]
        c = cells.setdefault((st, var), [0, 0])
        c[0] += 1
        c[1] += y
    out = causal_extra.QUERIES["events_stratified_ate"](spark, SF0001).collect()
    assert sum(r["n_control"] + r["n_treatment"] for r in out) == n
    for r in out:
        n0, s0 = cells[(r["stratum"], 0)]
        n1, s1 = cells[(r["stratum"], 1)]
        assert (r["n_control"], r["n_treatment"]) == (n0, n1)
        assert r["mean_control"] == round(s0 / n0 / 1000.0, 6)
        assert r["stratum_effect"] == round(
            s1 / n1 / 1000.0 - s0 / n0 / 1000.0, 6
        )
