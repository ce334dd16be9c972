"""Invariant tests for the round-9 batch-4 queries (inference_extra +
scalepath_extra). The oracle hash proves engine-equivalence; these prove
the MATH — each statistic is replayed by an independent driver-side fold
over the same fixture, or checked against the bounds its definition
promises."""

import math

from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries import inference_extra, scalepath_extra
from hawaiidatapipeline_spark.registry import load_table

from .conftest import SF0001


def _values(spark, grp):
    e = load_table(spark, SF0001, "events")
    return [
        r["value"]
        for r in e.filter(F.col("event_type") == grp).select("value").collect()
    ]


def test_welch_t_matches_driver_fold(spark):
    """Recompute Welch's t and the Satterthwaite df from the raw values
    with the same milli-unit flooring — must agree exactly post-round."""
    row = inference_extra.QUERIES["agg_welch_t_test"](spark, SF0001).collect()[0]
    out = {}
    for grp in ("click", "purchase"):
        xm = [math.floor(v * 1000) for v in _values(spark, grp)]
        n, sx, sxx = len(xm), sum(xm), sum(x * x for x in xm)
        mean = sx / 1000.0 / n
        var = (sxx - float(sx) * float(sx) / n) / (n - 1) / 1e6
        out[grp] = (n, mean, var)
    (n1, m1, v1), (n2, m2, v2) = out["click"], out["purchase"]
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / math.sqrt(se2)
    df = se2**2 / ((v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1))
    assert row["n_click"] == n1 and row["n_purchase"] == n2
    assert row["t_stat"] == round(t, 6)
    assert row["df_welch"] == round(df, 6)
    # Welch df is bounded by min(n1,n2)-1 below and n1+n2-2 above
    assert min(n1, n2) - 1 <= row["df_welch"] <= n1 + n2 - 2


def test_chi2_cramers_v_matches_driver_fold(spark):
    row = inference_extra.QUERIES["agg_chi2_cramers_v"](spark, SF0001).collect()[0]
    o = load_table(spark, SF0001, "orders")
    cells = {}
    for r in o.groupBy("o_orderpriority", "o_orderstatus").count().collect():
        cells[(r[0], r[1])] = r["count"]
    rm, cm = {}, {}
    for (pr, st), n in cells.items():
        rm[pr] = rm.get(pr, 0) + n
        cm[st] = cm.get(st, 0) + n
    nn = sum(cells.values())
    chi_micro = 0
    for (pr, st), n in cells.items():
        e = rm[pr] * cm[st] / nn
        chi_micro += math.floor((n - e) ** 2 / e * 1e6)
    chi2 = chi_micro / 1e6
    assert row["n_orders"] == nn
    assert row["dof"] == (len(rm) - 1) * (len(cm) - 1)
    assert row["chi2"] == round(chi2, 6)
    v = math.sqrt(chi2 / (nn * min(len(rm) - 1, len(cm) - 1)))
    assert row["cramers_v"] == round(v, 6)
    assert 0.0 <= row["cramers_v"] <= 1.0


def test_srm_check_counts_and_formula(spark):
    row = inference_extra.QUERIES["agg_ab_srm_check"](spark, SF0001).collect()[0]
    e = load_table(spark, SF0001, "events")
    n_users = e.select("user_id").distinct().count()
    n0, n1 = row["n_control"], row["n_treatment"]
    assert n0 + n1 == n_users
    chi2 = (n0 - n1) ** 2 / (n0 + n1)
    assert row["chi2"] == round(chi2, 6)
    assert row["srm_flag"] == (chi2 > 3.841459)


def test_spearman_matches_driver_fold(spark):
    row = inference_extra.QUERIES["agg_spearman_corr"](spark, SF0001).collect()[0]
    li = load_table(spark, SF0001, "lineitem")
    xs, ys = zip(
        *[(r[0], r[1]) for r in li.select("l_quantity", "l_extendedprice").collect()]
    )

    def doubled_ranks(vals):
        # 2*avg_rank = 2*min_rank + (tie_count - 1): exact integers
        order = sorted(vals)
        first = {}
        count = {}
        for i, v in enumerate(order):
            first.setdefault(v, i + 1)
            count[v] = count.get(v, 0) + 1
        return [2 * first[v] + count[v] - 1 for v in vals]

    a, b = doubled_ranks(xs), doubled_ranks(ys)
    n = len(a)
    sa, sb = sum(a), sum(b)
    sab = sum(x * y for x, y in zip(a, b))
    saa = sum(x * x for x in a)
    sbb = sum(y * y for y in b)
    rho = (n * sab - float(sa) * sb) / math.sqrt(
        (n * saa - float(sa) * sa) * (n * sbb - float(sb) * sb)
    )
    assert row["n_rows"] == n
    assert abs(row["spearman_rho"] - round(rho, 6)) <= 1e-6
    assert -1.0 <= row["spearman_rho"] <= 1.0


def test_doubled_avg_rank_map_equals_serial_window(spark):
    """The distributed rank map (range-partitioned local cumsums + prefix
    offsets) must reproduce the single-partition Window.orderBy ranks
    exactly, including tie averaging — on a column with heavy ties."""
    from pyspark.sql import Window

    from hawaiidatapipeline_spark.operators.ranks import doubled_avg_rank_map

    li = load_table(spark, SF0001, "lineitem").select(
        F.col("l_quantity").alias("x")
    )
    got = {
        r["x"]: r["dbl"]
        for r in doubled_avg_rank_map(li, "x", "dbl").collect()
    }
    serial = li.select(
        "x",
        (
            2 * F.rank().over(Window.orderBy("x"))
            + F.count(F.lit(1)).over(Window.partitionBy("x"))
            - 1
        ).cast("long").alias("dbl"),
    )
    want = {r["x"]: r["dbl"] for r in serial.distinct().collect()}
    assert got == want
    # one rank per distinct value, and the top rank closes the telescope:
    # sum over rows of avg rank must be n(n+1)/2
    n = li.count()
    rows_sum = sum(
        got[r["x"]] for r in li.collect()
    )  # doubled ranks summed over all rows
    assert rows_sum == n * (n + 1)


def test_mutual_information_bounds(spark):
    row = inference_extra.QUERIES["dq_mutual_information"](spark, SF0001).collect()[0]
    # MI >= 0 up to the micro-floor slack (one ulp-of-grid per cell)
    assert row["mi_bits"] >= -row["n_cells"] * 1e-6
    assert row["nmi"] <= 1.0 + 1e-6
    d = load_table(spark, SF0001, "documents")
    assert row["n_docs"] == d.count()
    assert row["n_cells"] == d.select("lang", "source").distinct().count()


def test_ljung_box_acf_bounds_and_q_monotone(spark):
    rows = inference_extra.QUERIES["ts_ljung_box"](spark, SF0001).collect()
    assert [r["lag"] for r in rows] == list(range(1, 8))
    prev_q = 0.0
    for r in rows:
        assert -1.0 <= r["acf"] <= 1.0
        assert r["q_stat"] >= prev_q - 1e-9  # Q accumulates r_k^2 terms
        prev_q = r["q_stat"]
    # driver-side replay of lag-1 ACF over the daily counts
    e = load_table(spark, SF0001, "events")
    daily = sorted(
        (r[0], r[1])
        for r in e.groupBy(F.date_trunc("day", "ts").alias("d")).count().collect()
    )
    x = [c for _, c in daily]
    n, sx, sxx = len(x), sum(x), sum(v * v for v in x)
    m = sx / n
    c1 = sum(x[i] * x[i - 1] for i in range(1, n))
    sh, st = sum(x[: n - 1]), sum(x[1:])
    r1 = (c1 - m * (sh + st) + (n - 1) * m * m) / (sxx - sx * sx / n)
    assert rows[0]["acf"] == round(r1, 6)


def test_compaction_plan_conserves_bytes_and_days(spark):
    rows = scalepath_extra.QUERIES["etl_compaction_plan"](spark, SF0001).collect()
    assert rows
    e = load_table(spark, SF0001, "events")
    total = e.agg(
        F.sum(
            F.lit(32)
            + F.octet_length("event_type")
            + F.coalesce(F.octet_length("props"), F.lit(0))
        )
    ).collect()[0][0]
    n_days = e.select(F.date_trunc("day", "ts")).distinct().count()
    assert sum(r["total_bytes"] for r in rows) == total
    assert sum(r["n_partitions"] for r in rows) == n_days
    # file ids strictly increase and day ranges never overlap
    for a, b in zip(rows, rows[1:]):
        assert a["file_id"] < b["file_id"]
        assert a["last_day"] < b["first_day"]


def test_spatial_grid_equals_brute_force(spark):
    rows = scalepath_extra.QUERIES["join_spatial_grid"](spark, SF0001).collect()
    assert len(rows) == 25  # every nation present even with zero points
    c = load_table(spark, SF0001, "customer")
    pts = [
        ((k % 180 - 90) + 0.25, ((7 * k) % 360 - 180) + 0.25)
        for (k,) in c.select("c_custkey").collect()
    ]
    for r in rows:
        nk = r["n_nationkey"]
        lat0, lon0 = ((nk * 7) % 160) - 85, ((nk * 13) % 340) - 175
        want = sum(
            1
            for lat, lon in pts
            if lat0 <= lat <= lat0 + 8 and lon0 <= lon <= lon0 + 12
        )
        assert r["n_points"] == want


def test_feature_hashing_bucket_invariants(spark):
    rows = scalepath_extra.QUERIES["llm_feature_hashing"](spark, SF0001).collect()
    assert 0 < len(rows) <= 20
    tfs = [r["tf_total"] for r in rows]
    assert tfs == sorted(tfs, reverse=True)
    for r in rows:
        assert 0 <= r["bucket"] < 256
        assert r["n_tokens"] <= r["tf_total"]
        # signed sum of +-1 per token occurrence is bounded by volume
        assert abs(r["signed_sum"]) <= r["tf_total"]
        assert (r["signed_sum"] - r["tf_total"]) % 2 == 0


def test_mips_topk_equals_brute_force(spark):
    import numpy as np

    rows = scalepath_extra.QUERIES["emb_mips_topk"](spark, SF0001).collect()
    e = load_table(spark, SF0001, "embeddings").collect()
    ids = [r["vec_id"] for r in e]
    mat = np.array([r["embedding"] for r in e], dtype="float64")
    sims = mat @ mat.T
    pairs = []
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j]:
                pairs.append((round(sims[i, j], 6), ids[i], ids[j]))
    pairs.sort(key=lambda p: (-p[0], p[1], p[2]))
    want = [(b, c, a) for a, b, c in pairs[:20]]
    got = [(r["vec_a"], r["vec_b"], r["dot"]) for r in rows]
    assert got == want
    # raw inner product must NOT be the cosine ordering when norms vary
    norms = np.linalg.norm(mat, axis=1)
    assert norms.max() / norms.min() > 1.0001 or got == want


# ---------------------------------------------------------------- batch 5


def test_exists_correlated_predicates_hold(spark):
    from hawaiidatapipeline_spark.queries import sqlsurface_extra

    rows = sqlsurface_extra.QUERIES["subquery_exists_correlated"](
        spark, SF0001
    ).collect()
    assert rows
    o = load_table(spark, SF0001, "orders").collect()
    urgent = {r["o_custkey"] for r in o if r["o_orderpriority"] == "1-URGENT"}
    big_f = {
        r["o_custkey"]
        for r in o
        if r["o_orderstatus"] == "F" and r["o_totalprice"] > 200000
    }
    keys = [r["c_custkey"] for r in rows]
    assert keys == sorted(keys)  # ordered, limited
    for k in keys:
        assert k in urgent and k not in big_f


def test_interval_overlap_equals_brute_force(spark):
    import datetime as dt

    from hawaiidatapipeline_spark.queries import joins_extra

    row = joins_extra.QUERIES["join_interval_overlap"](spark, SF0001).collect()[0]
    o = load_table(spark, SF0001, "orders").collect()

    def side(priority, mod):
        out = []
        for r in o:
            if r["o_orderpriority"] == priority:
                s = r["o_orderdate"].date()
                out.append((s, s + dt.timedelta(days=r["o_orderkey"] % mod + 1)))
        return out

    a, b = side("1-URGENT", 5), side("2-HIGH", 7)
    n_pairs = total = 0
    for s1, e1 in a:
        for s2, e2 in b:
            if s1 <= e2 and s2 <= e1:
                n_pairs += 1
                total += (min(e1, e2) - max(s1, s2)).days + 1
    assert row["n_pairs"] == n_pairs
    assert row["total_overlap_days"] == total


def test_matryoshka_recall_matches_numpy(spark):
    import numpy as np

    from hawaiidatapipeline_spark.queries import emb_extra

    rows = emb_extra.QUERIES["emb_matryoshka_recall"](spark, SF0001).collect()
    assert [r["dims"] for r in rows] == [8, 16, 32]
    e = load_table(spark, SF0001, "embeddings").collect()
    ids = np.array([r["vec_id"] for r in e])
    q = np.round(np.array([r["embedding"] for r in e], dtype="float64") * 1000).astype(
        "int64"
    )
    probes = [i for i, v in enumerate(ids) if v % 23 == 0]
    n_probes = len(probes)

    def top10(dots, pi):
        # (dot DESC, cid ASC) total order, self excluded
        order = sorted(
            (int(-dots[j]), int(ids[j]))
            for j in range(len(ids))
            if ids[j] != ids[pi]
        )
        return {cid for _, cid in order[:10]}

    for r in rows:
        t = r["dims"]
        assert r["n_probes"] == n_probes
        hits = 0
        for pi in probes:
            full = top10(q[pi] @ q.T, pi)
            trunc = top10(q[pi, :t] @ q[:, :t].T, pi)
            hits += len(full & trunc)
        assert r["recall_at_10"] == round(hits / (10 * n_probes), 6)
        assert 0.0 <= r["recall_at_10"] <= 1.0


def test_proportion_z_matches_counts(spark):
    import math

    row = inference_extra.QUERIES["events_ab_proportion_z"](spark, SF0001).collect()[0]
    e = load_table(spark, SF0001, "events")
    n_users = e.select("user_id").distinct().count()
    n0, n1 = row["n_control"], row["n_treatment"]
    x0, x1 = row["conv_control"], row["conv_treatment"]
    assert n0 + n1 == n_users
    assert 0 <= x0 <= n0 and 0 <= x1 <= n1
    p0, p1, pp = x0 / n0, x1 / n1, (x0 + x1) / (n0 + n1)
    se = math.sqrt(pp * (1 - pp) * (1 / n0 + 1 / n1))
    if se > 0:
        assert row["z_score"] == round((p1 - p0) / se, 6)
    else:
        # degenerate arm (everyone or no one converted): z is NULL by design
        assert row["z_score"] is None
    assert row["cvr_control"] == round(p0, 6)
    assert row["cvr_treatment"] == round(p1, 6)


# ---------------------------------------------------------------- batch 6


def test_markov_next_accuracy_matches_transitions(spark):
    from hawaiidatapipeline_spark.queries import events as ev

    rows = ev.QUERIES["events_markov_next_accuracy"](spark, SF0001).collect()
    assert rows
    trans = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in ev.QUERIES["events_transition_matrix"](spark, SF0001).collect()
    }
    for r in rows:
        outgoing = {b: n for (a, b), n in trans.items() if a == r["event_type"]}
        assert r["n_transitions"] == sum(outgoing.values())
        # deterministic tie-break: count desc, type asc
        best_n = max(outgoing.values())
        cand = sorted(b for b, n in outgoing.items() if n == best_n)
        assert r["predicted_next"] == cand[0]
        assert r["n_correct"] == best_n
        assert r["hit_rate"] == round(best_n / sum(outgoing.values()), 6)
        assert 0.0 < r["hit_rate"] <= 1.0


def test_hard_negatives_label_and_rank_invariants(spark):
    import numpy as np

    from hawaiidatapipeline_spark.queries import emb_extra

    rows = emb_extra.QUERIES["emb_hard_negatives"](spark, SF0001).collect()
    assert rows
    by_pid = {}
    for r in rows:
        assert r["neg_label"] != r["p_label"]
        by_pid.setdefault(r["pid"], []).append(r)
    e = load_table(spark, SF0001, "embeddings").collect()
    ids = np.array([r["vec_id"] for r in e])
    labels = {r["vec_id"]: r["label"] for r in e}
    q = np.round(
        np.array([r["embedding"] for r in e], dtype="float64") * 1000
    ).astype("int64")
    idx_of = {v: i for i, v in enumerate(ids)}
    for pid, rs in by_pid.items():
        assert [r["rn"] for r in rs] == list(range(1, len(rs) + 1))
        dots = q[idx_of[pid]] @ q.T
        cands = sorted(
            (int(-dots[idx_of[v]]), int(v))
            for v in ids
            if v != pid and labels[v] != labels[pid]
        )
        want = [(v, -d) for d, v in cands[:5]]
        got = [(r["neg_id"], r["dot_q"]) for r in rs]
        assert got == want


def test_mixture_temperature_weights(spark):
    from hawaiidatapipeline_spark.queries import training_extra

    rows = training_extra.QUERIES["llm_mixture_temperature"](spark, SF0001).collect()
    assert rows
    total = sum(r["n_docs"] for r in rows)
    for col in ("w_t03", "w_t07", "w_t10"):
        s = sum(r[col] for r in rows)
        assert abs(s - 1.0) < 1e-4  # rounding + micro-floor slack
    for r in rows:
        assert abs(r["w_t10"] - round(r["n_docs"] / total, 6)) <= 1e-6
    # temperature < 1 compresses the head: the largest source's share
    # must shrink as T drops
    big = max(rows, key=lambda r: r["n_docs"])
    assert big["w_t03"] <= big["w_t07"] <= big["w_t10"]


def test_embedding_drift_matches_numpy(spark):
    import numpy as np

    from hawaiidatapipeline_spark.queries import emb_extra

    rows = emb_extra.QUERIES["dq_embedding_drift"](spark, SF0001).collect()
    assert rows
    e = load_table(spark, SF0001, "embeddings").collect()
    by = {}
    for r in e:
        q = np.round(np.array(r["embedding"], dtype="float64") * 1000).astype("int64")
        by.setdefault((r["label"], r["vec_id"] % 2), []).append(q)
    for r in rows:
        old = by[(r["label"], 0)]
        new = by[(r["label"], 1)]
        assert r["n_old"] == len(old) and r["n_new"] == len(new)
        c_old = np.sum(old, axis=0) / len(old)
        c_new = np.sum(new, axis=0) / len(new)
        t = sum(math.floor(d * d * 1e6) for d in (c_old - c_new))
        want = round(math.sqrt(t / 1e6) / 1000.0, 6)
        assert r["centroid_drift"] == want
        assert r["centroid_drift"] >= 0.0
