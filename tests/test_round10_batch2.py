"""Round-10 batch-2 invariants. The oracle hash proves engine
equivalence; these prove the MATH — each statistic replayed by an
independent driver-side fold over the same fixture, or checked against
bounds its definition promises."""

import math

from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries import round10_extra
from hawaiidatapipeline_spark.registry import load_table

from .conftest import SF0001


def _cents_per_cust(spark):
    o = load_table(spark, SF0001, "orders")
    return [
        r["cents"]
        for r in o.groupBy("o_custkey")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("cents")
        )
        .collect()
    ]


def test_percentile_grid_matches_driver_fold(spark):
    """Each grid point must be the smallest value whose cumulative count
    reaches ceil(p*n/100) — replayed by sorting all cents driver-side."""
    o = load_table(spark, SF0001, "orders")
    cents = sorted(
        r["c"]
        for r in o.select(
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("c")
        ).collect()
    )
    n = len(cents)
    got = {
        r["p"]: (r["n_rows"], r["quantile"])
        for r in round10_extra.QUERIES["agg_percentile_exact_grid"](
            spark, SF0001
        ).collect()
    }
    for p in (25, 50, 75, 90, 99):
        target = -(-p * n // 100)  # ceil
        want = round(cents[target - 1] / 100.0, 2)
        assert got[p] == (n, want), (p, got[p], want)


def test_theil_indices_match_driver_fold(spark):
    """Theil T and L recomputed with the same floored-term grid."""
    xs = _cents_per_cust(spark)
    n, total = len(xs), sum(xs)
    sum_xlnx_milli = sum(math.floor(x * math.log(x) * 1000) for x in xs)
    sum_lnx_micro = sum(math.floor(math.log(x) * 1000000) for x in xs)
    ln_mu = math.log(total / n)
    want_t = round((sum_xlnx_milli / 1000.0) / total - ln_mu, 6)
    want_l = round(ln_mu - (sum_lnx_micro / 1000000.0) / n, 6)
    row = round10_extra.QUERIES["agg_theil_index"](spark, SF0001).collect()[0]
    assert row["n"] == n and row["total"] == total
    assert abs(row["theil_t"] - want_t) <= 1e-6
    assert abs(row["theil_l"] - want_l) <= 1e-6
    # both indices are non-negative and 0 only under perfect equality
    assert row["theil_t"] >= 0 and row["theil_l"] >= 0


def test_jaccard_links_bounds_and_nonadjacency(spark):
    """Jaccard scores live in (0, 1]; returned pairs are non-adjacent and
    cn <= min(deg) by construction."""
    rows = round10_extra.QUERIES["graph_jaccard_links"](spark, SF0001).collect()
    assert 0 < len(rows) <= 50
    for r in rows:
        assert 0 < r["jaccard"] <= 1.0
        assert r["common_neighbors"] >= 1
        assert r["part_a"] < r["part_b"]
    # descending by rounded score with (a, b) tie-breaks
    keys = [(-r["jaccard"], r["part_a"], r["part_b"]) for r in rows]
    assert keys == sorted(keys)


def test_row_count_anomaly_z_matches_fold(spark):
    """z-score for one armed day replayed from the raw daily counts."""
    e = load_table(spark, SF0001, "events")
    daily = sorted(
        (r["day"], r["n"])
        for r in e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    got = {
        r["day"]: (r["z_score"], r["is_anomaly"])
        for r in round10_extra.QUERIES["dq_row_count_anomaly"](
            spark, SF0001
        ).collect()
    }
    assert got, "no armed days"
    for i, (day, n) in enumerate(daily):
        trail = [x for _, x in daily[max(0, i - 28) : i]]
        k = len(trail)
        if k < 7:
            assert day not in got
            continue
        s, ss = sum(trail), sum(x * x for x in trail)
        den = math.sqrt(max(k * ss - s * s, 1.0))
        want_z = round((n * k - s) / den, 6)
        assert abs(got[day][0] - want_z) <= 1e-6, day
        assert got[day][1] == (1 if abs(n * k - s) > 3 * den else 0)


def test_sequence_entropy_bounds(spark):
    """Per-user transition entropy is in [0, log2(n_patterns)] and the
    report is the 20 most active users in deterministic order."""
    rows = round10_extra.QUERIES["events_sequence_entropy"](spark, SF0001).collect()
    assert 0 < len(rows) <= 20  # sf0.001 has fewer than 20 users
    for r in rows:
        assert -1e-6 <= r["transition_entropy_bits"] <= math.log2(r["n_patterns"]) + 1e-6
        assert r["n_patterns"] <= r["n_trans"]
    ns = [(-r["n_trans"], r["user_id"]) for r in rows]
    assert ns == sorted(ns)


def test_uniqueness_report_key_column(spark):
    """The primary key shows uniqueness 1.0 and zero dup rows; every
    ratio is in (0, 1]."""
    rows = {
        r["col"]: r
        for r in round10_extra.QUERIES["dq_uniqueness_report"](
            spark, SF0001
        ).collect()
    }
    assert rows["o_orderkey"]["uniqueness"] == 1.0
    assert rows["o_orderkey"]["n_dup_rows"] == 0
    for r in rows.values():
        assert 0 < r["uniqueness"] <= 1.0
        assert r["n_rows"] == rows["o_orderkey"]["n_rows"]


def test_retention_triangle_offset_zero_is_full(spark):
    """Week-offset 0 retention is exactly 1.0 per cohort (everyone is
    active in their first week by definition), later offsets never
    exceed the cohort size, and cells partition the active grain."""
    rows = round10_extra.QUERIES["events_retention_triangle"](
        spark, SF0001
    ).collect()
    assert rows
    for r in rows:
        if r["week_offset"] == 0:
            assert r["active_users"] == r["cohort_size"]
            assert r["retention"] == 1.0
        assert 0 <= r["week_offset"]
        assert r["active_users"] <= r["cohort_size"]


def test_oov_rate_complements_vocab_coverage(spark):
    """OOV rate bounds: in (0,1]; a language's in-vocab + OOV occurrences
    partition its token stream; global OOV occurrences equal total
    occurrences minus top-1000-vocab occurrences."""
    rows = round10_extra.QUERIES["llm_oov_rate"](spark, SF0001).collect()
    assert rows
    d = load_table(spark, SF0001, "documents")
    total = d.select(F.explode(F.split("text", " ")).alias("t")).count()
    assert sum(r["n_occurrences"] for r in rows) == total
    for r in rows:
        assert 0 <= r["oov_occurrences"] <= r["n_occurrences"]
        assert 0 <= r["oov_rate"] <= 1


def test_mixture_epochs_budget_and_cap(spark):
    """Allocations must (a) never exceed the 4-epoch cap, (b) sum to at
    most the 2x budget (integer truncation only loses tokens), and (c)
    rank by sqrt weight."""
    rows = round10_extra.QUERIES["llm_mixture_epochs"](spark, SF0001).collect()
    total = sum(r["tokens"] for r in rows)
    assert sum(r["alloc_tokens"] for r in rows) <= 2 * total
    for r in rows:
        assert r["epochs_milli"] <= 4000
        assert (r["capped"] == 1) == (
            r["alloc_tokens"] * 1000 // r["tokens"] > 4000
        )
    ws = sorted(rows, key=lambda r: r["tokens"])
    for lo, hi in zip(ws, ws[1:]):
        assert lo["weight"] <= hi["weight"] + 1e-9


def test_fingerprint_overlap_pairs_catch_planted_dup(spark):
    """A document that shares a long span with another must surface as a
    high-containment pair; scores live in (0,1] and ordering is by the
    rounded score with deterministic tie-breaks."""
    rows = round10_extra.QUERIES["llm_fingerprint_overlap_pairs"](
        spark, SF0001
    ).collect()
    for r in rows:
        assert r["shared"] >= 3
        assert 0 < r["containment"] <= 1.0
        assert r["doc_a"] < r["doc_b"]
    keys = [(-r["containment"], r["doc_a"], r["doc_b"]) for r in rows]
    assert keys == sorted(keys)


def test_mahalanobis_scores_match_driver_fold(spark):
    """Top outlier's integer score replayed driver-side with the same
    truncating-division grid."""
    e = load_table(spark, SF0001, "embeddings").collect()
    vecs = {r["vec_id"]: [round(v * 1000000) for v in r["embedding"]] for r in e}
    dims = len(next(iter(vecs.values())))
    n = len(vecs)
    mu, var = [], []
    for i in range(dims):
        col = [v[i] for v in vecs.values()]
        s, ss = sum(col), sum(x * x for x in col)
        m = s // n if s >= 0 else -((-s) // n)  # truncation toward zero
        ms = ss // n
        mu.append(m)
        var.append(ms - m * m)
    want = {}
    for vid, v in vecs.items():
        t = 0
        for i in range(dims):
            denom = max(var[i] // 1000000, 1)
            t += ((v[i] - mu[i]) * (v[i] - mu[i])) // denom
        want[vid] = t
    got = round10_extra.QUERIES["emb_mahalanobis_outliers"](spark, SF0001).collect()
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[: len(got)]
    assert [(r["vec_id"], r["maha_score"]) for r in got] == top


def test_effect_sizes_match_welch_inputs(spark):
    """Cohen's d replayed from the raw milli-floored values; Hedges g is
    a strict shrinkage of d."""
    e = load_table(spark, SF0001, "events")
    vals = {}
    for grp in ("click", "purchase"):
        xs = [
            math.floor(r["value"] * 1000)
            for r in e.filter(F.col("event_type") == grp).select("value").collect()
        ]
        vals[grp] = xs
    n1, n2 = len(vals["click"]), len(vals["purchase"])
    m = {g: sum(x) / len(x) / 1000 for g, x in vals.items()}
    v = {
        g: (sum(x * x for x in xs) - sum(xs) ** 2 / len(xs)) / (len(xs) - 1) / 1e6
        for g, xs in vals.items()
    }
    pooled = math.sqrt(
        ((n1 - 1) * v["click"] + (n2 - 1) * v["purchase"]) / (n1 + n2 - 2)
    )
    want_d = round((m["click"] - m["purchase"]) / pooled, 6)
    row = round10_extra.QUERIES["agg_effect_sizes"](spark, SF0001).collect()[0]
    assert row["n_click"] == n1 and row["n_purchase"] == n2
    assert abs(row["cohens_d"] - want_d) <= 1e-6
    assert abs(row["hedges_g"]) < abs(row["cohens_d"])


def test_ohlc_bars_invariants(spark):
    """low <= open/close <= high per day; open/close match the first/last
    rows under the (ts, event_id) total order, replayed driver-side for
    one day."""
    rows = round10_extra.QUERIES["ts_ohlc_bars"](spark, SF0001).collect()
    assert rows
    for r in rows:
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]
        assert r["n_events"] >= 1
    day0 = rows[0]["day"]
    e = load_table(spark, SF0001, "events")
    day_rows = sorted(
        (r["ts"], r["event_id"], math.floor(r["value"] * 100))
        for r in e.filter(F.date_trunc("day", "ts") == day0)
        .select("ts", "event_id", "value")
        .collect()
    )
    assert rows[0]["open"] == round(day_rows[0][2] / 100.0, 2)
    assert rows[0]["close"] == round(day_rows[-1][2] / 100.0, 2)


def test_nprobe_cost_curve_monotone(spark):
    """Candidate volume grows monotonically with nprobe; nprobe = K
    (here 4) touches the whole corpus minus self; every candidate count
    is non-negative."""
    from hawaiidatapipeline_spark.queries import ivfpq

    rows = {
        r["nprobe"]: r
        for r in ivfpq.QUERIES["emb_ivf_nprobe_cost_curve"](
            spark, SF0001
        ).collect()
    }
    assert set(rows) == {1, 2, 4}
    assert (
        rows[1]["avg_candidates"]
        <= rows[2]["avg_candidates"]
        <= rows[4]["avg_candidates"]
    )
    n = load_table(spark, SF0001, "embeddings").count()
    # nprobe=4 admits all K=4 cells: exactly corpus-minus-self per probe
    assert rows[4]["avg_candidates"] == n - 1
    assert abs(rows[4]["corpus_pct"] - round((n - 1) / n * 100, 6)) <= 1e-6
    for r in rows.values():
        assert r["max_candidates"] >= r["avg_candidates"] >= 0


def test_group_median_matches_driver_fold(spark):
    """Per-group lower median replayed by sorting each group's cents."""
    o = load_table(spark, SF0001, "orders")
    groups = {}
    for r in o.select(
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    ).collect():
        groups.setdefault(r["o_orderpriority"], []).append(r["cents"])
    got = {
        r["priority"]: (r["n_rows"], r["median"])
        for r in round10_extra.QUERIES["agg_group_median_exact"](
            spark, SF0001
        ).collect()
    }
    assert set(got) == set(groups)
    for g, xs in groups.items():
        xs.sort()
        want = round(xs[(len(xs) + 1) // 2 - 1] / 100.0, 2)
        assert got[g] == (len(xs), want), g


def test_bollinger_bands_invariants(spark):
    """Bands bracket the moving average; a breakout day is strictly
    outside its band (replayed in exact integers for every armed day)."""
    rows = round10_extra.QUERIES["ts_bollinger_bands"](spark, SF0001).collect()
    assert rows
    e = load_table(spark, SF0001, "events")
    daily = sorted(
        (r["day"], r["cents"])
        for r in e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents")
        )
        .collect()
    )
    by_day = {r["day"]: r for r in rows}
    for i in range(6, len(daily)):
        day, x = daily[i]
        win = [c for _, c in daily[i - 6 : i + 1]]
        k, s, ss = len(win), sum(win), sum(c * c for c in win)
        flag = 0
        if (x * k - s) ** 2 > 4 * (ss * k - s * s):
            flag = 1 if x * k > s else -1
        r = by_day[day]
        assert r["breakout"] == flag, day
        assert r["lower_band"] <= r["ma7"] <= r["upper_band"]


def test_schema_merge_null_fills_old_batch(spark):
    """Rows from the pre-evolution batch carry NULL n_regionkey; rows
    from the new batch carry the true value; nothing is lost."""
    df = round10_extra.QUERIES["scan_schema_merge"](spark, SF0001)
    rows = df.collect()
    n = load_table(spark, SF0001, "nation")
    assert len(rows) == n.count()
    for r in rows:
        if r["n_nationkey"] < 12:
            assert r["n_regionkey"] is None
        else:
            assert r["n_regionkey"] is not None


def test_lang_id_eval_matrix_partitions_corpus(spark):
    """Confusion cells partition the corpus; row shares sum to 1 per
    label; diagonal share equals per-label recall of llm_lang_id."""
    from hawaiidatapipeline_spark.queries import textanalysis

    rows = textanalysis.QUERIES["llm_lang_id_eval"](spark, SF0001).collect()
    n_docs = load_table(spark, SF0001, "documents").count()
    assert sum(r["n"] for r in rows) == n_docs
    by_label = {}
    for r in rows:
        by_label.setdefault(r["labeled_lang"], []).append(r)
    for label, cells in by_label.items():
        assert abs(sum(c["row_share"] for c in cells) - 1.0) <= 1e-4
        assert all(c["label_total"] == cells[0]["label_total"] for c in cells)


def test_markov_attribution_invariants(spark):
    """Removal effects are in [0,1]; credit shares sum to ~1; removing a
    channel can only LOWER the truncated conversion probability (checked
    structurally by removal >= 0); p_conv matches a driver-side replay of
    the same integer DP from independently recomputed transition
    counts."""
    from hawaiidatapipeline_spark.queries import attribution_extra as ax

    rows = ax.QUERIES["events_attribution_markov"](spark, SF0001).collect()
    assert {r["channel"] for r in rows} == set(ax._MK_CHANNELS)
    # truncating division loses up to 1 micro per channel
    assert abs(sum(r["credit_share"] for r in rows) - 1.0) <= 5e-6
    for r in rows:
        assert 0.0 <= r["removal_effect"] <= 1.0
        assert 0.0 < r["p_conv"] <= 1.0

    # independent journey fold -> transition counts -> same DP
    e = load_table(spark, SF0001, "events").collect()
    fp = {}
    for r in e:
        if r["event_type"] == "purchase":
            fp[r["user_id"]] = min(fp.get(r["user_id"], r["ts"]), r["ts"])
    touches = {}
    for r in e:
        if r["event_type"] in ax._MK_CHANNELS and (
            r["user_id"] not in fp or r["ts"] < fp[r["user_id"]]
        ):
            touches.setdefault(r["user_id"], []).append(
                (r["ts"], r["event_id"], r["event_type"])
            )
    trans = {}

    def bump(s, d):
        trans[(s, d)] = trans.get((s, d), 0) + 1

    for u, ts in touches.items():
        ts.sort()
        bump("START", ts[0][2])
        for a, b in zip(ts, ts[1:]):
            bump(a[2], b[2])
        bump(ts[-1][2], "CONV" if u in fp else "DROP")
    for u in fp:
        if u not in touches:
            bump("START", "CONV")
    totals = {}
    for (s, _), n in trans.items():
        totals[s] = totals.get(s, 0) + n
    p = {"CONV": 1000000}
    for _ in range(ax._MK_STEPS):
        nxt = {}
        for (s, d), n in trans.items():
            nxt[s] = nxt.get(s, 0) + n * p.get(d, 0)
        p = {s: v // totals[s] for s, v in nxt.items()}
        p["CONV"] = 1000000
    assert rows[0]["p_conv"] == round(max(p.get("START", 0), 1) / 1e6, 6)


def test_partition_skew_report_fold(spark):
    """Summary row replayed from raw month counts, including the
    quantile_disc median convention."""
    import math as _m

    o = load_table(spark, SF0001, "orders")
    ns = sorted(
        r["n"]
        for r in o.groupBy(F.date_trunc("month", "o_orderdate").alias("m"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    rows = round10_extra.QUERIES["dq_partition_skew_report"](
        spark, SF0001
    ).collect()
    assert len(rows) == 3
    median = ns[_m.ceil(len(ns) * 0.5) - 1]
    for r in rows:
        assert r["n_parts"] == len(ns)
        assert r["total"] == sum(ns)
        assert r["min_rows"] == ns[0] and r["max_rows"] == ns[-1]
        assert r["median_rows"] == median
        assert r["skew_factor"] == round(ns[-1] / median, 6)
    assert [r["top_rows"] for r in rows] == sorted(ns[-3:], reverse=True)


def test_new_vs_returning_partitions_dau(spark):
    """new + returning = distinct active users per day; the first day of
    the fixture has zero returning users."""
    rows = round10_extra.QUERIES["events_new_vs_returning"](
        spark, SF0001
    ).collect()
    assert rows
    assert rows[0]["returning_users"] == 0
    e = load_table(spark, SF0001, "events")
    dau = {
        r["day"]: r["n"]
        for r in e.select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r["new_users"] + r["returning_users"] == dau[r["day"]]
