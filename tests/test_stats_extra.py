"""Independent-reference tests for queries/stats_extra.py: each query is
recomputed with plain Python/pandas/numpy (no Spark, no SQL) on the
sf0.001 fixture or on closed-form synthetic inputs, so a shared mistake
in the Spark query and its DuckDB oracle cannot hide."""

import math

import pandas as pd
import pytest

from hawaiidatapipeline_spark.queries import stats_extra

SF = "/root/testdata/sf0.001"


def test_agg_entropy_matches_math_log2(spark):
    pdf = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    got = {
        r["lang"]: r["source_entropy_bits"]
        for r in stats_extra.QUERIES["agg_entropy"](spark, SF).collect()
    }
    for lang, grp in pdf.groupby("lang"):
        p = grp["source"].value_counts(normalize=True)
        want = float(-(p * p.map(math.log2)).sum())
        assert got[lang] == pytest.approx(want, abs=1e-6)


def test_zipf_slope_matches_numpy_ols(spark):
    import numpy as np

    pdf = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    got = {
        r["lang"]: r["zipf_slope"]
        for r in stats_extra.QUERIES["llm_zipf_slope"](spark, SF).collect()
    }
    for lang, grp in pdf.groupby("lang"):
        toks = pd.Series(" ".join(grp["text"]).split(" "))
        freq = toks.value_counts()
        # rank ties broken by token, mirroring the query's (f DESC, token)
        ranked = (
            freq.rename("f").reset_index().rename(columns={"index": "token"})
            .sort_values(["f", "token"], ascending=[False, True])
            .head(100)
        )
        x = np.floor(np.log(np.arange(1, len(ranked) + 1)) * 1e6)
        y = np.floor(np.log(ranked["f"].to_numpy(dtype=float)) * 1e6)
        n = len(x)
        want = (n * (x * y).sum() - x.sum() * y.sum()) / (
            n * (x * x).sum() - x.sum() ** 2
        )
        assert got[lang] == pytest.approx(want, abs=1e-5)
        assert -3.0 < got[lang] < 0.0  # rank-frequency slope is negative


def test_autocorr_matches_pandas(spark):
    pdf = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    pdf["d"] = pdf["ts"].dt.date
    got = {
        r["event_type"]: r["autocorr_lag1"]
        for r in stats_extra.QUERIES["ts_autocorr"](spark, SF).collect()
    }
    for et, grp in pdf.groupby("event_type"):
        daily = grp.groupby("d").size().sort_index()
        want = float(daily.autocorr(lag=1))
        assert got[et] == pytest.approx(want, abs=1e-6)


def test_connected_components_match_union_find(spark):
    from hawaiidatapipeline_spark.operators.graph import copurchase_edges

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    edges = [(r["u"], r["v"]) for r in copurchase_edges(li).collect()]
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    sizes = pd.Series([find(n) for n in parent]).value_counts()
    want = sorted(sizes.tolist(), reverse=True)[:30]
    got = [
        r["n_nodes"]
        for r in stats_extra.QUERIES["graph_connected_components"](spark, SF).collect()
    ]
    assert got == want
    # component_id is the min node id of its component (hash-min contract)
    out = stats_extra.QUERIES["graph_connected_components"](spark, SF).collect()
    for r in out:
        assert r["component_id"] == r["min_node"]


def test_running_distinct_matches_pandas(spark):
    out = stats_extra.QUERIES["win_running_distinct"](spark, SF).toPandas()
    pdf = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    pdf = pdf[pdf["user_id"] % 13 == 0].sort_values(["user_id", "ts", "event_id"])
    for uid, grp in pdf.groupby("user_id"):
        seen: set[str] = set()
        want = []
        for et in grp["event_type"]:
            seen.add(et)
            want.append(len(seen))
        got = out[out["user_id"] == uid].sort_values("event_id")
        assert got["distinct_types_so_far"].tolist() == want


def test_first_touch_conserves_purchases(spark):
    pdf = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    out = stats_extra.QUERIES["events_first_touch"](spark, SF).toPandas()
    buyers = pdf[pdf["event_type"] == "purchase"]["user_id"].nunique()
    assert out["n_converting_users"].sum() == buyers
    assert out["total_purchases"].sum() == (pdf["event_type"] == "purchase").sum()


def test_zscore_flags_match_pandas(spark):
    pdf = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    out = stats_extra.QUERIES["llm_doc_outlier_zscore"](spark, SF).toPandas()
    st = pdf.groupby("source")["n_chars"].agg(["mean", "std", "count"])
    z = (
        pdf["n_chars"] - pdf["source"].map(st["mean"])
    ) / pdf["source"].map(st["std"])
    want = set(pdf.loc[z.abs() > 1.5, "doc_id"])
    assert set(out["doc_id"]) == want


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_string_distance_matches_reference_dp(spark):
    out = stats_extra.QUERIES["fn_string_distance"](spark, SF).collect()
    assert out, "blocked join produced no pairs on the fixture"
    for r in out:
        assert r["name_a"] < r["name_b"]  # dedup orientation
        assert r["name_a"].split(" ")[0] == r["name_b"].split(" ")[0]  # same block
        assert r["edit_dist"] == _lev(r["name_a"], r["name_b"]) <= 12
