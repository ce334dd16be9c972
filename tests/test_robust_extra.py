"""Independent-reference tests for queries/robust_extra.py: each query is
recomputed with plain Python/pandas (no Spark, no SQL) on the sf0.001
fixture, so a shared mistake in the Spark query and its DuckDB oracle
cannot hide."""

import pandas as pd
import pytest

from hawaiidatapipeline_spark.queries import robust_extra

SF = "/root/testdata/sf0.001"


def _daily_counts(spark):
    pdf = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    pdf["day"] = pdf["ts"].dt.normalize()
    return pdf.groupby(["event_type", "day"]).size().rename("n").reset_index()


def test_ewma_dyadic_matches_python(spark):
    daily = _daily_counts(spark)
    got = robust_extra.QUERIES["ts_ewma_dyadic"](spark, SF).toPandas()
    want = {}
    for et, grp in daily.groupby("event_type"):
        ns = grp.sort_values("day")["n"].tolist()
        days = grp.sort_values("day")["day"].tolist()
        for t in range(len(ns)):
            num = den = 0
            for k in range(8):
                if t - k >= 0:
                    num += ns[t - k] * (1 << (7 - k))
                    den += 1 << (7 - k)
            want[(et, days[t])] = round(num / den, 6)
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[(r.event_type, pd.Timestamp(r.day))] == pytest.approx(
            r.ewma, abs=1e-9
        )


def test_theil_sen_matches_python_lower_median(spark):
    daily = _daily_counts(spark)
    epoch = pd.Timestamp("1970-01-01")
    got = {
        r["event_type"]: (r["n_pairs"], r["theil_sen_slope"])
        for r in robust_extra.QUERIES["ts_theil_sen_trend"](spark, SF).collect()
    }
    for et, grp in daily.groupby("event_type"):
        g = grp.sort_values("day")
        xs = [(d - epoch).days for d in g["day"]]
        ns = g["n"].tolist()
        slopes = [
            ((ns[j] - ns[i]) / (xs[j] - xs[i]), xs[i], xs[j])
            for i in range(len(xs))
            for j in range(i + 1, len(xs))
        ]
        slopes.sort()
        n_pairs, want = len(slopes), slopes[(len(slopes) + 1) // 2 - 1][0]
        assert got[et][0] == n_pairs
        assert got[et][1] == pytest.approx(round(want, 6), abs=1e-9)


def test_skyline_matches_bruteforce_dominance(spark):
    pdf = (
        spark.read.parquet(f"{SF}/part.parquet")
        .toPandas()[["p_brand", "p_retailprice", "p_size"]]
        .drop_duplicates()
    )
    got = robust_extra.QUERIES["mine_skyline_2d"](spark, SF).toPandas()
    for brand, grp in pdf.groupby("p_brand"):
        pts = list(zip(grp["p_retailprice"], grp["p_size"]))
        want = {
            (x, y)
            for x, y in pts
            if not any(
                (x2 <= x and y2 >= y and (x2 < x or y2 > y)) for x2, y2 in pts
            )
        }
        have = {
            (r.p_retailprice, r.p_size)
            for r in got[got["p_brand"] == brand].itertuples()
        }
        assert have == want, brand


def test_candidate_keys_matches_pandas_nunique(spark):
    pdf = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    got = {
        r["combo"]: (r["n_rows"], r["n_distinct"], r["is_key"])
        for r in robust_extra.QUERIES["dq_candidate_keys"](spark, SF).collect()
    }
    assert len(got) == len(robust_extra._KEY_COMBOS)
    for cols in robust_extra._KEY_COMBOS:
        label = ",".join(cols)
        nd = len(pdf[list(cols)].drop_duplicates())
        assert got[label] == (len(pdf), nd, int(nd == len(pdf)))
    assert got["o_orderkey"][2] == 1  # primary key really is a key


def test_interval_coverage_matches_python_merge(spark):
    pdf = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    epoch = pd.Timestamp("1970-01-01")
    pdf["s"] = (pdf["l_shipdate"].dt.normalize() - epoch).dt.days
    pdf["e"] = pdf["s"] + pdf["l_quantity"].astype(int)
    got = {
        r["l_suppkey"]: (r["n_intervals"], r["covered_days"])
        for r in robust_extra.QUERIES["ts_interval_coverage"](spark, SF).collect()
    }
    for sk, grp in pdf.groupby("l_suppkey"):
        ivs = sorted(zip(grp["s"], grp["e"]))
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        assert got[sk] == (len(merged), sum(e - s for s, e in merged)), sk


def test_funnel_windowed_matches_python(spark):
    pdf = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    hour = pd.Timedelta(hours=1)
    t1 = pdf[pdf.event_type == "view"].groupby("user_id")["ts"].min()
    c = pdf[pdf.event_type == "click"].merge(
        t1.rename("t1"), left_on="user_id", right_index=True
    )
    t2 = (
        c[(c.ts > c.t1) & (c.ts <= c.t1 + hour)].groupby("user_id")["ts"].min()
    )
    p = pdf[pdf.event_type == "purchase"].merge(
        t2.rename("t2"), left_on="user_id", right_index=True
    )
    t3 = (
        p[(p.ts > p.t2) & (p.ts <= p.t2 + hour)].groupby("user_id")["ts"].min()
    )
    row = robust_extra.QUERIES["events_funnel_windowed"](spark, SF).collect()[0]
    assert (row["n_view"], row["n_click_1h"], row["n_purchase_1h"]) == (
        len(t1),
        len(t2),
        len(t3),
    )
    assert row["cr_click"] == pytest.approx(round(len(t2) / len(t1), 6), abs=1e-9)


def test_edge_support_matches_python_triangles(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    items = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    from collections import Counter, defaultdict

    per_order = items.groupby("l_orderkey")["l_partkey"].apply(sorted)
    pair_orders = Counter(
        (a, b)
        for parts in per_order
        for i, a in enumerate(parts)
        for b in parts[i + 1 :]
    )
    edges = {p for p, n in pair_orders.items() if n >= 2}
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    want = {
        (u, v): len(adj[u] & adj[v])
        for u, v in edges
        if len(adj[u] & adj[v]) > 0
    }
    got = {
        (r["u"], r["v"]): r["support"]
        for r in robust_extra.QUERIES["graph_edge_triangle_support"](
            spark, SF
        ).collect()
    }
    assert got == want


def test_ip_cidr_matches_python(spark):
    pdf = spark.read.parquet(f"{SF}/customer.parquet").toPandas()
    ips = ((pdf["c_custkey"] * 2654435761) % 4294967296).astype("int64")
    from collections import defaultdict

    groups = defaultdict(list)
    for ip in ips:
        label = "public"
        for cidr, pref, bdiv in robust_extra._CIDR_BLOCKS:
            if ip // bdiv == pref // bdiv:
                label = cidr
                break
        groups[label].append(int(ip))
    got = {
        r["cidr"]: (r["n_ips"], r["min_ip"], r["min_ip_dotted"])
        for r in robust_extra.QUERIES["fn_ip_cidr"](spark, SF).collect()
    }
    assert set(got) == set(groups)
    for label, members in groups.items():
        lo = min(members)
        dotted = f"{lo >> 24}.{(lo >> 16) & 255}.{(lo >> 8) & 255}.{lo & 255}"
        assert got[label] == (len(members), lo, dotted)
