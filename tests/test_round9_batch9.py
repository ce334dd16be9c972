"""Invariant tests for the round-9 batch-9 queries (point-in-time
features, curriculum staging, Data Vault keys, rich-club coefficient,
cross-video frame dedup). Driver-side folds replay the math the oracle
hashes can't explain on their own."""

import hashlib
import math
from collections import defaultdict

from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries import (
    graph_demo,
    multimodal,
    training_extra,
    warehouse_extra,
)
from hawaiidatapipeline_spark.registry import load_table

from .conftest import SF0001


def test_pit_features_leakage_free_fold(spark):
    """Replay the trailing-7d strictly-before window per purchase and
    prove no same-instant or post-purchase event leaks in."""
    rows = load_table(spark, SF0001, "events").collect()
    ev = [
        (
            r["user_id"],
            int(r["ts"].timestamp() * 0) or r["ts"],  # keep datetime
            r["event_type"],
            r["event_id"],
            math.floor(r["value"] * 1000),
        )
        for r in rows
        if r["event_type"] in ("click", "view", "purchase")
    ]
    by_user = defaultdict(list)
    for u, ts, et, eid, vm in ev:
        by_user[u].append((ts, et, eid, vm))
    win_us = training_extra._PIT_WINDOW_US
    expected = {}
    for u, lst in by_user.items():
        for ts, et, eid, vm in lst:
            if et != "purchase":
                continue
            t_us = int(ts.timestamp() * 1e6)
            c = v = cv = 0
            for ts2, et2, _, vm2 in lst:
                t2 = int(ts2.timestamp() * 1e6)
                if t_us - win_us <= t2 <= t_us - 1:
                    if et2 == "click":
                        c += 1
                        cv += vm2
                    elif et2 == "view":
                        v += 1
            expected[eid] = (u, c, v, cv)
    out = training_extra.QUERIES["events_pit_features"](spark, SF0001).collect()
    assert len(out) == len(expected)
    for r in out:
        u, c, v, cv = expected[r["purchase_id"]]
        assert (r["user_id"], r["clicks_7d"], r["views_7d"],
                r["click_value_7d_milli"]) == (u, c, v, cv)


def test_curriculum_stages_partition_docs(spark):
    out = training_extra.QUERIES["llm_curriculum_order"](spark, SF0001).collect()
    docs = load_table(spark, SF0001, "documents").collect()
    diffs = sorted(len(r["text"].split(" ")) for r in docs)
    n = len(diffs)
    # stages tile the corpus exactly, are ordered easy->hard, disjoint
    assert sum(r["n_docs"] for r in out) == n
    assert sum(r["total_tokens"] for r in out) == sum(diffs)
    bounds = [(r["min_difficulty"], r["max_difficulty"]) for r in out]
    assert all(lo <= hi for lo, hi in bounds)
    assert all(
        prev_hi < lo for (_, prev_hi), (lo, _) in zip(bounds, bounds[1:])
    )
    # value-grain quantile rule: stage = ceil(4*cum_count/N), ties together
    cum = 0
    by_diff = {}
    for d in diffs:
        cum += 1
        by_diff[d] = cum  # last (inclusive) cumulative count per value
    for r in out:
        for d, c in by_diff.items():
            if r["min_difficulty"] <= d <= r["max_difficulty"]:
                assert min(4, math.ceil(4.0 * c / n)) == r["stage"]


def test_data_vault_keys_md5_and_cardinality(spark):
    out = warehouse_extra.QUERIES["etl_data_vault_keys"](spark, SF0001).collect()
    orders = load_table(spark, SF0001, "orders").collect()
    assert len(out) == 10
    n_links = out[0]["n_links"]
    assert n_links == len(orders)
    assert out[0]["n_hub_orders"] == len({r["o_orderkey"] for r in orders})
    assert out[0]["n_hub_customers"] == len({r["o_custkey"] for r in orders})
    keys = [r["link_key"] for r in out]
    assert keys == sorted(keys)
    for r in out:
        assert r["hub_customer_key"] == hashlib.md5(
            f"C|{r['custkey']}".encode()
        ).hexdigest()
        assert r["link_key"] == hashlib.md5(
            f"CO|{r['custkey']}|{r['orderkey']}".encode()
        ).hexdigest()


def test_rich_club_matches_fold_and_is_bounded(spark):
    from hawaiidatapipeline_spark.operators.graph import copurchase_edges

    li = load_table(spark, SF0001, "lineitem")
    edges = [(r["u"], r["v"]) for r in copurchase_edges(li).collect()]
    deg = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    out = graph_demo.QUERIES["graph_rich_club"](spark, SF0001).collect()
    got_ks = [r["degree_threshold"] for r in out]
    assert got_ks == sorted(graph_demo._RICH_CLUB_KS)
    for r in out:
        k = r["degree_threshold"]
        club = {n for n, d in deg.items() if d > k}
        e_k = sum(1 for u, v in edges if u in club and v in club)
        assert r["n_nodes"] == len(club)
        assert r["n_edges"] == e_k
        if len(club) >= 2:
            phi = 2.0 * e_k / (len(club) * (len(club) - 1.0))
            assert r["phi"] == round(phi, 6)
            assert 0.0 <= r["phi"] <= 1.0
        else:
            assert r["phi"] is None
    # density of the club never DECREASES the edge count as k drops
    edge_counts = [r["n_edges"] for r in out]
    assert edge_counts == sorted(edge_counts, reverse=True)


def test_frame_dedup_matches_planted_duplicates(spark):
    """The synthetic corpus plants exact cross-video dups at id+256 —
    every reported bucket must hold frames with identical decoded
    fingerprints, recomputed here from the generator formula."""
    out = multimodal.QUERIES["multimodal_frame_dedup"](spark, SF0001).collect()
    docs = [r["doc_id"] for r in
            load_table(spark, SF0001, "documents").collect()]
    fps = defaultdict(list)
    for i in docs:
        for f in range(3 + i % 4):
            fp = (
                ((i + 11 * f) % 256) * 65536
                + ((3 * i + 5 * f) % 256) * 256
                + ((7 * i + f) % 256)
            )
            fps[fp].append(i)
    expected = {
        fp: (len(ids), len(set(ids)), min(ids), max(ids))
        for fp, ids in fps.items()
        if len(set(ids)) >= 2
    }
    got = {
        r["fingerprint"]: (
            r["n_frames"], r["n_videos"], r["min_video"], r["max_video"]
        )
        for r in out
    }
    assert got == expected
    # planted structure: duplicate videos are exactly 256 ids apart
    for fp, (_, _, lo, hi) in got.items():
        assert (hi - lo) % 256 == 0 and hi != lo
