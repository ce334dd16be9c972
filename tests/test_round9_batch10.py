"""Invariant tests for the round-9 batch-10 queries (Shapley and
time-decay attribution, portable HLL, KMV merge proof)."""

import math
from collections import defaultdict

from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.dedup import portable_hash64
from hawaiidatapipeline_spark.queries import attribution_extra, sketches_extra
from hawaiidatapipeline_spark.registry import load_table

from .conftest import SF0001

_CH_BITS = dict(attribution_extra._CHANNELS)


def _events(spark):
    return load_table(spark, SF0001, "events").collect()


def test_shapley_matches_set_fold_and_conserves_credit(spark):
    rows = _events(spark)
    first_p = {}
    for r in rows:
        if r["event_type"] == "purchase":
            u = r["user_id"]
            first_p[u] = min(first_p.get(u, r["ts"]), r["ts"])
    masks = defaultdict(int)
    for r in rows:
        u = r["user_id"]
        if (
            u in first_p
            and r["event_type"] in _CH_BITS
            and r["ts"] < first_p[u]
        ):
            masks[u] |= _CH_BITS[r["event_type"]]
    sets = defaultdict(int)
    for u, m in masks.items():
        if m > 0:
            sets[m] += 1
    exp_credit = defaultdict(int)
    exp_users = defaultdict(int)
    for m, conv in sets.items():
        size = bin(m).count("1")
        for c, b in _CH_BITS.items():
            if m & b:
                exp_credit[c] += conv * 1000000 // size
                exp_users[c] += conv
    out = attribution_extra.QUERIES["events_attribution_shapley"](
        spark, SF0001
    ).collect()
    for r in out:
        assert r["n_users"] == exp_users[r["channel"]]
        assert r["credit"] == round(exp_credit[r["channel"]] / 1e6, 6)
    # conservation: total credit == attributed conversions (up to the
    # per-set micro flooring, one micro-unit per channel per set)
    total_conv = sum(sets.values())
    total_credit = sum(r["credit"] for r in out)
    assert total_conv - 7 * 3e-6 <= total_credit <= total_conv


def test_time_decay_weights_and_normalization(spark):
    rows = _events(spark)
    convs = [
        (r["event_id"], r["user_id"], r["ts"])
        for r in rows
        if r["event_type"] == "purchase"
    ]
    touches = defaultdict(list)
    for r in rows:
        if r["event_type"] in _CH_BITS:
            touches[r["user_id"]].append((r["ts"], r["event_type"]))
    H = attribution_extra._DECAY_HORIZON_DAYS
    credit = defaultdict(int)
    n_touch = defaultdict(int)
    conv_touched = defaultdict(set)
    for cid, u, cts in convs:
        cus = int(cts.timestamp() * 1e6)
        wlist = []
        for tts, ch in touches[u]:
            tus = int(tts.timestamp() * 1e6)
            if tus < cus and (cus - tus) // 86400000000 < H:
                wlist.append((ch, 1 << (H - 1 - (cus - tus) // 86400000000)))
        tot = sum(w for _, w in wlist)
        for ch, w in wlist:
            credit[ch] += w * 1000000 // tot
            n_touch[ch] += 1
            conv_touched[ch].add(cid)
    out = attribution_extra.QUERIES["events_attribution_time_decay"](
        spark, SF0001
    ).collect()
    assert len(out) > 0
    for r in out:
        ch = r["channel"]
        assert r["n_touches"] == n_touch[ch]
        assert r["n_conversions_touched"] == len(conv_touched[ch])
        assert r["credit"] == round(credit[ch] / 1e6, 6)


def test_hll_portable_matches_fold_and_error_bound(spark):
    o = load_table(spark, SF0001, "orders")
    hashed = o.select(
        F.col("o_orderpriority").alias("grp"),
        portable_hash64(F.col("o_custkey").cast("string"), 9).alias("h"),
    ).distinct().collect()
    regs = defaultdict(dict)
    for r in hashed:
        b = r["h"] % 64
        rem = r["h"] // 64
        rank = 55 if rem == 0 else 55 - rem.bit_length()
        regs[r["grp"]][b] = max(regs[r["grp"]].get(b, 0), rank)
    out = sketches_extra.QUERIES["agg_hll_portable"](spark, SF0001).collect()
    for row in out:
        g = row["o_orderpriority"]
        present = len(regs[g])
        assert row["registers_used"] == present
        sum_present = sum(1 << (55 - r) for r in regs[g].values())
        denom = float(sum_present) + float(64 - present) * float(1 << 55)
        e_raw = 0.709207 * 64 * 64 * float(1 << 55) / denom
        zeros = 64 - present
        if zeros > 0 and e_raw <= 160.0:
            e = 64.0 * math.log(64.0 / zeros)
        else:
            e = e_raw
        assert row["est_hll"] == round(e, 6)
        # HLL with m=64 has ~13% relative std error; assert within 40%
        assert abs(row["est_hll"] - row["exact_distinct"]) <= (
            0.4 * row["exact_distinct"]
        )


def test_kmv_merge_is_lossless_everywhere(spark):
    out = sketches_extra.QUERIES["agg_kmv_merge_proof"](spark, SF0001).collect()
    assert len(out) == 5
    for r in out:
        assert r["merge_lossless"] == 1
        assert r["kth_merged"] == r["kth_direct"]
        assert r["k_merged"] == r["k_direct"] <= sketches_extra._KMV_K
        assert r["est_distinct"] > 0
