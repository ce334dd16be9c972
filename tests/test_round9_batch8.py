"""Invariant tests for the round-9 batch-8 queries (binary-Hamming
k-NN, bounded BFS, stupid-backoff trigram LM, readability profile,
peak detection). Oracle hashes prove engine-equivalence; these replay
the math with independent driver-side folds."""

import math
import re
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal


def _r6(x: float) -> float:
    """Spark's round(col, 6) on doubles goes through
    BigDecimal.valueOf(d) (shortest decimal repr) with HALF_UP;
    Python's built-in round is half-even — mirror the JVM here."""
    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )

from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries import (
    emb_extra,
    graph_demo,
    metrics_extra,
    mining_extra,
    text_extra,
)
from hawaiidatapipeline_spark.registry import load_table

from .conftest import SF0001


def test_hamming_topk_equals_brute_force(spark):
    rows = load_table(spark, SF0001, "embeddings").collect()
    sigs = {}
    for r in rows:
        bits = 0
        for i, x in enumerate(r["embedding"]):
            if x > 0:
                bits |= 1 << i
        sigs[r["vec_id"]] = bits
    out = emb_extra.QUERIES["emb_hamming_topk"](spark, SF0001).collect()
    probes = sorted(v for v in sigs if v % emb_extra._HAM_PROBE_MOD == 0)
    expected = []
    for p in probes:
        scored = sorted(
            (bin(sigs[p] ^ s).count("1"), v)
            for v, s in sigs.items()
            if v != p
        )
        for rk, (h, v) in enumerate(scored[: emb_extra._HAM_K], 1):
            expected.append((p, v, h, rk))
    got = [
        (r["probe_id"], r["neighbor_id"], r["hamming"], r["rk"]) for r in out
    ]
    assert got == expected
    assert all(0 <= h <= 64 for _, _, h, _ in got)


def test_bfs_hops_equals_python_bfs(spark):
    from hawaiidatapipeline_spark.operators.graph import copurchase_edges

    li = load_table(spark, SF0001, "lineitem")
    edges = [(r["u"], r["v"]) for r in copurchase_edges(li).collect()]
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    seeds = [n for n in adj if n % graph_demo._BFS_SEED_MOD == 0]
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for hop in range(1, graph_demo._BFS_MAX_HOPS + 1):
        nxt = set()
        for n in frontier:
            for m in adj[n]:
                if m not in dist:
                    dist[m] = hop
                    nxt.add(m)
        frontier = nxt
    out = graph_demo.QUERIES["graph_bfs_hops"](spark, SF0001).collect()
    got = {r["part"]: r["dist"] for r in out}
    assert got == dist
    # seed rows are distance 0, everything else within the hop bound
    assert all(0 <= d <= graph_demo._BFS_MAX_HOPS for d in got.values())


def test_trigram_backoff_matches_driver_fold(spark):
    docs = {
        r["doc_id"]: r["text"].lower().split(" ")
        for r in load_table(spark, SF0001, "documents").collect()
    }
    c1, c2, c3 = Counter(), Counter(), Counter()
    for did, a in docs.items():
        if did % 2 != 0:
            continue
        c1.update(a)
        c2.update(f"{a[i]} {a[i+1]}" for i in range(len(a) - 1))
        c3.update(
            f"{a[i]} {a[i+1]} {a[i+2]}" for i in range(len(a) - 2)
        )
    t, v = sum(c1.values()), len(c1)
    per_doc = {}
    for did, a in docs.items():
        if did % 2 != 1 or len(a) < 3:
            continue
        total = 0
        n = 0
        for i in range(len(a) - 2):
            tg = f"{a[i]} {a[i+1]} {a[i+2]}"
            ctx = f"{a[i]} {a[i+1]}"
            bg2 = f"{a[i+1]} {a[i+2]}"
            if c3[tg] > 0 and c2[ctx] > 0:
                s = c3[tg] / c2[ctx]
            elif c2[bg2] > 0 and c1[a[i + 1]] > 0:
                s = 0.4 * c2[bg2] / c1[a[i + 1]]
            else:
                s = 0.16 * (c1[a[i + 2]] + 1) / (t + v)
            total += math.floor(math.log(s) * 1e6)
            n += 1
        per_doc[did] = (n, _r6(total / n / 1e6))
    expected = sorted(
        ((score, did) for did, (n, score) in per_doc.items())
    )[:30]
    out = mining_extra.QUERIES["llm_trigram_backoff"](spark, SF0001).collect()
    assert [(r["avg_logscore"], r["doc_id"]) for r in out] == expected
    for r in out:
        assert r["n_trigrams"] == per_doc[r["doc_id"]][0]
        assert r["avg_logscore"] <= 0.0  # log of probabilities ≤ 1


def test_readability_band_profile_matches_fold(spark):
    docs = load_table(spark, SF0001, "documents").collect()
    bands = defaultdict(lambda: [0, 0, None])
    for r in docs:
        text = r["text"]
        words = len(text.split(" "))
        if words == 0:
            continue
        sentences = max(
            1, text.count(".") + text.count("!") + text.count("?")
        )
        syll = len(re.findall(r"[aeiouy]+", text.lower()))
        score = 206.835 - 1.015 * (words / sentences) - 84.6 * (syll / words)
        micro = math.floor(score * 1e6)
        band = math.floor(micro / 1e7) * 10
        b = bands[band]
        b[0] += 1
        b[1] += micro
        b[2] = r["doc_id"] if b[2] is None else min(b[2], r["doc_id"])
    out = text_extra.QUERIES["llm_readability"](spark, SF0001).collect()
    assert [r["band"] for r in out] == sorted(bands)
    for r in out:
        n, sm, sample = bands[r["band"]]
        assert r["n_docs"] == n
        assert r["avg_score"] == round(sm / n / 1e6, 6)
        assert r["sample_doc"] == sample


def test_peak_detection_matches_fold(spark):
    rows = load_table(spark, SF0001, "events").collect()
    daily = Counter(r["ts"].date() for r in rows)
    days = sorted(daily)
    out = metrics_extra.QUERIES["ts_peak_detection"](spark, SF0001).collect()
    expected = []
    for i, d in enumerate(days):
        if i == 0 or i == len(days) - 1:
            continue
        n = daily[d]
        left = [daily[days[j]] for j in range(max(0, i - 3), i)]
        right = [daily[days[j]] for j in range(i + 1, min(len(days), i + 4))]
        if (
            n > daily[days[i - 1]]
            and n > daily[days[i + 1]]
            and n > max(left)
            and n > max(right)
        ):
            expected.append((d, n, n - max(max(left), max(right))))
    got = [(r["peak_day"], r["n_events"], r["prominence"]) for r in out]
    assert got == expected
    assert all(p > 0 for _, _, p in got)  # strict dominance
