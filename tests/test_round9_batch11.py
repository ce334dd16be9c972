"""Invariant tests for the round-9 batch-11 queries (trimmed mean,
Hamming recall audit, LPA modularity, dedup threshold curve)."""

import math
from collections import defaultdict

from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries import (
    emb_extra,
    graph_demo,
    llm,
    robust_extra,
)
from hawaiidatapipeline_spark.registry import load_table

from .conftest import SF0001


def test_trimmed_mean_matches_row_sort_fold(spark):
    """The value-grain partial-inclusion formula must equal the naive
    sort-and-slice definition exactly."""
    rows = load_table(spark, SF0001, "orders").collect()
    by_grp = defaultdict(list)
    for r in rows:
        by_grp[r["o_orderpriority"]].append(
            math.floor(r["o_totalprice"] * 100)
        )
    out = robust_extra.QUERIES["agg_trimmed_mean"](spark, SF0001).collect()
    assert len(out) == len(by_grp)
    for r in out:
        xs = sorted(by_grp[r["o_orderpriority"]])
        n = len(xs)
        kept = xs[n // 10 : n - n // 10]
        assert r["n_rows"] == n
        assert r["n_kept"] == len(kept)
        assert r["trimmed_mean"] == round(sum(kept) / len(kept) / 100.0, 6)
        # robustness: trimmed mean lies within the kept range
        assert kept[0] / 100.0 <= r["trimmed_mean"] <= kept[-1] / 100.0


def test_hamming_recall_consistent_with_component_queries(spark):
    """Recall rows must be reproducible from the two underlying
    rankings (sign-signature Hamming top-k vs exact integer-dot top-k)
    computed independently here via numpy."""
    import numpy as np

    rows = load_table(spark, SF0001, "embeddings").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    sigs = {}
    for vid, v in vecs.items():
        bits = 0
        for i, x in enumerate(v):
            if x > 0:
                bits |= 1 << i
        sigs[vid] = bits
    q = {vid: np.round(v * 1000).astype(np.int64) for vid, v in vecs.items()}
    k = emb_extra._HAM_K
    out = emb_extra.QUERIES["emb_hamming_recall_report"](spark, SF0001).collect()
    probes = sorted(v for v in vecs if v % emb_extra._HAM_PROBE_MOD == 0)
    assert [r["probe_id"] for r in out] == probes
    for r in out:
        p = r["probe_id"]
        ham = sorted(
            (bin(sigs[p] ^ s).count("1"), vid)
            for vid, s in sigs.items()
            if vid != p
        )[:k]
        gt = sorted(
            (-int(np.dot(q[p], qv)), vid)
            for vid, qv in q.items()
            if vid != p
        )[:k]
        hits = {v for _, v in ham} & {v for _, v in gt}
        assert r["n_hits"] == len(hits)
        assert r[f"recall_at_{k}"] == round(len(hits) / k, 6)
        assert 0.0 <= r[f"recall_at_{k}"] <= 1.0


def test_lpa_modularity_matches_fold_and_bounds(spark):
    from hawaiidatapipeline_spark.operators.graph import copurchase_edges

    li = load_table(spark, SF0001, "lineitem")
    edges = [(r["u"], r["v"]) for r in copurchase_edges(li).collect()]
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    l1 = {n: min(n, min(adj[n])) for n in adj}
    l2 = {n: min(l1[n], min(l1[m] for m in adj[n])) for n in adj}
    m = len(edges)
    intra = sum(1 for u, v in edges if l2[u] == l2[v])
    dsum = defaultdict(int)
    for n in adj:
        dsum[l2[n]] += len(adj[n])
    sum_d2 = sum(d * d for d in dsum.values())
    q_mod = intra / m - sum_d2 / (4.0 * m * m)
    row = graph_demo.QUERIES["graph_lpa_modularity"](spark, SF0001).collect()[0]
    assert row["n_edges"] == m
    assert row["intra_edges"] == intra
    assert row["n_communities"] == len(dsum)
    assert row["modularity"] == round(q_mod, 6)
    assert -0.5 <= row["modularity"] <= 1.0  # modularity hard bounds


def test_threshold_curve_monotone_and_consistent_with_jaccard(spark):
    out = llm.QUERIES["llm_dedup_threshold_curve"](spark, SF0001).collect()
    assert [r["tau_milli"] for r in out] == [500, 600, 700, 800, 900]
    pairs = [r["n_pairs"] for r in out]
    docs = [r["n_docs_affected"] for r in out]
    # raising the threshold can only shrink the yield
    assert pairs == sorted(pairs, reverse=True)
    assert docs == sorted(docs, reverse=True)
    # each qualifying pair touches at most 2 docs
    for r in out:
        assert r["n_docs_affected"] <= 2 * r["n_pairs"]
    # replay the df-capped jaccard sweep driver-side
    from collections import Counter

    docs = {
        r["doc_id"]: set(r["text"].split(" "))
        for r in load_table(spark, SF0001, "documents").collect()
    }
    df_count = Counter()
    for toks in docs.values():
        df_count.update(toks)
    kept = {
        d: {t for t in toks if df_count[t] <= 64}
        for d, toks in docs.items()
    }
    ids = sorted(kept)
    exp = {t: [0, set()] for t in (500, 600, 700, 800, 900)}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            common = len(kept[a] & kept[b])
            if common == 0:
                continue
            union = len(kept[a] | kept[b])
            for t in exp:
                if common * 1000 >= t * union:
                    exp[t][0] += 1
                    exp[t][1] |= {a, b}
    for r in out:
        n_pairs, docs_hit = exp[r["tau_milli"]]
        assert r["n_pairs"] == n_pairs
        assert r["n_docs_affected"] == len(docs_hit)
