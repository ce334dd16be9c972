"""Independent-reference tests for queries/mining_extra.py — each query
recomputed with plain Python (no Spark SQL, no DuckDB) on sf0.001."""

import math
from collections import Counter, defaultdict

from hawaiidatapipeline_spark.queries import mining_extra

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").toPandas()


def test_bpe_pair_counts_match_python(spark):
    pdf = _docs(spark)
    counts = Counter()
    for text in pdf["text"]:
        for w in text.lower().split(" "):
            for i in range(len(w) - 1):
                counts[w[i : i + 2]] += 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    got = [
        (r["pair"], r["n"])
        for r in mining_extra.QUERIES["llm_bpe_pair_counts"](spark, SF).collect()
    ]
    assert got == want


def test_bigram_logprob_matches_python(spark):
    pdf = _docs(spark)
    occ = []  # (doc_id, w1, bigram)
    vocab = set()
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        a = text.lower().split(" ")
        vocab.update(a)
        for i in range(len(a) - 1):
            occ.append((doc_id, a[i], f"{a[i]} {a[i + 1]}"))
    cb = Counter(bg for _, _, bg in occ)
    cp = Counter(w1 for _, w1, _ in occ)
    v = len(vocab)
    term = {
        bg: math.floor((math.log(c + 1) - math.log(cp[bg.split(" ")[0]] + v)) * 1e6)
        for bg, c in cb.items()
    }
    per_doc = defaultdict(lambda: [0, 0])
    for doc_id, _, bg in occ:
        per_doc[doc_id][0] += 1
        per_doc[doc_id][1] += term[bg]
    want = sorted(
        (
            (round(tot / n / 1e6, 6), doc_id, n, tot)
            for doc_id, (n, tot) in per_doc.items()
        )
    )[:50]
    got = mining_extra.QUERIES["llm_bigram_logprob"](spark, SF).collect()
    assert [(r["avg_logprob"], r["doc_id"], r["n_bigrams"], r["total_micro"])
            for r in got] == want


def test_stopword_profile_matches_python(spark):
    pdf = _docs(spark)
    stats = defaultdict(lambda: [0, 0, set()])
    for source, text in zip(pdf["source"], pdf["text"]):
        for t in text.lower().split(" "):
            st = stats[source]
            st[0] += 1
            if t in mining_extra._STOPWORDS:
                st[1] += 1
                st[2].add(t)
    got = mining_extra.QUERIES["llm_stopword_profile"](spark, SF).collect()
    assert len(got) == len(stats)
    for r in got:
        n, stop, dset = stats[r["source"]]
        assert (r["n_tokens"], r["n_stopwords"], r["n_distinct_stopwords"]) == (
            n, stop, len(dset),
        )
        assert r["stop_ratio"] == round(stop / n, 6)


def test_changepoint_matches_bruteforce(spark):
    events = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    events["d"] = events["ts"].dt.date
    got = {
        r["event_type"]: (r["change_day"], r["mean_before"], r["mean_after"])
        for r in mining_extra.QUERIES["ts_changepoint_binary"](spark, SF).collect()
    }
    for et, grp in events.groupby("event_type"):
        daily = grp.groupby("d").size().sort_index()
        n, s = len(daily), int(daily.sum())
        best = None
        cum = 0
        for k, (day, cnt) in enumerate(daily.items(), start=1):
            cum += int(cnt)
            if k == n:
                break
            gain = cum * cum / k + (s - cum) ** 2 / (n - k) - s * s / n
            key = (-gain, day)
            if best is None or key < best[0]:
                best = (key, day, round(cum / k, 6), round((s - cum) / (n - k), 6))
        assert got[et] == (best[1], best[2], best[3])


def test_markov_stationary_matches_python(spark):
    events = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    events = events.sort_values(["user_id", "ts", "event_id"], kind="stable")
    tm = Counter()
    for _, grp in events.groupby("user_id"):
        types = list(grp["event_type"])
        for a, b in zip(types, types[1:]):
            tm[(a, b)] += 1
    rowtot = Counter()
    for (a, _), n in tm.items():
        rowtot[a] += n
    states = sorted(set(events["event_type"]))
    p = {s: 1000000 // len(states) for s in states}
    for _ in range(3):
        nxt = defaultdict(int)
        for (a, b), n in tm.items():
            nxt[b] += (p.get(a, 0) * n) // rowtot[a]
        p = nxt
    got = {
        r["event_type"]: r["p_micro"]
        for r in mining_extra.QUERIES["events_markov_stationary"](spark, SF).collect()
    }
    assert got == {s: p.get(s, 0) for s in states}
    # stationary mass stays within the floor-division budget
    assert 0 < sum(got.values()) <= 1000000


def test_kcore_peel_matches_python(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    orders = defaultdict(set)
    for ok, pk in zip(li["l_orderkey"], li["l_partkey"]):
        orders[ok].add(pk)
    pair_orders = Counter()
    for parts in orders.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_orders[(ps[i], ps[j])] += 1
    edges = {p for p, n in pair_orders.items() if n >= 2}
    want = []
    for r in range(1, 5):
        deg = Counter()
        for u, v in edges:
            deg[u] += 1
            deg[v] += 1
        keep = {n for n, d in deg.items() if d >= 3}
        edges = {(u, v) for u, v in edges if u in keep and v in keep}
        want.append((r, len(keep), len(edges)))
    got = [
        (r["round"], r["n_nodes"], r["n_edges"])
        for r in mining_extra.QUERIES["graph_kcore_peel"](spark, SF).collect()
    ]
    assert got == want


def test_psi_drift_matches_python(spark):
    pdf = _docs(spark)
    by_lang = defaultdict(lambda: [Counter(), Counter()])
    for doc_id, lang, n_chars in zip(pdf["doc_id"], pdf["lang"], pdf["n_chars"]):
        by_lang[lang][doc_id % 2][n_chars // 100] += 1
    got = {
        r["lang"]: (r["n_bins"], r["psi_micro"], r["psi"])
        for r in mining_extra.QUERIES["dq_psi_drift"](spark, SF).collect()
    }
    for lang, (a, b) in by_lang.items():
        na, nb = sum(a.values()), sum(b.values())
        bins = set(a) | set(b)
        psi_micro = sum(
            math.floor(
                ((a[x] + 1) / (na + 1) - (b[x] + 1) / (nb + 1))
                * math.log(((a[x] + 1) * (nb + 1)) / ((b[x] + 1) * (na + 1)))
                * 1e6
            )
            for x in bins
        )
        assert got[lang] == (len(bins), psi_micro, round(psi_micro / 1e6, 6))


def test_bigram_cond_entropy_matches_python(spark):
    pdf = _docs(spark)
    bgc, pfc = Counter(), Counter()
    for lang, text in zip(pdf["lang"], pdf["text"]):
        a = text.lower().split(" ")
        for i in range(len(a) - 1):
            bgc[(lang, a[i], a[i + 1])] += 1
            pfc[(lang, a[i])] += 1
    agg = defaultdict(lambda: [0, 0, 0])  # n_bigrams, n_types, weighted_sum
    for (lang, w1, _), cb in bgc.items():
        t = math.floor((math.log2(pfc[(lang, w1)]) - math.log2(cb)) * 1e6)
        st = agg[lang]
        st[0] += cb
        st[1] += 1
        st[2] += cb * t
    got = {
        r["lang"]: (r["n_bigrams"], r["n_bigram_types"], r["cond_entropy_bits"])
        for r in mining_extra.QUERIES["llm_bigram_cond_entropy"](spark, SF).collect()
    }
    want = {
        lang: (n, ty, round(ws / n / 1e6, 6)) for lang, (n, ty, ws) in agg.items()
    }
    assert got == want
    # entropy is non-negative and bounded by log2 of the type count
    for lang, (_, ty, h) in want.items():
        assert 0 <= h <= math.log2(max(ty, 2))


def test_degree_assortativity_matches_python(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    orders = defaultdict(set)
    for ok, pk in zip(li["l_orderkey"], li["l_partkey"]):
        orders[ok].add(pk)
    pair_orders = Counter()
    for parts in orders.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_orders[(ps[i], ps[j])] += 1
    edges = [p for p, n in pair_orders.items() if n >= 2]
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    pts = [(deg[u], deg[v]) for u, v in edges] + [(deg[v], deg[u]) for u, v in edges]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    want = round(
        (n * sxy - sx * sy)
        / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)),
        6,
    )
    row = mining_extra.QUERIES["graph_degree_assortativity"](spark, SF).collect()[0]
    assert (row["n_edge_ends"], row["assortativity"]) == (n, want)


def test_seasonal_strength_matches_python(spark):
    events = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    events["d"] = events["ts"].dt.date
    got = {
        r["event_type"]: (r["n_days"], r["ss_total_micro"], r["ss_within_micro"],
                          r["seasonal_strength"])
        for r in mining_extra.QUERIES["events_seasonal_strength"](spark, SF).collect()
    }
    for et, grp in events.groupby("event_type"):
        daily = grp.groupby("d").size()
        n = len(daily)
        sx, sxx = int(daily.sum()), int((daily ** 2).sum())
        ss_total = math.floor((sxx - sx * sx / n) * 1e6)
        by_dow = defaultdict(list)
        for day, cnt in daily.items():
            by_dow[day.weekday()].append(int(cnt))
        ss_within = sum(
            math.floor(
                (sum(v * v for v in xs) - sum(xs) ** 2 / len(xs)) * 1e6
            )
            for xs in by_dow.values()
        )
        assert got[et] == (
            n, ss_total, ss_within, round(1.0 - ss_within / ss_total, 6),
        )
        assert 0.0 <= got[et][3] <= 1.0


def test_pmi_pairs_matches_python(spark):
    pdf = _docs(spark)
    docs_tokens = {
        doc_id: set(text.lower().split(" "))
        for doc_id, text in zip(pdf["doc_id"], pdf["text"])
    }
    n_docs = len(docs_tokens)
    df = Counter(t for toks in docs_tokens.values() for t in toks)
    kept = {t for t, c in df.items() if c * 100 <= n_docs * mining_extra._PMI_MAX_DF_PCT}
    cooc = Counter()
    for toks in docs_tokens.values():
        ks = sorted(t for t in toks if t in kept)
        for i in range(len(ks)):
            for j in range(i + 1, len(ks)):
                cooc[(ks[i], ks[j])] += 1
    scored = []
    for (t1, t2), cxy in cooc.items():
        if cxy < mining_extra._PMI_MIN_COOC:
            continue
        pmi_micro = math.floor(
            math.log((cxy * n_docs) / (df[t1] * df[t2])) * 1e6
        )
        scored.append((-pmi_micro, t1, t2, cxy, df[t1], df[t2]))
    want = [
        (t1, t2, cxy, c1, c2, -neg, round(-neg / 1e6, 6))
        for neg, t1, t2, cxy, c1, c2 in sorted(scored)[:30]
    ]
    got = [
        (r["t1"], r["t2"], r["cxy"], r["cx1"], r["cx2"], r["pmi_micro"], r["pmi"])
        for r in mining_extra.QUERIES["llm_pmi_pairs"](spark, SF).collect()
    ]
    assert got == want


def test_benford_deviation_matches_python(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    digits = Counter(
        int(str(int(math.floor(p)))[0]) for p in orders["o_totalprice"] if p >= 1
    )
    total = sum(digits.values())
    got = {
        r["digit"]: (r["n_obs"], r["p_obs_micro"], r["p_benford_micro"],
                     r["deviation_micro"])
        for r in mining_extra.QUERIES["dq_benford_deviation"](spark, SF).collect()
    }
    assert set(got) == set(range(1, 10))
    for d in range(1, 10):
        n_obs = digits.get(d, 0)
        p_obs = n_obs * 1000000 // total
        p_ben = math.floor(math.log10(1 + 1 / d) * 1e6)
        assert got[d] == (n_obs, p_obs, p_ben, p_obs - p_ben)
    # shares are a (floored) probability profile
    assert 0 < sum(v[1] for v in got.values()) <= 1000000
