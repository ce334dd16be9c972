"""Invariant tests for the round-9 batch-14 queries (bag set ops, SQL
PIVOT clause, nth_value, code detection, audio VAD)."""

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries import (
    multimodal,
    relational,
    sqlsurface_extra,
    textanalysis,
    windows as win_queries,
)
from hawaiidatapipeline_spark.registry import load_table

from .conftest import SF0001


def _order_rows(spark):
    return load_table(spark, SF0001, "orders").collect()


def test_bag_set_ops_multiplicity_semantics(spark):
    rows = _order_rows(spark)
    a = Counter(
        r["o_custkey"]
        for r in rows
        if r["o_orderpriority"] in ("1-URGENT", "2-HIGH")
    )
    b = Counter(
        r["o_custkey"] for r in rows if r["o_totalprice"] > 100000
    )
    except_all = Counter(
        {k: v - b.get(k, 0) for k, v in a.items() if v > b.get(k, 0)}
    )
    intersect_all = Counter(
        {k: min(v, b[k]) for k, v in a.items() if k in b}
    )
    got_e = Counter(
        r["o_custkey"]
        for r in relational.QUERIES["set_except_all"](spark, SF0001).collect()
    )
    got_i = Counter(
        r["o_custkey"]
        for r in relational.QUERIES["set_intersect_all"](
            spark, SF0001
        ).collect()
    )
    assert got_e == +except_all
    assert got_i == +intersect_all
    # bag ops must differ from their DISTINCT twins on this input
    assert sum(got_i.values()) > len(got_i)


def test_pivot_clause_cells_match_group_fold(spark):
    rows = _order_rows(spark)
    cells = defaultdict(lambda: [0, 0.0])
    for r in rows:
        c = cells[(r["o_orderpriority"], r["o_orderstatus"])]
        c[0] += 1
        c[1] += r["o_totalprice"]
    out = sqlsurface_extra.QUERIES["sql_pivot_clause"](spark, SF0001).collect()
    prios = sorted({r["o_orderpriority"] for r in rows})
    assert [r["o_orderpriority"] for r in out] == prios
    for r in out:
        for st, ncol in (("F", "n_f"), ("O", "n_o"), ("P", "n_p")):
            assert r[ncol] == cells[(r["o_orderpriority"], st)][0]
    # row sums tile the table
    assert sum(r["n_f"] + r["n_o"] + r["n_p"] for r in out) == len(rows)


def test_nth_value_growing_frame_semantics(spark):
    out = win_queries.QUERIES["win_nth_value"](spark, SF0001).collect()
    dates = {
        r["o_orderkey"]: r["o_orderdate"] for r in _order_rows(spark)
    }
    by_cust = defaultdict(list)
    for r in out:
        by_cust[r["o_custkey"]].append(r)
    for rows in by_cust.values():
        # replay the WINDOW order (date, orderkey); 1st row has no 2nd
        rows.sort(key=lambda r: (dates[r["o_orderkey"]], r["o_orderkey"]))
        assert rows[0]["second_order"] is None
        if len(rows) >= 2:
            second = rows[1]["o_orderkey"]
            for r in rows[1:]:
                assert r["second_order"] == second
        if len(rows) >= 3:
            third_price = rows[2]["o_totalprice"]
            assert rows[1]["third_price"] is None
            for r in rows[2:]:
                assert r["third_price"] == third_price


def test_code_detect_score_fold(spark):
    import math
    import re

    docs = load_table(spark, SF0001, "documents").collect()
    kw = re.compile(
        r"\b(def|return|import|class|function|var|const|if|else|for|while)\b"
    )
    expected = {}
    for r in docs:
        t = r["text"]
        n_sym = sum(t.count(c) for c in "{};=(")
        n_kw = len(kw.findall(t))
        n_words = len(t.split(" "))
        score = n_sym * 1000 // max(len(t), 1) + n_kw * 10000 // max(
            n_words, 1
        )
        expected[r["doc_id"]] = (n_sym, n_kw, score)
    out = textanalysis.QUERIES["llm_code_detect"](spark, SF0001).collect()
    want = sorted(
        ((-(s), d) for d, (_, _, s) in expected.items())
    )[:50]
    assert [(-r["code_score_milli"], r["doc_id"]) for r in out] == want
    for r in out:
        n_sym, n_kw, score = expected[r["doc_id"]]
        assert (r["n_symbols"], r["n_keywords"]) == (n_sym, n_kw)
        assert r["looks_like_code"] == (1 if score >= 60 else 0)


def test_audio_vad_energy_fold(spark):
    docs = [r["doc_id"] for r in
            load_table(spark, SF0001, "documents").collect()]
    out = {
        r["id"]: r
        for r in multimodal.QUERIES["multimodal_audio_vad"](
            spark, SF0001
        ).collect()
    }
    assert sorted(out) == sorted(docs)
    for i in docs[:50]:  # fold a sample of clips
        n = 800 + 8 * (i % 100)
        frames = defaultdict(lambda: [0, 0])
        for j in range(n):
            s = (i + j) % 200 - 100
            fr = frames[j // multimodal._VAD_FRAME]
            fr[0] += 1
            fr[1] += s * s
        n_active = sum(
            1
            for ns, sq in frames.values()
            if sq >= multimodal._VAD_THRESH_MEANSQ * ns
        )
        r = out[i]
        assert r["n_frames"] == len(frames)
        assert r["n_active"] == n_active
        assert r["total_energy"] == sum(sq for _, sq in frames.values())
