"""Round-11 batch-2 operator tests: DSIR selection, BM25 retrieval +
ranking eval, BPE merge training, harmonic centrality, exact-substring
removal planning, Yule-Walker PACF, two-stage IVF-PQ re-ranking."""

from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries.analysis_extra import llm_dupspan_removal_plan
from hawaiidatapipeline_spark.queries.graph_demo import graph_harmonic_centrality
from hawaiidatapipeline_spark.queries.ivfpq import emb_ivfpq_rerank, emb_ivfpq_topk
from hawaiidatapipeline_spark.queries.selection_extra import (
    _DSIR_N,
    _DSIR_TARGET_LANG,
    llm_dsir_eval,
    llm_dsir_sample,
    llm_dsir_weights,
)
from hawaiidatapipeline_spark.queries.stats_extra import ts_pacf
from hawaiidatapipeline_spark.queries.text_extra import (
    fulltext_bm25,
    fulltext_eval_ndcg,
    llm_bpe_merge_steps,
)

from .conftest import SF0001


def test_dsir_weights_favor_target_slice(spark):
    """The point of DSIR: documents IN the target slice should score a
    higher mean importance weight than documents outside it (the target
    n-gram model was fit on them)."""
    rows = llm_dsir_weights(spark, SF0001).collect()
    tgt = [r.weight_micro for r in rows if r.lang == _DSIR_TARGET_LANG]
    oth = [r.weight_micro for r in rows if r.lang != _DSIR_TARGET_LANG]
    assert tgt, "target-slice docs must appear in the top-100"
    if oth:
        assert sum(tgt) / len(tgt) > sum(oth) / len(oth)


def test_dsir_sample_size_and_key_order(spark):
    rows = llm_dsir_sample(spark, SF0001).collect()
    assert len(rows) == _DSIR_N
    keys = [r.key_micro for r in rows]
    assert all(r.key_micro == r.weight_micro + r.gumbel_micro for r in rows)
    assert keys == sorted(keys, reverse=True) or len(set(keys)) < len(keys)


def test_dsir_eval_counts_reconcile(spark):
    rows = llm_dsir_eval(spark, SF0001).collect()
    assert sum(r.n_sel for r in rows) == _DSIR_N
    assert all(r.n_tgt <= r.n_raw for r in rows)
    assert all(0 <= r.sel_share_milli <= 1000 for r in rows)


def test_bm25_scores_positive_and_ranked(spark):
    rows = fulltext_bm25(spark, SF0001).collect()
    assert rows, "some documents must match the query terms"
    assert all(r.n_terms >= 1 and r.score_milli > 0 for r in rows)
    scores = [r.score_milli for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_ndcg_bounds(spark):
    rows = fulltext_eval_ndcg(spark, SF0001).collect()
    assert rows
    for r in rows:
        assert 0 < r.ndcg_at_10 <= 1.0
        assert 0 <= r.mrr <= 1.0
        assert r.dcg_micro <= r.idcg_micro


def test_bpe_merge_shrinks_corpus(spark):
    """Each merge round strictly reduces the corpus symbol count (every
    applied merge collapses two symbols into one) and every learned merge
    had a positive pair count."""
    rows = {r.round: r for r in llm_bpe_merge_steps(spark, SF0001).collect()}
    assert set(rows) == {1, 2, 3}
    assert all(r.pair_total > 0 for r in rows.values())
    assert rows[1].n_symbols_after > rows[2].n_symbols_after > rows[3].n_symbols_after
    assert all(len(r.sym_a) >= 1 and len(r.sym_b) >= 1 for r in rows.values())


def test_harmonic_centrality_arithmetic(spark):
    rows = graph_harmonic_centrality(spark, SF0001).collect()
    for r in rows:
        assert r.part % 200 == 0
        assert (
            r.harmonic_milli == 1000 * r.n_1hop + 500 * r.n_2hop + 333 * r.n_3hop
        )


def test_dupspan_removal_bounds(spark):
    rows = llm_dupspan_removal_plan(spark, SF0001).collect()
    assert rows, "the synthetic corpus repeats 4-gram spans across docs"
    for r in rows:
        assert 4 <= r.tokens_covered <= r.n_tokens
        assert 0 <= r.retention_milli <= 1000
        assert r.n_dup_spans >= 1


def test_pacf_lag1_equals_acf(spark):
    """Yule-Walker at lag 1 IS the lag-1 autocorrelation; deeper lags stay
    within the quantized [-1, 1] band (milli-rounding can graze the
    boundary but never blow past it)."""
    rows = ts_pacf(spark, SF0001).collect()
    by = {(r.event_type, r.lag): r for r in rows}
    for (et, lag), r in by.items():
        if lag == 1:
            assert abs(r.pacf - r.acf_milli / 1000.0) < 1e-9
        assert abs(r.pacf) <= 1.05
        assert -1000 <= r.acf_milli <= 1000


def test_rerank_refines_adc_order(spark):
    """Re-ranked neighbors must come from the ADC candidate space (same
    cell economics) and be sorted by exact distance; the exact top-k can
    only differ from ADC's by reordering/shortlist recall, so every ADC
    top-3 neighbor that survives re-ranking keeps rnk <= 10."""
    rr = emb_ivfpq_rerank(spark, SF0001).collect()
    assert rr
    per_probe = {}
    for r in rr:
        per_probe.setdefault(r.probe_id, []).append(r)
    for probe, rows in per_probe.items():
        rows.sort(key=lambda r: r.rnk)
        d2s = [r.exact_d2 for r in rows]
        assert d2s == sorted(d2s)
        assert all(r.adc_rnk <= 30 for r in rows)
    adc = emb_ivfpq_topk(spark, SF0001).collect()
    adc_pairs = {(r.probe_id, r.neighbor_id) for r in adc}
    # cross-key consistency: a rerank-output row carrying adc_rnk <= 3
    # claims its pair was in the ADC top-3 — it must literally be an
    # emb_ivfpq_topk row (same training, same candidate space), and both
    # keys must serve the same probe set (ADVICE r11: the old form
    # `assert rr_pairs, adc_pairs` used adc_pairs as the assert MESSAGE
    # and checked nothing)
    rr_top3_claims = {(r.probe_id, r.neighbor_id) for r in rr if r.adc_rnk <= 3}
    assert rr_top3_claims <= adc_pairs
    assert {p for p, _ in adc_pairs} == {r.probe_id for r in rr}
