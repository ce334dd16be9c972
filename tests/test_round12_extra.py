"""Round-12 quality-classifier semantics (beyond the driver hash checks):
the training actually LEARNS, the gate actually separates, and the
centering actually removes the length common mode."""

from __future__ import annotations

from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries.round12_extra import (
    _QC_MARKER,
    _QC_MIN_HITS,
    _qc_train,
    llm_quality_classifier_scores,
    llm_quality_classifier_train,
)
from hawaiidatapipeline_spark.registry import load_table

from .conftest import SF0001


def test_training_curve_improves(spark):
    """Round 1 is the all-zero model (base rate); each GD sweep must
    strictly improve training accuracy on the fixture — the curve that
    proves the distributed gradient actually descends."""
    rows = llm_quality_classifier_train(spark, SF0001).collect()
    accs = [r.accuracy_micro for r in sorted(rows, key=lambda r: r.round)]
    assert len(accs) == 3
    assert accs[0] < accs[1] < accs[2]
    # base rate ~50% (balanced label), final model well above it
    assert 400000 <= accs[0] <= 600000
    assert accs[2] >= accs[0] + 150000


def test_top_scores_are_precise(spark):
    """Precision at the top of the gate: the 30 highest-scoring documents
    should be overwhelmingly positive-label, and prob_micro must be
    monotone in score (same sigmoid)."""
    rows = llm_quality_classifier_scores(spark, SF0001).collect()
    assert len(rows) == 30
    assert sum(r.label for r in rows) >= 24  # >= 80% precision@30
    probs = [r.prob_micro for r in rows]  # rows come score-desc
    assert probs == sorted(probs, reverse=True)


def test_centering_kills_length_mode(spark):
    """Per-bucket centered features must sum to ~0 over the corpus
    (|Σ v| < n from the floor in the mean), unlike raw counts whose
    bucket sums are all positive — the common mode the module docstring
    blames for stalling raw-count GD."""
    d = load_table(spark, SF0001, "documents")
    dense, lab, n, w, _ = _qc_train(spark, d)
    sums = (
        dense.filter(F.col("f") >= 0)
        .groupBy("f")
        .agg(F.sum("v").alias("s"))
        .collect()
    )
    assert sums and all(0 <= r.s < n for r in sums)
    # label sanity: y really is the marker-density gate
    docs = d.select(
        "doc_id",
        F.size(
            F.filter(F.split("text", " "), lambda x: x == F.lit(_QC_MARKER))
        ).alias("hits"),
    )
    joined = lab.join(docs, "doc_id").collect()
    assert all((r.hits >= _QC_MIN_HITS) == (r.y == 1) for r in joined)


def test_kmeans_scalable_init_properties(spark):
    """k-means|| invariants on the fixture: K distinct picks, the first
    pick is the heaviest candidate (greedy rule), weights are positive
    and sum to <= corpus size, and wd2 is 0 only for pick 0."""
    from hawaiidatapipeline_spark.queries.round12_extra import (
        _KSC_K,
        emb_kmeans_scalable_init,
    )

    rows = emb_kmeans_scalable_init(spark, SF0001).collect()
    assert [r.pick for r in rows] == list(range(_KSC_K))
    assert len({r.vec_id for r in rows}) == _KSC_K
    n = load_table(spark, SF0001, "embeddings").count()
    assert all(1 <= r.weight <= n for r in rows)
    assert sum(r.weight for r in rows) <= n
    assert rows[0].wd2 == 0 and all(r.wd2 > 0 for r in rows[1:])
    # greedy rule: pick 0 has the max weight among the picks
    assert rows[0].weight == max(r.weight for r in rows)


def test_doremi_mixture_semantics(spark):
    """DoReMi invariants: weights renormalize to ~1e6 (floor slack < D),
    every domain keeps positive weight, excess >= 0, and the highest
    final weight belongs to a domain with maximal excess ordering (the
    multiplicative-weights monotonicity: same starting weight, so final
    weight order follows cumulative excess — spot-check the extremes)."""
    from hawaiidatapipeline_spark.queries.round12_extra import (
        llm_doremi_mixture,
    )

    rows = llm_doremi_mixture(spark, SF0001).collect()
    d = len(rows)
    assert d >= 2
    total = sum(r.weight_micro for r in rows)
    assert 1000000 - d <= total <= 1000000
    assert all(r.weight_micro > 0 for r in rows)
    assert all(r.excess_micro >= 0 for r in rows)
    assert all(r.ce_shared_micro >= r.ce_own_micro - 1 for r in rows)
    # rows come weight-desc; the top domain's LAST-round excess should be
    # >= the bottom domain's (weights accumulate exp(excess) per round)
    assert rows[0].excess_micro >= rows[-1].excess_micro


def test_sequence_packing_accounting(spark):
    """Packing invariants: token totals reconcile with the corpus, doc
    shares sum to ~1e6, and a document can span at most
    ceil(max_tokens / CTX) boundaries."""
    from hawaiidatapipeline_spark.queries.round12_extra import (
        _PK_CTX,
        llm_sequence_packing,
    )

    rows = llm_sequence_packing(spark, SF0001).collect()
    d = load_table(spark, SF0001, "documents")
    total_docs = d.count()
    total_toks = d.select(
        F.sum(F.size(F.split("text", " "))).alias("t")
    ).collect()[0].t
    assert sum(r.n_docs for r in rows) == total_docs
    assert sum(r.n_tokens for r in rows) == total_toks
    share = sum(r.doc_share_micro for r in rows)
    assert 1000000 - len(rows) <= share <= 1000000
    max_tok = d.select(
        F.max(F.size(F.split("text", " "))).alias("m")
    ).collect()[0].m
    assert all(0 <= r.spans <= (max_tok // _PK_CTX) + 1 for r in rows)


def test_effective_rank_bounds(spark):
    """PR is bounded by (1, dim], and the fixture's near-isotropic
    synthetic embeddings should sit close to the dim ceiling."""
    from hawaiidatapipeline_spark.queries.round12_extra import (
        emb_effective_rank,
    )

    r = emb_effective_rank(spark, SF0001).collect()[0]
    assert r.dim == 64 and r.n_vectors > 0
    assert 1000 < r.pr_milli <= r.dim * 1000
    assert r.pr_milli > r.dim * 1000 * 0.8  # near-isotropic fixture
    assert r.trace_mm > 0


def test_triplet_margins_semantics(spark):
    """Triplet invariants: margins sorted ascending, margin arithmetic
    consistent, positives share the probe's source, negatives don't."""
    from hawaiidatapipeline_spark.queries.round12_extra import (
        emb_triplet_margins,
    )

    rows = emb_triplet_margins(spark, SF0001).collect()
    assert rows
    margins = [r.margin for r in rows]
    assert margins == sorted(margins)
    for r in rows:
        assert r.margin == r.neg_d2 - r.pos_d2
        assert r.neg_src != r.probe_src
        assert r.pos_id != r.probe_id and r.neg_id != r.probe_id


def test_pipeline_v8_manifest_consistency(spark):
    """v8 manifest invariants: chunk accounting per shard (n_chunks =
    ceil(tokens/CTX)), fragmentation bounded by docs, and the classifier
    gate only shrinks v7's selection."""
    from hawaiidatapipeline_spark.queries.pipeline_demo import (
        _V8_CTX,
        llm_corpus_pipeline_v7,
        llm_corpus_pipeline_v8,
    )

    v8 = llm_corpus_pipeline_v8(spark, SF0001).collect()
    assert v8
    for r in v8:
        assert r.n_chunks == (r.total_tokens + _V8_CTX - 1) // _V8_CTX
        assert 0 <= r.frag_docs <= r.n_docs
    v7 = llm_corpus_pipeline_v7(spark, SF0001).collect()
    assert sum(r.n_docs for r in v8) <= sum(r.n_docs for r in v7)
