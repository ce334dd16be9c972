"""Round-11 operator tests: SemDeDup cell-pruned semantic dedup."""

from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.similarity import (
    as_double_vec,
    cosine_pairs_exact,
    cosine_pairs_in_cells,
)
from hawaiidatapipeline_spark.queries.emb_extra import _kmeans_assign
from hawaiidatapipeline_spark.queries.llm import _EMB_TAU
from hawaiidatapipeline_spark.queries.round11_extra import (
    llm_semdedup_cells,
    llm_semdedup_recall,
)
from hawaiidatapipeline_spark.registry import load_table

from .conftest import SF0001


def test_cell_pairs_are_subset_of_exact_pairs(spark):
    """Every cell-restricted pair must appear in the exact all-pairs set
    with the same similarity — the pruning changes WHICH pairs are
    scored, never the score."""
    e = as_double_vec(load_table(spark, SF0001, "embeddings"))
    _, assign, _ = _kmeans_assign(spark, SF0001)
    cell = {
        (r.vec_a, r.vec_b): round(r.cos_sim, 9)
        for r in cosine_pairs_in_cells(e, assign).collect()
    }
    exact = {
        (r.vec_a, r.vec_b): round(r.cos_sim, 9)
        for r in cosine_pairs_exact(e).collect()
    }
    assert set(cell) <= set(exact)
    assert all(exact[k] == v for k, v in cell.items())


def test_semdedup_invariants(spark):
    """Per-cell ledger arithmetic: dropped <= vectors, survivors + dropped
    == vectors, and a cell with zero edges drops nobody."""
    rows = llm_semdedup_cells(spark, SF0001).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_dropped <= r.n_vectors
        assert r.n_survivors + r.n_dropped == r.n_vectors
        if r.n_edges == 0:
            assert r.n_dropped == 0


def test_semdedup_recall_consistent_with_cells(spark):
    """The audit's cell-edge count must equal the per-cell ledger's edge
    total, and recall = cell/exact on the nose."""
    rec = llm_semdedup_recall(spark, SF0001).collect()[0]
    total_cell_edges = (
        llm_semdedup_cells(spark, SF0001)
        .agg(F.sum("n_edges").alias("s"))
        .collect()[0]
        .s
    )
    assert rec.n_cell_edges == total_cell_edges
    assert rec.n_exact_edges >= rec.n_cell_edges
    assert rec.n_missed == rec.n_exact_edges - rec.n_cell_edges
    if rec.n_exact_edges:
        assert abs(
            rec.edge_recall - rec.n_cell_edges / rec.n_exact_edges
        ) < 1e-6


def test_semdedup_tau_matches_dedup_embedding_contract(spark):
    """The cell path must use llm_dedup_embedding's threshold: every
    within-cell exact edge above tau appears in the cell ledger count."""
    e = as_double_vec(load_table(spark, SF0001, "embeddings"))
    _, assign, _ = _kmeans_assign(spark, SF0001)
    n_edges = (
        cosine_pairs_in_cells(e, assign)
        .filter(F.col("cos_sim") >= _EMB_TAU)
        .count()
    )
    ledger = (
        llm_semdedup_cells(spark, SF0001)
        .agg(F.sum("n_edges").alias("s"))
        .collect()[0]
        .s
    )
    assert n_edges == ledger


def test_semdedup_survivors_rule(spark):
    """Survivor = the cluster member with max centroid distance (ties →
    min id); every cluster is cell-homogeneous and has >= 2 members."""
    from hawaiidatapipeline_spark.queries.round11_extra import (
        llm_semdedup_survivors,
    )

    rows = llm_semdedup_survivors(spark, SF0001).collect()
    assert rows
    _, assign, _ = _kmeans_assign(spark, SF0001)
    cells = {r.vec_id: r.cid for r in assign.collect()}
    for r in rows:
        assert r.n_members >= 2
        assert cells[r.survivor_id] == r.cell
        assert r.survivor_d2 > 0
