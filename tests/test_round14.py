"""Round-14 operator invariants: growth laws, burstiness, soft dedup,
MoE routing, chunking, Neyman allocation, graph/embedding structure
audits, audio clipping.

Property tests beyond the oracle hash — the hash proves Spark == DuckDB;
these prove the shared answer means what the operator claims."""

from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries.round14_extra import (
    QUERIES as Q,
    _CHUNK_S,
    _CHUNK_W,
    _HEAPS_CHECKPOINTS,
    _KNNG_K,
    _MOE_EXPERTS,
    _NEYMAN_BUDGET_DEN,
)

from .conftest import SF0001


def test_heaps_law_monotone_and_sublinear(spark):
    """Cumulative docs/tokens/types all non-decreasing across
    checkpoints, and the type-token ratio non-increasing (Heaps' law is
    sub-linear: new text repeats old types more and more)."""
    rows = sorted(
        Q["llm_heaps_law"](spark, SF0001).collect(), key=lambda r: r["checkpoint"]
    )
    assert len(rows) == _HEAPS_CHECKPOINTS
    for a, b in zip(rows, rows[1:]):
        assert a["docs_seen"] <= b["docs_seen"]
        assert a["tokens_seen"] <= b["tokens_seen"]
        assert a["types_seen"] <= b["types_seen"]
        assert a["ttr_micro"] >= b["ttr_micro"]
    assert all(r["types_seen"] <= r["tokens_seen"] for r in rows)


def test_burstiness_nonnegative_and_ordered(spark):
    """VMR is non-negative (Cauchy-Schwarz) and the output honors the
    (vmr DESC, term) total order; every term satisfies df <= total."""
    rows = Q["llm_term_burstiness"](spark, SF0001).collect()
    assert 0 < len(rows) <= 30
    vals = [(-r["vmr_milli"], r["term"]) for r in rows]
    assert vals == sorted(vals)
    for r in rows:
        assert r["vmr_milli"] >= 0
        assert r["df"] <= r["total_count"]


def test_softdedup_retention_bounds(spark):
    """Effective mass can never exceed raw mass (weights <= 1), clusters
    <= docs, and retention is exactly the floored ratio."""
    for r in Q["llm_softdedup_weights"](spark, SF0001).collect():
        assert r["eff_tokens_milli"] <= r["raw_tokens"] * 1000
        assert r["n_clusters"] <= r["n_docs"]
        assert r["retained_milli"] == r["eff_tokens_milli"] // r["raw_tokens"]
        assert 0 < r["retained_milli"] <= 1000


def test_moe_router_shares_sum_to_one(spark):
    """Expert shares partition the corpus: micro shares sum to ~1e6
    (floor loss < E), and the aux loss sum is >= the uniform-load
    minimum E * sum(f_e * P_e) >= 1 - floor slack."""
    rows = Q["llm_moe_router_balance"](spark, SF0001).collect()
    assert len(rows) <= _MOE_EXPERTS
    ds = sum(r["doc_share_micro"] for r in rows)
    ts = sum(r["tok_share_micro"] for r in rows)
    assert 1000000 - _MOE_EXPERTS <= ds <= 1000000
    assert 1000000 - _MOE_EXPERTS <= ts <= 1000000
    aux = sum(r["aux_term_micro"] for r in rows)
    # Chebyshev: E*sum(f*P) >= 1 when f and P rank together; floor slack
    assert aux >= 1000000 - 2 * _MOE_EXPERTS * 1000


def test_chunking_closed_form(spark):
    """Recompute the chunk count identity doc-by-doc and compare the
    source rollup; emitted >= raw always."""
    from hawaiidatapipeline_spark.registry import load_table

    d = load_table(spark, SF0001, "documents")
    lens = [
        (r["source"], r["n"])
        for r in d.select(
            "source", F.size(F.split("text", " ")).alias("n")
        ).collect()
    ]
    want = {}
    for src, n in lens:
        c = 1 if n <= _CHUNK_W else 1 + -(-(n - _CHUNK_W) // _CHUNK_S)
        agg = want.setdefault(src, [0, 0, 0])
        agg[0] += 1
        agg[1] += c
        agg[2] += n
    for r in Q["llm_context_chunking"](spark, SF0001).collect():
        nd, nc, nt = want[r["source"]]
        assert (r["n_docs"], r["n_chunks"], r["n_tokens"]) == (nd, nc, nt)
        assert r["emitted_tokens"] == r["n_chunks"] * _CHUNK_W
        assert r["emitted_tokens"] >= r["n_tokens"]


def test_neyman_allocation_hits_budget_exactly(spark):
    """Largest-remainder rounding: allocations sum EXACTLY to the
    budget, and no stratum exceeds proportionality by more than 1."""
    from hawaiidatapipeline_spark.registry import load_table

    rows = Q["sample_neyman_allocation"](spark, SF0001).collect()
    n_docs = load_table(spark, SF0001, "documents").count()
    budget = n_docs // _NEYMAN_BUDGET_DEN
    assert sum(r["alloc_docs"] for r in rows) == budget
    for r in rows:
        assert r["alloc_docs"] >= 0
        assert r["s_milli"] >= 0


def test_knn_graph_edge_counts(spark):
    """Every probe node emits at most k edges, reciprocity lies in
    [0, 1000], and reciprocal edges cannot exceed edge count."""
    r = Q["emb_knn_graph_health"](spark, SF0001).collect()[0]
    assert r["n_edges"] <= r["n_nodes"] * _KNNG_K
    assert 0 <= r["n_reciprocal"] <= r["n_edges"]
    assert 0 <= r["reciprocity_milli"] <= 1000
    assert r["max_in_degree"] >= 1


def test_audio_clipping_matches_generator_law(spark):
    """The REAL-decode clip counts equal the closed form of the
    synthetic sample law: 11 of every 200 residues clip at the 95
    rail; per-source totals reconcile."""
    rows = Q["multimodal_audio_clipping"](spark, SF0001).collect()
    assert rows
    for r in rows:
        assert 0 <= r["total_clipped"] <= r["total_samples"]
        # share must be near 11/200 = 55 milli (residue windows wrap)
        assert 40 <= r["clip_share_milli"] <= 70
        assert r["clips_flagged"] >= 0


def test_uniqueness_profile_sane(spark):
    """Status has tiny cardinality, custkey near-unique; entropy is
    non-negative and bounded by ln(n_distinct)."""
    import math

    rows = {r["col_name"]: r for r in Q["dq_uniqueness_profile"](spark, SF0001).collect()}
    assert rows["o_orderstatus"]["n_distinct"] <= 5
    # custkey is orders/customers — far higher cardinality than status
    assert (
        rows["o_custkey"]["distinct_ratio_micro"]
        > 10 * rows["o_orderstatus"]["distinct_ratio_micro"]
    )
    for r in rows.values():
        assert 0 <= r["entropy_micro"] <= math.log(max(r["n_distinct"], 2)) * 1e6 + 1
        assert 0 < r["top_share_milli"] <= 1000


def test_reciprocity_is_total_on_symmetric_build(spark):
    """The directed co-purchase build mirrors every pair, so
    reciprocity must be exactly 1000 — the invariant the audit pins."""
    r = Q["graph_reciprocity"](spark, SF0001).collect()[0]
    assert r["reciprocity_milli"] == 1000
    assert r["n_reciprocal"] == r["n_edges"]
