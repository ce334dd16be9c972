"""Round-13 batch 6-12 operator invariants: privacy audit, theta
sketch algebra, reservoir mergeability, centralities, influence, JL
distortion, IPW, FD discovery, guardrails, fusion, multimodal audits.

These are the PROPERTY tests the oracle hash can't express — the hash
proves Spark == DuckDB; these prove the shared answer means what the
operator claims."""

from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries.round13b_extra import (
    QUERIES as Q,
    _KANON_K,
    _RES_K,
    _THETA_K,
)

from .conftest import SF0001


def test_theta_estimates_bracket_exact(spark):
    """Theta-sketch estimates must be sane: retained ≤ k per leg, and
    each estimate within 50% relative error of the exact cardinality at
    the fixture (k=64 on hundreds of customers — coarse but bounded),
    with union ≥ max(intersect, a_not_b) retained."""
    rows = {r["op"]: r for r in Q["agg_theta_sketch_setops"](spark, SF0001).collect()}
    assert set(rows) == {"union", "intersect", "a_not_b"}
    for op, r in rows.items():
        assert r["retained"] <= 2 * _THETA_K
        assert r["est_distinct"] >= 0
        # the relative-error contract only means something once the
        # retained sample is non-trivial (a 1-hash estimate is noise)
        if r["exact_distinct"] > 0 and r["retained"] >= 8:
            rel = abs(r["est_distinct"] - r["exact_distinct"]) / r["exact_distinct"]
            assert rel < 0.5, f"{op}: est {r['est_distinct']} vs exact {r['exact_distinct']}"
    assert rows["union"]["retained"] >= rows["intersect"]["retained"]
    assert rows["union"]["retained"] >= rows["a_not_b"]["retained"]


def test_reservoir_merge_is_lossless(spark):
    """The merge proof's whole claim: every one of the k positions of
    the shard-merged reservoir matches the direct sample."""
    rows = Q["sample_reservoir_merge_proof"](spark, SF0001).collect()
    assert len(rows) == _RES_K
    assert all(r["match_direct"] == 1 for r in rows)
    keys = [r["key_val"] for r in rows]
    assert keys == sorted(keys)  # rn follows the key total order


def test_katz_dominated_by_degree_bound(spark):
    """Katz scores are non-negative and bounded by the geometric series
    of the max in-degree: x_l <= (maxdeg/4)^l * 1000."""
    df = Q["graph_katz_centrality"](spark, SF0001)
    rows = df.collect()
    assert all(r["katz_milli"] >= 0 for r in rows)
    from hawaiidatapipeline_spark.operators.graph import copurchase_edges
    from hawaiidatapipeline_spark.registry import load_table

    li = load_table(spark, SF0001, "lineitem")
    maxdeg = (
        copurchase_edges(li, directed=True)
        .groupBy("dst")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    bound = sum((max(maxdeg, 1) ** l) * 1000 // (4 ** l) for l in (1, 2, 3))
    assert all(r["katz_milli"] <= bound for r in rows)


def test_hits_normalization_hits_1000(spark):
    """HITS max-normalization: the top hub and top authority must score
    exactly 1000 milli, everything else in [0, 1000]."""
    rows = Q["graph_hits_hubs_auth"](spark, SF0001).collect()
    hubs = [r["hub_milli"] for r in rows]
    auths = [r["auth_milli"] for r in rows]
    assert max(hubs) == 1000 and max(auths) == 1000
    assert min(hubs) >= 0 and min(auths) >= 0


def test_k_anonymity_generalization_never_hurts(spark):
    """Region-level k is the sum of its nations' k, so region_k >= k
    for every class, and releasable is implied by not-at-risk."""
    rows = Q["dq_k_anonymity"](spark, SF0001).collect()
    for r in rows:
        assert r["region_k"] >= r["k"]
        if r["at_risk"] == 0:
            assert r["releasable"] == 1
        assert (r["k"] < _KANON_K) == (r["at_risk"] == 1)


def test_influence_val_docs_excluded(spark):
    """Influence ranks TRAINING docs only — no validation-slice doc
    (doc_id % 7 == 0) may appear in the top-20."""
    rows = Q["llm_influence_proxy"](spark, SF0001).collect()
    assert len(rows) == 20
    assert all(r["doc_id"] % 7 != 0 for r in rows)
    infl = [r["influence_e12"] for r in rows]
    assert infl == sorted(infl, reverse=True)


def test_jl_distortion_centers_on_unity(spark):
    """JL with m=16: the pair-count-weighted mean distortion must land
    within [0.5, 1.5] of the expectation 1000 milli (loose — m is small,
    but a sign/projection bug lands far outside)."""
    rows = Q["emb_jl_distortion"](spark, SF0001).collect()
    n = sum(r["n_pairs"] for r in rows)
    mean = sum(r["mean_milli"] * r["n_pairs"] for r in rows) / n
    assert 500 <= mean <= 1500, mean


def test_ipw_arms_partition_users(spark):
    """IPW arm sizes partition the user set; the Hájek means are exact
    integer milli values derivable from the weights."""
    r = Q["events_ipw_ate"](spark, SF0001).collect()[0]
    from hawaiidatapipeline_spark.registry import load_table

    n_users = (
        load_table(spark, SF0001, "events").select("user_id").distinct().count()
    )
    assert r["n_treated"] + r["n_control"] == n_users
    assert r["ate_milli"] == r["mu1_milli"] - r["mu0_milli"]


def test_fd_discovery_key_fd_holds(spark):
    """c_custkey -> c_mktsegment must HOLD (custkey is a key), and g3
    is 0 exactly when holds=1 for every candidate."""
    rows = {r["fd"]: r for r in Q["dq_fd_discovery"](spark, SF0001).collect()}
    assert rows["c_custkey->c_mktsegment"]["holds"] == 1
    for r in rows.values():
        assert (r["violation_rows"] == 0) == (r["holds"] == 1)
        assert 0 <= r["g3_milli"] <= 1000


def test_sequential_pairs_support_bounds(spark):
    """Sequential-pair support can't exceed users-with-antecedent, and
    confidence is the exact integer ratio."""
    for r in Q["mine_sequential_pairs"](spark, SF0001).collect():
        assert r["support_users"] <= r["users_with_a"]
        assert r["confidence_milli"] == (r["support_users"] * 1000) // r["users_with_a"]


def test_obf_boundary_monotone_decreasing(spark):
    """The O'Brien-Fleming boundary must tighten as information
    accrues: bound2 is non-increasing in (n1+n0), and z2 is always
    non-negative."""
    rows = Q["events_sequential_obf_guardrail"](spark, SF0001).collect()
    rows = sorted(rows, key=lambda r: r["day"])
    bounds = [r["bound2_micro"] for r in rows]
    assert all(b2 <= b1 for b1, b2 in zip(bounds, bounds[1:]))
    assert all(r["z2_micro"] >= 0 for r in rows)


def test_rrf_fused_beats_single_leg_presence(spark):
    """A doc ranked #1 in BOTH legs would score 2*(1e6/61); every fused
    score must be positive and no doc may exceed that ceiling."""
    rows = Q["llm_rrf_hybrid_retrieval"](spark, SF0001).collect()
    ceiling = 2 * (1000000 // 61)
    assert all(0 < r["rrf_micro"] <= ceiling for r in rows)
    # at least one doc should be found by both legs at the fixture
    assert any(
        r["lex_rank"] is not None and r["sem_rank"] is not None for r in rows
    )


def test_audio_fingerprint_clusters_partition(spark):
    """Fingerprint cluster sizes must sum to the clip count, and n_bits
    is frames-1 (bounded by the synthetic duration)."""
    rows = Q["multimodal_audio_fingerprint"](spark, SF0001).collect()
    from collections import Counter

    by_fp = Counter(r["fingerprint"] for r in rows)
    for r in rows:
        assert r["cluster_n"] == by_fp[r["fingerprint"]]
        assert 1 <= r["n_bits"] <= 9


def test_audio_downsample_halves_samples(spark):
    """Stride-2 decimation keeps ceil(n/2) samples and can't create
    energy: energy_out <= energy_in."""
    for r in Q["multimodal_audio_downsample"](spark, SF0001).collect():
        assert r["n_out"] == (r["n_in"] + 1) // 2
        assert r["energy_out"] <= r["energy_in"]


def test_image_patches_cover_crop_grid(spark):
    """Patch manifest: exactly (h//4)*(w//4) tiles per image with the
    synthetic dims, and flat channels mean sum_g = 16*g for every tile."""
    rows = Q["multimodal_image_patches"](spark, SF0001).collect()
    from collections import Counter

    per_img = Counter(r["id"] for r in rows)
    for i, n_tiles in per_img.items():
        h, w = 8 + i % 5, 16 + i % 8
        assert n_tiles == (h // 4) * (w // 4)
    for r in rows:
        assert r["sum_g"] == 16 * ((3 * r["id"]) % 256)
        assert r["n_px"] == 16


def test_video_keyframes_tile_scenes(spark):
    """Scene lengths per video must sum to the frame count and the
    first keyframe is always frame 0."""
    rows = Q["multimodal_video_keyframes"](spark, SF0001).collect()
    from collections import defaultdict

    by_id = defaultdict(list)
    for r in rows:
        by_id[r["id"]].append(r)
    for i, scenes in by_id.items():
        scenes = sorted(scenes, key=lambda r: r["scene_no"])
        assert scenes[0]["keyframe_frame"] == 0
        n_frames = 3 + i % 4
        assert sum(r["scene_len_frames"] for r in scenes) == n_frames


def test_split_leakage_fix_plan_is_minimal(spark):
    """Every reported cluster genuinely straddles (n_splits > 1) and
    the move count is strictly less than the cluster size (the
    canonical member never moves)."""
    for r in Q["llm_split_leakage_audit"](spark, SF0001).collect():
        assert r["n_splits"] > 1
        assert 0 < r["n_moved"] < r["n_docs"]


def test_gopher_conjunction_bounded_by_rules(spark):
    """pass_all can't exceed any individual rule's pass count."""
    for r in Q["llm_gopher_rules_gate"](spark, SF0001).collect():
        for c in (
            "pass_wordcount", "pass_mean_word_len", "pass_stopwords",
            "pass_dominance", "pass_dup_bigram",
        ):
            assert r["pass_all"] <= r[c]
        assert r["retention_milli"] == (r["pass_all"] * 1000) // r["n_docs"]


def test_decay_counters_bounded_by_raw(spark):
    """Decayed counts never exceed raw count x 1e6, and the longer
    half-life always retains at least as much mass."""
    for r in Q["agg_decay_counters"](spark, SF0001).collect():
        assert r["decayed_h7_micro"] <= r["n_events"] * 1000000
        assert r["decayed_h30_micro"] >= r["decayed_h7_micro"]


def test_manifest_prune_sorted_layout_wins(spark):
    """The whole point of the key: the date-sorted layout must scan
    fewer files than ingestion order for the range query, while both
    layouts agree on the matched rows and revenue."""
    rows = {r["layout"]: r for r in Q["layout_manifest_prune"](spark, SF0001).collect()}
    ing, srt = rows["ingestion_order"], rows["date_sorted"]
    assert srt["candidate_files"] <= ing["candidate_files"]
    assert srt["rows_matched"] == ing["rows_matched"]
    assert srt["revenue_cents"] == ing["revenue_cents"]
    assert srt["rows_scanned"] >= srt["rows_matched"]


def test_kneser_ney_probabilities_valid(spark):
    """KN components: discounted main term below the MLE ratio,
    lambda in (0, 1e6], continuation in (0, 1e6], and the interpolated
    p >= the main term."""
    for r in Q["llm_kneser_ney_bigram"](spark, SF0001).collect():
        assert 0 <= r["pmain_micro"] <= 1000000
        assert 0 < r["lambda_micro"] <= 1000000
        assert 0 < r["pcont_micro"] <= 1000000
        assert r["p_kn_micro"] >= r["pmain_micro"]


def test_bitemporal_restated_only_after_horizon(spark):
    """Restated orders exist (the fixture posts corrections after the
    as-of horizon), and as-of totals are >= current totals (corrections
    are -10%)."""
    rows = Q["etl_bitemporal_correction"](spark, SF0001).collect()
    assert sum(r["n_restated"] for r in rows) > 0
    for r in rows:
        assert r["total_asof_cents"] >= r["total_now_cents"]


def test_char_entropy_buckets_ordered(spark):
    """Histogram buckets carry consistent min/max envelopes."""
    for r in Q["llm_char_entropy_compressibility"](spark, SF0001).collect():
        assert r["min_h_micro"] <= r["mean_h_micro"] <= r["max_h_micro"]
        assert r["bucket"] == r["min_h_micro"] // 250000
        assert r["bucket"] == r["max_h_micro"] // 250000


def test_char_entropy_degenerate_docs_match_oracle(spark, tmp_path):
    """Docs shorter than 2 chars must emit NO bigrams on either engine
    (ADVICE r13: Spark's sequence(1, 0) descends while DuckDB's
    generate_series(1, 0) is empty — the guard makes both sides drop
    them). Build a fixture with empty/1-char docs and hash-compare."""
    import duckdb

    sf = str(tmp_path)
    rows = [
        (1, "", "en", "web", 0),
        (2, "a", "en", "web", 1),
        (3, "ab", "en", "web", 2),
        (4, "abcabc", "en", "wiki", 6),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    got = sorted(
        tuple(r) for r in Q["llm_char_entropy_compressibility"](spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    from hawaiidatapipeline_spark.queries.round13b_extra import ORACLES

    want = sorted(tuple(r) for r in con.execute(
        ORACLES["llm_char_entropy_compressibility"]
    ).fetchall())
    assert got == want
    # only docs 3 and 4 survive the guard; both engines agree on that
    assert sum(r[2] for r in got) == 2
