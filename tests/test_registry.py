"""Registry-level invariants that protect the driver correctness gate.

Round 1 lesson (CORRECTNESS_r01.json): the driver canonicalizes results with
pandas ``sort_values``, which raises ``TypeError: unhashable type`` on any
array/map/struct cell. Queries must therefore serialize complex values
(e.g. ``concat_ws('|', sort_array(...))``) before returning.
"""

import pyspark.sql.types as T
import pytest

from hawaiidatapipeline_spark import queries

from .conftest import SF0001

COMPLEX = (T.ArrayType, T.MapType, T.StructType, T.BinaryType)

# Queries already driver-proved green in a past round (union of
# CORRECTNESS_r01.json + CORRECTNESS_r02.json passing/weak-ok rows;
# regenerate via tools/rotate_window.py). Registry order must keep these
# AFTER the first 50 slots so each round's 50-entry sweep covers only
# never-checked (or fail-on-record) queries.
DRIVER_GREEN = {
    'agg_approx_count_distinct', 'agg_bitmap_distinct',
    'agg_collect_sorted', 'agg_corr_deterministic', 'agg_count_distinct',
    'agg_cube', 'agg_distinct_kmv', 'agg_global', 'agg_groupby_basic',
    'agg_grouping_sets', 'agg_having', 'agg_heavy_hitters_cms',
    'agg_minby_maxby', 'agg_mode_deterministic', 'agg_moments',
    'agg_multikey', 'agg_percentile', 'agg_percentile_approx',
    'agg_pivot', 'agg_quantile_histogram', 'agg_regression', 'agg_rollup',
    'agg_salted_skew', 'agg_stats', 'catalog_list', 'catalog_search',
    'distinct_rows', 'dq_column_masking', 'dq_expectations',
    'dq_freshness', 'dq_profile', 'dq_referential', 'dq_schema_contract',
    'emb_dim_stats', 'emb_label_centroids', 'emb_norm_qc',
    'emb_quantize_int8', 'etl_cdc_apply', 'etl_dedup_incremental',
    'etl_incremental_agg', 'etl_incremental_join_view',
    'etl_merge_upsert', 'etl_partition_overwrite', 'etl_rollup_hierarchy',
    'etl_scd2', 'etl_snapshot_diff', 'events_anomaly', 'events_funnel',
    'events_rate_limit', 'events_retention', 'events_sessionize_gap',
    'events_top_sequences', 'events_transition_matrix',
    'events_user_lifecycle', 'filter_boolean', 'filter_compare',
    'filter_in_between_null', 'filter_like', 'fn_array',
    'fn_array_topk_struct', 'fn_bitwise', 'fn_cast', 'fn_conditional',
    'fn_date_arith', 'fn_date_extract', 'fn_date_trunc', 'fn_explode',
    'fn_geo_box_then_circle', 'fn_geo_distance', 'fn_geo_within_box',
    'fn_hash', 'fn_json', 'fn_map', 'fn_math', 'fn_money_decimal',
    'fn_null_semantics', 'fn_regex', 'fn_string', 'fn_struct_ops',
    'fn_timezone', 'fn_try_safe', 'fn_url_parse', 'fn_variant_json',
    'fulltext_ranked', 'fulltext_search', 'graph_pagerank_copurchase',
    'graph_triangle_count', 'join_asof', 'join_asof_forward',
    'join_asof_nearest', 'join_asof_tolerance', 'join_bloom_prefilter',
    'join_cross', 'join_exists_flag', 'join_full_outer',
    'join_fuzzy_blocked', 'join_hint_shuffle_hash',
    'join_inner_broadcast', 'join_inner_sortmerge',
    'join_interval_binned', 'join_left_anti', 'join_left_outer',
    'join_left_semi', 'join_right_outer', 'join_salted_skew',
    'join_theta_range', 'layout_zorder_key', 'limit_n',
    'llm_chunk_documents', 'llm_containment_pairs',
    'llm_contamination_report', 'llm_corpus_pipeline',
    'llm_corpus_pipeline_v2', 'llm_corpus_pipeline_v3',
    'llm_corpus_pipeline_v4', 'llm_cosine_ivf', 'llm_cosine_topk',
    'llm_dataset_card', 'llm_decontaminate', 'llm_dedup_clusters',
    'llm_dedup_embedding', 'llm_dedup_exact', 'llm_dedup_fuzzy',
    'llm_dedup_jaccard', 'llm_dedup_jaccard_ngram', 'llm_dedup_minhash',
    'llm_dedup_minhash_exact', 'llm_dedup_survivors', 'llm_dedup_url',
    'llm_dupspan_ngram', 'llm_fingerprint', 'llm_fingerprint_exact',
    'llm_inverted_index', 'llm_knn_label', 'llm_lang_id',
    'llm_lang_source_matrix', 'llm_length_histogram',
    'llm_linkage_minhash', 'llm_mixture_sample', 'llm_ngram_counts',
    'llm_pack_sequences', 'llm_pii_scrub', 'llm_quality_score',
    'llm_quota_sample', 'llm_repetition_filter', 'llm_semantic_clusters',
    'llm_shard_manifest', 'llm_simhash_buckets', 'llm_simhash_exact',
    'llm_text_normalize', 'llm_text_stats', 'llm_tfidf_topterms',
    'llm_token_count_bpe', 'llm_train_val_split', 'llm_unigram_logprob',
    'llm_uniqueness_score', 'llm_vocab_coverage',
    'mine_association_rules', 'mine_frequent_pairs',
    'multimodal_audio_decode', 'multimodal_decode_tolerant',
    'multimodal_features', 'multimodal_image_decode',
    'multimodal_image_resize', 'multimodal_video_frames', 'offset_paging',
    'pricing_summary', 'project_alias', 'project_computed',
    'project_select', 'reshape_unpivot', 'sample_bernoulli',
    'sample_stratified', 'sample_systematic', 'sample_weighted',
    'scan_bucketed_join', 'scan_csv_malformed', 'scan_csv_roundtrip',
    'scan_jsonlines', 'scan_orc_roundtrip', 'scan_partition_pruned_agg',
    'scan_schema_evolution', 'scan_text_lines', 'scan_xml_roundtrip',
    'set_except', 'set_intersect', 'set_union_all', 'set_union_by_name',
    'set_union_distinct', 'sink_parquet_partitioned',
    'sink_sorted_export', 'soql_aggregate', 'soql_chained_pipeline',
    'soql_date_functions', 'soql_full_query_string',
    'soql_fulltext_paged', 'soql_fulltext_terms', 'sort_multikey',
    'sql_group_by_all', 'sql_star_except', 'stream_dedup',
    'stream_session', 'stream_sliding', 'stream_tumbling',
    'subquery_scalar_correlated', 'topk_global',
    'tpch_q10_returned_items', 'tpch_q11_important_stock',
    'tpch_q12_late_lines_by_priority',
    'tpch_q13_order_count_distribution', 'tpch_q14_promo_effect',
    'tpch_q15_top_supplier', 'tpch_q16_supplier_part_variety',
    'tpch_q17_small_quantity_revenue', 'tpch_q18_large_orders',
    'tpch_q19_disjunctive_revenue', 'tpch_q20_part_promotion_suppliers',
    'tpch_q21_late_supplier_blame', 'tpch_q22_dormant_customers',
    'tpch_q2_min_cost_supplier', 'tpch_q3_shipping_priority',
    'tpch_q4_late_orders', 'tpch_q5_local_supplier_volume',
    'tpch_q6_forecast_revenue', 'tpch_q7_volume_shipping',
    'tpch_q8_market_share', 'tpch_q9_product_profit', 'ts_fill_forward',
    'ts_interpolate_linear', 'ts_outage_detection', 'ts_resample',
    'udf_arrow_batch', 'udf_cogrouped_map', 'udf_grouped_agg',
    'udf_grouped_map', 'udf_pandas_scalar', 'udf_python_scalar',
    'udtf_python', 'win_distribution', 'win_first_last', 'win_islands',
    'win_lag_lead', 'win_ntile_pct', 'win_range_frame', 'win_ranking',
    'win_running_rows', 'win_topk_per_group',
}


@pytest.fixture(scope="module")
def registry():
    qs, oracles = queries.collect()
    return qs, oracles


def test_no_complex_output_columns(spark, registry):
    """Schema analysis only (no jobs): no query may emit array/map/struct/
    binary columns — the driver's hash canonicalizer crashes on them."""
    qs, _ = registry
    offenders = []
    for name, fn in qs.items():
        schema = fn(spark, SF0001).schema
        for field in schema.fields:
            if isinstance(field.dataType, COMPLEX):
                offenders.append(f"{name}.{field.name}: {field.dataType}")
    assert not offenders, f"complex output columns crash the driver gate: {offenders}"


def test_no_pandas_degrading_output_types(spark, registry):
    """Round-2 lesson (fn_money_decimal, llm_lang_source_matrix): the driver
    fetches both sides through pandas, where DuckDB DECIMAL and HUGEINT
    degrade to float64 while Spark returns Decimal/long — same values,
    different hash. Ban the degrading types at the schema level on BOTH
    sides: Spark queries must not emit DecimalType, and oracle SQL must not
    produce DECIMAL/HUGEINT/UHUGEINT columns (serialize as VARCHAR or cast
    to BIGINT/DOUBLE instead). DuckDB binds the relation without executing,
    so this stays schema-analysis-only like the complex-type lint."""
    import duckdb

    qs, oracles = registry
    offenders = []
    for name, fn in qs.items():
        schema = fn(spark, SF0001).schema
        for field in schema.fields:
            if isinstance(field.dataType, T.DecimalType):
                offenders.append(f"{name}.{field.name}: spark {field.dataType}")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF0001}/{t}.parquet')"
        )
    for name, sql in oracles.items():
        rel = con.sql(sql)
        for col, dtype in zip(rel.columns, rel.types):
            s = str(dtype)
            if s.startswith("DECIMAL") or "HUGEINT" in s:
                offenders.append(f"{name}.{col}: duckdb {s}")
    assert not offenders, (
        f"output types that degrade through the driver's pandas fetch: {offenders}"
    )


def test_driver_window_covers_unchecked_queries(registry):
    """The first 50 registry slots (the driver's per-round sweep size) must
    all be queries with no green driver row yet (fail-on-record keys
    re-enter the window to re-prove their fixes)."""
    qs, _ = registry
    window = list(qs)[:50]
    overlap = DRIVER_GREEN.intersection(window)
    assert not overlap, (
        f"round-1-green queries occupy driver window slots: {sorted(overlap)}"
    )


def test_driver_window_is_exactly_the_pinned_front(registry):
    """The sweep window is pinned by queries._FRONT — adding queries to any
    module must not shift it."""
    qs, _ = registry
    assert list(qs)[: len(queries._FRONT)] == list(queries._FRONT)


def test_every_query_has_oracle_or_weak_marker(registry):
    qs, oracles = registry
    assert set(oracles) <= set(qs)
    assert len(qs) >= 116


def test_bench_headline_keys_are_registered(registry):
    """bench.py is the driver's per-round perf gate: a renamed or dropped
    registry key must fail HERE, not in the driver's bench run."""
    import bench

    qs, _ = registry
    missing = [k for k in bench.HEADLINE if k not in qs]
    assert not missing, f"bench.HEADLINE keys absent from registry: {missing}"


def test_bench_final_line_fits_tail_capture():
    """Round-5 lesson: bench.py's single JSON line (detail + spreads + heavy
    lane) outgrew the driver's tail capture, so BENCH_r05.json recorded
    ``"parsed": null``. The LAST printed line must stay small: simulate it
    with worst-case float widths and bound the serialized size."""
    import json

    import bench

    simulated = {
        "metric": "headline_query_total",
        "value": 99999.999,
        "unit": "sec",
        "queries": {k: 99999.999 for k in bench.HEADLINE},
        "sf": 0.1,
    }
    assert len(json.dumps(simulated)) < 1800


def test_front_window_keys_are_registered(registry):
    """Every pinned _FRONT key must resolve — a typo'd key silently shrinks
    the driver's 50-entry correctness window."""
    qs, _ = registry
    missing = [k for k in queries._FRONT if k not in qs]
    assert not missing, f"_FRONT keys absent from registry: {missing}"
    assert len(queries._FRONT) == 50


def test_front_window_is_not_stale():
    """Round-5 lesson: the driver re-checked round-4's identical window
    because ``_FRONT`` was never rotated, wasting the round's entire
    correctness budget. Guard: if EVERY window key already has a green row
    in a committed CORRECTNESS_r*.json, the window proves nothing new and
    must be rotated (``python tools/rotate_window.py CORRECTNESS_r*.json``).
    A window key with a FAILED row on record is fine — it re-enters the
    window to re-prove its fix."""
    import glob
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.rotate_window import row_is_green

    paths = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                          "CORRECTNESS_r*.json")))
    if not paths:
        pytest.skip("no driver correctness files yet (round 1)")
    green: set[str] = set()
    failed: set[str] = set()
    for path in paths:
        data = json.load(open(path))
        rows = data if isinstance(data, dict) else {r["key"]: r for r in data}
        for key, row in rows.items():
            (green if row_is_green(row) else failed).add(key)
    already_proven = [k for k in queries._FRONT if k in green and k not in failed]
    assert len(already_proven) < len(queries._FRONT), (
        "every _FRONT key already has a green driver row — the next round's "
        "sweep would re-prove old results; rotate the window"
    )


def test_scaling_and_perf_probe_keys_are_registered(registry):
    """The scaling/shuffle evidence tools must track registry renames."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.explain_audit import AUDITS
    from tools.perf_evidence import PROBES
    from tools.scaling_probe import PROBES as SCALING_PROBES

    qs, _ = registry
    missing = [k for k in AUDITS if k not in qs]
    missing += [k for k, _ in PROBES if k not in qs]
    missing += [k for k, _ in SCALING_PROBES if k not in qs]
    assert not missing, f"evidence-tool keys absent from registry: {missing}"
