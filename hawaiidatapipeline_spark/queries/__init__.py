"""Checked query registry.

Every operator from SURVEY.md §2 lands here as a named entry: a PySpark
callable ``(spark, sf_dir) -> DataFrame`` plus (for E-oracle rows) the
equivalent ANSI SQL that DuckDB runs over the same Parquet tables. The
driver hash-compares the two at sf0.01 — column names are aliased
identically on both sides, floating aggregates rounded to 6 dp on both
sides (SURVEY.md §7 risk 1).

Modules register into ``QUERIES`` / ``ORACLES`` via ``collect()``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Registry order drives the driver's correctness sweep, which records the
# FIRST 50 entries per round. Rounds 1-3 proved 147 keys green
# (CORRECTNESS_r01/r02/r03.json, disjoint windows, 0 standing failures);
# the round-4 window (below) fronts the 50 keys never driver-checked as
# of round 3. Keys added during round 4 queue for the round-5 rotation.
_MODULES = (
    "functions",
    "events",
    "llm",
    "textanalysis",
    "udfs",
    "sources",
    # -- module order no longer affects the driver window (see _FRONT) --
    "multimodal",
    "soql_demo",
    "sources_extra",
    "tpch",
    "tpch_extra",
    "analysis_extra",
    "warehouse_extra",
    "training_extra",
    "sqlsurface_extra",
    "functional_extra",
    "patterns_extra",
    "stats_extra",
    "ops_extra",
    "geo_extra",
    "sampling",
    "sketches_extra",
    "text_extra",
    "curation_extra",
    "emb_extra",
    "joins_extra",
    "layout",
    "graph_demo",
    "training",
    "analytics",
    "pipeline_demo",
    "windows",
    "core",
    "relational",
    "joins",
    "aggregates",
)

# The driver's per-round correctness sweep records the FIRST 50 registry
# entries. _FRONT pins that window to an EXPLICIT key list (in order),
# decoupled from module placement — adding a query to any module can no
# longer silently shift the window. Keys listed here but not registered
# (e.g. a module not built yet) are ignored. Per-round procedure: run
# tools/rotate_window.py with all CORRECTNESS_r*.json files — it rewrites
# this tuple to fail-on-record keys first, then never-checked keys.
#
# Round-4 window: exactly the 50 keys with no driver row after round 3
# (windows family, etl_*, corpus pipelines v1-v4, fn_bitwise, ...).
_FRONT: tuple[str, ...] = (
    'events_transition_matrix', 'llm_unigram_logprob', 'catalog_search',
    'multimodal_video_frames', 'multimodal_image_resize', 'soql_fulltext_terms',
    'tpch_q4_late_orders', 'tpch_q19_disjunctive_revenue', 'tpch_q7_volume_shipping',
    'tpch_q8_market_share', 'tpch_q9_product_profit', 'tpch_q13_order_count_distribution',
    'tpch_q15_top_supplier', 'tpch_q16_supplier_part_variety', 'tpch_q17_small_quantity_revenue',
    'tpch_q20_part_promotion_suppliers', 'tpch_q21_late_supplier_blame', 'tpch_q22_dormant_customers',
    'tpch_q2_min_cost_supplier', 'tpch_q11_important_stock', 'tpch_q12_late_lines_by_priority',
    'events_sessionize_gap', 'join_asof_forward', 'join_asof_nearest',
    'graph_triangle_count', 'agg_regression', 'llm_dupspan_ngram',
    'fn_struct_ops', 'join_asof_tolerance', 'ts_outage_detection',
    'etl_partition_overwrite', 'scan_partition_pruned_agg', 'events_rate_limit',
    'emb_dim_stats', 'dq_freshness', 'dq_schema_contract',
    'llm_dataset_card', 'etl_incremental_join_view', 'etl_cdc_apply',
    'dq_column_masking', 'sample_systematic', 'llm_shard_manifest',
    'llm_quota_sample', 'join_exists_flag', 'agg_moments',
    'events_top_sequences', 'sql_group_by_all', 'sql_star_except',
    'fn_try_safe', 'join_hint_shuffle_hash',
)


def collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """Import every query module and merge its QUERIES/ORACLES dicts,
    then move the pinned ``_FRONT`` window keys to the head of the
    registry (the driver sweeps the first 50 entries per round)."""
    import importlib

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for modname in _MODULES:
        fqname = f"hawaiidatapipeline_spark.queries.{modname}"
        try:
            mod = importlib.import_module(fqname)
        except ModuleNotFoundError as exc:
            # Only tolerate the module file itself being absent; a broken
            # import INSIDE an existing module must fail loudly, otherwise
            # its queries silently vanish from the correctness gate.
            if exc.name == fqname:
                continue  # module not built yet
            raise
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query key: {name}")
            queries[name] = fn
        for name, sql in getattr(mod, "ORACLES", {}).items():
            if name in oracles:
                raise ValueError(f"duplicate oracle key: {name}")
            oracles[name] = sql
    front = [k for k in _FRONT if k in queries]
    ordered = {k: queries[k] for k in front}
    ordered.update((k, v) for k, v in queries.items() if k not in ordered)
    return ordered, oracles
