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
    "inference_extra",
    "causal_extra",
    "attribution_extra",
    "scalepath_extra",
    "ops_extra",
    "robust_extra",
    "audit_extra",
    "mining_extra",
    "geo_extra",
    "sampling",
    "sketches_extra",
    "metrics_extra",
    "round10_extra",
    "round11_extra",
    "selection_extra",
    "text_extra",
    "curation_extra",
    "emb_extra",
    "ivfpq",
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
    'llm_lang_id_eval', 'events_attribution_markov', 'llm_oov_rate',
    'llm_mixture_epochs', 'agg_effect_sizes', 'ts_ohlc_bars',
    'agg_group_median_exact', 'ts_bollinger_bands', 'scan_schema_merge',
    'dq_partition_skew_report', 'events_new_vs_returning', 'emb_ivf_nprobe_cost_curve',
    'stream_late_audit', 'soql_geo_hull', 'soql_datetime_median',
    'soql_fixed_floating', 'soql_text_case', 'emb_ivfpq_topk_nprobe2',
    'llm_semdedup_cells', 'llm_semdedup_recall', 'llm_semdedup_survivors',
    'llm_corpus_pipeline_v6', 'llm_dsir_weights', 'llm_dsir_sample',
    'emb_ivfpq_rerank', 'llm_dupspan_removal_plan', 'ts_pacf',
    'agg_ddsketch_quantiles', 'llm_dsir_eval', 'fulltext_bm25',
    'fulltext_eval_ndcg', 'llm_bpe_merge_steps', 'emb_kmeanspp_init',
    'graph_harmonic_centrality', 'llm_corpus_pipeline_v7', 'agg_cms_merge_proof',
    'graph_ppr_seeded', 'project_computed', 'filter_compare',
    'filter_boolean', 'filter_in_between_null', 'filter_like',
    'fulltext_search', 'distinct_rows', 'sort_multikey',
    'limit_n', 'offset_paging', 'topk_global',
    'set_union_all', 'set_union_distinct',
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
