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
# FIRST 50 entries per round. Round 1 proved core/relational/joins/aggregates
# and the first two windows queries (CORRECTNESS_r01.json, 47 green rows);
# round 2 therefore fronts the 50 never-checked queries
# (functions 18 + events 6 + llm 12 + textanalysis 5 + udfs 5 + sources 4),
# leaving training/analytics/pipeline_demo/windows-tail (16) for round 3.
_MODULES = (
    "functions",
    "events",
    "llm",
    "textanalysis",
    "udfs",
    "sources",
    # -- everything below is outside the round-2 driver window --
    "multimodal",
    "soql_demo",
    "sources_extra",
    "tpch",
    "geo_extra",
    "sampling",
    "sketches_extra",
    "text_extra",
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
# (e.g. a module not built yet) are ignored. Per-round procedure: replace
# this tuple with the next 50 never-driver-checked keys.
#
# Round-2 window: the 50 queries with no CORRECTNESS_r01.json row, in the
# module order the round-2 registry shipped with.
_FRONT: tuple[str, ...] = (
    "fn_string", "fn_regex", "fn_date_extract", "fn_date_trunc",
    "fn_date_arith", "fn_math", "fn_conditional", "fn_cast", "fn_json",
    "fn_map", "fn_array", "fn_explode", "fn_hash", "fn_geo_distance",
    "fn_url_parse", "fn_money_decimal", "fn_array_topk_struct",
    "fn_null_semantics", "stream_tumbling", "stream_sliding",
    "stream_session", "stream_dedup", "ts_resample", "ts_fill_forward",
    "llm_dedup_exact", "llm_dedup_jaccard", "llm_dedup_minhash",
    "llm_dedup_jaccard_ngram", "llm_dedup_embedding", "llm_simhash_buckets",
    "llm_cosine_topk", "llm_cosine_ivf", "llm_knn_label",
    "llm_tfidf_topterms", "llm_text_stats", "llm_lang_source_matrix",
    "llm_lang_id", "llm_quality_score", "llm_token_count_bpe",
    "llm_fingerprint", "multimodal_features", "udf_python_scalar",
    "udf_pandas_scalar", "udf_grouped_map", "udf_grouped_agg",
    "udtf_python", "scan_csv_roundtrip", "scan_jsonlines", "catalog_list",
    "sink_parquet_partitioned",
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
