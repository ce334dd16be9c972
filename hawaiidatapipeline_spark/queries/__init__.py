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
    "training",
    "analytics",
    "pipeline_demo",
    "windows",
    "core",
    "relational",
    "joins",
    "aggregates",
)


def collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """Import every query module and merge its QUERIES/ORACLES dicts."""
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
    return queries, oracles
