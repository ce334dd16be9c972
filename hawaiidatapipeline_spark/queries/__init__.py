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

_MODULES = (
    "core",
    "relational",
    "joins",
    "aggregates",
    "windows",
    "functions",
    "events",
    "llm",
    "textanalysis",
    "udfs",
    "sources",
    "pipeline_demo",
    "training",
    "analytics",
)


def collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """Import every query module and merge its QUERIES/ORACLES dicts."""
    import importlib

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for modname in _MODULES:
        try:
            mod = importlib.import_module(f"hawaiidatapipeline_spark.queries.{modname}")
        except ImportError:
            continue  # module not built yet
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query key: {name}")
            queries[name] = fn
        oracles.update(getattr(mod, "ORACLES", {}))
    return queries, oracles
