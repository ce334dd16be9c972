"""Physical-plan auditing: programmatic access to the checks a performance
review does by eyeballing ``df.explain("formatted")``.

Used by tests/test_plans.py to LOCK IN the plan properties that matter at
100 TB — filters reaching the Parquet scan, dims broadcast, column pruning —
so a refactor that silently regresses the plan fails CI, not production.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # same text .explain() prints
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries across all scans in the plan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df)):
        out.extend(f.strip() for f in m.group(1).split(",") if f.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings for each file scan (column-pruning view)."""
    return re.findall(r"ReadSchema: (struct<[^>]*>)", explain_str(df))


def join_strategies(df: DataFrame) -> list[str]:
    """Physical join operators in occurrence order (simple mode: each
    operator printed once; formatted mode repeats them in detail sections)."""
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)",
        explain_str(df, "simple"),
    )


def num_exchanges(df: DataFrame) -> int:
    """Shuffle count (Exchange operators; BroadcastExchange excluded by the
    word boundary) — the number that must stay flat as data grows."""
    return len(re.findall(r"\bExchange\b", explain_str(df, "simple")))


def wholestage_codegen_ids(df: DataFrame) -> list[str]:
    """WholeStageCodegen span ids — wider/fewer spans = more fused compute."""
    return re.findall(r"WholeStageCodegen \((\d+)\)", explain_str(df))
