"""Generic data-quality expectations engine (complements the fixed
dq_profile / dq_referential checks): declare rules as boolean SQL
expressions, get one violation-count report row per rule from a SINGLE
scan — the Great-Expectations-style gate as one conditional aggregation,
no per-rule jobs.

    report = expect(df, {
        "qty_positive":  "l_quantity > 0",
        "disc_in_range": "l_discount between 0 and 1",
    })
    # rule | n_violations | n_rows | pass

At 100 TB this is one pass over the table regardless of rule count;
`fail_fast` turns violations into a raised error for pipeline gating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ExpectationError(AssertionError):
    """Raised by ``expect(..., fail_fast=True)`` when any rule is violated."""


def expect(df: DataFrame, rules: dict[str, str], fail_fast: bool = False) -> DataFrame:
    """One-scan violation report: each rule contributes a conditional SUM
    (row violates when the expression is false OR null — SQL three-valued
    logic must not let nulls slip through a gate)."""
    import re

    if not rules:
        raise ValueError("expect() needs at least one rule")
    for name in rules:
        if not re.fullmatch(r"[A-Za-z_][A-Za-z_0-9]*", name):
            raise ValueError(
                f"rule name {name!r} must be identifier-like (it is spliced "
                "into the report SQL)"
            )
    # coalesce: on an empty frame SUM is NULL, but zero rows violate nothing
    aggs = [F.count(F.lit(1)).alias("_n_rows")] + [
        F.coalesce(
            F.sum(F.when(F.expr(expr_sql).eqNullSafe(F.lit(True)), 0).otherwise(1)),
            F.lit(0),
        ).alias(f"_v_{name}")
        for name, expr_sql in rules.items()
    ]
    row = df.agg(*aggs)
    spark = df.sparkSession
    names = list(rules)
    report = row.selectExpr(
        "stack({n}, {pairs}) AS (rule, n_violations)".format(
            n=len(names),
            pairs=", ".join(f"'{name}', _v_{name}" for name in names),
        ),
        "_n_rows AS n_rows",
    ).select(
        "rule",
        F.col("n_violations").cast("long").alias("n_violations"),
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.col("n_violations") == 0).alias("pass"),
    )
    if fail_fast:
        bad = [(r.rule, r.n_violations) for r in report.collect() if not r["pass"]]
        if bad:
            raise ExpectationError(f"expectations violated: {bad}")
    return report
