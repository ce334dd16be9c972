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

# Queries the round-1 driver already proved green (CORRECTNESS_r01.json).
# Registry order must keep these AFTER the first 50 slots so the driver's
# 50-entry round-2 sweep covers only never-checked queries.
ROUND1_GREEN = {
    "pricing_summary", "project_select", "project_alias", "project_computed",
    "filter_compare", "filter_boolean", "filter_in_between_null", "filter_like",
    "fulltext_search", "distinct_rows", "sort_multikey", "limit_n",
    "offset_paging", "topk_global", "set_union_all", "set_union_distinct",
    "set_intersect", "set_except", "subquery_scalar_correlated", "dq_profile",
    "dq_referential", "join_inner_broadcast", "join_inner_sortmerge",
    "join_left_outer", "join_right_outer", "join_full_outer", "join_left_semi",
    "join_left_anti", "join_cross", "join_theta_range", "join_asof",
    "agg_groupby_basic", "agg_global", "agg_multikey", "agg_count_distinct",
    "agg_approx_count_distinct", "agg_having", "agg_rollup", "agg_cube",
    "agg_grouping_sets", "agg_stats", "agg_minby_maxby", "agg_collect_sorted",
    "agg_percentile", "agg_percentile_approx", "agg_pivot", "reshape_unpivot",
    "agg_salted_skew", "win_ranking", "win_ntile_pct",
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
    all be queries with no round-1 correctness row."""
    qs, _ = registry
    window = list(qs)[:50]
    overlap = ROUND1_GREEN.intersection(window)
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
