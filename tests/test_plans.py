"""Plan-property locks (pushdown / pruning / broadcast) + Pipeline DAG."""

import pytest
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.plans import audit
from hawaiidatapipeline_spark.plans.pipeline import Pipeline
from hawaiidatapipeline_spark.registry import load_table

from .conftest import SF0001


def test_filter_pushdown_reaches_scan(spark):
    from hawaiidatapipeline_spark.queries.relational import filter_compare

    df = filter_compare(spark, SF0001)
    assert any("o_totalprice" in f for f in audit.pushed_filters(df))


def test_column_pruning(spark):
    from hawaiidatapipeline_spark.queries.relational import project_select

    df = project_select(spark, SF0001)
    schemas = audit.read_schemas(df)
    assert schemas and all("c_acctbal" not in s for s in schemas)  # unused col pruned


def test_dim_joins_are_broadcast(spark):
    from hawaiidatapipeline_spark.queries.joins import join_inner_broadcast

    df = join_inner_broadcast(spark, SF0001)
    assert audit.join_strategies(df) == ["BroadcastHashJoin", "BroadcastHashJoin"]
    assert audit.num_exchanges(df) == 0  # fact side never shuffles


def test_flagship_single_shuffle(spark):
    from hawaiidatapipeline_spark.queries.core import pricing_summary

    df = pricing_summary(spark, SF0001)
    assert any("l_shipdate" in f for f in audit.pushed_filters(df))
    assert audit.num_exchanges(df) <= 2  # partial-agg exchange + final sort


def test_pipeline_dag_runs_in_order_with_checkpoint(spark, tmp_path):
    p = Pipeline(spark, "test_pipe", checkpoint_dir=str(tmp_path))
    p.stage("raw", lambda c: load_table(spark, SF0001, "orders"))
    p.stage(
        "big",
        lambda c: c.get("raw").filter(F.col("o_totalprice") > 100000),
        depends=("raw",),
        checkpoint=True,
    )
    p.stage(
        "by_prio",
        lambda c: c.get("big").groupBy("o_orderpriority").count(),
        depends=("big",),
    )
    results = p.run()
    assert results["by_prio"].count() > 0
    lineage = {r.stage: r for r in p.lineage().collect()}
    assert lineage["big"].checkpoint_path is not None
    # checkpoint actually cut lineage: stage reads back from parquet
    assert "Scan parquet" in audit.explain_str(results["big"])


def test_pipeline_rejects_cycles_and_unknown_deps(spark):
    p = Pipeline(spark, "bad")
    with pytest.raises(ValueError, match="undeclared"):
        p.stage("a", lambda c: None, depends=("missing",))
    p2 = Pipeline(spark, "dup")
    p2.stage("a", lambda c: None)
    with pytest.raises(ValueError, match="duplicate"):
        p2.stage("a", lambda c: None)
