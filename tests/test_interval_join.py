"""Binned interval join: equivalence to the naive range join, no
nested-loop in the plan, and the bin-width contract."""

import pytest
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.bucketing import interval_join_binned
from hawaiidatapipeline_spark.registry import load_table

from .conftest import SF0001


def _fixture(spark):
    e = load_table(spark, SF0001, "events")
    intervals = e.filter(F.col("event_id") % 10 == 0).select(
        F.col("event_id").alias("interval_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end_ts"),
    )
    points = e.select("user_id", "ts", "value")
    return points, intervals


def test_binned_matches_naive_range_join(spark):
    points, intervals = _fixture(spark)
    binned = interval_join_binned(points, intervals, on="user_id", bin_seconds=1800)
    naive = points.join(
        intervals,
        (points["user_id"] == intervals["user_id"])
        & (points["ts"] >= intervals["start_ts"])
        & (points["ts"] < intervals["end_ts"]),
    )
    got = {(r["interval_id"], r["ts"]) for r in binned.collect()}
    want = {(r["interval_id"], r["ts"]) for r in naive.collect()}
    assert got == want
    # each candidate pair meets in exactly one bucket: no duplicates
    assert binned.count() == len(got)


def test_binned_plan_has_no_nested_loop(spark):
    points, intervals = _fixture(spark)
    binned = interval_join_binned(points, intervals, on="user_id", bin_seconds=1800)
    plan = binned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bin_width_contract_rejected_by_equivalence(spark):
    """A bin narrower than the interval loses matches — documents WHY the
    bin_seconds >= max-interval-length contract exists."""
    points, intervals = _fixture(spark)
    too_narrow = interval_join_binned(points, intervals, on="user_id", bin_seconds=600)
    full = interval_join_binned(points, intervals, on="user_id", bin_seconds=1800)
    assert too_narrow.count() < full.count()
