"""Expectations engine (operators/quality.py): null semantics, single-scan
report shape, fail-fast gating."""

import pytest

from hawaiidatapipeline_spark.operators.quality import ExpectationError, expect


def test_expect_counts_and_null_violations(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -1.0), (3, None), (4, 5.0)], "id int, v double"
    )
    report = {r.rule: r for r in expect(df, {
        "v_positive": "v > 0",
        "id_known": "id between 1 and 4",
    }).collect()}
    # NULL v must count as a violation, not slip through
    assert report["v_positive"].n_violations == 2
    assert report["v_positive"].n_rows == 4 and not report["v_positive"]["pass"]
    assert report["id_known"].n_violations == 0 and report["id_known"]["pass"]


def test_expect_fail_fast(spark):
    df = spark.createDataFrame([(1,), (2,)], "id int")
    with pytest.raises(ExpectationError, match="id_small"):
        expect(df, {"id_small": "id < 2"}, fail_fast=True)
    # all-pass: returns the report without raising
    assert expect(df, {"id_pos": "id > 0"}, fail_fast=True).count() == 1


def test_expect_rejects_empty_rules(spark):
    df = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(ValueError):
        expect(df, {})
    with pytest.raises(ValueError, match="identifier-like"):
        expect(df, {"bad'name": "id > 0"})


def test_expect_empty_frame_passes(spark):
    df = spark.createDataFrame([], "id int")
    report = expect(df, {"id_pos": "id > 0"}, fail_fast=True).collect()
    assert report[0].n_violations == 0 and report[0]["pass"] and report[0].n_rows == 0
