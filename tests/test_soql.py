"""SoQL compiler (soql.py): the reference's SODA request surface compiled
onto DataFrames — clause mapping, function rewrites, $q, paging, and the
unsupported-token guard."""

import pytest
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.registry import load_table
from hawaiidatapipeline_spark.soql import SoqlError, rewrite_soql_expr, soql_query

from .conftest import SF0001


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_select_where_order_limit_offset(spark):
    o = load_table(spark, SF0001, "orders")
    got = soql_query(
        o,
        {
            "$select": "o_orderkey, o_totalprice",
            "$where": "o_totalprice > 100000 and o_orderpriority != '5-LOW'",
            "$order": "o_totalprice DESC, o_orderkey",
            "$limit": "20",
            "$offset": "5",
        },
    )
    expected = (
        o.filter((F.col("o_totalprice") > 100000) & (F.col("o_orderpriority") != "5-LOW"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .offset(5)
        .limit(20)
    )
    assert _rows(got) == _rows(expected)


def test_group_having_aggregates(spark):
    o = load_table(spark, SF0001, "orders")
    got = soql_query(
        o,
        {
            "$select": "o_orderpriority, count(*) AS n, round(sum(o_totalprice), 6) AS total",
            "$group": "o_orderpriority",
            "$having": "count(*) > 10",
        },
    )
    expected = (
        o.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 6).alias("total"))
        .filter(F.col("n") > 10)
    )
    assert _rows(got) == _rows(expected)


def test_soql_function_rewrites(spark):
    e = load_table(spark, SF0001, "events")
    got = soql_query(
        e,
        {
            "$select": "event_id, date_extract_m(ts) AS m, date_trunc_ymd(ts) AS d",
            "$where": "date_extract_y(ts) >= 2024",
            "$limit": "100",
        },
    )
    expected = (
        e.filter(F.year("ts") >= 2024)
        .select(
            "event_id",
            F.month("ts").alias("m"),
            F.date_trunc("DAY", "ts").alias("d"),
        )
        .limit(100)
    )
    assert got.count() == expected.count()
    assert _rows(got.select("event_id", "m")) == _rows(expected.select("event_id", "m"))


def test_starts_with_and_case(spark):
    d = load_table(spark, SF0001, "documents")
    got = soql_query(
        d,
        {
            "$select": "doc_id, case(length(text) > 200, 'long', length(text) > 50, 'mid', true, 'short') AS bucket",
            "$where": "starts_with(source, 'src1')",
        },
    )
    expected = d.filter(F.col("source").startswith("src1")).select(
        "doc_id",
        F.when(F.length("text") > 200, "long")
        .when(F.length("text") > 50, "mid")
        .otherwise("short")
        .alias("bucket"),
    )
    assert _rows(got) == _rows(expected)


def test_q_fulltext_over_string_columns(spark):
    d = load_table(spark, SF0001, "documents")
    got = soql_query(d, {"$select": "doc_id", "$q": "merge"})
    expected = d.filter(
        F.lower("text").contains("merge")
        | F.lower("lang").contains("merge")
        | F.lower("source").contains("merge")
    ).select("doc_id")
    assert _rows(got) == _rows(expected)


def test_distance_in_meters_rewrite():
    s = rewrite_soql_expr("distance_in_meters(lat, lon, 21.3, -157.85) < 5000")
    assert "asin" in s and "6371008.8" in s


def test_rejects_unsupported(spark):
    d = load_table(spark, SF0001, "documents")
    with pytest.raises(SoqlError, match="unsupported SoQL function"):
        soql_query(d, {"$select": "doc_id", "$where": "sleep(10) = 1"})
    with pytest.raises(SoqlError, match="unsupported character"):
        soql_query(d, {"$select": "doc_id; DROP TABLE documents"})
    with pytest.raises(SoqlError, match="unsupported SODA parameters"):
        soql_query(d, {"$bogus": "1"})
