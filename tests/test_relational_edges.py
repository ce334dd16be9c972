"""Edge cases the oracle queries can't show: nulls in keys, empty inputs,
ranking ties, session-window gap boundary."""

from datetime import datetime

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_null_keys_in_groupby_and_join(spark):
    df = spark.createDataFrame(
        [(None, 1.0), (None, 2.0), ("a", 3.0)], "k string, v double"
    )
    grouped = {r.k: r.s for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    assert grouped == {None: 3.0, "a": 3.0}  # null is a real group
    other = spark.createDataFrame([(None, "x"), ("a", "y")], "k string, tag string")
    joined = df.join(other, "k").collect()
    assert {r.tag for r in joined} == {"y"}  # null keys never equi-join


def test_empty_input_aggregates(spark):
    df = spark.createDataFrame([], "k string, v double")
    assert df.groupBy("k").agg(F.sum("v")).count() == 0  # no groups
    row = df.agg(F.count("v").alias("c"), F.sum("v").alias("s")).collect()[0]
    assert (row.c, row.s) == (0, None)  # global agg: one row, sum is null


def test_rank_vs_dense_rank_on_ties(spark):
    df = spark.createDataFrame(
        [("g", 10), ("g", 10), ("g", 5)], "g string, v int"
    )
    w = Window.partitionBy("g").orderBy(F.col("v").desc())
    rows = df.select(
        "v", F.rank().over(w).alias("r"), F.dense_rank().over(w).alias("d")
    ).collect()
    got = sorted((r.v, r.r, r.d) for r in rows)
    assert got == [(5, 3, 2), (10, 1, 1), (10, 1, 1)]


def test_session_window_gap_boundary(spark):
    """An event exactly gap-after the previous one is MERGED into the same
    session (Spark merges on ts <= session_end); only a strictly-greater gap
    splits. The oracle in queries/events.py uses > to mirror this."""
    t = datetime
    df = spark.createDataFrame(
        [
            (1, t(2024, 1, 1, 10, 0)),
            (1, t(2024, 1, 1, 10, 30)),  # exactly 30 min later -> merged
            (1, t(2024, 1, 1, 11, 0, 0, 1)),  # 30 min + 1 µs -> new session
        ],
        "user_id bigint, ts timestamp",
    )
    sessions = (
        df.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .count()
        .collect()
    )
    assert len(sessions) == 2
