"""Guard for the round-2 breaking class: the events fixture's physical
timestamp shape has drifted across rounds (TIMESTAMP(NANOS)->long under
nanosAsLong, then tz-naive TIMESTAMP(MICROS)->TIMESTAMP_NTZ under Spark
4's NTZ inference). normalize_event_time must map every shape to plain
TIMESTAMP so event-time ops (unix_micros, withWatermark) keep working."""

import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

from hawaiidatapipeline_spark.registry import load_table, normalize_event_time

from .conftest import SF0001


def test_long_nanos_shape(spark):
    df = spark.createDataFrame(
        [(1_700_000_000_123_456_789,)], "ts bigint"
    )
    out = normalize_event_time(df)
    assert isinstance(out.schema["ts"].dataType, TimestampType)
    got = out.select(F.unix_micros("ts").alias("us")).collect()[0].us
    assert got == 1_700_000_000_123_456  # ns truncated to us


def test_ntz_shape(spark):
    df = spark.createDataFrame(
        [(datetime.datetime(2025, 1, 1, 12, 0, 0),)], "ts timestamp_ntz"
    )
    assert isinstance(df.schema["ts"].dataType, TimestampNTZType)
    out = normalize_event_time(df)
    assert isinstance(out.schema["ts"].dataType, TimestampType)
    # session TZ is UTC, so the cast must be exact wall-clock
    got = out.select(F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("s")).collect()[0].s
    assert got == "2025-01-01 12:00:00"


def test_timestamp_shape_noop(spark):
    df = spark.createDataFrame(
        [(datetime.datetime(2025, 1, 1, 12, 0, 0),)], "ts timestamp"
    )
    out = normalize_event_time(df)
    assert out is df  # already normalized: no extra projection


def test_fixture_events_load_as_timestamp(spark):
    ts_type = load_table(spark, SF0001, "events").schema["ts"].dataType
    assert isinstance(ts_type, TimestampType)
    # and event-time functions accept it (the round-2 failure mode)
    load_table(spark, SF0001, "events").select(F.unix_micros("ts")).limit(1).collect()
