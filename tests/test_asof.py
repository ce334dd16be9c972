"""As-of join edge cases: equal timestamps (inclusive), no prior match,
multiple matches — the union-then-window pattern from queries/joins.py."""

from datetime import datetime

from pyspark.sql import Window
from pyspark.sql import functions as F


def _asof(clicks, purchases):
    merged = clicks.select(
        "user_id", "ts", F.lit(0).alias("tag"), "click_id", F.lit(None).cast("long").alias("purchase_id")
    ).unionByName(
        purchases.select(
            "user_id", "ts", F.lit(1).alias("tag"), F.lit(None).cast("long").alias("click_id"), "purchase_id"
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn("last_click_id", F.last("click_id", ignorenulls=True).over(w))
        .filter(F.col("tag") == 1)
        .select("purchase_id", "user_id", "last_click_id")
    )


def test_asof_semantics(spark):
    t = datetime
    clicks = spark.createDataFrame(
        [
            (1, t(2024, 1, 1, 10, 0), 100),
            (1, t(2024, 1, 1, 12, 0), 101),
            (2, t(2024, 1, 1, 9, 0), 200),
        ],
        "user_id bigint, ts timestamp, click_id bigint",
    )
    purchases = spark.createDataFrame(
        [
            (1, t(2024, 1, 1, 11, 0), 1000),  # between clicks -> 100
            (1, t(2024, 1, 1, 12, 0), 1001),  # equal ts -> inclusive -> 101
            (2, t(2024, 1, 1, 8, 0), 2000),  # before any click -> null
            (3, t(2024, 1, 1, 8, 0), 3000),  # user with no clicks -> null
        ],
        "user_id bigint, ts timestamp, purchase_id bigint",
    )
    got = {r.purchase_id: r.last_click_id for r in _asof(clicks, purchases).collect()}
    assert got == {1000: 100, 1001: 101, 2000: None, 3000: None}
