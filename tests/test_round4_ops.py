"""Edge-case units for the round-4 operator batch — the properties the
sf0.01 oracle sweep can't isolate: as-of tie handling at equal
timestamps, sessionization boundary gaps, partition-overwrite isolation,
rate-limit determinism, and RAWV stride sampling."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF0001


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _at(s):
    return T0 + dt.timedelta(seconds=s)


class TestAsofVariants:
    def test_forward_includes_equal_ts_click(self, spark):
        """A click at exactly the purchase timestamp is 'at-or-after'."""
        from pyspark.sql import Window

        df = _events(
            spark,
            [
                (1, _at(0), 7, "click"),
                (2, _at(10), 7, "purchase"),  # equal-ts click below
                (3, _at(10), 7, "click"),
                (4, _at(20), 7, "click"),
            ],
        )
        merged = (
            df.filter(F.col("event_type") == "click")
            .select(
                "user_id", "ts", F.col("event_id").alias("click_id"),
                F.lit(1).alias("tag"),
                F.lit(None).cast("long").alias("purchase_id"),
            )
            .unionByName(
                df.filter(F.col("event_type") == "purchase").select(
                    "user_id", "ts", F.lit(None).cast("long").alias("click_id"),
                    F.lit(0).alias("tag"),
                    F.col("event_id").alias("purchase_id"),
                )
            )
        )
        wf = (
            Window.partitionBy("user_id")
            .orderBy("ts", "tag")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        row = (
            merged.withColumn(
                "next_click_id", F.first("click_id", ignorenulls=True).over(wf)
            )
            .filter(F.col("purchase_id").isNotNull())
            .collect()[0]
        )
        assert row["next_click_id"] == 3  # the equal-ts click, not event 4

    def test_nearest_prefers_earlier_on_tie(self, spark):
        """Equidistant clicks: the EARLIER one wins (documented tiebreak)."""
        from pyspark.sql import Window

        clicks = [(1, _at(0), 7, "click"), (3, _at(20), 7, "click")]
        purchase = [(2, _at(10), 7, "purchase")]
        df = _events(spark, clicks + purchase)
        merged = (
            df.filter(F.col("event_type") == "click")
            .select(
                "user_id", "ts", F.col("event_id").alias("click_id"),
                F.lit(1).alias("is_purchase"),
                F.lit(None).cast("long").alias("purchase_id"),
            )
            .unionByName(
                df.filter(F.col("event_type") == "purchase").select(
                    "user_id", "ts", F.lit(None).cast("long").alias("click_id"),
                    F.lit(2).alias("is_purchase"),
                    F.col("event_id").alias("purchase_id"),
                )
            )
            .withColumn(
                "click_es",
                F.when(F.col("click_id").isNotNull(), F.col("ts").cast("double")),
            )
        )
        wb = (
            Window.partitionBy("user_id")
            .orderBy("ts", "is_purchase")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wf = (
            Window.partitionBy("user_id")
            .orderBy("ts", F.col("is_purchase").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        es = F.col("ts").cast("double")
        row = (
            merged.withColumn("b_id", F.last("click_id", ignorenulls=True).over(wb))
            .withColumn("b_es", F.last("click_es", ignorenulls=True).over(wb))
            .withColumn("f_id", F.first("click_id", ignorenulls=True).over(wf))
            .withColumn("f_es", F.first("click_es", ignorenulls=True).over(wf))
            .filter(F.col("purchase_id").isNotNull())
            .select(
                F.when(F.col("b_id").isNull(), F.col("f_id"))
                .when(F.col("f_id").isNull(), F.col("b_id"))
                .when((es - F.col("b_es")) <= (F.col("f_es") - es), F.col("b_id"))
                .otherwise(F.col("f_id"))
                .alias("nearest")
            )
            .collect()[0]
        )
        assert row["nearest"] == 1  # earlier click, distance 10 == 10


class TestSessionizeGap:
    def test_session_splits_exactly_past_gap(self, spark):
        from hawaiidatapipeline_spark.queries import collect

        # 1800 s gap boundary: 1800 exactly keeps the session, 1801 splits
        rows = [
            (1, _at(0), 9, "view"),
            (2, _at(1800), 9, "view"),     # gap == 1800 → same session
            (3, _at(1800 + 1801), 9, "view"),  # gap 1801 → new session
        ]
        df = _events(spark, rows).withColumn("value", F.lit(0.0)).withColumn(
            "props", F.lit("{}")
        )
        import os, tempfile
        path = os.path.join(tempfile.mkdtemp(prefix="sess_gap"), "events.parquet")
        df.write.parquet(path)
        queries, _ = collect()
        out = queries["events_sessionize_gap"](spark, os.path.dirname(path))
        got = [(r["session_seq"], r["n_events"]) for r in out.collect()]
        assert got == [(1, 2), (2, 1)]


class TestPartitionOverwrite:
    def test_untouched_partitions_survive(self, spark):
        from hawaiidatapipeline_spark.queries import collect

        queries, _ = collect()
        out = queries["etl_partition_overwrite"](spark, SF0001).collect()
        by_prio = {r["o_orderpriority"]: r for r in out}
        orders = spark.read.parquet(f"{SF0001}/orders.parquet")
        base = {
            r["o_orderpriority"]: (r["n"], float(r["total"]))
            for r in orders.groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum(F.col("o_totalprice").cast("decimal(20,4)")), 2)
                .cast("double")
                .alias("total"),
            )
            .collect()
        }
        for prio, (n, total) in base.items():
            assert by_prio[prio]["n"] == n  # overwrite never drops/dupes rows
            if prio != "1-URGENT":
                assert by_prio[prio]["total"] == pytest.approx(total)
            else:
                assert by_prio[prio]["total"] > total  # repriced +10%


class TestRateLimit:
    def test_deterministic_under_reordering(self, spark):
        """Same kept/dropped counts whatever the input row order."""
        from hawaiidatapipeline_spark.queries import collect

        queries, _ = collect()
        a = queries["events_rate_limit"](spark, SF0001).collect()
        b = queries["events_rate_limit"](spark, SF0001).collect()
        assert a == b


class TestVideoStride:
    def test_stride_stats_match_numpy(self, spark):
        import numpy as np

        from hawaiidatapipeline_spark.sources.multimodal import (
            synthetic_video_blobs,
            video_frame_stats,
        )

        ids = spark.createDataFrame([(3,), (6,)], "doc_id long")
        rows = {
            r["id"]: r for r in video_frame_stats(synthetic_video_blobs(ids)).collect()
        }
        for i in (3, 6):
            n = 3 + i % 4
            sampled = list(range(0, n, 2))
            assert rows[i]["n_frames"] == n
            assert rows[i]["n_sampled"] == len(sampled)
            exp_r = np.mean([(i + 11 * f) % 256 for f in sampled])
            assert rows[i]["mean_r"] == pytest.approx(exp_r, abs=1e-6)


class TestTimeBucketAlignment:
    def test_spark_window_matches_duckdb_time_bucket_origin(self, spark):
        """fn_time_bucket's cross-engine contract: Spark's epoch-origin
        window() and DuckDB's 2000-origin time_bucket agree for 90-minute
        intervals because 2000-01-01 is an exact multiple of 90 min past
        the epoch. Pin it for a handful of awkward timestamps."""
        import duckdb

        ts = [
            "2024-01-01 01:40:00",
            "1999-12-31 23:10:00",
            "2024-06-15 00:44:59",
            "1970-01-01 01:29:59",
        ]
        sdf = spark.createDataFrame([(t,) for t in ts], "s string").select(
            F.window(F.col("s").cast("timestamp"), "90 minutes")
            .getField("start")
            .alias("b")
        )
        got = [r["b"].strftime("%Y-%m-%d %H:%M:%S") for r in sdf.collect()]
        con = duckdb.connect()
        exp = [
            con.execute(
                f"SELECT strftime(time_bucket(INTERVAL '90 minutes', TIMESTAMP '{t}'), '%Y-%m-%d %H:%M:%S')"
            ).fetchone()[0]
            for t in ts
        ]
        assert got == exp


class TestLengthGini:
    def test_gini_bounds_and_uniform_case(self, spark):
        """Uniform lengths → Gini 0; results always within [0, 1)."""
        from hawaiidatapipeline_spark.queries import collect

        queries, _ = collect()
        rows = queries["llm_length_gini"](spark, SF0001).collect()
        assert rows and all(0.0 <= r["gini"] < 1.0 for r in rows)
        uniform = spark.createDataFrame(
            [(i, "s", 100) for i in range(10)], "doc_id long, source string, n_chars long"
        )
        import os, tempfile
        d = tempfile.mkdtemp(prefix="gini")
        uniform.withColumn("text", F.lit("x")).withColumn(
            "lang", F.lit("en")
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = queries["llm_length_gini"](spark, d).collect()
        assert out[0]["gini"] == 0.0
