"""Salting and bucketing: results identical to unsalted plans; bucketed
joins elide exchanges."""

import pytest
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.bucketing import cobucketed_join, write_bucketed
from hawaiidatapipeline_spark.operators.skew import salted_aggregate, salted_join
from hawaiidatapipeline_spark.plans import audit
from hawaiidatapipeline_spark.registry import load_table

from .conftest import SF0001


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_aggregate_equals_plain(spark):
    li = load_table(spark, SF0001, "lineitem")
    plain = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 6).alias("qty"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )
    salted = salted_aggregate(
        li,
        ["l_returnflag"],
        {
            "n": F.count(F.lit(1)),
            "qty": F.sum("l_quantity"),
            "lo": F.min("l_extendedprice"),
            "hi": F.max("l_extendedprice"),
        },
        n_salts=8,
    ).select("l_returnflag", "n", F.round("qty", 6).alias("qty"), "lo", "hi")
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_aggregate_rejects_unmergeable(spark):
    li = load_table(spark, SF0001, "lineitem")
    with pytest.raises(ValueError, match="not mergeable"):
        salted_aggregate(li, ["l_returnflag"], {"a": F.avg("l_quantity")})
    # count_distinct stringifies like count — must still be rejected
    with pytest.raises(ValueError, match="not mergeable"):
        salted_aggregate(li, ["l_returnflag"], {"d": F.count_distinct("l_orderkey")})


def test_salted_join_rejects_dim_duplicating_modes(spark):
    li = load_table(spark, SF0001, "lineitem").select("l_orderkey")
    o = load_table(spark, SF0001, "orders").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    with pytest.raises(ValueError, match="unsupported"):
        salted_join(li, o, "l_orderkey", how="full_outer")


def test_salted_join_equals_plain(spark):
    li = load_table(spark, SF0001, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, SF0001, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(o, "l_orderkey").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("s")
    )
    salted = salted_join(li, o, "l_orderkey", n_salts=4).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("s")
    )
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_bucketed_join_has_no_exchange(spark):
    # managed tables land in ./spark-warehouse (gitignored); warehouse.dir is
    # a static conf and can't be pointed at tmp_path on a live session
    li = load_table(spark, SF0001, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, SF0001, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    write_bucketed(li, "li_bkt", "l_orderkey", n_buckets=4, sort_col="l_orderkey")
    write_bucketed(o, "o_bkt", "l_orderkey", n_buckets=4, sort_col="l_orderkey")
    joined = cobucketed_join(spark, "li_bkt", "o_bkt", "l_orderkey")
    assert audit.num_exchanges(joined) == 0, audit.explain_str(joined, "simple")
    # and it still returns the right row count
    assert joined.count() == li.join(o, "l_orderkey").count()
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS o_bkt")


def test_aqe_splits_skewed_join_partitions(spark):
    """Mechanical proof of the AQE skew-join claim in SCALE.md: with a
    pathologically hot key and fixture-sized thresholds, the executed SMJ
    must carry the skew=true marker (runtime partition splitting). This is
    the engine-level guard our salted operators complement, not replace."""
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        fact = spark.range(200_000).select(
            F.when(F.col("id") % 100 < 98, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(1000).select(F.col("id").alias("k"), F.lit("d").alias("tag"))
        # NOTE: assert on the bare join — AQE declines to split a skewed
        # join whose output partitioning is reused downstream (e.g. a
        # groupBy on the same key), since the split would force an extra
        # shuffle. That refusal is itself correct scale behavior.
        joined = fact.join(dim, "k")
        rows = joined.collect()
        assert len(rows) == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


class TestZipfWindowPath:
    """Skew stress on WINDOW operators (the paths AQE's skew-join split
    cannot touch — a window partition is indivisible), over the zipf-hot
    lane from tools/skew_stress.py: one user owns 15% of all rows."""

    def _lane(self, spark):
        from tools.skew_stress import zipf_events

        return zipf_events(spark, n_rows=60_000, n_users=200)

    def test_salted_window_topk_equals_plain_on_hot_key(self, spark):
        from pyspark.sql import Window

        from hawaiidatapipeline_spark.operators.skew import salted_window_topk

        ev = self._lane(spark)
        order = [F.col("value").desc(), F.col("event_id")]  # total order
        w = Window.partitionBy("user_id").orderBy(*order)
        plain = ev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)
        salted = salted_window_topk(ev, ["user_id"], order, k=5, n_salts=8)
        cols = ["user_id", "event_id", "rn"]
        assert _sorted_rows(plain.select(*cols)) == _sorted_rows(salted.select(*cols))
        # two-phase shape: a per-(key,salt) Window then a per-key Window
        plan = salted._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Window") >= 2, plan[:2000]

    def test_sessionize_hot_key_matches_driver_fold(self, spark):
        """Gap sessionization has no salt-decomposition (session numbering
        is a running sum over the user's total event order); the skew
        contract is therefore CORRECTNESS under a zipf-hot key — the hot
        user costs one large sorted partition, never a wrong answer."""
        from pyspark.sql import Window

        gap_s = 1800
        ev = self._lane(spark)
        es = F.col("ts").cast("double")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        new_sess = F.when(
            F.lag("ts").over(w).isNull() | ((es - F.lag(es).over(w)) > gap_s), 1
        ).otherwise(0)
        sess = (
            ev.select("user_id", "ts", "event_id", es.alias("es"))
            .withColumn("session_seq", F.sum(new_sess).over(wrun))
            .groupBy("user_id", "session_seq")
            .agg(F.count(F.lit(1)).alias("n_events"))
        )
        got_hot = sorted(
            (r["session_seq"], r["n_events"])
            for r in sess.filter(F.col("user_id") == 0).collect()
        )
        hot = sorted(
            (r["es"], r["event_id"])
            for r in ev.filter(F.col("user_id") == 0)
            .select(es.alias("es"), "event_id")
            .collect()
        )
        seq, counts, prev = 0, {}, None
        for t, _eid in hot:
            if prev is None or t - prev > gap_s:
                seq += 1
            counts[seq] = counts.get(seq, 0) + 1
            prev = t
        assert got_hot == sorted(counts.items())
