"""Histogram-quantile sketch: accuracy bound vs exact percentile, and
degenerate single-value groups."""

from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.sketches import histogram_quantile
from hawaiidatapipeline_spark.registry import load_table

from .conftest import SF0001


def test_histogram_median_brackets_order_statistic(spark):
    """The selected bucket must CONTAIN the ceil(p·n)-th order statistic:
    upper-edge estimate within one bucket_width above it. (Interpolated
    percentile() can sit further away across local value gaps — the sketch
    approximates the order statistic, which is the guarantee that matters.)"""
    from pyspark.sql import Window

    o = load_table(spark, SF0001, "orders")
    approx = {
        r.o_orderpriority: r
        for r in histogram_quantile(
            o, "o_orderpriority", "o_totalprice", p=0.5, n_buckets=1000
        ).collect()
    }
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    ranked = o.select(
        "o_orderpriority", "o_totalprice", F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("o_orderpriority")).alias("n"),
    )
    order_stat = {
        r.o_orderpriority: r.o_totalprice
        for r in ranked.filter(F.col("rn") == F.ceil(0.5 * F.col("n"))).collect()
    }
    for grp, row in approx.items():
        stat = order_stat[grp]
        assert stat <= row.q_estimate <= stat + row.bucket_width + 1e-6, (
            grp, row.q_estimate, stat, row.bucket_width,
        )


def test_kmv_distinct_accuracy_and_exact_below_capacity(spark):
    from hawaiidatapipeline_spark.operators.sketches import kmv_distinct

    o = load_table(spark, SF0001, "orders")
    est = {
        r.o_orderpriority: r.est_distinct
        for r in kmv_distinct(o, "o_orderpriority", "o_custkey", k=128).collect()
    }
    exact = {
        r.o_orderpriority: r.nd
        for r in o.groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").alias("nd"))
        .collect()
    }
    for grp, e in est.items():
        rel = abs(e - exact[grp]) / exact[grp]
        # KMV rel. std. error ~ 1/sqrt(k-2) ≈ 9% at k=128; allow 3 sigma
        assert rel < 0.27, (grp, e, exact[grp], rel)
    # below capacity: exact
    small = spark.createDataFrame([("g", i % 7) for i in range(100)], "g string, v int")
    rows = kmv_distinct(small, "g", "v", k=64).collect()
    assert rows[0].est_distinct == 7.0


def test_kmv_state_merges_exactly(spark):
    """The scale claim made concrete: computing k-min sets on two disjoint
    halves, unioning the states, and re-taking the k minimum yields the
    SAME k-th hash — hence the same estimate — as one global pass. This is
    what lets per-partition / per-increment sketch states combine without
    revisiting data."""
    from hawaiidatapipeline_spark.operators.dedup import portable_hash64

    o = load_table(spark, SF0001, "orders")
    k = 64
    hashed = o.select(
        portable_hash64(F.col("o_custkey").cast("string"), 7).alias("h"),
        (F.col("o_orderkey") % 2).alias("half"),
    ).distinct()
    global_kth = (
        hashed.select("h").distinct().orderBy("h").limit(k).orderBy(F.col("h").desc()).limit(1)
    ).collect()[0].h
    half_states = [
        [r.h for r in hashed.filter(F.col("half") == i).select("h").distinct()
         .orderBy("h").limit(k).collect()]
        for i in (0, 1)
    ]
    merged_kth = sorted(set(half_states[0]) | set(half_states[1]))[k - 1]
    assert merged_kth == global_kth


def test_bloom_prefilter_prunes_without_false_negatives(spark):
    from hawaiidatapipeline_spark.operators.sketches import (
        bloom_build,
        bloom_condition,
        bloom_prefilter_join,
    )

    li = load_table(spark, SF0001, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        load_table(spark, SF0001, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey")
    )
    plain = li.join(big, li.l_orderkey == big.o_orderkey).count()
    pruned = bloom_prefilter_join(li, big, "l_orderkey", "o_orderkey")
    assert pruned.count() == plain  # zero false negatives
    # the prefilter must actually prune: surviving fact rows << total
    words = bloom_build(big, "o_orderkey")
    survivors = li.filter(bloom_condition("l_orderkey", words)).count()
    total = li.count()
    assert survivors < total * 0.5, (survivors, total)
    assert survivors >= plain


def test_histogram_quantile_degenerate_group(spark):
    df = spark.createDataFrame(
        [("a", 7.0)] * 5 + [("b", 1.0), ("b", 2.0), ("b", 3.0)], "g string, v double"
    )
    rows = {r.g: r for r in histogram_quantile(df, "g", "v", p=0.5).collect()}
    assert rows["a"].q_estimate == 7.0 and rows["a"].n == 5
    assert 1.0 <= rows["b"].q_estimate <= 3.0


def test_cms_never_undercounts_and_finds_all_heavy_hitters(spark):
    from hawaiidatapipeline_spark.operators.sketches import count_min_heavy_hitters

    e = load_table(spark, SF0001, "events")
    threshold = 10
    got = count_min_heavy_hitters(e, "user_id", threshold=threshold, depth=4, width=64)
    rows = got.collect()
    # estimate is an upper bound on the true count, always
    assert all(r["est_cnt"] >= r["true_cnt"] for r in rows)
    # no false negatives: every true heavy hitter is in the survivor set
    true_heavy = {
        r["user_id"]
        for r in e.groupBy("user_id").count().filter(F.col("count") >= threshold).collect()
    }
    assert true_heavy <= {r["user_id"] for r in rows}


def test_cms_sketch_width_bounds_overestimate(spark):
    from hawaiidatapipeline_spark.operators.sketches import count_min_heavy_hitters

    e = load_table(spark, SF0001, "events")
    # a wide sketch (few collisions) should estimate exactly for most keys
    wide = count_min_heavy_hitters(e, "user_id", threshold=1, depth=4, width=4096)
    exact_frac = wide.filter(F.col("est_cnt") == F.col("true_cnt")).count() / wide.count()
    assert exact_frac > 0.9


def test_bitmap_distinct_equals_direct_count_distinct(spark):
    """The 63-bit-word bitmap aggregation must reproduce count_distinct
    EXACTLY — it is the exact+mergeable point in the distinct-count
    design space (HLL: mergeable, approximate; count_distinct: exact,
    full key shuffle)."""
    from pyspark.sql import functions as F

    from hawaiidatapipeline_spark.queries.aggregates import agg_bitmap_distinct
    from hawaiidatapipeline_spark.registry import load_table

    from .conftest import SF0001

    li = load_table(spark, SF0001, "lineitem")
    direct = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_suppkey").alias("n"))
        .collect()
    }
    bitmap = {
        r.l_returnflag: r.n_distinct_supp
        for r in agg_bitmap_distinct(spark, SF0001).collect()
    }
    assert bitmap == direct
