"""Similarity operators: GEMM top-k must equal the exact pair ranking;
LSH recall sanity on fixture embeddings."""

from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.similarity import (
    as_double_vec,
    cosine_pairs_exact,
    cosine_topk_gemm,
    cosine_topk_lsh,
)
from hawaiidatapipeline_spark.registry import load_table

from .conftest import SF0001


def _topk_exact(e, k):
    return (
        cosine_pairs_exact(e)
        .orderBy(F.round("cos_sim", 6).desc(), "vec_a", "vec_b")
        .limit(k)
        .select("vec_a", "vec_b", F.round("cos_sim", 6).alias("cos_sim"))
    )


def test_gemm_equals_exact(spark):
    e = as_double_vec(load_table(spark, SF0001, "embeddings"))
    exact = [tuple(r) for r in _topk_exact(e, 20).collect()]
    gemm = [
        tuple(r)
        for r in cosine_topk_gemm(e, k=20)
        .select("vec_a", "vec_b", F.round("cos_sim", 6).alias("cos_sim"))
        .collect()
    ]
    assert gemm == exact


def test_gemm_size_gate_never_collects_large_input(spark):
    """Past max_index_rows the GEMM path must not toPandas() the table:
    'error' raises loudly; 'lsh'/'exact' route to distributed plans."""
    import pytest

    e = as_double_vec(load_table(spark, SF0001, "embeddings"))
    with pytest.raises(ValueError, match="max_index_rows"):
        cosine_topk_gemm(e, k=5, max_index_rows=10, fallback="error")
    routed = cosine_topk_gemm(e, k=5, max_index_rows=10, fallback="exact")
    assert "mapInPandas" not in routed._jdf.queryExecution().analyzed().toString()
    exact = [tuple(r) for r in _topk_exact(e, 5).collect()]
    got = [
        tuple(r)
        for r in routed.select(
            "vec_a", "vec_b", F.round("cos_sim", 6).alias("cos_sim")
        ).collect()
    ]
    assert got == exact
    assert cosine_topk_gemm(e, k=5, max_index_rows=10, fallback="lsh").count() > 0


def test_lsh_finds_planted_near_duplicates(spark):
    """Fixture embeddings are near-uniform random (best cosine ≈ 0.5 — no
    true neighbors), where bucketed LSH legitimately has low recall. The
    meaningful property: genuinely-near vectors land in shared buckets. We
    plant 20 perturbed copies and require LSH to surface them."""
    import numpy as np

    base = load_table(spark, SF0001, "embeddings").limit(20).toPandas()
    rng = np.random.default_rng(7)
    planted = []
    for _, row in base.iterrows():
        v = np.array(row["embedding"], dtype="float64")
        noisy = v + rng.normal(0, 0.02, v.shape)  # cos ≈ 0.999
        planted.append((int(row["vec_id"]) + 10_000, [float(x) for x in noisy]))
    extra = spark.createDataFrame(planted, "vec_id bigint, embedding array<double>")
    all_vecs = as_double_vec(
        load_table(spark, SF0001, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .unionByName(extra)
    )
    got = {(r.vec_a, r.vec_b) for r in cosine_topk_lsh(all_vecs, k=40, n_tables=8).collect()}
    expected = {(int(i), int(i) + 10_000) for i in base["vec_id"]}
    recall = len(expected & got) / len(expected)
    assert recall >= 0.8, f"planted-pair recall too low: {recall}"


def test_ivf_finds_planted_near_duplicates(spark):
    """Same planted-near-dup protocol as the LSH test: a trained k-means
    quantizer must co-locate vectors at cosine ≈ 0.999 (a perturbed copy
    lands in the same cell unless it falls on a cell boundary)."""
    import numpy as np

    from hawaiidatapipeline_spark.operators.similarity import cosine_topk_ivf

    base = load_table(spark, SF0001, "embeddings").limit(20).toPandas()
    rng = np.random.default_rng(7)
    planted = []
    for _, row in base.iterrows():
        v = np.array(row["embedding"], dtype="float64")
        noisy = v + rng.normal(0, 0.02, v.shape)
        planted.append((int(row["vec_id"]) + 10_000, [float(x) for x in noisy]))
    extra = spark.createDataFrame(planted, "vec_id bigint, embedding array<double>")
    all_vecs = as_double_vec(
        load_table(spark, SF0001, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .unionByName(extra)
    )
    got = {(r.vec_a, r.vec_b) for r in cosine_topk_ivf(all_vecs, k=40, n_cells=8).collect()}
    expected = {(int(i), int(i) + 10_000) for i in base["vec_id"]}
    recall = len(expected & got) / len(expected)
    assert recall >= 0.8, f"planted-pair recall too low: {recall}"
    # multi-probe: with MANY cells (more boundaries) probing 3 lists must
    # recover at least what single-probe finds, and still clear the bar
    got1 = {
        (r.vec_a, r.vec_b)
        for r in cosine_topk_ivf(all_vecs, k=40, n_cells=32, n_probe=1).collect()
    }
    got3 = {
        (r.vec_a, r.vec_b)
        for r in cosine_topk_ivf(all_vecs, k=40, n_cells=32, n_probe=3).collect()
    }
    r1 = len(expected & got1) / len(expected)
    r3 = len(expected & got3) / len(expected)
    assert r3 >= r1, (r1, r3)
    assert r3 >= 0.8, f"multi-probe recall too low: {r3}"


def test_sharded_gemm_equals_exact_with_no_driver_collect(spark, monkeypatch):
    """The sharded grid (VERDICT r3 item 3) must produce the exact top-k
    WITHOUT any driver-side index build: toPandas is forbidden for the
    whole call."""
    from pyspark.sql import DataFrame

    from hawaiidatapipeline_spark.operators.similarity import cosine_topk_gemm_sharded

    e = as_double_vec(load_table(spark, SF0001, "embeddings"))
    exact = [tuple(r) for r in _topk_exact(e, 20).collect()]

    def _forbidden(self, *a, **k):
        raise AssertionError("sharded GEMM must not collect the index to the driver")

    monkeypatch.setattr(DataFrame, "toPandas", _forbidden)
    sharded = cosine_topk_gemm_sharded(e, k=20, n_shards=3, n_probe_blocks=2)
    got = [
        tuple(r)
        for r in sharded.select(
            "vec_a", "vec_b", F.round("cos_sim", 6).alias("cos_sim")
        ).collect()
    ]
    assert got == exact


def test_knn_join_gemm_matches_jvm_window_ranking(spark):
    """knn_join_gemm's in-kernel (cos desc, id asc) top-k must equal the
    pure-JVM zip_with/aggregate + row_number reference on the fixture."""
    from pyspark.sql import Window

    from hawaiidatapipeline_spark.operators.similarity import _dot, knn_join_gemm, with_norm

    e = as_double_vec(load_table(spark, SF0001, "embeddings")).select("vec_id", "label", "emb")
    probes = e.filter(F.col("vec_id") < 20)
    got = (
        knn_join_gemm(probes, e, k=3, payload=("label",))
        .select("query_id", "neighbor_id", "rank", F.round("cos_sim", 6).alias("s"))
        .orderBy("query_id", "rank")
        .collect()
    )
    en = with_norm(e, "emb")
    q, n = en.filter(F.col("vec_id") < 20).alias("q"), en.alias("n")
    sims = q.join(n, F.col("q.vec_id") != F.col("n.vec_id")).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("n.vec_id").alias("neighbor_id"),
        (_dot(F.col("q.emb"), F.col("n.emb")) / (F.col("q.norm") * F.col("n.norm"))).alias("s"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("s").desc(), "neighbor_id")
    ref = (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "rank", F.round("s", 6).alias("s"))
        .orderBy("query_id", "rank")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in ref]


def test_gemm_byte_gate_trips_on_high_dim(spark):
    """The driver gate is byte-aware: a tiny max_index_bytes budget must
    route to the fallback even when the row count is far under
    max_index_rows — high-dimensional vectors cannot OOM the driver
    before a row-count-only gate would trip."""
    import pytest

    e = as_double_vec(load_table(spark, SF0001, "embeddings"))
    n = e.count()
    assert n < 4_000_000  # row gate alone would NOT trip
    with pytest.raises(ValueError, match="max_index_bytes"):
        cosine_topk_gemm(e, k=5, max_index_bytes=1024, fallback="error")
    routed = cosine_topk_gemm(e, k=5, max_index_bytes=1024, fallback="exact")
    assert "mapInPandas" not in routed._jdf.queryExecution().analyzed().toString()
    exact = [tuple(r) for r in _topk_exact(e, 5).collect()]
    got = [
        tuple(r)
        for r in routed.select(
            "vec_a", "vec_b", F.round("cos_sim", 6).alias("cos_sim")
        ).collect()
    ]
    assert got == exact
