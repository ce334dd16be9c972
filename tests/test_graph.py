"""Fixed-point PageRank sanity properties."""

from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.graph import pagerank_fixed_point

from .conftest import SF0001  # noqa: F401  (fixture-scale convention)


def _star_graph(spark):
    # hub 0 connected to spokes 1..8 (undirected)
    edges = [(0, s) for s in range(1, 9)] + [(s, 0) for s in range(1, 9)]
    e = spark.createDataFrame(edges, "src long, dst long")
    n = e.select(F.col("src").alias("node")).distinct()
    return e, n


def test_hub_outranks_spokes_and_floor_holds(spark):
    e, n = _star_graph(spark)
    ranks = {r["node"]: r["rank_micro"] for r in pagerank_fixed_point(e, n).collect()}
    hub = ranks[0]
    spokes = [v for k, v in ranks.items() if k != 0]
    assert all(hub > s for s in spokes)
    # every node keeps at least the teleport mass
    assert all(v >= 150_000 for v in ranks.values())
    # spokes are symmetric: identical integer ranks (no float drift)
    assert len(set(spokes)) == 1


def test_pagerank_is_deterministic_across_runs(spark):
    e, n = _star_graph(spark)
    r1 = sorted(map(tuple, pagerank_fixed_point(e, n).collect()))
    r2 = sorted(map(tuple, pagerank_fixed_point(e, n).collect()))
    assert r1 == r2
