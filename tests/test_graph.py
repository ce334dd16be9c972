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


def test_reliable_checkpoint_path_used_when_dir_configured(spark, tmp_path):
    """Cluster-deployment contract (operators/materialize.py): when the
    session has a reliable checkpoint dir, iterative materialization goes
    through fault-tolerant ``checkpoint()`` (files under the dir) instead
    of executor-local blocks — and the integer fixed-point results are
    bit-identical on either path."""
    import os

    from hawaiidatapipeline_spark.operators.materialize import (
        materialize,
        reliable_checkpoint_configured,
    )

    e, n = _star_graph(spark)
    local = sorted(map(tuple, pagerank_fixed_point(e, n).collect()))

    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    ckpt_dir = str(tmp_path / "ckpt")
    sc.setCheckpointDir(ckpt_dir)
    try:
        assert reliable_checkpoint_configured(e)
        reliable = sorted(map(tuple, pagerank_fixed_point(e, n).collect()))
        # the reliable path actually wrote checkpoint data
        wrote = any(files for _, _, files in os.walk(ckpt_dir))
        assert wrote, "no checkpoint files written under the configured dir"
        # materialize() round-trips a frame intact on the reliable path
        back = materialize(e)
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, e.collect()))
        assert back.schema == e.schema
    finally:
        # reset for the rest of the session-scoped fixture's tests
        # (py4j: the Scala setter is `checkpointDir_=`, mangled to `_$eq`)
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(sc._jvm.scala.Option.empty())
    assert sc.getCheckpointDir() is None
    assert local == reliable


def test_degree_orientation_eliminates_hub_wedges(spark):
    """The skew property the orientation exists for: on a star graph
    (hub 0 + n spokes) a raw-KEY orientation keeps every edge outgoing
    from the hub — C(n,2) wedges from one node — while degree orientation
    points every edge spoke→hub, producing ZERO wedges. Triangle counts
    are orientation-invariant (here: none either way), but the
    intermediate wedge volume is the 100×-scale cost."""
    from pyspark.sql import functions as F

    from hawaiidatapipeline_spark.operators.graph import orient_edges_by_degree

    n = 12

    def wedge_count(e):
        e1, e2 = e.alias("e1"), e.alias("e2")
        return e1.join(e2, F.col("e2.u") == F.col("e1.v")).count()

    # hub 0 keeps ALL edges outgoing under key order (0 < every spoke);
    # one feeder edge (-1, 0) makes the hub an intermediate node, so the
    # wedge join fans out through it: n wedges under key orientation
    star = spark.createDataFrame([(0, s) for s in range(1, n + 1)], "u long, v long")
    feeder = spark.createDataFrame([(-1, 0)], "u long, v long")
    key_edges = star.unionAll(feeder)
    assert wedge_count(key_edges) == n  # (-1,0)⋈(0,s): hub fan-out blow-up
    oriented = orient_edges_by_degree(
        key_edges.select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
    )
    assert wedge_count(oriented) == 0  # all edges point INTO the hub
    # orientation preserved the edge set as an undirected graph
    assert oriented.count() == n + 1
