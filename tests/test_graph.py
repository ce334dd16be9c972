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
