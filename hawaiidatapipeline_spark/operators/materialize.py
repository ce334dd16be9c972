"""Lineage-truncating materialization with a cluster-reliable option.

Iterative operators (pagerank_fixed_point, ml_kmeans_fixed_point,
connected_components, the triangle-count edge set) re-materialize their
working set each round so the plan stays flat at any iteration count. On
``local[*]`` that is ``localCheckpoint()`` — executor-memory blocks, zero
extra I/O. On a real cluster, executor-local blocks VANISH on executor
loss and Spark cannot recompute them (lineage was truncated), killing the
job mid-iteration. The cluster-safe form is ``checkpoint()`` to reliable
storage (HDFS/S3 via ``SparkContext.setCheckpointDir``), which survives
any executor death at the cost of a write+read per materialization.

``materialize(df)`` picks automatically: reliable ``checkpoint()`` when
the session has a checkpoint dir configured (the cluster deployment sets
one), ``localCheckpoint()`` otherwise (the single-node default). Both are
eager, so caller semantics — "computed once, lineage cut" — are identical
on either path.

Cluster-deployment requirement: reliable checkpoint files are NOT
deleted when the DataFrame is garbage-collected unless the session sets
``spark.cleaner.referenceTracking.cleanCheckpoints=true``. Iterative
callers checkpoint every round, so a long-lived cluster session without
that flag accumulates unbounded checkpoint storage — set it alongside
``setCheckpointDir`` (and/or apply a storage-lifecycle rule to the
checkpoint path) in any deployment that uses the reliable path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def reliable_checkpoint_configured(df: DataFrame) -> bool:
    """True when the owning SparkContext has a reliable checkpoint dir."""
    sc = df.sparkSession.sparkContext
    return sc.getCheckpointDir() is not None


def materialize(df: DataFrame) -> DataFrame:
    """Eagerly compute ``df`` once and truncate its lineage.

    Uses fault-tolerant ``checkpoint()`` when
    ``SparkContext.setCheckpointDir`` has been called (cluster mode),
    else ``localCheckpoint()`` (single-node; fast, not executor-loss
    safe). Deterministic operators produce identical results on either
    path — the oracle hashes don't depend on which one ran.
    """
    if reliable_checkpoint_configured(df):
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
