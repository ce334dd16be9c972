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


def observed_metric(obs, name: str, timeout_s: float = 120.0):
    """Bounded read of an ``Observation`` metric riding a materialize().

    The free-convergence pattern (connected_components, the PCA squaring
    ladder): attach ``df.observe(obs, ...)`` before ``materialize(df)``
    and the metric is computed BY the materialization action — no extra
    job. ``Observation.get`` would wait indefinitely if materialize ever
    stopped running a listener-visible DataFrame action, so poll the
    JVM-side non-blocking ``getOrEmpty`` with a deadline and fail loudly
    instead (ADVICE r7)."""
    import time

    if not hasattr(obs, "_jo"):
        # Spark Connect (or a future PySpark that drops the private JVM
        # handle): no non-blocking probe exists, so run the documented
        # blocking ``Observation.get`` under a watchdog thread — same
        # fail-loudly-at-deadline contract, without private-API churn risk.
        import concurrent.futures

        ex = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        try:
            return ex.submit(lambda: obs.get[name]).result(timeout=timeout_s)
        except concurrent.futures.TimeoutError:
            pass  # fall through to the shared loud failure below
        finally:
            ex.shutdown(wait=False)
    else:
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            if not obs._jo.getOrEmpty().isEmpty():
                return obs.get[name]  # populated → returns immediately
            time.sleep(0.05)
    raise RuntimeError(
        f"observed_metric({name!r}): the Observation was never populated "
        f"within {timeout_s:.0f}s after materialize() — materialize() must "
        "run a listener-visible DataFrame action (not an RDD-level action); "
        "see operators/materialize.py"
    )
