"""Pure-Python pipeline DAG over DataFrame thunks.

The reference's pipeline = fetch dataset → munge in Ruby → cache to local
files, chained manually. Here each stage is a named thunk producing a
DataFrame from its dependencies; the runner topologically orders stages,
persists/checkpoints where declared, and records lineage.

Checkpointing is PARQUET MATERIALIZATION, not ``df.checkpoint()``: at 100 TB
a long DAG must cut lineage at stable storage so (a) downstream stages
re-plan from compact columnar inputs with fresh statistics (AQE sees real
sizes), (b) a failed run resumes from the last checkpoint, (c) independent
consumers share the intermediate. ``cache`` is intra-run reuse only.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Stage:
    name: str
    fn: Callable[["StageContext"], DataFrame]
    depends: tuple[str, ...] = ()
    checkpoint: bool = False
    cache: bool = False


@dataclass
class StageRun:
    stage: str
    depends: tuple[str, ...]
    started_at: float
    finished_at: float
    schema: str
    checkpoint_path: str | None


class StageContext:
    """Handed to each stage fn; exposes upstream results by name."""

    def __init__(self, results: dict[str, DataFrame], spark: SparkSession):
        self._results = results
        self.spark = spark

    def get(self, name: str) -> DataFrame:
        if name not in self._results:
            raise KeyError(f"stage dependency {name!r} has not run")
        return self._results[name]


class Pipeline:
    """Named-stage DAG. Stages declare dependencies; ``run`` executes in
    topological order (deterministic: declaration order among ready stages).

    >>> p = Pipeline(spark, "daily", checkpoint_dir="/data/ckpt")
    >>> p.stage("raw", lambda c: spark.read.parquet(src))
    >>> p.stage("clean", lambda c: c.get("raw").filter(...), depends=("raw",),
    ...         checkpoint=True)
    >>> results = p.run()
    """

    def __init__(self, spark: SparkSession, name: str, checkpoint_dir: str | None = None):
        self.spark = spark
        self.name = name
        self.checkpoint_dir = checkpoint_dir
        self._stages: dict[str, Stage] = {}
        self.runs: list[StageRun] = []

    def stage(
        self,
        name: str,
        fn: Callable[[StageContext], DataFrame],
        depends: tuple[str, ...] = (),
        checkpoint: bool = False,
        cache: bool = False,
    ) -> "Pipeline":
        if name in self._stages:
            raise ValueError(f"duplicate stage {name!r}")
        for d in depends:
            if d not in self._stages:
                raise ValueError(f"stage {name!r} depends on undeclared {d!r}")
        if checkpoint and not self.checkpoint_dir:
            raise ValueError("checkpoint=True requires a checkpoint_dir")
        self._stages[name] = Stage(name, fn, tuple(depends), checkpoint, cache)
        return self

    def _topo_order(self) -> list[Stage]:
        order: list[Stage] = []
        done: set[str] = set()
        pending = list(self._stages.values())
        while pending:
            ready = [s for s in pending if all(d in done for d in s.depends)]
            if not ready:
                cycle = ", ".join(s.name for s in pending)
                raise ValueError(f"dependency cycle among stages: {cycle}")
            for s in ready:
                order.append(s)
                done.add(s.name)
            pending = [s for s in pending if s.name not in done]
        return order

    def run(self) -> dict[str, DataFrame]:
        results: dict[str, DataFrame] = {}
        ctx = StageContext(results, self.spark)
        for s in self._topo_order():
            t0 = time.time()
            df = s.fn(ctx)
            ckpt_path = None
            if s.checkpoint:
                ckpt_path = os.path.join(self.checkpoint_dir, self.name, s.name)
                df.write.mode("overwrite").parquet(ckpt_path)
                df = self.spark.read.parquet(ckpt_path)  # lineage cut
            if s.cache:
                df = df.persist()
            results[s.name] = df
            self.runs.append(
                StageRun(s.name, s.depends, t0, time.time(), df.schema.simpleString(), ckpt_path)
            )
        return results

    def lineage(self) -> DataFrame:
        """The run log as a DataFrame — stage, deps, timing, schema, where
        it was materialized. The queryable provenance record."""
        rows = [
            (
                r.stage,
                list(r.depends),
                r.started_at,
                r.finished_at,
                round(r.finished_at - r.started_at, 3),
                r.schema,
                r.checkpoint_path,
            )
            for r in self.runs
        ]
        return self.spark.createDataFrame(
            rows,
            "stage string, depends array<string>, started_at double, finished_at double,"
            " seconds double, schema string, checkpoint_path string",
        )
