"""Streaming latency/throughput evidence for the stateful runtime.

The streaming operators have batch-parity correctness tests but (until
round 5) no performance artifact. This probe drives the two custom
stateful sinks with the rate source at two input rates and harvests
per-microbatch numbers from the progress reports:

- **rate limiter** (``rate_limited_counters``): applyInPandasWithState,
  per-user hour buckets — measures the Arrow state-exchange path;
- **CDC applier** (``run_cdc_sink``): foreachBatch merge + atomic swap —
  measures a full fold-merge-rewrite cycle per batch over a bounded
  (1000-key) target, the steady-state cost profile of the applier.

For each (operator, rate): batches, p50/p95 trigger-execution latency,
input and processed rows/s (medians, warmup batches dropped). Appends a
section to PERF_EVIDENCE.md when called with ``--write``;
tools/perf_evidence.py invokes it so regeneration keeps the table.

Run: ``python tools/streaming_latency.py [--write PERF_EVIDENCE.md]``.
"""

from __future__ import annotations

import json
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

RATES = [2_000, 20_000]  # input rows/second
RUN_SECONDS = 25
TRIGGER = {"processingTime": "1 second"}
WARMUP_BATCHES = 3


def _progress_stats(query) -> dict | None:
    """p50/p95 triggerExecution + throughput medians from recentProgress."""
    progs = []
    for p in query.recentProgress:
        if not isinstance(p, dict):
            p = json.loads(p.json)
        progs.append(p)
    progs = [p for p in progs if p.get("numInputRows", 0) > 0][WARMUP_BATCHES:]
    if len(progs) < 3:
        return None
    lat = sorted(p["durationMs"]["triggerExecution"] for p in progs)
    n = len(lat)
    return {
        "batches": n,
        "p50_ms": lat[n // 2],
        "p95_ms": lat[min(n - 1, int(n * 0.95))],
        "in_rps": round(statistics.median(p["inputRowsPerSecond"] for p in progs)),
        "proc_rps": round(
            statistics.median(p["processedRowsPerSecond"] for p in progs)
        ),
    }


def measure_rate_limiter(spark, rate: int) -> dict | None:
    from hawaiidatapipeline_spark.streaming.runtime import rate_limited_counters

    with tempfile.TemporaryDirectory() as tmp:
        src = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", rate)
            .load()
            .select(
                F.col("value").alias("event_id"),
                F.col("timestamp").alias("ts"),
                F.pmod("value", F.lit(100)).alias("user_id"),
            )
        )
        out = rate_limited_counters(src, cap=2)
        q = (
            out.writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(**TRIGGER)
            .start()
        )
        time.sleep(RUN_SECONDS)
        stats = _progress_stats(q)
        q.stop()
        q.awaitTermination(30)
        return stats


def measure_cdc_applier(spark, rate: int) -> dict | None:
    from hawaiidatapipeline_spark.streaming.runtime import run_cdc_sink

    with tempfile.TemporaryDirectory() as tmp:
        src = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", rate)
            .load()
            .select(
                F.pmod("value", F.lit(1000)).alias("key"),
                F.when(F.pmod("value", 10) == 0, F.lit("D"))
                .otherwise(F.lit("U"))
                .alias("op"),
                F.col("value").alias("op_seq"),
                (F.col("value") * 0.01).alias("price"),
            )
        )
        q = run_cdc_sink(src, f"{tmp}/target", "key", f"{tmp}/ckpt", trigger=TRIGGER)
        time.sleep(RUN_SECONDS)
        stats = _progress_stats(q)
        q.stop()
        q.awaitTermination(30)
        return stats


def measure_aggregate_sink(spark, rate: int) -> dict | None:
    from hawaiidatapipeline_spark.streaming.runtime import run_aggregate_sink

    with tempfile.TemporaryDirectory() as tmp:
        src = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", rate)
            .load()
            .select(
                F.concat(F.lit("t"), F.pmod("value", F.lit(20))).alias(
                    "event_type"
                ),
                (F.col("value") * 0.01).alias("value"),
            )
        )
        q = run_aggregate_sink(
            src, f"{tmp}/target", f"{tmp}/ckpt", trigger=TRIGGER
        )
        time.sleep(RUN_SECONDS)
        stats = _progress_stats(q)
        q.stop()
        q.awaitTermination(30)
        return stats


def measure_funnel_tracker(spark, rate: int) -> dict | None:
    from hawaiidatapipeline_spark.streaming.runtime import funnel_stage_tracker

    with tempfile.TemporaryDirectory() as tmp:
        src = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", rate)
            .load()
            .select(
                F.pmod("value", F.lit(500)).alias("user_id"),
                F.col("timestamp").alias("ts"),
                F.element_at(
                    F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
                    (F.pmod("value", F.lit(3)) + 1).cast("int"),
                ).alias("event_type"),
            )
        )
        # 10-second funnel window: the timeout arms at the EPISODE HORIZON
        # (view + 2W — the round-9 exactly-once fix), so a 1h window would
        # never finalize inside a 25s run and the lane would measure pure
        # state accumulation; a short window keeps episodes closing at the
        # benchmark's own timescale, which is what the latency table is for.
        out = funnel_stage_tracker(
            src, window_hours=10 / 3600, watermark="5 seconds"
        )
        q = (
            out.writeStream.format("noop")
            .outputMode("append")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(**TRIGGER)
            .start()
        )
        time.sleep(RUN_SECONDS)
        stats = _progress_stats(q)
        q.stop()
        q.awaitTermination(30)
        return stats


def measure_late_audit_sink(spark, rate: int) -> dict | None:
    from hawaiidatapipeline_spark.streaming.runtime import run_late_audit_sink

    with tempfile.TemporaryDirectory() as tmp:
        # ~1/7 of rows arrive with a 20-140 min-old event time so every
        # batch routes through all three verdicts; event_id = value is the
        # arrival order the classifier windows on
        src = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", rate)
            .load()
            .select(
                F.pmod("value", F.lit(200)).alias("user_id"),
                F.col("value").alias("event_id"),
                (
                    F.col("timestamp")
                    - F.pmod("value", F.lit(7))
                    * F.expr("INTERVAL 20 MINUTES")
                ).alias("ts"),
                F.element_at(
                    F.array(F.lit("view"), F.lit("click")),
                    (F.pmod("value", F.lit(2)) + 1).cast("int"),
                ).alias("event_type"),
            )
        )
        q = run_late_audit_sink(
            src,
            audit_path=f"{tmp}/audit",
            state_path=f"{tmp}/state",
            checkpoint=f"{tmp}/ckpt",
            trigger=TRIGGER,
        )
        time.sleep(RUN_SECONDS)
        stats = _progress_stats(q)
        q.stop()
        q.awaitTermination(30)
        return stats


def measure_kmv_sink(spark, rate: int) -> dict | None:
    from hawaiidatapipeline_spark.streaming.runtime import run_kmv_sink

    with tempfile.TemporaryDirectory() as tmp:
        src = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", rate)
            .load()
            .select(
                F.col("timestamp").alias("ts"),
                F.pmod("value", F.lit(10000)).alias("user_id"),
            )
        )
        q = run_kmv_sink(src, f"{tmp}/target", f"{tmp}/ckpt", k=32,
                         trigger=TRIGGER)
        time.sleep(RUN_SECONDS)
        stats = _progress_stats(q)
        q.stop()
        q.awaitTermination(30)
        return stats


def _doc_stream(spark, rate: int):
    """Rate source shaped like the documents table: 8-token synthetic
    text through the SAME featurizer path the batch twin uses."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rate)
        .load()
        .select(
            F.col("value").alias("doc_id"),
            F.element_at(
                F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
                (F.pmod("value", F.lit(3)) + 1).cast("int"),
            ).alias("lang"),
            F.element_at(
                F.array(F.lit("web"), F.lit("wiki")),
                (F.pmod("value", F.lit(2)) + 1).cast("int"),
            ).alias("source"),
            F.format_string(
                "w%d the w%d of w%d quality w%d data w%d end w%d",
                F.pmod("value", F.lit(97)),
                F.pmod("value", F.lit(53)),
                F.pmod("value", F.lit(31)),
                F.pmod("value", F.lit(17)),
                F.pmod("value", F.lit(11)),
                F.pmod("value", F.lit(7)),
            ).alias("text"),
        )
    )


def measure_dsir_model_sink(spark, rate: int) -> dict | None:
    from hawaiidatapipeline_spark.streaming.runtime import run_dsir_model_sink

    with tempfile.TemporaryDirectory() as tmp:
        q = run_dsir_model_sink(
            _doc_stream(spark, rate), f"{tmp}/target", f"{tmp}/ckpt",
            trigger=TRIGGER,
        )
        # model-sink batches run ~2s (featurize + merge + rewrite): a 25s
        # window leaves <3 usable post-warmup batches — run longer
        time.sleep(RUN_SECONDS * 2)
        stats = _progress_stats(q)
        q.stop()
        q.awaitTermination(30)
        return stats


def measure_classifier_model_sink(spark, rate: int) -> dict | None:
    from hawaiidatapipeline_spark.streaming.runtime import (
        run_classifier_model_sink,
    )

    with tempfile.TemporaryDirectory() as tmp:
        q = run_classifier_model_sink(
            _doc_stream(spark, rate), f"{tmp}/target", f"{tmp}/ckpt",
            trigger=TRIGGER,
        )
        time.sleep(RUN_SECONDS * 2)  # see dsir note
        stats = _progress_stats(q)
        q.stop()
        q.awaitTermination(30)
        return stats


def measure_theta_sink(spark, rate: int) -> dict | None:
    from hawaiidatapipeline_spark.streaming.runtime import run_theta_sink

    with tempfile.TemporaryDirectory() as tmp:
        src = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", rate)
            .load()
            .select(
                F.pmod("value", F.lit(5000)).alias("o_custkey"),
                F.element_at(
                    F.array(
                        F.lit("1-URGENT"), F.lit("2-HIGH"),
                        F.lit("3-MEDIUM"), F.lit("4-NOT SPECIFIED"),
                        F.lit("5-LOW"),
                    ),
                    (F.pmod("value", F.lit(5)) + 1).cast("int"),
                ).alias("o_orderpriority"),
                (F.pmod("value", F.lit(400000)) * 1.0).alias("o_totalprice"),
            )
        )
        q = run_theta_sink(src, f"{tmp}/target", f"{tmp}/ckpt", k=64,
                           trigger=TRIGGER)
        time.sleep(RUN_SECONDS)
        stats = _progress_stats(q)
        q.stop()
        q.awaitTermination(30)
        return stats


def measure_decay_sink(spark, rate: int) -> dict | None:
    from hawaiidatapipeline_spark.streaming.runtime import run_decay_sink

    with tempfile.TemporaryDirectory() as tmp:
        src = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", rate)
            .load()
            .select(
                F.concat(F.lit("t"), F.pmod("value", F.lit(20))).alias(
                    "event_type"
                ),
                (
                    F.col("timestamp")
                    - F.pmod("value", F.lit(40)) * F.expr("INTERVAL 1 DAY")
                ).alias("ts"),
            )
        )
        q = run_decay_sink(src, f"{tmp}/target", f"{tmp}/ckpt",
                           trigger=TRIGGER)
        time.sleep(RUN_SECONDS)
        stats = _progress_stats(q)
        q.stop()
        q.awaitTermination(30)
        return stats


def run(spark, write_to: str | None = None,
        only: set[str] | None = None) -> int:
    rows = []
    for label, fn in (
        ("rate_limited_counters", measure_rate_limiter),
        ("run_cdc_sink", measure_cdc_applier),
        ("run_aggregate_sink", measure_aggregate_sink),
        ("funnel_stage_tracker", measure_funnel_tracker),
        ("run_late_audit_sink", measure_late_audit_sink),
        ("run_kmv_sink", measure_kmv_sink),
        ("run_dsir_model_sink", measure_dsir_model_sink),
        ("run_classifier_model_sink", measure_classifier_model_sink),
        ("run_theta_sink", measure_theta_sink),
        ("run_decay_sink", measure_decay_sink),
    ):
        if only and label not in only:
            continue
        for rate in RATES:
            s = fn(spark, rate)
            if s is None:  # too few batches (slow startup race) — once more
                s = fn(spark, rate)
            rows.append((label, rate, s))
            print(f"{label} @ {rate} rows/s: {s}")
    ok = all(s is not None for _l, _r, s in rows)

    if write_to and ok:
        with open(write_to, "a") as f:
            f.write(
                "\n\n## streaming micro-batch latency (tools/streaming_latency.py)\n\n"
                f"Rate source, 1 s processing-time trigger, {RUN_SECONDS}s runs,\n"
                f"first {WARMUP_BATCHES} batches dropped as warmup. Latency =\n"
                "`durationMs.triggerExecution` (full batch: plan + state\n"
                "exchange + sink). The CDC applier rewrites its whole bounded\n"
                "1000-key target every batch — its latency is the merge+swap\n"
                "floor, flat in input rate once the target dominates; the rate\n"
                "limiter's cost tracks rows through the Arrow state exchange;\n"
                "the aggregate sink folds each batch's 20-key partial agg into\n"
                "the stored aggregate table (merge cost ∝ batch keys + stored\n"
                "cardinality, never history).\n"
                "processed rows/s ≥ input rows/s means the operator keeps up\n"
                "(no growing backlog) at that rate.\n\n"
                "| operator | input rows/s | batches | p50 ms | p95 ms | processed rows/s |\n"
                "|---|---|---|---|---|---|\n"
            )
            for label, rate, s in rows:
                f.write(
                    f"| {label} | {rate} | {s['batches']} | {s['p50_ms']} "
                    f"| {s['p95_ms']} | {s['proc_rps']} |\n"
                )
        print(f"appended streaming latency table to {write_to}")
    return 0 if ok else 1


def main() -> int:
    from pyspark.sql import SparkSession

    write_to = None
    if "--write" in sys.argv:
        write_to = sys.argv[sys.argv.index("--write") + 1]
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    # -Xss16m: under sustained 1 s processing-time triggers on local[32],
    # Spark's streaming progress/offset path recurses a java.util.regex
    # match deep enough to overflow the DEFAULT JVM thread stack
    # (StackOverflowError entirely inside Pattern$Loop.match frames,
    # observed on the dsir/theta model sinks at 2k rows/s — round 14).
    # A deployment sets executor/driver stack via spark-submit; the probe
    # sets it here so the lane measures the sinks, not the JVM default.
    import os as _os

    cpus = _os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("hdp-streaming-latency")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.extraJavaOptions", "-Xss16m")
        .getOrCreate()
    )
    rc = run(spark, write_to, only)
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
