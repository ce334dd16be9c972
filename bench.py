"""Benchmark harness — one JSON line with per-query wall time.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default sf0.1) on
``local[$SPARK_GRAFT_CPUS]``. Each query is forced to full materialization
with the noop sink (measures compute, not driver collect). A warmup pass
absorbs JVM/codegen/Python-worker startup.

Noise hardening (round-2 lesson: the gate metric was one co-tenant spike
away from blowing 2×): each query runs ``$SPARK_GRAFT_BENCH_PASSES``
(default 3) timed passes with a short cooldown between queries; the
reported per-query number and the headline total are MEDIANS, and the
full per-query min/median/max spread is recorded in the JSON so a noisy
box is visible in the artifact instead of argued about afterwards.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = max(int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")), 1)
COOLDOWN_SEC = float(os.environ.get("SPARK_GRAFT_BENCH_COOLDOWN", "0.2"))

# Headline set: one per operator family, weighted toward the shuffles/joins
# that dominate at scale. FROZEN since round 1 — the headline total is the
# apples-to-apples number vs BASELINE.md; do not add queries here (that
# would inflate the total and break round-over-round comparison).
HEADLINE = [
    "pricing_summary",
    "join_inner_broadcast",
    "join_inner_sortmerge",
    "join_asof",
    "agg_multikey",
    "agg_rollup",
    "win_topk_per_group",
    "win_running_rows",
    "stream_session",
    "stream_sliding",
    "ts_resample",
    "fulltext_search",
    "llm_dedup_exact",
    "llm_dedup_minhash",
    "llm_tfidf_topterms",
    "llm_cosine_topk",
    "llm_corpus_pipeline",
    "llm_decontaminate",
    "llm_pack_sequences",
    "udf_pandas_scalar",
]

# Heavy set: the expensive round-2..4 operators whose walls were previously
# measured once (PERF_EVIDENCE.md / SCALING.md) and never re-checked — under
# the gate from round 5 so a regression trips the bench diff instead of
# hiding. Reported as a SEPARATE total ("heavy_total") so the frozen
# headline metric stays baseline-comparable.
HEAVY = [
    "llm_containment_pairs",
    "llm_dupspan_ngram",
    "graph_triangle_count",
    "graph_link_prediction",
    "tpch_q21_late_supplier_blame",
    "events_sessionize_gap",
    "llm_cosine_topk_sharded",
    # round-6 additions (heavy_total therefore not comparable to r5's —
    # compare per-query medians across rounds instead)
    "graph_connected_components",
    "llm_lsh_band_stats",
    # round-7 additions (same caveat for r6's heavy_total)
    "llm_bigram_logprob",
    "graph_kcore_peel",
    "emb_ann_recall_report",
    # round-8 additions (same caveat for r7's heavy_total)
    "emb_pca_power_iteration",
    "emb_covariance_topk",
    "llm_vocab_coverage_curve",
    "dq_order_total_reconciliation",
    "emb_pq_codes",
    "emb_pq_adc_topk",
    "llm_dedup_incremental_lsh",
    "emb_pq_recall_report",
    # round-9 additions (same caveat for r8's heavy_total)
    "emb_ivfpq_topk",
    "emb_ivfpq_recall_report",
    "emb_pq_residual_codes",
    "emb_kmeans_silhouette",
    "graph_adamic_adar",
    "graph_clustering_coefficient",
    # round-9 batch-4 additions (same caveat)
    "agg_spearman_corr",
    # round-9 batch-8..13 additions (same caveat)
    "llm_trigram_backoff",
    "graph_bfs_hops",
    "emb_mmr_rerank",
    "emb_hamming_recall_report",
    "graph_lpa_modularity",
    "graph_rich_club",
    "llm_dedup_threshold_curve",
    # round-11 additions (same caveat for r10's heavy_total)
    "emb_ivfpq_topk_nprobe2",
    "emb_ivfpq_rerank",
    "llm_semdedup_cells",
    # round-12 additions (same caveat for r11's heavy_total)
    "llm_quality_classifier_train",
    "emb_kmeans_scalable_init",
    "llm_doremi_mixture",
    "llm_corpus_pipeline_v8",
]

# Sub-0.5s queries sit at the box-noise floor: with 3 passes one co-tenant
# spike shifts the median 2-3x with no code change (round-8 lesson:
# fulltext_search read 3.2x, judge re-measure found 0.220s). When the
# running median is below this, keep sampling up to MAX_PASSES so the
# median reflects the query, not the neighbor.
FAST_QUERY_SEC = 0.5
MAX_PASSES = max(int(os.environ.get("SPARK_GRAFT_BENCH_MAX_PASSES", "7")),
                 PASSES)


def main() -> None:
    from hawaiidatapipeline_spark.queries import collect
    from hawaiidatapipeline_spark.session import get_spark

    spark = get_spark(app_name="hdp-bench")
    queries, _ = collect()

    # warmup: JVM + codegen + parquet footer caches, and the Python/Arrow
    # worker pool (daemon fork + first Arrow batch), so per-query numbers
    # measure engine time rather than one-time process startup.
    queries["pricing_summary"](spark, SF_DIR).write.mode("overwrite").format("noop").save()
    spark.range(1000).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()

    def run_set(names: list[str]) -> tuple[dict[str, float], dict[str, dict[str, float]]]:
        timings: dict[str, float] = {}
        spread: dict[str, dict[str, float]] = {}
        for name in names:
            fn = queries[name]
            samples: list[float] = []
            for _ in range(PASSES):
                t0 = time.time()
                fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
                samples.append(time.time() - t0)
            # noise hardening for queries at the timing floor: extra passes
            # cost little (<0.5s each) and keep one spike from owning the
            # median
            while (
                statistics.median(samples) < FAST_QUERY_SEC
                and len(samples) < MAX_PASSES
            ):
                t0 = time.time()
                fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
                samples.append(time.time() - t0)
            timings[name] = round(statistics.median(samples), 3)
            spread[name] = {
                "min": round(min(samples), 3),
                "median": timings[name],
                "max": round(max(samples), 3),
                "passes": len(samples),
            }
            time.sleep(COOLDOWN_SEC)
        return timings, spread

    timings, spread = run_set(HEADLINE)
    heavy_timings, heavy_spread = run_set(HEAVY)

    # Per-key heavy budgets (VERDICT r7 item 5): heavy_total grows as
    # queries are added, so regressions hide in the total. Each key's
    # median is checked against its committed budget (trailing median ×
    # 1.5 — tools/update_bench_budgets.py); breaches are named in BOTH
    # the detail artifact and the short final line.
    budgets_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "BENCH_BUDGETS.json")
    budgets: dict[str, float] = {}
    if os.path.exists(budgets_path):
        budgets = json.load(open(budgets_path))
    # Budget verdicts read the BEST pass, not the median (round-8 lesson):
    # a genuine plan regression slows every pass, so min > budget is the
    # trustworthy breach signal; a median inflated by co-tenant noise while
    # min sits at its historical level is a noisy box, not a regression.
    heavy_budgets = {
        k: {
            "budget": budgets[k],
            "median": v,
            "best": heavy_spread[k]["min"],
            "ok": heavy_spread[k]["min"] <= budgets[k],
        }
        for k, v in heavy_timings.items()
        if k in budgets
    }
    breaches = sorted(k for k, r in heavy_budgets.items() if not r["ok"])

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    detail = {
        "metric": "headline_query_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "heavy_total": round(sum(heavy_timings.values()), 3),
        "heavy": heavy_timings,
        "heavy_spread": heavy_spread,
        "heavy_budgets": heavy_budgets,
        "budget_breaches": breaches,
        "passes": PASSES,
        "sf": float(sf) if sf else None,
    }
    # Round-5 lesson: the full detail line outgrew the driver's tail capture,
    # so BENCH_r05.json recorded "parsed": null. Write the big object to
    # BENCH_DETAIL.json and print a SHORT headline line LAST (nearest the
    # tail) so the driver's capture always parses it.
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1)
    print(json.dumps(detail))
    spark.stop()
    headline = {
        "metric": "headline_query_total",
        "value": detail["value"],
        "unit": "sec",
        "queries": timings,
        "sf": detail["sf"],
        # usually [] — at most 3 names + a count on a breach, so the final
        # line stays inside the driver's tail-capture bound (see the
        # test_bench_final_line_fits_tail_capture size test); the full
        # list is in BENCH_DETAIL.json
        "budget_breaches": (
            breaches if len(breaches) <= 3
            else breaches[:3] + [f"+{len(breaches) - 3} more"]
        ),
    }
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
