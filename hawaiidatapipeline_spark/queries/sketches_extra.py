"""Frequency-sketch queries: count-min heavy hitters.

Like agg_distinct_kmv / agg_quantile_histogram, the sketch is built over
the portable md5 hash so DuckDB reproduces every counter and estimate
exactly — a hash-verified approximate aggregate, not a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hawaiidatapipeline_spark.operators.sketches import count_min_heavy_hitters
from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()


@q(
    "agg_heavy_hitters_cms",
    """WITH iv AS (SELECT unnest(generate_series(0, 3)) AS i),
       pairs AS (
         SELECT i,
                ('0x' || substring(md5((23 + i)::VARCHAR || ':' || user_id::VARCHAR), 1, 15))::BIGINT % 64 AS b
         FROM events CROSS JOIN iv
       ),
       sketch AS (SELECT i, b, count(*) AS c FROM pairs GROUP BY i, b),
       cand AS (SELECT user_id, count(*) AS true_cnt FROM events GROUP BY user_id),
       cb AS (
         SELECT user_id, true_cnt, i,
                ('0x' || substring(md5((23 + i)::VARCHAR || ':' || user_id::VARCHAR), 1, 15))::BIGINT % 64 AS b
         FROM cand CROSS JOIN iv
       )
       SELECT user_id, true_cnt, min(c) AS est_cnt
       FROM cb JOIN sketch USING (i, b)
       GROUP BY user_id, true_cnt
       HAVING min(c) >= 75""",
)
def agg_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users with ≥75 events by count-min estimate (depth 4 × width 64).
    The sketch is a few KB regardless of input size, mergeable across
    partitions and micro-batches; estimates never undercount, so the
    result is a guaranteed superset of the true heavy hitters. true_cnt
    is included to expose the overestimate bound to the gate."""
    e = load_table(spark, sf_dir, "events")
    return count_min_heavy_hitters(e, "user_id", threshold=75, depth=4, width=64)
