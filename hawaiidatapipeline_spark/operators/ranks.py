"""Distributed global ranking without a single-partition window.

``Window.orderBy(col)`` with no partition key is correct but serial: Spark
moves EVERY row to one task (WindowExec warns exactly this), which is the
difference between "works at fixture scale" and "works at 100 TB". Rank
statistics (Spearman, Mann-Whitney, percentile grids) only need the rank
of each VALUE, so the scale-safe shape is:

1. one ``groupBy(value)`` count — shuffle on the value, partial-aggregated;
2. range-repartition the DISTINCT values and cumulative-sum locally within
   each sorted partition (parallel);
3. per-partition totals form a tiny frame (one row per partition); their
   exclusive prefix sum — the only serial step — runs over ≤ shuffle-
   partition rows and is broadcast back;
4. global rank of a value = prefix offset + local cumulative − its count.

The output is a VALUE → rank map (one row per distinct value), joined back
to the fact rows by value equality — exact, because the map was built from
those same values. Everything is integer arithmetic; ties get the textbook
average rank on the exact .5 grid via the DOUBLED-rank trick
(2·avg_rank = 2·(#values below) + tie_count + 1, always an integer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def doubled_avg_rank_map(df: DataFrame, col: str, out: str = "dbl_rank") -> DataFrame:
    """Map each distinct value of ``col`` to 2× its average (tie-adjusted)
    rank — an exact integer. Returns one row per distinct value:
    (col, out). No single-partition pass ever sees more than the distinct
    values of one range slice; the serial prefix step is one row per
    partition."""
    cnt = df.groupBy(col).agg(F.count(F.lit(1)).alias("_c"))
    rp = cnt.repartitionByRange(col).withColumn("_pid", F.spark_partition_id())
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    loc = rp.withColumn("_local_cum", F.sum("_c").over(w_local))
    ptot = loc.groupBy("_pid").agg(F.sum("_c").alias("_ptot"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    off = ptot.withColumn(
        "_off", F.coalesce(F.sum("_ptot").over(w_off), F.lit(0))
    ).select("_pid", "_off")
    below = F.col("_off") + F.col("_local_cum") - F.col("_c")
    return loc.join(F.broadcast(off), "_pid").select(
        col, (2 * below + F.col("_c") + 1).cast("long").alias(out)
    )
