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

from hawaiidatapipeline_spark.operators.materialize import materialize


def doubled_avg_rank_map(df: DataFrame, col: str, out: str = "dbl_rank") -> DataFrame:
    """Map each distinct value of ``col`` to 2× its average (tie-adjusted)
    rank — an exact integer. Returns one row per distinct value:
    (col, out). No single-partition pass ever sees more than the distinct
    values of one range slice; the serial prefix step is one row per
    partition.

    Contract: NULL values of ``col`` are excluded from the map (and from
    the rank denominator). Callers join the map back with plain equality,
    so a NULL group would be silently dropped anyway — filtering here makes
    the behavior on nullable columns defined instead of accidental. A
    caller that needs SQL ``rank()``'s NULLS-ranked semantics must handle
    NULLs before calling."""
    cnt = (
        df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    # materialize: _pid is consumed by TWO branches (local window and
    # per-partition totals); freezing the exchange output here removes
    # any dependency on exchange-reuse/AQE-coalescing agreement between
    # the branches (ADVICE r10) — the frame is distinct-value-sized
    rp = materialize(
        cnt.repartitionByRange(col).withColumn("_pid", F.spark_partition_id())
    )
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


def partitioned_prefix_sums(df: DataFrame, order_by, sums: dict) -> DataFrame:
    """Inclusive running sums under a GLOBAL sort order without a
    single-partition window. ``order_by`` is a list of Column sort
    expressions defining the total order (ties all land in one range
    partition, so inclusive sums at the tie block's last row are exact);
    ``sums`` maps each output column name to the measure (column name or
    Column expression) to accumulate. Returns ``df``'s columns plus one
    running-sum column per entry.

    Shape: range-repartition on the sort keys (partition ids come back in
    range order) → local cumulative window inside each slice (parallel) →
    per-partition totals (one row per partition) get the only serial
    prefix pass → broadcast offsets join back. The serial step's input is
    ≤ ``spark.sql.shuffle.partitions`` rows no matter how large ``df``
    is — this is the scale-safe replacement for
    ``Window.orderBy(...).rowsBetween(unboundedPreceding, 0)``.
    """
    sums = {name: F.col(c) if isinstance(c, str) else c for name, c in sums.items()}
    # materialize: same two-branch _pid contract as doubled_avg_rank_map —
    # a frozen exchange output makes the broadcast offsets immune to the
    # two branches ever re-planning the repartition differently
    rp = materialize(
        df.repartitionByRange(*order_by).withColumn("_pid", F.spark_partition_id())
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    loc = rp
    for name, c in sums.items():
        loc = loc.withColumn(name, F.sum(c).over(w_local))
    ptot = rp.groupBy("_pid").agg(
        *[F.sum(c).alias("_t_" + name) for name, c in sums.items()]
    )
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    off = ptot.select(
        "_pid",
        *[
            F.coalesce(F.sum("_t_" + name).over(w_off), F.lit(0)).alias("_o_" + name)
            for name in sums
        ],
    )
    out = loc.join(F.broadcast(off), "_pid")
    for name in sums:
        out = out.withColumn(name, F.col(name) + F.col("_o_" + name))
    return out.drop("_pid", *["_o_" + name for name in sums])


def partitioned_row_number(df: DataFrame, order_by, out: str = "rn") -> DataFrame:
    """Global 1-based row number under a total order, distributed: the
    same range-partition + local window + broadcast-offset shape as
    ``partitioned_prefix_sums`` with a per-partition COUNT as the measure.
    Exactly equivalent to ``row_number() OVER (ORDER BY ...)`` when the
    sort keys are unique (a total order); with duplicate keys the numbers
    within a tie block are assigned in an unspecified order — same caveat
    as SQL row_number, but callers should not rely on tie order either
    way."""
    rp = materialize(
        df.repartitionByRange(*order_by).withColumn("_pid", F.spark_partition_id())
    )  # frozen _pid, see partitioned_prefix_sums
    w_local = Window.partitionBy("_pid").orderBy(*order_by)
    loc = rp.withColumn(out, F.row_number().over(w_local).cast("long"))
    ptot = rp.groupBy("_pid").agg(F.count(F.lit(1)).alias("_t"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    off = ptot.select(
        "_pid", F.coalesce(F.sum("_t").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        loc.join(F.broadcast(off), "_pid")
        .withColumn(out, (F.col(out) + F.col("_off")).cast("long"))
        .drop("_pid", "_off")
    )
