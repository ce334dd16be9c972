"""Z-order layout: measured row-group pruning vs natural order.

The claim behind layout_zorder_key: sorting files by the Morton key over
(partkey, suppkey) makes min/max row-group stats selective for 2-D box
predicates. This test writes the same table both ways with identical file
counts and row-group sizes, then counts row groups a stats-based reader
would have to touch for a box query. Z-order must prune substantially
more (at fixture scale typically >2x fewer groups touched).
"""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.layout import zorder_layout, zvalue
from hawaiidatapipeline_spark.registry import load_table

from .conftest import SF0001

# fixture ranges at sf0.001: l_partkey 0..199, l_suppkey 0..9
BOX = dict(pk_lo=50, pk_hi=80, sk_lo=2, sk_hi=4)


def _touched_row_groups(path_glob: str) -> tuple[int, int]:
    """(row groups overlapping the box, total row groups) by parquet stats."""
    touched = total = 0
    for f in glob.glob(path_glob):
        meta = pq.ParquetFile(f).metadata
        names = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        for rg in range(meta.num_row_groups):
            total += 1
            g = meta.row_group(rg)
            pk = g.column(names["l_partkey"]).statistics
            sk = g.column(names["l_suppkey"]).statistics
            if (
                pk.min <= BOX["pk_hi"]
                and pk.max >= BOX["pk_lo"]
                and sk.min <= BOX["sk_hi"]
                and sk.max >= BOX["sk_lo"]
            ):
                touched += 1
    return touched, total


def test_zorder_layout_prunes_2d_box_queries(spark, tmp_path):
    li = load_table(spark, SF0001, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    rows_per_group = 500

    natural = str(tmp_path / "natural")
    (
        li.repartitionByRange(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.option("parquet.block.size", 64 * 1024)
        .option("maxRecordsPerFile", rows_per_group * 4)
        .parquet(natural)
    )
    zordered = str(tmp_path / "zordered")
    (
        zorder_layout(li, "l_partkey", "l_suppkey", n_files=8)
        .write.option("parquet.block.size", 64 * 1024)
        .option("maxRecordsPerFile", rows_per_group * 4)
        .parquet(zordered)
    )

    nat_touched, nat_total = _touched_row_groups(natural + "/*.parquet")
    z_touched, z_total = _touched_row_groups(zordered + "/*.parquet")
    # same data volume within rounding: layouts comparable
    assert abs(nat_total - z_total) <= max(4, nat_total // 2)
    # natural order scatters (partkey, suppkey): stats prune ~nothing
    assert nat_touched >= nat_total * 0.8
    # z-order must prune at least 2x better
    assert z_touched * 2 <= nat_touched, (z_touched, nat_touched)

    # correctness: both layouts return identical box-query results
    box = (
        (F.col("l_partkey").between(BOX["pk_lo"], BOX["pk_hi"]))
        & (F.col("l_suppkey").between(BOX["sk_lo"], BOX["sk_hi"]))
    )
    a = sorted(map(tuple, spark.read.parquet(natural).filter(box).collect()))
    b = sorted(map(tuple, spark.read.parquet(zordered).filter(box).collect()))
    assert a == b


def test_zvalue_orders_locally(spark):
    """Adjacent z-values stay in small (a, b) neighborhoods: the max side
    of the bounding box of any 64 consecutive z-sorted fixture rows is far
    smaller than the full dimension range."""
    li = load_table(spark, SF0001, "lineitem")
    df = (
        li.select("l_partkey", "l_suppkey")
        .withColumn("z", zvalue(F.col("l_partkey"), F.col("l_suppkey")))
        .orderBy("z")
        .collect()
    )
    pk_range = max(r.l_partkey for r in df) - min(r.l_partkey for r in df)
    worst = 0
    for i in range(0, len(df) - 64, 64):
        chunk = df[i : i + 64]
        side = max(r.l_partkey for r in chunk) - min(r.l_partkey for r in chunk)
        worst = max(worst, side)
    assert worst < pk_range * 0.5
