"""Parquet bloom filters on the write path: point-lookup file skipping.

Z-order (tests/test_layout.py) makes min/max stats selective for RANGE
predicates; parquet bloom filters cover the complementary case — point
lookups on HIGH-CARDINALITY columns whose values scatter across the full
range in every file (stats can never prune those). The writer only emits
a bloom when the column chunk overflows dictionary encoding — exactly the
high-cardinality regime where a dictionary can no longer act as the exact
membership filter — so the fixture derives a unique key wide enough to
bust the 1 MB dictionary page."""

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.registry import load_table

SF001 = "/root/testdata/sf0.01"


def test_bloom_filter_written_and_results_identical(spark, tmp_path):
    li = (
        load_table(spark, SF001, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .withColumn(
            "row_uid",
            F.md5(F.concat_ws("-", "l_orderkey", "l_linenumber")),
        )
    )
    plain = str(tmp_path / "plain")
    li.coalesce(1).write.parquet(plain)
    bloomed = str(tmp_path / "bloomed")
    # NOTE: this parquet writer honors the global toggle but silently
    # ignores the per-column `parquet.bloom.filter.enabled#col` form —
    # verified empirically (identical bytes); at scale prefer per-column
    # enables where the writer supports them so only lookup keys pay.
    (
        li.coalesce(1)
        .write.option("parquet.bloom.filter.enabled", "true")
        .option("parquet.bloom.filter.expected.ndv#row_uid", "100000")
        .parquet(bloomed)
    )

    def shape(path_glob):
        """(rows, total_bytes) for a file set."""
        rows = size = 0
        for f in glob.glob(path_glob):
            rows += pq.ParquetFile(f).metadata.num_rows
            size += os.path.getsize(f)
        return rows, size

    n_plain, sz_plain = shape(plain + "/*.parquet")
    n_bloom, sz_bloom = shape(bloomed + "/*.parquet")
    assert n_plain == n_bloom
    # identical rows + settings except the bloom toggle: the extra bytes
    # are the serialized bloom for the non-dictionary row_uid chunk
    assert sz_bloom - sz_plain >= 1024, (sz_plain, sz_bloom)

    # the bloom is an optimization, never a semantics change
    probe = li.filter("l_orderkey = 42 and l_linenumber = 1").first()["row_uid"]
    a = sorted(
        map(tuple, spark.read.parquet(plain).filter(F.col("row_uid") == probe).collect())
    )
    b = sorted(
        map(tuple, spark.read.parquet(bloomed).filter(F.col("row_uid") == probe).collect())
    )
    assert a == b and a


def test_corrupt_file_policy_on_landing_zone(spark, tmp_path):
    """Landing-zone resilience: a truncated/garbage parquet part must not
    kill the bulk read when the corrupt-files policy is on — at 100 TB a
    single bad object in a million-file landing zone cannot be allowed to
    fail the nightly load. Default (strict) behavior must still raise, so
    corruption is never silently tolerated unless opted into."""
    import pytest

    li = load_table(spark, SF001, "lineitem").select("l_orderkey", "l_quantity")
    zone = str(tmp_path / "zone")
    li.coalesce(2).write.parquet(zone)
    # drop a garbage object into the zone
    with open(zone + "/part-corrupt.parquet", "wb") as f:
        f.write(b"PAR1 this is not a parquet file")

    strict = spark.read.parquet(zone)
    with pytest.raises(Exception):
        strict.count()

    tolerant = (
        spark.read.option("ignoreCorruptFiles", "true").parquet(zone)
    )
    assert tolerant.count() == li.count()
