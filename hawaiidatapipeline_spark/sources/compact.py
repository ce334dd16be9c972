"""Small-file compaction — the landing-zone maintenance job.

Paged ingestion (sources/ingest.py) and streaming sinks land MANY small
files; parquet scans then pay per-file open/footer costs and the driver
pays listing costs — the classic small-files problem. ``compact_dir``
rewrites a directory to ~``target_mb`` output files sized from the actual
input bytes, preserving rows exactly.

At 100 TB this runs per partition (e.g. per landed date) as a recurring
maintenance job; with a table format it becomes OPTIMIZE/rewrite-data-files.
The repartition count derives from real input size, so output files track
the target regardless of how fragmented the input was.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def dir_bytes(path: str) -> int:
    """Total data bytes under a directory (ignores _SUCCESS/CRC sidecars)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith(("_", ".")) or f.endswith(".crc"):
                continue
            total += os.path.getsize(os.path.join(root, f))
    return total


def plan_output_files(input_bytes: int, target_mb: int = 128) -> int:
    return max(1, math.ceil(input_bytes / (target_mb * 1024 * 1024)))


def compact_dir(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    fmt: str = "parquet",
    target_mb: int = 128,
) -> DataFrame:
    """Rewrite ``src_dir`` into ``dst_dir`` with ~target-sized files.
    Returns the compacted DataFrame (lazy, re-read from the new location).
    Uses ``coalesce`` when shrinking the file count — no shuffle, each
    output task concatenates input splits; a full ``repartition`` is only
    ever needed to SPLIT files, which compaction doesn't do."""
    reader = getattr(spark.read, fmt)
    df = reader(src_dir)
    n_out = plan_output_files(dir_bytes(src_dir), target_mb)
    getattr(df.coalesce(n_out).write.mode("overwrite"), fmt)(dst_dir)
    return reader(dst_dir)


def data_file_count(path: str) -> int:
    return sum(
        1
        for _root, _dirs, files in os.walk(path)
        for f in files
        if not f.startswith(("_", ".")) and not f.endswith(".crc")
    )
