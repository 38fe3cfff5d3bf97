"""Small-file compaction: rewrite a parquet dataset into files of a
target size.

The chronic operational problem of any long-running ingest at scale:
incremental jobs, streaming micro-batches, and per-shard writers leave
thousands of KB-sized parquet files, and every downstream scan then
pays one task + one open per file.  The fix is a periodic rewrite into
~target-sized files — what table formats call "bin-packing
compaction", here for plain parquet directories.

Plan shape: one scan, an AQE-backed ``repartition(n)`` (round-robin —
no key, no skew), one write.  ``n`` is estimated from the dataset's
on-disk bytes / target file size, so the row-group geometry downstream
scans see is predictable.  There is exactly one shuffle and it IS the
point: redistributing rows into right-sized files.  Reading back
compacted output needs no coordination — it's just parquet.

The estimate reads sizes through the scheme-dispatching fs layer
(io/fs.py), so local, memory:// and fsspec-backed (s3://, gs://)
datasets all work.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from img2dataset_spark.io import fs


def dataset_bytes(path: str) -> int:
    """Total bytes of the dataset's parquet files (direct children and
    one partition level deep — the layouts our sinks produce)."""
    files = fs.glob(fs.join(path, "*.parquet")) + fs.glob(
        fs.join(path, "*", "*.parquet")
    )
    total = 0
    for f in files:
        with fs.open_read(f) as fh:
            fh.seek(0, 2)
            total += fh.tell()
    return total


def plan_target_files(total_bytes: int, target_file_mb: int = 256) -> int:
    """ceil(total / target), minimum 1 — the file count a compaction
    should produce."""
    if target_file_mb <= 0:
        raise ValueError(f"target_file_mb must be > 0, got {target_file_mb}")
    return max(1, math.ceil(total_bytes / (target_file_mb * (1 << 20))))


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_mb: int = 256,
) -> int:
    """Rewrite the parquet dataset at ``in_path`` into ``out_path`` as
    ~``target_file_mb``-sized files; returns the file count written.
    Compression ratios differ slightly between the fragmented and
    compacted layouts, so sizes are approximate — the invariant that
    matters is the file COUNT collapsing from thousands to
    bytes/target."""
    n = plan_target_files(dataset_bytes(in_path), target_file_mb)
    df: DataFrame = spark.read.parquet(in_path)
    df.repartition(n).write.mode("overwrite").parquet(out_path)
    return len(fs.glob(fs.join(out_path, "*.parquet")))
