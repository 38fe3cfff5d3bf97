"""operators/compact.py — small-file compaction."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from img2dataset_spark.operators.compact import (
    compact_parquet,
    dataset_bytes,
    plan_target_files,
)


def test_plan_target_files():
    mb = 1 << 20
    assert plan_target_files(0) == 1
    assert plan_target_files(100 * mb, 256) == 1
    assert plan_target_files(257 * mb, 256) == 2
    assert plan_target_files(10 * 256 * mb, 256) == 10
    with pytest.raises(ValueError):
        plan_target_files(1, 0)


def test_compaction_collapses_fragments(spark, tmp_path):
    src = os.path.join(str(tmp_path), "frag")
    out = os.path.join(str(tmp_path), "compacted")
    # 64 tiny files
    spark.range(10_000).withColumn("payload", F.md5(F.col("id").cast("string"))) \
        .repartition(64).write.parquet(src)
    assert len(glob.glob(os.path.join(src, "*.parquet"))) == 64
    assert dataset_bytes(src) > 0

    n = compact_parquet(spark, src, out, target_file_mb=256)
    assert n == 1
    assert len(glob.glob(os.path.join(out, "*.parquet"))) == 1

    # content identical
    a = sorted(r["payload"] for r in spark.read.parquet(src).collect())
    b = sorted(r["payload"] for r in spark.read.parquet(out).collect())
    assert a == b


def test_partitioned_layout_bytes(spark, tmp_path):
    src = os.path.join(str(tmp_path), "parts")
    spark.range(1000).withColumn("p", (F.col("id") % 2).cast("int")) \
        .write.partitionBy("p").parquet(src)
    assert dataset_bytes(src) > 0
