"""operators/bloom.py — broadcast Bloom-filter membership."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from img2dataset_spark.operators.bloom import (
    bloom_exclude,
    bloom_params,
    build_bloom,
    probe_bloom,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_params_sizing():
    m, k = bloom_params(1000, 0.01)
    assert m % 64 == 0
    # textbook ~9.6 bits/item, ~7 hashes at 1% fp
    assert 9 * 1000 <= m <= 11 * 1000
    assert 6 <= k <= 8
    assert bloom_params(0) == (64, 1)
    # more items -> more bits, never fewer
    assert bloom_params(10_000, 0.01)[0] > m


def test_no_false_negatives_and_bounded_false_positives(spark, docs):
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 != 0)
    n = hist.count()
    m, k = bloom_params(n, 0.01)
    bloom = build_bloom(hist, "doc_id", m, k)
    # every member must hit — the defining guarantee
    assert (
        probe_bloom(hist, "doc_id", bloom, k)
        .filter(~F.col("maybe_seen"))
        .count()
        == 0
    )
    # non-members: fp rate in the ballpark of the target
    fp = probe_bloom(new, "doc_id", bloom, k).filter("maybe_seen").count()
    assert fp <= max(5, 0.05 * new.count())


def test_build_matches_pure_python_model(spark):
    """The distributed bit_or aggregation assembles exactly the bitmap
    a sequential builder produces."""
    ids = [3, 17, 255, 1024, 99999]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    m, k = 256, 3
    got = build_bloom(df, "doc_id", m, k)
    bits = bytearray(m // 8)
    for i in ids:
        for j in range(k):
            pos = int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[:8], 16) % m
            bits[pos // 8] |= 1 << (pos % 8)
    assert got == bytes(bits)


def test_exclude_is_anti_join_minus_false_positives(spark, docs):
    hist = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    new = docs.filter(F.col("doc_id") % 3 != 0).select("doc_id")
    excluded = {r["doc_id"] for r in bloom_exclude(new, hist, "doc_id").collect()}
    truly_new = {r["doc_id"] for r in new.join(hist, "doc_id", "left_anti").collect()}
    # bloom never passes a seen row; may drop a few unseen ones (fp)
    assert excluded <= truly_new
    assert len(excluded) >= 0.9 * len(truly_new)


def test_probe_is_map_only(spark, docs):
    hist = docs.filter(F.col("doc_id") % 5 == 0)
    bloom = build_bloom(hist, "doc_id", 1024, 7)
    probed = probe_bloom(docs.select("doc_id"), "doc_id", bloom, 7)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_probe_accepts_caller_broadcast(spark, docs):
    """Repeated probes of one filter pass a caller-owned Broadcast so
    its lifetime is controllable (no per-call broadcast accumulation);
    results must equal the bytes path."""
    hist = docs.filter(F.col("doc_id") % 5 == 0)
    bloom = build_bloom(hist, "doc_id", 1024, 7)
    bc = spark.sparkContext.broadcast(bloom)
    try:
        via_bytes = sorted(
            (r["doc_id"], r["maybe_seen"])
            for r in probe_bloom(docs.select("doc_id"), "doc_id", bloom, 7).collect()
        )
        for _ in range(2):  # reuse across probes — the advertised pattern
            via_bc = sorted(
                (r["doc_id"], r["maybe_seen"])
                for r in probe_bloom(docs.select("doc_id"), "doc_id", bc, 7).collect()
            )
            assert via_bc == via_bytes
    finally:
        bc.unpersist()


def test_null_ids_probe_null(spark):
    df = spark.createDataFrame([(1,), (None,)], "doc_id long")
    bloom = build_bloom(
        spark.createDataFrame([(1,)], "doc_id long"), "doc_id", 64, 2
    )
    rows = {r["doc_id"]: r["maybe_seen"] for r in
            probe_bloom(df, "doc_id", bloom, 2).collect()}
    assert rows[1] is True
    assert rows[None] is None


def test_num_bits_validation(spark, docs):
    with pytest.raises(ValueError, match="multiple of 64"):
        build_bloom(docs, "doc_id", 100, 3)


def test_exclude_keeps_null_ids_like_anti_join(spark):
    df = spark.createDataFrame([(1,), (2,), (None,)], "doc_id long")
    hist = spark.createDataFrame([(1,)], "doc_id long")
    got = sorted(
        [r["doc_id"] for r in bloom_exclude(df, hist, "doc_id").collect()],
        key=lambda x: (x is None, x),
    )
    want = sorted(
        [r["doc_id"] for r in df.join(hist, "doc_id", "left_anti").collect()],
        key=lambda x: (x is None, x),
    )
    assert got == want == [2, None]


def test_large_filter_broadcast_probe(spark, docs):
    """A 64 MB bit array (2^29 bits) must ship via an explicit broadcast
    and probe correctly — the closure path would serialize it into every
    task binary."""
    hist = docs.filter(F.col("doc_id") % 7 == 0)
    bloom = build_bloom(hist, "doc_id", 1 << 29, 5)
    assert len(bloom) == (1 << 29) // 8
    probed = probe_bloom(docs.select("doc_id"), "doc_id", bloom, 5)
    # no member missed, and with 2^29 bits for ~150 ids, ~zero fp
    joined = probed.join(hist.select("doc_id", F.lit(True).alias("is_hist")),
                         "doc_id", "left")
    bad = joined.filter(
        (F.col("is_hist").isNotNull() & ~F.col("maybe_seen"))
    ).count()
    assert bad == 0
    fp = joined.filter(
        F.col("is_hist").isNull() & F.col("maybe_seen")
    ).count()
    assert fp == 0
    # and the plan stays map-only
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_wide_positions_beyond_32bit_fold(spark):
    """Filters wider than 2^31 bits switch to 60-bit md5 positions; the
    no-false-negative guarantee must hold through the wide path."""
    ids = [1, 2, 3, 5_000_000_000_123]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    num_bits = (1 << 31) + 64  # just over the narrow limit
    bloom = build_bloom(df, "doc_id", num_bits, 3)
    assert (
        probe_bloom(df, "doc_id", bloom, 3).filter(~F.col("maybe_seen")).count()
        == 0
    )


def test_probe_positions_are_spark_side(spark, docs):
    """No Python md5 in the probe: exactly one ArrowEvalPython stage
    (the bit test), with positions computed by codegen expressions."""
    hist = docs.filter(F.col("doc_id") % 5 == 0)
    bloom = build_bloom(hist, "doc_id", 1024, 7)
    plan = (
        probe_bloom(docs.select("doc_id"), "doc_id", bloom, 7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("ArrowEvalPython") == 1
    assert "md5" in plan  # the position expressions stayed JVM-side
