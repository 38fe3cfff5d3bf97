"""functions/phash.py + operators/dedup.hamming_pairs64 — perceptual
image dedup with zero imaging dependencies."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from img2dataset_spark.functions.phash import (
    hamming64,
    make_phash_udf,
    phash64,
    to_gray,
)
from img2dataset_spark.operators.dedup import hamming_pairs64


def _gradient(w=120, h=90, phase=0.0):
    """Smooth synthetic photo-ish image: two crossed gradients + a blob."""
    x = np.linspace(0, 1, w)[None, :]
    y = np.linspace(0, 1, h)[:, None]
    img = 255 * (0.5 * x + 0.3 * y + 0.2 * np.sin(6.28 * (x * y + phase)))
    rgb = np.stack([img, np.roll(img, 5, axis=1), img[::-1]], axis=2)
    return np.clip(rgb, 0, 255).astype(np.uint8)


def test_phash_deterministic_and_signed_range():
    a = phash64(_gradient())
    assert a == phash64(_gradient())
    assert -(1 << 63) <= a < (1 << 63)


def test_phash_invariances():
    """Re-encode-scale invariance: the same scene at a different
    resolution hashes within a small Hamming distance; a structurally
    different scene is far away."""
    base = phash64(_gradient(120, 90))
    from img2dataset_spark.functions.resample import resize

    small = phash64(resize(_gradient(120, 90), 60, 45, mode="area"))
    other = phash64(_gradient(120, 90, phase=0.5).transpose(1, 0, 2))
    assert hamming64(base, small) <= 3, hamming64(base, small)
    assert hamming64(base, other) > 10, hamming64(base, other)


def test_phash_gray_passthrough():
    g = (np.arange(64 * 64, dtype=np.float64).reshape(64, 64)) % 251
    assert to_gray(g).shape == (64, 64)
    assert phash64(g) == phash64(np.stack([g, g, g], axis=2))


def test_phash_udf_decodes_png_and_nulls(spark):
    from img2dataset_spark.functions.png import encode_png

    img_a = _gradient()
    img_b = _gradient(phase=0.5).transpose(1, 0, 2)
    rows = [
        (0, bytearray(encode_png(img_a))),
        (1, bytearray(encode_png(img_b))),
        (2, bytearray(b"not an image")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    ph = make_phash_udf()
    got = {
        r["doc_id"]: r["ph"]
        for r in df.select("doc_id", ph(F.col("payload")).alias("ph")).collect()
    }
    assert got[0] == phash64(img_a)
    assert got[1] == phash64(img_b)
    assert got[2] is None and got[3] is None


def _brute_pairs(hashes, k):
    out = set()
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if hamming64(hashes[a], hashes[b]) <= k:
                out.add((a, b))
    return out


def test_hamming_pairs64_pigeonhole_full_recall(spark):
    """Banded pairs == brute-force pairs for hamming <= k (the
    pigeonhole guarantee), including negative (high-bit) hashes."""
    rng = np.random.RandomState(7)
    base = (int(rng.randint(0, 1 << 62)) | (1 << 63)) - (1 << 64)  # negative
    mask = (1 << 64) - 1

    def signed(u):
        u &= mask
        return u - (1 << 64) if u >= 1 << 63 else u

    hashes = {0: base}
    for i in range(1, 12):
        hu = hashes[0] & mask
        for bit in rng.choice(64, size=i % 6, replace=False):
            hu ^= 1 << int(bit)
        hashes[i] = signed(hu)
    # a few random far-away hashes
    for i in range(12, 20):
        hashes[i] = signed(
            int(rng.randint(0, 1 << 62)) ^ (int(rng.randint(0, 1 << 62)) << 1)
        )
    df = spark.createDataFrame(
        [(i, h) for i, h in hashes.items()], "doc_id long, phash long"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in hamming_pairs64(df, "phash", max_hamming=3).collect()
    }
    assert got == _brute_pairs(hashes, 3)


def test_hamming_pairs64_cap_and_nulls(spark):
    a, b = 0xAAAA0001, 0xAAAA0003  # share word 1 (0xAAAA), hamming 1
    rows = [(i, 0) for i in range(30)] + [(100, None), (101, a), (102, b)]
    df = spark.createDataFrame(rows, "doc_id long, phash long")
    # the 30 identical hashes form giant buckets in every word; cap at
    # 10 drops those clusters (including the zero words a/b share with
    # them), but a and b still co-bucket alone via word 1 and pair up
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_pairs64(df, "phash", max_hamming=3, max_bucket_size=10).collect()
    }
    assert got == {(101, 102, 1)}


def test_dedup_phash_survivors_precomputed_column(spark):
    """dedup_phash over a precomputed phash column: transitive chains
    collapse to the min id (a-b and b-c within radius but a-c outside
    — CC must still merge all three), NULL hashes and singletons
    survive, original columns pass through."""
    from img2dataset_spark.operators.dedup import dedup_phash

    # 0-1 hamming 2, 1-2 hamming 2, 0-2 hamming 4: one chain @ radius 2
    rows = [
        (0, 0b0000, "a"),
        (1, 0b0011, "b"),
        (2, 0b1111, "c"),
        (3, 0b1010101010101010, "d"),  # singleton
        (4, None, "e"),  # undecodable: kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, phash long, extra string")
    surv = dedup_phash(df, max_hamming=2)
    got = {(r["doc_id"], r["extra"]) for r in surv.collect()}
    assert got == {(0, "a"), (3, "d"), (4, "e")}


def test_hamming_bucket_stats_pins_capped_mass(spark):
    """The cap ledger counts the constructed degenerate bucket the
    verifier silently drops: 30 identical hashes over cap 10 occupy
    all 4 pigeonhole words -> 4 capped buckets; a/b share the zero
    words 2-3 with the cluster (32-row buckets) but their private
    word-1 bucket stays under cap and uncounted."""
    from img2dataset_spark.operators.dedup import hamming_bucket_stats

    a, b = 0xAAAA0001, 0xAAAA0003
    rows = [(i, 0) for i in range(30)] + [(100, None), (101, a), (102, b)]
    df = spark.createDataFrame(rows, "doc_id long, phash long")
    s = hamming_bucket_stats(df, "phash", max_hamming=3, max_bucket_size=10).collect()[0]
    assert s["n_capped_buckets"] == 4  # the zero-hash cluster, per word
    assert s["capped_row_mass"] == 30 + 30 + 32 + 32
    clean = hamming_bucket_stats(df, "phash", max_hamming=3, max_bucket_size=1000).collect()[0]
    assert clean["n_capped_buckets"] == 0 and clean["capped_row_mass"] == 0
    assert clean["n_buckets"] == s["n_buckets"]


def test_hamming_pairs64_rejects_degenerate_radius(spark):
    """max_hamming=0 would overflow the single word's int64 mask at
    plan time (exact match is an equality join, not banding); 64+
    words would make zero-width words.  Both rejected up front."""
    df = spark.createDataFrame([(1, 5)], "doc_id long, phash long")
    for bad in (0, -1, 64):
        with pytest.raises(ValueError, match="max_hamming"):
            hamming_pairs64(df, "phash", max_hamming=bad)


def test_phash_e2e_near_dup_images(spark):
    """Two spellings of one image (different resolution, PNG re-encode)
    pair up; the third, different image does not — the pixel-level
    dedup the reference's byte hashing cannot do."""
    from img2dataset_spark.functions.png import encode_png
    from img2dataset_spark.functions.resample import resize

    img = _gradient()
    rows = [
        (0, bytearray(encode_png(img))),
        (1, bytearray(encode_png(resize(img, 60, 45, mode="area")))),
        (2, bytearray(encode_png(_gradient(phase=0.5).transpose(1, 0, 2)))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    ph = make_phash_udf()
    hashed = df.select("doc_id", ph(F.col("payload")).alias("phash"))
    pairs = hamming_pairs64(hashed, "phash", max_hamming=4).collect()
    assert {(p["id_a"], p["id_b"]) for p in pairs} == {(0, 1)}


def test_streaming_phash_flags_matches_batch(spark, tmp_path):
    """Stream-static perceptual screening agrees with batch
    hamming_pairs64 verdicts: distinct in-radius corpus refs counted,
    NULL hashes get a 0-match verdict, capped degenerate buckets drop."""
    import datetime as dt
    import os

    from img2dataset_spark.streaming.dedup import streaming_phash_flags

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    # corpus: two hashes 1 bit apart + one far hash
    index = spark.createDataFrame(
        [(100, 0x1234), (101, 0x1235), (102, -(1 << 62) | 0x5A5A)],
        "doc_id long, phash long",
    )
    stream_rows = [
        (0, t0, 0x1234),                  # within 1 of 100 AND 101 -> 2 matches
        (1, t0, 0x1234 ^ (1 << 40)),      # within 2 of both        -> 2
        (2, t0, 0x0F0F0F0F0F0F0F0F),      # far from everything     -> 0
        (3, t0, None),                    # undecodable             -> 0
    ]
    src = os.path.join(str(tmp_path), "phsrc")
    batch = spark.createDataFrame(stream_rows, "doc_id long, ts timestamp, phash long")
    batch.coalesce(1).write.parquet(src)
    # append mode emits aggregated groups only once the watermark passes
    # them: a LATE flush row in a second file + maxFilesPerTrigger=1
    # advances the watermark between micro-batches (same pattern as the
    # wave-admission test); the flush row stays pending, never emitted
    flush = spark.createDataFrame(
        [(-1, t0 + dt.timedelta(hours=2), 0)], batch.schema
    )
    flush.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_phash_flags(stream, index, max_hamming=4, watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_phash_flags")
        .option("checkpointLocation", os.path.join(str(tmp_path), "phckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {r["doc_id"]: r for r in spark.table("t_phash_flags").collect()}
    # batch ground truth: union frame, pairs between stream ids and refs
    union = batch.select("doc_id", "phash").unionByName(index)
    bpairs = hamming_pairs64(union, "phash", max_hamming=4).collect()
    want = {i: set() for i, _, _ in stream_rows}
    for p in bpairs:
        lo, hi = p["id_a"], p["id_b"]
        if lo < 100 and hi >= 100:
            want[lo].add(hi)
    assert set(got) == {0, 1, 2, 3}
    for i in got:
        assert got[i]["n_matches"] == len(want[i]), (i, got[i])
        assert got[i]["is_dup"] == (len(want[i]) > 0)
