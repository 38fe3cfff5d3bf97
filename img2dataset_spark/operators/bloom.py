"""Broadcast Bloom-filter membership: map-only historical exclusion.

The incremental story so far removes already-done work with anti-joins
(plans/incremental.py) — right when the historical id set is small
enough to broadcast as rows.  Against a multi-year 100 TB corpus the
"seen" set is itself billions of ids: an anti-join shuffles the full
new batch against it, while a Bloom filter compresses the set into a
fixed bit array (~1.2 GB for 10^9 ids at 1% fp) that broadcasts once
and probes map-only — the classic big-data membership trade (false
positives drop a few unseen rows; false negatives never happen, so
nothing seen is ever re-admitted... the conservative direction for
dedup).

Spark-first shape:

  build: positions are a pure column expression (k md5-fold hashes —
    the same engine-portable md5 fold the sampling/mixture operators
    share with their SQL oracles), OR-folded into 64-bit words by ONE
    map-side-combinable groupBy(word).bit_or aggregation; the driver
    assembles the (num_bits/64)-row result into a numpy array.  No RDD
    API, no per-partition imperative code.

  probe: the k hash positions are computed Spark-side with the SAME
    column expression as the build (so build and probe can never
    disagree on formatting/precision — ids hash through Spark's
    cast-to-string on both sides), and the bit array ships via an
    explicit SparkContext.broadcast (one torrent-distributed copy per
    executor host, fetched once — NOT serialized into every task
    binary).  An Arrow-batched pandas UDF then does a single
    vectorized gather + shift per batch: zero shuffles, zero joins,
    no per-row Python hashing.

Memory note: the JVM holds one broadcast copy per executor; each
PYTHON worker process that runs the probe UDF materializes its own
copy of the value on first access (numpy views over the broadcast
bytes avoid a second copy within a worker, but a 16-worker executor
still holds up to 16 copies).  Budget executor memory accordingly for
multi-GB filters, cap `spark.executor.cores` for the probe stage, or
enable `spark.python.worker.reuse` (default) so copies amortize
across tasks.

Determinism: position j of id = fold32(md5("j:" + str(id))) % num_bits,
reproducible in DuckDB SQL verbatim — the oracle rebuilds the same
filter relationally and must agree bit-for-bit (queries.py
``bloom_probe``).  Filters wider than 2^31 bits (256 MB) switch to a
60-bit md5 prefix for positions (the 32-bit fold cannot address them);
the registry oracle pins the narrow path.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from img2dataset_spark.functions.text import hex_to_int32

_NARROW_LIMIT = 1 << 31  # max num_bits addressable by the 32-bit fold


def bloom_params(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Standard sizing: m = -n ln(p)/ln(2)^2 bits (rounded up to a
    64-bit word), k = m/n ln(2) hashes."""
    if n_items <= 0:
        return 64, 1
    m = int(-n_items * math.log(fpp) / (math.log(2) ** 2))
    m = max(64, ((m + 63) // 64) * 64)
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def _position(col: Column, seed: int, num_bits: int) -> Column:
    """Engine-portable hash position: fold32(md5("seed:id")) % num_bits.
    The SQL twin is _hv_of(md5(seed || ':' || id)) % num_bits.  Filters
    wider than 2^31 bits use the first 15 md5 hex digits (60 bits)
    instead — the 32-bit fold cannot address them."""
    h = F.md5(F.concat_ws(":", F.lit(seed), col.cast("string")).cast("binary"))
    if num_bits <= _NARROW_LIMIT:
        return F.pmod(hex_to_int32(h), F.lit(num_bits))
    wide = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    return F.pmod(wide, F.lit(num_bits))


def _positions_array(col: Column, num_hashes: int, num_bits: int) -> Column:
    """array<long> of the k probe positions, NULL for a NULL id — built
    from the same per-seed expression as the build side."""
    arr = F.array(
        *[_position(col, j, num_bits).cast("long") for j in range(num_hashes)]
    )
    return F.when(col.isNotNull(), arr)


def build_bloom(
    df: DataFrame,
    id_col: str,
    num_bits: int,
    num_hashes: int,
) -> bytes:
    """Aggregate the Bloom bit array for ``df[id_col]``.

    One explode (k positions per row) + one map-side-combinable
    groupBy(word).bit_or — the shuffle moves at most num_bits/64 rows
    regardless of input size.  Returns the array as little-endian
    uint64 words (num_bits/8 bytes)."""
    if num_bits % 64 != 0:
        raise ValueError("num_bits must be a multiple of 64")
    col = F.col(id_col)
    positions = df.select(
        F.explode(
            F.array(*[_position(col, j, num_bits) for j in range(num_hashes)])
        ).alias("pos")
    )
    words = (
        positions.select(
            F.expr("pos div 64").alias("word"),
            # shiftleft() takes a Column shift only via SQL
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    arr = np.zeros(num_bits // 64, dtype=np.uint64)
    for r in words:
        arr[int(r["word"])] = np.uint64(r["bits"] & 0xFFFFFFFFFFFFFFFF)
    return arr.tobytes()


def probe_bloom(
    df: DataFrame,
    id_col: str,
    bloom: "bytes | Broadcast",
    num_hashes: int,
    flag_col: str = "maybe_seen",
) -> DataFrame:
    """Add ``flag_col``: True when every hash position of the id is set
    (id possibly in the historical set), False when definitely unseen,
    NULL for a NULL id.

    Map-only, with the work split where each engine is strongest: the
    k md5 positions are Spark-side codegen (the byte-identical
    expression the build used — no Python re-implementation to drift),
    the bit array rides an explicit ``SparkContext.broadcast``, and the
    pandas UDF is one vectorized ``gather >> shift & 1`` over the
    (n × k) position matrix per Arrow batch.

    ``bloom`` may be the raw bit-array bytes OR an existing
    ``SparkContext.broadcast`` of them.  Passing bytes creates a NEW
    broadcast per call whose lifetime the caller can't reach — fine
    for one-shot probes, but repeated probes of one filter (incremental
    waves reusing a multi-GB array) should broadcast ONCE and pass the
    handle, then ``.unpersist()`` / ``.destroy()`` it after the last
    consuming action::

        bc = spark.sparkContext.broadcast(bloom_bytes)
        for wave in waves:
            probe_bloom(wave, "id", bc, k).write...
        bc.destroy()
    """
    from pyspark import Broadcast

    if isinstance(bloom, Broadcast):
        bloom_bc, raw = bloom, bloom.value
    else:
        raw = bloom
        bloom_bc = df.sparkSession.sparkContext.broadcast(bloom)
    arr = np.frombuffer(raw, dtype=np.uint64)
    num_bits = len(arr) * 64
    k = num_hashes

    @F.pandas_udf("boolean")
    def probe(pos_lists: pd.Series) -> pd.Series:
        # zero-copy view over the broadcast bytes (one copy per worker)
        words = np.frombuffer(bloom_bc.value, dtype=np.uint64)
        valid = pos_lists.notna().to_numpy()
        out = np.empty(len(pos_lists), dtype=object)
        if valid.any():
            P = np.stack(
                [np.asarray(p, dtype=np.int64) for p in pos_lists[valid]]
            ).reshape(-1, k)
            hit = (
                (words[P >> 6] >> (P & 63).astype(np.uint64)) & np.uint64(1)
            ).all(axis=1)
            out[np.flatnonzero(valid)] = [bool(h) for h in hit]
        return pd.Series(out, dtype="object")

    return df.withColumn(
        flag_col, probe(_positions_array(F.col(id_col), num_hashes, num_bits))
    )


def bloom_exclude(
    df: DataFrame,
    historical: DataFrame,
    id_col: str,
    fpp: float = 0.01,
    n_items: int | None = None,
) -> DataFrame:
    """Rows of ``df`` whose id is DEFINITELY not in ``historical`` —
    the shuffle-free alternative to a left-anti join when the
    historical set is huge but its Bloom array fits in executor memory.
    False positives (≈ fpp) drop a few genuinely-new rows; no seen row
    ever passes.  NULL ids are KEPT, matching left-anti semantics (a
    NULL never equi-matches the historical side)."""
    if n_items is None:
        n_items = historical.count()
    num_bits, num_hashes = bloom_params(n_items, fpp)
    bloom = build_bloom(historical, id_col, num_bits, num_hashes)
    probed = probe_bloom(df, id_col, bloom, num_hashes)
    return probed.where(
        F.col("maybe_seen").isNull() | ~F.col("maybe_seen")
    ).drop("maybe_seen")
