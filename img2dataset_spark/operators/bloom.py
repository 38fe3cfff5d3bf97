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

  probe: the bit array rides to executors in the UDF closure (Spark
    broadcasts task binaries once per executor) and an Arrow-batched
    pandas UDF tests k bits per row — zero shuffles, zero joins.

Determinism: position j of id = fold32(md5("j:" + str(id))) % num_bits,
reproducible in DuckDB SQL verbatim — the oracle rebuilds the same
filter relationally and must agree bit-for-bit (queries.py
``bloom_probe``).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from img2dataset_spark.functions.text import hex_to_int32


def bloom_params(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Standard sizing: m = -n ln(p)/ln(2)^2 bits (rounded up to a
    64-bit word), k = m/n ln(2) hashes."""
    if n_items <= 0:
        return 64, 1
    m = int(-n_items * math.log(fpp) / (math.log(2) ** 2))
    m = max(64, ((m + 63) // 64) * 64)
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def _position(col, seed: int, num_bits: int):
    """Engine-portable hash position: fold32(md5("seed:id")) % num_bits.
    The SQL twin is _hv_of(md5(seed || ':' || id)) % num_bits."""
    h = F.md5(
        F.concat_ws(":", F.lit(seed), col.cast("string")).cast("binary")
    )
    return F.pmod(hex_to_int32(h), F.lit(num_bits))


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
    bloom: bytes,
    num_hashes: int,
    flag_col: str = "maybe_seen",
) -> DataFrame:
    """Add ``flag_col``: True when every hash position of the id is set
    (id possibly in the historical set), False when definitely unseen.
    Map-only: the bit array travels in the UDF closure; the Python-side
    md5 fold is byte-identical to the build expression (int(hex[:8],16)
    == the per-digit fold)."""
    arr = np.frombuffer(bloom, dtype=np.uint64)
    num_bits = len(arr) * 64

    @F.pandas_udf("boolean")
    def probe(ids: pd.Series) -> pd.Series:
        out = []
        for v in ids:
            if pd.isna(v):  # nulls arrive as None OR NaN depending on dtype
                out.append(None)
                continue
            # int64-with-null columns arrive as float64; normalize so the
            # string fed to md5 matches Spark's cast(long as string)
            s = str(int(v)) if isinstance(v, float) else str(v)
            hit = True
            for j in range(num_hashes):
                pos = (
                    int(hashlib.md5(f"{j}:{s}".encode()).hexdigest()[:8], 16)
                    % num_bits
                )
                if not (int(arr[pos // 64]) >> (pos % 64)) & 1:
                    hit = False
                    break
            out.append(hit)
        return pd.Series(out, dtype="object")

    return df.withColumn(flag_col, probe(F.col(id_col)))


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
    ever passes."""
    if n_items is None:
        n_items = historical.count()
    num_bits, num_hashes = bloom_params(n_items, fpp)
    bloom = build_bloom(historical, id_col, num_bits, num_hashes)
    probed = probe_bloom(df, id_col, bloom, num_hashes)
    return probed.where(~F.col("maybe_seen")).drop("maybe_seen")
