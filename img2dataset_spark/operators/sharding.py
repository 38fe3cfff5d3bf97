"""R1/T12: contiguous global sharding + key synthesis.

Reference semantics (citations into /root/reference):
  - fixed-size contiguous shards of `number_sample_per_shard` rows with
    globally increasing shard ids: img2dataset/reader.py:137-151,189-212
  - key = zero-padded "{shard_id:0{oom}d}{idx:0{w}d}":
    img2dataset/downloader.py:88-94,223,238

Scale design (the SURVEY §7 "hard part #1"): a naive
`row_number() OVER (ORDER BY k)` funnels 100 TB through ONE partition.
Instead `with_global_index` does the classic distributed zip-with-index:

  1. `repartitionByRange(order_col)` — range shuffle, fully parallel;
  2. persist, count rows per partition (tiny job: one long per partition);
  3. assign `offset[pid] + local_position`, all JVM-side:
     `monotonically_increasing_id()` already encodes the within-partition
     scan position in its low 33 bits (upper bits are the partition id),
     and the scan order of the persisted sorted partition IS the sort
     order — so the index is `map[pid] + (mid & (2^33-1))` with the
     prefix-sum offsets inlined as a literal map.  No Python stage, no
     second shuffle, stays inside whole-stage codegen.

Cost at scale: exactly one range shuffle + one lightweight count pass —
the minimum possible for *exact* contiguous global numbering.  When exact
contiguity is not required, `with_hash_shard_id` assigns shards by hash
with zero shuffles.
"""

from __future__ import annotations

import math

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MID_LOCAL_MASK = (1 << 33) - 1  # low 33 bits of monotonically_increasing_id


def _assert_unique_index(df: DataFrame, index_col: str) -> None:
    """Defensive gate for the cached-scan-order invariant: the index
    assignment relies on (a) persisted partitions never being recomputed
    with different range boundaries and (b) monotonically_increasing_id
    low bits matching the cached scan order.  Executor loss at cluster
    scale recomputes partitions, and a stale literal offset map would
    then mis-index SILENTLY — this cheap count==countDistinct job turns
    that into a loud failure."""
    agg = df.agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct(index_col).alias("nd")
    ).collect()[0]
    if agg["n"] != agg["nd"]:
        raise RuntimeError(
            f"global index is not unique ({agg['nd']} distinct of {agg['n']} "
            "rows) — a persisted partition was likely recomputed with "
            "different range boundaries; re-run with a checkpointed input"
        )


def with_global_index(
    df: DataFrame,
    order_col: str,
    index_col: str = "_row_idx",
    num_partitions: int | None = None,
    strict: bool = False,
) -> DataFrame:
    """Exact contiguous 0-based global row index ordered by `order_col`,
    without a single-partition global window.  With ``strict`` the
    returned frame has been verified unique (one extra lightweight
    aggregation job over the persisted partitions)."""
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(num_partitions, F.col(order_col)).sortWithinPartitions(
        order_col
    )
    # Persist so the count pass and the index pass see identical partitions
    # (repartitionByRange samples boundaries; without persist the two jobs
    # could sample differently) AND a frozen in-partition row order (the
    # local counter below is assigned in scan order over the cached rows).
    ranged.persist(StorageLevel.MEMORY_AND_DISK)
    counts = (
        ranged.groupBy(F.spark_partition_id().alias("pid")).count().collect()
    )
    sizes: dict[int, int] = {r["pid"]: r["count"] for r in counts}
    offsets: list = []
    acc = 0
    for pid in sorted(sizes):
        offsets.extend([F.lit(pid), F.lit(acc)])
        acc += sizes[pid]

    offset_of_pid = (
        F.element_at(F.create_map(*offsets), F.spark_partition_id())
        if offsets
        else F.lit(0)
    )
    local_pos = F.monotonically_increasing_id().bitwiseAND(F.lit(_MID_LOCAL_MASK))
    indexed = ranged.withColumn(
        index_col, (offset_of_pid + local_pos).cast("long")
    )
    if strict:
        _assert_unique_index(indexed, index_col)
    return indexed


def with_shard_id(
    df: DataFrame,
    samples_per_shard: int,
    order_col: str | None = None,
    start_shard_id: int = 0,
    shard_col: str = "shard_id",
    index_col: str = "_row_idx",
) -> DataFrame:
    """Contiguous fixed-size sharding (reader.py:137-151).

    With `order_col`: exact reference semantics (shard i holds rows
    [i*N, (i+1)*N) in key order).  Without: hash-based sharding, zero
    extra shuffle (documented deviation for shuffle-free ingest).
    """
    if order_col is not None:
        indexed = with_global_index(df, order_col, index_col=index_col)
        return indexed.withColumn(
            shard_col,
            (F.floor(F.col(index_col) / samples_per_shard) + start_shard_id).cast("long"),
        )
    return with_hash_shard_id(df, samples_per_shard, shard_col=shard_col)


def with_hash_shard_id(
    df: DataFrame,
    samples_per_shard: int,
    shard_col: str = "shard_id",
) -> DataFrame:
    """Shuffle-free sharding: shard = current partition id. Row counts per
    shard are approximate (file-split driven), ids still dense per task."""
    return df.withColumn(shard_col, F.spark_partition_id().cast("long"))


def with_key(
    df: DataFrame,
    samples_per_shard: int,
    oom_shard_count: int = 5,
    shard_col: str = "shard_id",
    index_col: str = "_row_idx",
    key_col: str = "key",
) -> DataFrame:
    """T12 key synthesis (downloader.py:88-94): zero-padded
    '{shard:0{oom}d}{idx_in_shard:0{w}d}' where w = ceil(log10(N)).

    format_string (printf semantics) rather than lpad: lpad TRUNCATES
    values wider than the pad width, which would silently collide keys;
    printf only pads.
    """
    oom_sample = max(1, int(math.ceil(math.log10(max(samples_per_shard, 2)))))
    idx_in_shard = F.pmod(F.col(index_col), F.lit(samples_per_shard))
    return df.withColumn(
        key_col,
        F.format_string(f"%0{oom_shard_count}d%0{oom_sample}d",
                        F.col(shard_col), idx_in_shard),
    )
