"""A3/W7 as Structured Streaming: live progress over the stats stream.

The reference runs a separate logger PROCESS that polls the output dir
every 5 s for new `{shard}_stats.json` files, incrementally merges them
into running totals and rates, and prints updates
(/root/reference/img2dataset/logger.py:162-191,196-285).

Spark-first restatement: the stats sidecars ARE an append-only file
stream, so the whole logger collapses to a file-source Structured
Streaming query with a 5 s processing-time trigger and a global
aggregation in `update`/`complete` mode — no extra process, no polling
loop, no hand-rolled counter merging (logger.py:31-34 CappedCounter
merge == Spark partial/final aggregation).

Scale note: one stats row per 10k-sample shard means the stream is tiny
even at 100 TB (a 10B-sample run emits 1M rows total); the aggregation
state is a single group, so `complete` mode is O(1) memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Schema of {shard}_stats.json (sinks/shard_writer.py STATS_SCHEMA)
STATS_JSON_SCHEMA = StructType(
    [
        StructField("shard_id", LongType()),
        StructField("count", LongType()),
        StructField("successes", LongType()),
        StructField("failed_to_download", LongType()),
        StructField("failed_to_resize", LongType()),
        StructField("duration", DoubleType()),
        StructField("start_time", DoubleType()),
        StructField("end_time", DoubleType()),
        StructField("status_dict", StringType()),
    ]
)


def stats_stream(spark: SparkSession, output_folder: str) -> DataFrame:
    """File-source stream over the per-shard stats sidecars."""
    return (
        spark.readStream.schema(STATS_JSON_SCHEMA)
        .option("pathGlobFilter", "*_stats.json")
        .option("maxFilesPerTrigger", 1000)
        .json(output_folder)
    )


# Schema of wave_{id}_wavestats.json (sinks/shard_writer.py
# write_wave_sidecar) — the R2 subjob-wave rollups.  The suffix differs
# from '*_stats.json' so neither stream ever reads the other's files.
WAVE_STATS_JSON_SCHEMA = StructType(
    [
        StructField("wave_id", LongType()),
        StructField("lo_shard", LongType()),
        StructField("hi_shard", LongType()),
        StructField("shards", LongType()),
        StructField("count", LongType()),
        StructField("successes", LongType()),
        StructField("failed_to_download", LongType()),
        StructField("failed_to_resize", LongType()),
        StructField("duration", DoubleType()),
        StructField("start_time", DoubleType()),
        StructField("end_time", DoubleType()),
    ]
)


def wave_stats_stream(spark: SparkSession, output_folder: str) -> DataFrame:
    """File-source stream over the per-wave rollup sidecars (R2)."""
    return (
        spark.readStream.schema(WAVE_STATS_JSON_SCHEMA)
        .option("pathGlobFilter", "*_wavestats.json")
        .option("maxFilesPerTrigger", 1000)
        .json(output_folder)
    )


def aggregate_wave_progress(waves: DataFrame) -> DataFrame:
    """Run-level rollup of the wave sidecars — the mid-flight view of a
    batched 100 TB run (waves done, rows through, failure mass, wall).
    Works on both a static frame and the stream from
    `wave_stats_stream`."""
    return waves.agg(
        F.count(F.lit(1)).alias("waves_done"),
        F.sum("shards").alias("shards_done"),
        F.sum("count").alias("total"),
        F.sum("successes").alias("successes"),
        F.sum("failed_to_download").alias("failed_to_download"),
        F.sum("failed_to_resize").alias("failed_to_resize"),
        (F.sum("successes") / F.sum("count")).alias("success_rate"),
        (F.max("end_time") - F.min("start_time")).alias("wall_seconds"),
    )


def aggregate_progress(stats: DataFrame) -> DataFrame:
    """Running totals + rates (logger.py:83-141,220-271) — works on both
    a static stats DataFrame and the stream from `stats_stream`."""
    return stats.agg(
        F.count(F.lit(1)).alias("shards_done"),
        F.sum("count").alias("total"),
        F.sum("successes").alias("successes"),
        F.sum("failed_to_download").alias("failed_to_download"),
        F.sum("failed_to_resize").alias("failed_to_resize"),
        (F.sum("successes") / F.sum("count")).alias("success_rate"),
        F.sum("duration").alias("total_shard_seconds"),
        (F.max("end_time") - F.min("start_time")).alias("wall_seconds"),
        (F.sum("count") / (F.max("end_time") - F.min("start_time"))).alias(
            "samples_per_second"
        ),
    )


def start_progress_stream(
    spark: SparkSession,
    output_folder: str,
    checkpoint_dir: str,
    query_name: str = "img2dataset_progress",
    trigger_seconds: float = 5.0,
    available_now: bool = False,
):
    """Start the live progress query (memory sink, `complete` mode).

    Poll `spark.table(query_name)` for the current totals — the
    replacement for the reference logger process's printed updates.
    ``available_now=True`` drains the currently-visible files and stops
    (used by tests and post-hoc aggregation).
    """
    writer = (
        aggregate_progress(stats_stream(spark, output_folder))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
