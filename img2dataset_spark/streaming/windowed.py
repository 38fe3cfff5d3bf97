"""Event-time windowed aggregation over the events stream.

Beyond-reference (SURVEY §2.10 notes the reference has no event-time
semantics at all): a training-data pipeline's telemetry wants tumbling-
window rollups with late-data handling.  Expressed once as a column
recipe shared by the batch query (oracle-checkable against DuckDB's
time_bucket) and the Structured Streaming query (same aggregation +
watermark; state is bounded by watermark expiry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from img2dataset_spark.functions.eventtime import ensure_event_time


def windowed_event_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window counts + value sums per event_type.

    Works on both batch and streaming DataFrames (same plan either way —
    the streaming variant just adds a watermark first).
    """
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(27,4)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "cnt",
            "total_value",
        )
    )


def streaming_windowed_event_counts(
    spark: SparkSession,
    input_dir: str,
    schema,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """File-source streaming variant with late-data watermark: aggregation
    state for a window is dropped once the watermark passes its end, so
    state size is O(active windows), not O(history)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    return (
        ensure_event_time(stream, "ts")
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(27,4)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "cnt",
            "total_value",
        )
    )
