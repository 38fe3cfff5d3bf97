"""Streaming deduplication — exact dedup as data arrives.

Batch `operators.dedup.exact_dedup` keeps one row per content
fingerprint with a hash aggregate.  The streaming twin answers the
ingestion-time question — "have I already accepted this document?" —
with Spark's `dropDuplicatesWithinWatermark`: state holds one entry
per fingerprint seen inside the watermark horizon and is evicted once
the event-time watermark passes, so state is O(fingerprints per
horizon), not O(corpus).

That horizon IS the semantic difference from batch dedup: a duplicate
arriving later than the watermark delay after the original is emitted
again.  For a training-data ingest (dedup against the recent crawl
window, with a periodic batch `exact_dedup` compaction over the
accumulated corpus) this is the standard lambda split: the stream
bounds state, the batch pass guarantees global exactness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from img2dataset_spark.functions.text import fingerprint


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Shared prep: attach the normalized-content fingerprint (same
    expression as batch exact_dedup, so stream and batch agree)."""
    return df.withColumn("fingerprint", fingerprint(F.col(text_col)))


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-seen rows of a streaming DataFrame, deduped by content
    fingerprint within the watermark horizon.  State per fingerprint is
    dropped when the watermark passes its event time + delay."""
    return (
        with_fingerprint(stream, text_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )
