"""streaming/dedup.py — streaming exact dedup twin agrees with batch."""

import datetime as dt
import os

from pyspark.sql import functions as F

from img2dataset_spark.operators.dedup import exact_dedup
from img2dataset_spark.streaming.dedup import streaming_exact_dedup, with_fingerprint


def _rows():
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    mk = lambda i, s, text: (i, t0 + dt.timedelta(seconds=s), text)
    return [
        mk(1, 0, "the quick brown fox"),
        mk(2, 10, "The  Quick   Brown Fox"),  # same normalized content
        mk(3, 20, "something else entirely"),
        mk(4, 30, "the quick brown fox"),     # duplicate again
        mk(5, 40, "third distinct document"),
    ]


def test_streaming_dedup_matches_batch_fingerprints(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    batch = spark.createDataFrame(_rows(), "doc_id long, ts timestamp, text string")
    batch.write.parquet(src)

    stream = spark.readStream.schema(batch.schema).parquet(src)
    deduped = streaming_exact_dedup(stream, watermark="10 minutes")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_stream_dedup")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table("t_stream_dedup").collect()

    # one surviving row per distinct fingerprint, same fingerprint set
    # as the batch operator computes
    want_fps = {
        r["fingerprint"]
        for r in exact_dedup(batch.select("doc_id", "text")).collect()
    }
    assert {r["fingerprint"] for r in got} == want_fps
    assert len(got) == len(want_fps) == 3
    # exactly one representative per fingerprint survives; WHICH member
    # of an in-batch duplicate group wins is partition-order-dependent
    # (dropDuplicatesWithinWatermark makes no first-by-event-time
    # promise), so assert membership, not identity
    winners = {r["doc_id"] for r in got}
    assert 3 in winners and 5 in winners
    assert len(winners & {1, 2, 4}) == 1


def test_stateful_operator_in_plan(spark, tmp_path):
    batch = spark.createDataFrame(_rows(), "doc_id long, ts timestamp, text string")
    src = os.path.join(str(tmp_path), "src2")
    batch.write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    logical = streaming_exact_dedup(stream)._jdf.queryExecution().logical().toString()
    assert "DeduplicateWithinWatermark" in logical


def test_fingerprint_matches_batch_expression(spark):
    batch = spark.createDataFrame(_rows(), "doc_id long, ts timestamp, text string")
    a = with_fingerprint(batch).select("doc_id", "fingerprint")
    b = batch.select(
        "doc_id",
        F.md5(
            F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ").cast("binary")
        ).alias("fingerprint"),
    )
    assert a.collect() == b.collect()
