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


def test_streaming_url_dedup_matches_batch_canonicals(spark, tmp_path):
    """streaming_url_dedup keeps one row per canonical URL and agrees
    with the batch canonicalizer on the key set."""
    import datetime as dt

    from img2dataset_spark.functions.url import canonical_url
    from img2dataset_spark.streaming.dedup import streaming_url_dedup

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, t0, "HTTP://Img.Site:80/cat.jpg?utm_source=a#f"),
        (2, t0 + dt.timedelta(seconds=5), "http://img.site/cat.jpg"),
        (3, t0 + dt.timedelta(seconds=10), "http://img.site/dog.jpg?b=2&a=1"),
        (4, t0 + dt.timedelta(seconds=15), "http://img.site/dog.jpg?a=1&b=2"),
        (5, t0 + dt.timedelta(seconds=20), "http://other.site/bird.jpg"),
    ]
    src = os.path.join(str(tmp_path), "usrc")
    batch = spark.createDataFrame(rows, "doc_id long, ts timestamp, url string")
    batch.write.parquet(src)

    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        streaming_url_dedup(stream, watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_stream_url_dedup")
        .option("checkpointLocation", os.path.join(str(tmp_path), "uckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table("t_stream_url_dedup").collect()
    want = {
        r["c"]
        for r in batch.select(canonical_url(F.col("url")).alias("c")).collect()
    }
    assert {r["canonical_url"] for r in got} == want
    assert len(got) == len(want) == 3


def test_streaming_url_dedup_null_urls_exempt(spark, tmp_path):
    """NULL-url rows are exempt from streaming dedup (each gets a
    unique uuid state key): ALL of them pass through with canonical_url
    NULL, matching batch dedup_by_url's null exemption."""
    import datetime as dt

    from img2dataset_spark.streaming.dedup import streaming_url_dedup

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, t0, None),
        (2, t0 + dt.timedelta(seconds=5), None),
        (3, t0 + dt.timedelta(seconds=10), "http://img.site/cat.jpg"),
        (4, t0 + dt.timedelta(seconds=15), "http://img.site/cat.jpg#frag"),
    ]
    src = os.path.join(str(tmp_path), "unullsrc")
    batch = spark.createDataFrame(rows, "doc_id long, ts timestamp, url string")
    batch.write.parquet(src)

    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        streaming_url_dedup(stream, watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_stream_url_dedup_null")
        .option("checkpointLocation", os.path.join(str(tmp_path), "unullckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table("t_stream_url_dedup_null").collect()
    null_ids = sorted(r["doc_id"] for r in got if r["canonical_url"] is None)
    assert null_ids == [1, 2]  # both NULL rows survive
    assert len([r for r in got if r["canonical_url"] is not None]) == 1
