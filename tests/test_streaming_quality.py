"""The new quality ops are map-only, so they must run UNCHANGED under
Structured Streaming: the same redact_pii / contamination expressions
applied to a readStream frame yield exactly the batch result.  That is
the point of keeping them shuffle-free — a streaming ingest pipeline
can scrub and score documents on the way in with zero extra machinery.
"""

import os

from img2dataset_spark.functions.redact import redact_pii
from img2dataset_spark.operators.decontaminate import (
    benchmark_shingle_set,
    make_contamination_udf,
)
from pyspark.sql import functions as F


def _drain(df, tmp_path, name):
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", os.path.join(str(tmp_path), f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return df.sparkSession.table(name)


def test_streaming_redaction_matches_batch(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    batch = spark.createDataFrame(
        [
            (1, "mail a@b.io from 10.0.0.1"),
            (2, "ssn 123-45-6789 clean tail"),
            (3, "nothing sensitive"),
        ],
        "doc_id long, text string",
    )
    batch.write.parquet(src)

    stream = spark.readStream.schema(batch.schema).parquet(src)
    got = {
        r["doc_id"]: (r["text"], r["n_email"], r["n_ipv4"], r["n_ssn"])
        for r in _drain(redact_pii(stream), tmp_path, "t_stream_redact").collect()
    }
    want = {
        r["doc_id"]: (r["text"], r["n_email"], r["n_ipv4"], r["n_ssn"])
        for r in redact_pii(batch).collect()
    }
    assert got == want
    assert got[1][0] == "mail <EMAIL> from <IPV4>"


def test_streaming_contamination_matches_batch(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    batch = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high"),
            (2, "totally unrelated words appear here"),
        ],
        "doc_id long, text string",
    )
    batch.write.parquet(src)
    bench = spark.createDataFrame(
        [(9, "the quick brown fox jumps high")], "doc_id long, text string"
    )

    udf = make_contamination_udf(spark, benchmark_shingle_set(bench, k=3), k=3)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    scored = stream.select("doc_id", udf(F.col("text")).alias("contamination"))
    got = {
        r["doc_id"]: r["contamination"]
        for r in _drain(scored, tmp_path, "t_stream_contam").collect()
    }
    assert got == {1: 1.0, 2: 0.0}
