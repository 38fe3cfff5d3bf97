"""Multimodal column plumbing (image/WAV header parsing, frame sampling)
and event-time windowed aggregation (batch == streaming with watermark)."""

from __future__ import annotations

import struct

import pandas as pd
import pytest
from pyspark.sql import functions as F

from img2dataset_spark.functions.multimodal import (
    detect_image_format,
    extract_image_features,
    extract_wav_features,
    parse_wav_header,
    sample_video_frames,
)


def png_bytes(w: int, h: int) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x02\x00\x00\x00"
        + b"\x00" * 16
    )


def wav_bytes(rate: int, channels: int, bits: int, n_frames: int) -> bytes:
    data_size = n_frames * channels * (bits // 8)
    fmt = (
        b"fmt "
        + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * bits // 8, channels * bits // 8, bits)
    )
    data = b"data" + struct.pack("<I", data_size) + b"\x00" * data_size
    body = b"WAVE" + fmt + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


class TestParsers:
    def test_detect_formats(self):
        assert detect_image_format(png_bytes(4, 4)) == "png"
        assert detect_image_format(b"\xff\xd8\xff\xe0" + b"\x00" * 16) == "jpg"
        assert detect_image_format(b"garbage-not-an-image") is None

    def test_wav_header_roundtrip(self):
        got = parse_wav_header(wav_bytes(16000, 2, 16, 8000))
        assert got == (16000, 2, 16, 8000, 0.5)

    def test_wav_header_rejects_nonwav(self):
        assert parse_wav_header(b"\x89PNG" + b"\x00" * 60) is None


class TestSparkPlumbing:
    def test_image_meta_udf(self, spark):
        rows = [
            (0, png_bytes(320, 200)),
            (1, b"\xff\xd8\xff"),  # truncated jpeg
            (2, None),
        ]
        df = spark.createDataFrame(rows, "id long, jpg binary")
        out = {r["id"]: r["image_meta"] for r in extract_image_features(df).collect()}
        assert out[0]["width"] == 320 and out[0]["height"] == 200
        assert out[0]["format"] == "png" and out[0]["error"] is None
        assert out[1]["error"] is not None
        assert out[2]["error"] == "no data"

    def test_wav_meta_udf(self, spark):
        rows = [(0, wav_bytes(44100, 1, 16, 44100)), (1, b"not-audio")]
        df = spark.createDataFrame(rows, "id long, audio binary")
        out = {r["id"]: r["audio_meta"] for r in extract_wav_features(df).collect()}
        assert out[0]["sample_rate"] == 44100
        assert out[0]["duration_s"] == pytest.approx(1.0)
        assert "unsupported" in out[1]["error"]

    def test_frame_sample_mock(self, spark):
        df = spark.createDataFrame([(0, bytes(range(256)))], "id long, video binary")
        out = sample_video_frames(df, num_frames=4, mock=True).collect()[0]["frames"]
        assert len(out) == 4
        assert bytes(out[0])[:4] == bytes([0, 1, 2, 3])
        # deterministic: evenly spaced slices
        assert bytes(out[1])[0] == 64

    def test_frame_sample_stub_raises(self, spark):
        df = spark.createDataFrame([(0, b"\x00" * 64)], "id long, video binary")
        with pytest.raises(Exception, match="NotImplementedError|frame sampling"):
            sample_video_frames(df, mock=False).collect()


class TestWindowedAggregation:
    def test_streaming_matches_batch(self, spark, tmp_path):
        from img2dataset_spark.queries import _t
        from img2dataset_spark.streaming.windowed import (
            streaming_windowed_event_counts,
            windowed_event_counts,
        )

        events = _t(spark, "/root/testdata/sf0.001", "events")
        batch = windowed_event_counts(events, "1 hour")

        src = str(tmp_path / "stream_src")
        events.write.parquet(src)
        stream = streaming_windowed_event_counts(
            spark, src, spark.read.parquet(src).schema, window="1 hour",
            watermark="2 hours",
        )
        q = (
            stream.writeStream.outputMode("complete")
            .format("memory")
            .queryName("t_windowed")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["window_start"], r["event_type"]): (r["cnt"], r["total_value"])
            for r in spark.table("t_windowed").collect()
        }
        want = {
            (r["window_start"], r["event_type"]): (r["cnt"], r["total_value"])
            for r in batch.collect()
        }
        assert got == want and len(want) > 0
