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

    def test_image_pixel_features_udf(self, spark):
        """Real raster features via the dependency-free PNG/JPEG codecs:
        known-constant PNG gives exact mean/std/entropy; JPEG decodes
        for real; webp errors cleanly."""
        import numpy as np

        from img2dataset_spark.functions.jpeg import encode_jpeg
        from img2dataset_spark.functions.multimodal import (
            make_image_features_udf,
        )
        from img2dataset_spark.functions.png import encode_png

        from img2dataset_spark.functions.vp8l import encode_webp_lossless

        flat = np.full((10, 20, 3), 77, np.uint8)
        rows = [
            (0, encode_png(flat)),
            (1, encode_jpeg(flat, 95)),
            (2, b"RIFF\x00\x00\x00\x00WEBPVP8 " + b"\x00" * 16),
            (3, None),
            (4, encode_webp_lossless(flat)),
        ]
        df = spark.createDataFrame(rows, "id long, img binary")
        feats = make_image_features_udf()
        out = {
            r["id"]: r["f"]
            for r in df.select("id", feats("img").alias("f")).collect()
        }
        assert (out[0]["width"], out[0]["height"], out[0]["channels"]) == (20, 10, 3)
        assert out[0]["mean"] == pytest.approx(77.0)
        assert out[0]["std"] == pytest.approx(0.0)
        assert out[0]["luma_entropy"] == pytest.approx(0.0)
        assert out[1]["error"] is None
        assert out[1]["mean"] == pytest.approx(77.0, abs=2.0)
        # lossy webp: honest gate; lossless webp: REAL pixels
        assert "lossy WebP" in out[2]["error"]
        assert out[3]["error"] == "no data"
        assert out[4]["error"] is None
        assert (out[4]["width"], out[4]["height"]) == (20, 10)
        assert out[4]["mean"] == pytest.approx(77.0)


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


def y4m_bytes(w: int, h: int, n_frames: int, fps=(25, 1)) -> bytes:
    """Synthetic YUV4MPEG2 stream: frame k filled with byte value k."""
    hdr = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C420jpeg\n".encode()
    frame_bytes = w * h * 3 // 2
    out = bytearray(hdr)
    for k in range(n_frames):
        out += b"FRAME\n" + bytes([k & 0xFF]) * frame_bytes
    return bytes(out)


class TestY4m:
    def test_header(self):
        from img2dataset_spark.functions.multimodal import parse_y4m_header

        w, h, fps, fb, off = parse_y4m_header(y4m_bytes(16, 8, 1))
        assert (w, h, fps) == (16, 8, 25.0)
        assert fb == 16 * 8 * 3 // 2

    def test_real_frame_sampling(self):
        from img2dataset_spark.functions.multimodal import sample_y4m_frames

        data = y4m_bytes(8, 4, 10)
        frames = sample_y4m_frames(data, 4)
        assert len(frames) == 4
        fb = 8 * 4 * 3 // 2
        assert all(len(f) == fb for f in frames)
        # evenly spaced: frames 0, 2, 5, 7 (i*10//4)
        assert [f[0] for f in frames] == [0, 2, 5, 7]

    def test_udf_routes_y4m_without_mock(self, spark):
        from img2dataset_spark.functions.multimodal import sample_video_frames

        df = spark.createDataFrame(
            [(0, y4m_bytes(8, 4, 6))], "id long, video binary"
        )
        out = sample_video_frames(df, num_frames=3, mock=False).collect()[0]["frames"]
        assert len(out) == 3 and len(out[0]) == 8 * 4 * 3 // 2


class TestAudioFeatures:
    def test_silence_and_square_wave(self, spark):
        import struct as _s

        import numpy as np

        from img2dataset_spark.functions.multimodal import wav_pcm_features

        # silence
        d, rms, peak, zcr, err = wav_pcm_features(wav_bytes(8000, 1, 16, 800))
        assert err is None and rms == 0.0 and peak == 0.0
        assert abs(d - 0.1) < 1e-9
        # full-scale square wave at Nyquist/2: rms == peak == amplitude
        amp = 16384
        n = 1000
        samples = np.tile([amp, amp, -amp, -amp], n // 4).astype("<i2")
        payload = samples.tobytes()
        hdr = (b"RIFF" + _s.pack("<I", 36 + len(payload)) + b"WAVE"
               + b"fmt " + _s.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
               + b"data" + _s.pack("<I", len(payload)))
        d, rms, peak, zcr, err = wav_pcm_features(hdr + payload)
        assert err is None
        assert abs(peak - 0.5) < 1e-6        # 16384/32768
        assert abs(rms - 0.5) < 1e-6         # square wave: rms == peak
        assert abs(zcr - 0.5) < 0.01         # crosses every 2 samples

    def test_udf(self, spark):
        from img2dataset_spark.functions.multimodal import make_audio_features_udf
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(0, wav_bytes(16000, 2, 16, 1600)), (1, b"nope")],
            "id long, audio binary",
        )
        feats = make_audio_features_udf()
        out = {r["id"]: r["f"] for r in df.select("id", feats(F.col("audio")).alias("f")).collect()}
        assert out[0]["error"] is None and abs(out[0]["duration_s"] - 0.1) < 1e-9
        assert out[1]["error"] is not None


class TestWebpRouting:
    """Round-5: header-level lossy/lossless triage for webp — the
    routing primitive for the (permanent) PIL gate on VP8 raster."""

    @staticmethod
    def _vp8_lossy(w=640, h=360):
        import struct

        # RFC 6386 §9.1 keyframe header: 3-byte frame tag (keyframe,
        # version 0, show_frame), 9D 01 2A start code, 14-bit dims
        frame = bytes([0x50, 0x00, 0x00]) + b"\x9d\x01\x2a" + struct.pack(
            "<HH", w, h
        ) + b"\x00" * 10
        chunk = b"VP8 " + struct.pack("<I", len(frame)) + frame
        riff = b"WEBP" + chunk
        return b"RIFF" + struct.pack("<I", len(riff)) + riff

    @staticmethod
    def _vp8x_wrapped(w=640, h=360, alpha=True):
        import struct

        inner = TestWebpRouting._vp8_lossy(w, h)
        vp8_chunk = inner[12:]
        body = bytes([0x10 if alpha else 0x00]) + b"\x00\x00\x00" + (
            (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
        )
        vp8x = b"VP8X" + struct.pack("<I", len(body)) + body
        riff = b"WEBP" + vp8x + vp8_chunk
        return b"RIFF" + struct.pack("<I", len(riff)) + riff

    def test_parse_webp_info_lossy(self):
        from img2dataset_spark.functions.multimodal import parse_webp_info

        codec, w, h, alpha = parse_webp_info(self._vp8_lossy(1280, 720))
        assert (codec, w, h, alpha) == ("vp8", 1280, 720, False)

    def test_parse_webp_info_vp8x_alpha(self):
        from img2dataset_spark.functions.multimodal import parse_webp_info

        codec, w, h, alpha = parse_webp_info(self._vp8x_wrapped(64, 48, True))
        assert (codec, w, h, alpha) == ("vp8", 64, 48, True)

    def test_parse_webp_info_lossless(self):
        from img2dataset_spark.functions.multimodal import parse_webp_info
        from img2dataset_spark.functions.vp8l import encode_webp_lossless
        import numpy as np

        img = np.zeros((5, 7, 3), dtype=np.uint8)
        codec, w, h, alpha = parse_webp_info(encode_webp_lossless(img))
        assert codec == "vp8l" and (w, h) == (7, 5)

    def test_image_meta_routes_lossy_webp(self, spark):
        """A pipeline can count/filter/route lossy webp from pure
        header bytes even though its raster decode stays gated."""
        from img2dataset_spark.functions.vp8l import encode_webp_lossless
        import numpy as np

        rows = [
            (0, self._vp8_lossy(320, 200)),
            (1, encode_webp_lossless(np.zeros((4, 6, 3), dtype=np.uint8))),
            (2, png_bytes(10, 10)),
        ]
        df = spark.createDataFrame(rows, "id long, jpg binary")
        out = {
            r["id"]: r["image_meta"] for r in extract_image_features(df).collect()
        }
        assert out[0]["format"] == "webp" and out[0]["codec"] == "vp8"
        assert (out[0]["width"], out[0]["height"]) == (320, 200)
        assert out[0]["error"] is None
        assert out[1]["codec"] == "vp8l" and out[1]["error"] is None
        assert out[2]["codec"] is None and out[2]["format"] == "png"
