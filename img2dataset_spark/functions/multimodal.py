"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Beyond-reference (SURVEY §7 M6): a 100 TB training-data pipeline carries
media as `binary` columns with typed metadata alongside.  This module
provides the Spark-side plumbing — schemas, Arrow-batched UDF signatures,
mapInPandas batch shapes — with REAL pure-Python parsing where no media
library is needed and clearly-marked stubs where one is:

  REAL   image_meta   — width/height/format from PNG/JPEG/GIF/WebP/BMP headers
  REAL   wav_meta     — sample rate / channels / bit depth / duration from
                        RIFF/WAVE headers (pure struct parsing)
  STUB   pixel decode — full raster decode needs PIL/OpenCV; raises
                        NotImplementedError unless PIL is importable
  STUB   video frame-sample — needs pyav/ffmpeg; deterministic byte-slice
                        fake keeps the plumbing testable hermetically

Scale notes: media rows are large (MBs); the UDFs are iterator-style so
one Arrow batch is in memory per task at a time, and callers should size
`spark.sql.files.maxPartitionBytes` / `maxRecordsPerFile` so a partition
of media rows fits executor memory.  All functions are factories —
pandas_udf registration needs an active SparkSession.
"""

from __future__ import annotations

import struct as _struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from img2dataset_spark.functions.image import parse_dimensions

IMAGE_META_SCHEMA = "width int, height int, format string, n_bytes long, error string"

WAV_META_SCHEMA = (
    "sample_rate int, channels int, bits_per_sample int, "
    "n_frames long, duration_s double, error string"
)

FRAME_SAMPLE_SCHEMA = "array<binary>"


def detect_image_format(data: bytes | None) -> str | None:
    if data is None or len(data) < 12:
        return None
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:2] == b"\xff\xd8":
        return "jpg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    if data[:2] == b"BM":
        return "bmp"
    return None


def make_image_meta_udf():
    """binary -> struct(width, height, format, n_bytes, error).  REAL:
    header parsing only, no pixel decode."""

    def meta_one(data: bytes | None):
        if data is None:
            return (None, None, None, None, "no data")
        fmt = detect_image_format(data)
        if fmt is None:
            return (None, None, None, len(data), "unknown format")
        dims = parse_dimensions(data)
        if dims is None:
            return (None, None, fmt, len(data), "header parse failed")
        return (dims[0], dims[1], fmt, len(data), None)

    @pandas_udf(IMAGE_META_SCHEMA)
    def image_meta(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        cols = ["width", "height", "format", "n_bytes", "error"]
        for series in batches:
            yield pd.DataFrame([meta_one(d) for d in series], columns=cols)

    return image_meta


def parse_wav_header(data: bytes | None):
    """RIFF/WAVE fmt+data chunk walk (pure struct parsing)."""
    if data is None or len(data) < 44:
        return None
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos, n = 12, len(data)
    rate = channels = bits = None
    data_size = None
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        size = _struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        if cid == b"fmt " and pos + 24 <= n:
            channels = _struct.unpack("<H", data[pos + 10 : pos + 12])[0]
            rate = _struct.unpack("<I", data[pos + 12 : pos + 16])[0]
            bits = _struct.unpack("<H", data[pos + 22 : pos + 24])[0]
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size % 2)
    if rate is None or data_size is None or not channels or not bits:
        return None
    n_frames = data_size // (channels * (bits // 8))
    return rate, channels, bits, n_frames, n_frames / rate


def make_wav_meta_udf():
    """binary -> struct(sample_rate, channels, bits_per_sample, n_frames,
    duration_s, error).  REAL for WAV; other codecs need an audio library
    (stub: 'unsupported codec')."""

    def meta_one(data: bytes | None):
        if data is None:
            return (None, None, None, None, None, "no data")
        parsed = parse_wav_header(data)
        if parsed is None:
            return (None, None, None, None, None, "unsupported codec (WAV only)")
        return parsed + (None,)

    @pandas_udf(WAV_META_SCHEMA)
    def wav_meta(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        cols = ["sample_rate", "channels", "bits_per_sample", "n_frames",
                "duration_s", "error"]
        for series in batches:
            yield pd.DataFrame([meta_one(d) for d in series], columns=cols)

    return wav_meta


def make_frame_sample_udf(num_frames: int = 4, mock: bool = False):
    """binary video -> array<binary> of `num_frames` sampled frames.

    STUB: real decoding needs pyav/ffmpeg (not in this environment).
    mock=True returns deterministic evenly-spaced byte slices so the
    plumbing (schema, batch shape, downstream explode) is testable.
    """

    def sample_one(data: bytes | None):
        if data is None:
            return None
        if not mock:
            # clearly-marked stub — no video decoder available
            raise NotImplementedError(
                "video frame sampling requires an av/ffmpeg library"
            )
        n = len(data)
        step = max(1, n // num_frames)
        return [data[i * step : i * step + min(16, step)] for i in range(num_frames)]

    @pandas_udf(FRAME_SAMPLE_SCHEMA)
    def frame_sample(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in batches:
            yield series.map(sample_one)

    return frame_sample


def extract_image_features(df: DataFrame, data_col: str = "jpg") -> DataFrame:
    """Attach typed image metadata to a media DataFrame (mapInPandas-shaped
    composition: one projection, no shuffle)."""
    meta = make_image_meta_udf()
    return df.withColumn("image_meta", meta(F.col(data_col)))


def extract_wav_features(df: DataFrame, data_col: str = "audio") -> DataFrame:
    meta = make_wav_meta_udf()
    return df.withColumn("audio_meta", meta(F.col(data_col)))


def sample_video_frames(
    df: DataFrame, data_col: str = "video", num_frames: int = 4, mock: bool = False
) -> DataFrame:
    sampler = make_frame_sample_udf(num_frames, mock=mock)
    return df.withColumn("frames", sampler(F.col(data_col)))
