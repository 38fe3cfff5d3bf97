"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Beyond-reference (SURVEY §7 M6): a 100 TB training-data pipeline carries
media as `binary` columns with typed metadata alongside.  This module
provides the Spark-side plumbing — schemas, Arrow-batched UDF signatures,
mapInPandas batch shapes — with REAL pure-Python parsing where no media
library is needed and clearly-marked stubs where one is:

  REAL   image_meta   — width/height/format from PNG/JPEG/GIF/WebP/BMP headers
  REAL   image pixel features — full raster decode for PNG, JPEG
                        (baseline + progressive), GIF, BMP, and lossless
                        WebP via the dependency-free codecs
                        (functions/png.py, jpeg.py, gif.py, vp8l.py);
                        only lossy-WebP (VP8) pixels need PIL
  REAL   wav_meta     — sample rate / channels / bit depth / duration from
                        RIFF/WAVE headers (pure struct parsing)
  REAL   video frame-sample — Y4M (uncompressed) and MJPEG-in-AVI
                        (functions/avi.py + the from-spec JPEG decoder);
                        other codecs need pyav/ffmpeg (STUB: honest
                        NotImplementedError; deterministic byte-slice
                        fake keeps the plumbing testable hermetically)

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

IMAGE_META_SCHEMA = (
    "width int, height int, format string, codec string, has_alpha boolean, "
    "n_bytes long, error string"
)

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


def parse_webp_info(data: bytes):
    """Header-level WebP triage from the RIFF chunk walk (container
    layout: RFC 9649 §2; 'VP8 ' frame-header layout: RFC 6386 §9.1 —
    ~20 public bytes: 3-byte frame tag, 9D 01 2A start code, 14-bit
    width/height).  Returns (codec, width, height, has_alpha) with
    codec ∈ {"vp8", "vp8l"} or None when no image chunk is found.

    This is the ROUTING primitive for lossy webp: raster decode of VP8
    stays PIL-gated (the normative RFC 6386 probability tables aren't
    reproducible offline — see functions/image.py), but pipelines can
    still count, filter, size-bucket, and route lossy frames from pure
    header bytes — format/codec/dimensions/alpha without any decode."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        return None, None, None, None
    codec = w = h = None
    has_alpha = False
    pos, n = 12, len(data)
    while pos + 8 <= n:
        cc = data[pos : pos + 4]
        size = _struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = pos + 8
        if cc == b"VP8X" and size >= 10:
            has_alpha = has_alpha or bool(data[body] & 0x10)
            if w is None:
                w = int.from_bytes(data[body + 4 : body + 7], "little") + 1
                h = int.from_bytes(data[body + 7 : body + 10], "little") + 1
        elif cc == b"VP8 " and size >= 10:
            codec = codec or "vp8"
            # keyframe start code, then 14-bit dims (RFC 6386 §9.1)
            if data[body + 3 : body + 6] == b"\x9d\x01\x2a":
                fw = _struct.unpack("<H", data[body + 6 : body + 8])[0] & 0x3FFF
                fh = _struct.unpack("<H", data[body + 8 : body + 10])[0] & 0x3FFF
                w, h = (w or fw), (h or fh)
        elif cc == b"VP8L" and size >= 5 and data[body] == 0x2F:
            codec = codec or "vp8l"
            bits = _struct.unpack("<I", data[body + 1 : body + 5])[0]
            if w is None:
                w = (bits & 0x3FFF) + 1
                h = ((bits >> 14) & 0x3FFF) + 1
            has_alpha = has_alpha or bool((bits >> 28) & 1)
        elif cc == b"ALPH":
            has_alpha = True
        pos = body + size + (size & 1)  # chunks are 2-byte aligned
    return codec, w, h, has_alpha


def make_image_meta_udf():
    """binary -> struct(width, height, format, codec, has_alpha,
    n_bytes, error).  REAL: header parsing only, no pixel decode.
    `codec` distinguishes lossy (vp8) from lossless (vp8l) webp so
    pipelines can route lossy frames around the PIL-gated raster path;
    for other formats it is NULL."""

    def meta_one(data: bytes | None):
        if data is None:
            return (None, None, None, None, None, None, "no data")
        fmt = detect_image_format(data)
        if fmt is None:
            return (None, None, None, None, None, len(data), "unknown format")
        if fmt == "webp":
            codec, w, h, has_alpha = parse_webp_info(data)
            if w is None:
                return (None, None, fmt, codec, has_alpha, len(data),
                        "header parse failed")
            return (w, h, fmt, codec, has_alpha, len(data), None)
        dims = parse_dimensions(data)
        if dims is None:
            return (None, None, fmt, None, None, len(data),
                    "header parse failed")
        return (dims[0], dims[1], fmt, None, None, len(data), None)

    @pandas_udf(IMAGE_META_SCHEMA)
    def image_meta(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        cols = [
            "width", "height", "format", "codec", "has_alpha",
            "n_bytes", "error",
        ]
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


IMAGE_FEATURES_SCHEMA = (
    "width int, height int, channels int, mean double, std double, "
    "luma_entropy double, error string"
)


def image_pixel_features(data: bytes | None):
    """Real pixel statistics from PNG/JPEG bytes (dependency-free
    decode): dims, channel count, global mean/std, and 8-bit luma
    histogram entropy — the cheap quality signals an image-curation
    pipeline filters on (flat/blank detection, exposure outliers)."""
    import numpy as np

    if data is None:
        return (None, None, None, None, None, None, "no data")
    try:
        from img2dataset_spark.functions.image import _codec_decode

        arr = _codec_decode(data)
    except Exception as e:  # undecodable or unsupported container
        return (None, None, None, None, None, None, str(e) or type(e).__name__)
    h, w = arr.shape[:2]
    nch = 1 if arr.ndim == 2 else arr.shape[2]
    f = arr.astype(np.float64)
    luma = f if arr.ndim == 2 else f[..., :3].mean(axis=2)
    hist = np.bincount(
        np.clip(luma, 0, 255).astype(np.int64).ravel(), minlength=256
    )
    p = hist / hist.sum()
    nz = p[p > 0]
    entropy = float(-(nz * np.log2(nz)).sum())
    return (w, h, nch, float(f.mean()), float(f.std()), entropy, None)


def make_image_features_udf():
    """binary -> struct(width, height, channels, mean, std, luma_entropy,
    error).  Iterator pandas UDF: one Arrow batch of (large) media rows
    in memory per task at a time."""

    @pandas_udf(IMAGE_FEATURES_SCHEMA)
    def image_features(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        cols = ["width", "height", "channels", "mean", "std",
                "luma_entropy", "error"]
        for series in batches:
            yield pd.DataFrame(
                [image_pixel_features(d) for d in series], columns=cols
            )

    return image_features


def parse_y4m_header(data: bytes):
    """YUV4MPEG2 (Y4M) stream header — a tiny public plain-text format:
    'YUV4MPEG2 W<w> H<h> F<num>:<den> ... \\n' then per frame a
    'FRAME...\\n' marker followed by planar YUV pixel data.
    Returns (width, height, fps, frame_bytes, header_end) or None."""
    if not data.startswith(b"YUV4MPEG2"):
        return None
    nl = data.find(b"\n")
    if nl < 0:
        return None
    w = h = None
    fps = None
    chroma = "420"
    for tok in data[10:nl].split(b" "):
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            num, den = tok[1:].split(b":")
            fps = int(num) / int(den)
        elif tok[:1] == b"C":
            chroma = tok[1:].decode("ascii", "replace")
    if not w or not h:
        return None
    if chroma.startswith("420"):
        frame_bytes = w * h * 3 // 2
    elif chroma.startswith("422"):
        frame_bytes = w * h * 2
    elif chroma.startswith("444"):
        frame_bytes = w * h * 3
    elif chroma.startswith("mono"):
        frame_bytes = w * h
    else:
        return None
    return w, h, fps, frame_bytes, nl + 1


def sample_y4m_frames(data: bytes, num_frames: int) -> list[bytes] | None:
    """Evenly-spaced raw YUV frames from a Y4M stream (REAL pixel data,
    no decoder dependency — Y4M is uncompressed)."""
    hdr = parse_y4m_header(data)
    if hdr is None:
        return None
    _, _, _, frame_bytes, pos = hdr
    offsets = []
    n = len(data)
    while pos < n and data[pos : pos + 5] == b"FRAME":
        fnl = data.find(b"\n", pos)
        if fnl < 0:
            break
        offsets.append(fnl + 1)
        pos = fnl + 1 + frame_bytes
    if not offsets:
        return None
    total = len(offsets)
    picks = sorted({min(total - 1, i * total // num_frames) for i in range(num_frames)})
    return [data[offsets[i] : offsets[i] + frame_bytes] for i in picks]


def make_frame_sample_udf(num_frames: int = 4, mock: bool = False):
    """binary video -> array<binary> of `num_frames` sampled frames.

    REAL for Y4M (uncompressed YUV4MPEG2 — parsed natively, returns raw
    planar frames) and for MJPEG-in-AVI (RIFF walk + per-frame baseline
    JPEG, standard Huffman tables spliced when omitted — see
    functions/avi.py; frames come back as standalone JPEG byte strings
    decodable by functions/jpeg.py).  Other compressed codecs
    (mp4/webm/h264-in-avi/...) need pyav/ffmpeg, absent here:
    clearly-marked stub raises.  mock=True returns deterministic
    evenly-spaced byte slices so the plumbing (schema, batch shape,
    downstream explode) stays testable.
    """

    def sample_one(data: bytes | None):
        if data is None:
            return None
        if data[:9] == b"YUV4MPEG2":
            return sample_y4m_frames(data, num_frames)
        if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
            from img2dataset_spark.functions.avi import sample_avi_frames

            return sample_avi_frames(data, num_frames)
        if not mock:
            # clearly-marked stub — narrowed to non-MJPEG compressed codecs
            raise NotImplementedError(
                "compressed video frame sampling (beyond MJPEG/AVI and Y4M) "
                "requires an av/ffmpeg library"
            )
        n = len(data)
        step = max(1, n // num_frames)
        return [data[i * step : i * step + min(16, step)] for i in range(num_frames)]

    @pandas_udf(FRAME_SAMPLE_SCHEMA)
    def frame_sample(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in batches:
            yield series.map(sample_one)

    return frame_sample


AUDIO_FEATURES_SCHEMA = (
    "duration_s double, rms double, peak double, zcr double, error string"
)


def wav_pcm_features(data: bytes | None):
    """Real signal features from WAV PCM bytes (numpy, no audio lib):
    RMS and peak of the normalized signal, zero-crossing rate.  8-bit
    (unsigned) and 16-bit (signed) PCM supported."""
    import numpy as np

    meta = parse_wav_header(data)
    if meta is None:
        return (None, None, None, None, "unsupported codec (WAV only)")
    rate, channels, bits, n_frames, duration = meta
    # locate the data chunk payload
    pos, n = 12, len(data)
    payload = None
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        size = _struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        if cid == b"data":
            payload = data[pos + 8 : pos + 8 + size]
            break
        pos += 8 + size + (size % 2)
    if payload is None:
        return (None, None, None, None, "no data chunk")
    if bits == 16:
        x = np.frombuffer(payload, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(payload, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        return (None, None, None, None, f"unsupported bit depth {bits}")
    if channels > 1:
        x = x[: (len(x) // channels) * channels].reshape(-1, channels).mean(axis=1)
    if len(x) == 0:
        return (float(duration), 0.0, 0.0, 0.0, None)
    rms = float(np.sqrt(np.mean(x * x)))
    peak = float(np.max(np.abs(x)))
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if len(x) > 1 else 0.0
    return (float(duration), rms, peak, zcr, None)


def make_audio_features_udf():
    """binary -> struct(duration_s, rms, peak, zcr, error) — REAL DSP for
    WAV PCM; other codecs flagged, not faked."""

    @pandas_udf(AUDIO_FEATURES_SCHEMA)
    def audio_features(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        cols = ["duration_s", "rms", "peak", "zcr", "error"]
        for series in batches:
            yield pd.DataFrame([wav_pcm_features(d) for d in series], columns=cols)

    return audio_features


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
