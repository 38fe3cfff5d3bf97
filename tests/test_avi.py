"""MJPEG/AVI frame sampling: hand-authored RIFF/AVI fixtures, pixel
assertions through the from-spec JPEG decoder, and the honest pyav gate
for non-MJPEG codecs."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from img2dataset_spark.functions.avi import (
    ensure_mjpeg_huffman,
    parse_avi,
    sample_avi_frames,
)
from img2dataset_spark.functions.jpeg import decode_jpeg, encode_jpeg


def _chunk(cc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return cc + struct.pack("<I", len(payload)) + payload + pad


def _list(ltype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", ltype + payload)


def make_avi(frames, w, h, fps=10, codec=b"MJPG", use_rec=False):
    """Minimal spec-shaped AVI: hdrl(avih + strl(strh,strf)) + movi."""
    n = len(frames)
    avih = struct.pack(
        "<IIIIIIIIII", int(1_000_000 / fps), 0, 0, 0, n, 0, 1, 0, w, h
    ) + b"\x00" * 16
    strh = (
        b"vids"
        + codec
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, 0, 0, 0)
        + struct.pack("<HHHH", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, w * h * 3, 0, 0, 0, 0)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    if use_rec:
        movi_children = b"".join(_list(b"rec ", _chunk(b"00dc", f)) for f in frames)
    else:
        movi_children = b"".join(_chunk(b"00dc", f) for f in frames)
    body = b"AVI " + hdrl + _list(b"movi", movi_children)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _strip_dht(jpg: bytes) -> bytes:
    """Remove every DHT segment — the MJPEG space-saving convention."""
    out = bytearray(jpg[:2])
    pos = 2
    while pos + 4 <= len(jpg):
        marker = jpg[pos + 1]
        if marker == 0xDA:
            out += jpg[pos:]
            break
        (seglen,) = struct.unpack(">H", jpg[pos + 2 : pos + 4])
        if marker != 0xC4:
            out += jpg[pos : pos + 2 + seglen]
        pos += 2 + seglen
    return bytes(out)


def _synthetic_frames(n, w, h, quality=85):
    rng = np.random.default_rng(11)
    frames, rasters = [], []
    for i in range(n):
        base = np.zeros((h, w, 3), np.uint8)
        base[..., 0] = (i * 29) % 256
        base[..., 1] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
        base[..., 2] = rng.integers(0, 256, (h, w), dtype=np.uint8)
        rasters.append(base)
        frames.append(encode_jpeg(base, quality))
    return frames, rasters


class TestParse:
    def test_header_fields(self):
        frames, _ = _synthetic_frames(5, 32, 16)
        info = parse_avi(make_avi(frames, 32, 16, fps=25))
        assert (info.width, info.height) == (32, 16)
        assert info.codec == "MJPG"
        assert info.fps == 25
        assert info.n_frames == 5
        assert len(info.frames) == 5

    def test_rec_grouped_chunks(self):
        frames, _ = _synthetic_frames(3, 16, 16)
        info = parse_avi(make_avi(frames, 16, 16, use_rec=True))
        assert len(info.frames) == 3

    def test_not_avi(self):
        assert parse_avi(b"RIFF\x04\x00\x00\x00WAVE") is None
        assert parse_avi(b"nonsense") is None


class TestSample:
    def test_frames_decode_pixel_exact(self):
        """Sampled frame bytes must be exactly the embedded JPEGs, and
        decode to the same pixels as decoding those JPEGs directly."""
        frames, _ = _synthetic_frames(6, 32, 16)
        avi = make_avi(frames, 32, 16)
        got = sample_avi_frames(avi, 3)
        assert len(got) == 3
        assert got[0] == frames[0]  # even spacing starts at frame 0
        for f in got:
            assert f in frames
            assert np.array_equal(decode_jpeg(f), decode_jpeg(frames[frames.index(f)]))

    def test_dht_stripped_frames_decode_identically(self):
        """MJPEG convention: frames without DHT get the standard K.3
        tables spliced in and must decode to IDENTICAL pixels (the
        encoder used those same tables)."""
        frames, _ = _synthetic_frames(4, 24, 24)
        stripped = [_strip_dht(f) for f in frames]
        for s, f in zip(stripped, frames):
            assert len(s) < len(f)
            with pytest.raises(ValueError):
                decode_jpeg(s)  # undecodable without table injection
        avi = make_avi(stripped, 24, 24)
        got = sample_avi_frames(avi, 4)
        assert len(got) == 4
        for g, f in zip(got, frames):
            assert np.array_equal(decode_jpeg(g), decode_jpeg(f))

    def test_ensure_huffman_noop_when_present(self):
        frames, _ = _synthetic_frames(1, 8, 8)
        assert ensure_mjpeg_huffman(frames[0]) == frames[0]

    def test_non_mjpeg_codec_raises_honestly(self):
        frames, _ = _synthetic_frames(2, 16, 16)
        avi = make_avi(frames, 16, 16, codec=b"H264")
        with pytest.raises(NotImplementedError, match="av/ffmpeg"):
            sample_avi_frames(avi, 2)

    def test_empty_movi_raises(self):
        avi = make_avi([], 16, 16)
        with pytest.raises(ValueError, match="no video frames"):
            sample_avi_frames(avi, 2)

    def test_more_samples_than_frames(self):
        frames, _ = _synthetic_frames(2, 16, 16)
        got = sample_avi_frames(make_avi(frames, 16, 16), 8)
        assert got == frames  # deduped even spacing


def test_frame_sample_udf_over_avi(spark):
    """End-to-end through the Spark plumbing: binary column -> sampled
    frames -> per-frame decode assertions on the driver."""
    from img2dataset_spark.functions.multimodal import sample_video_frames

    frames, _ = _synthetic_frames(5, 16, 16)
    avi = make_avi(frames, 16, 16)
    df = spark.createDataFrame([(1, bytearray(avi))], "vid int, video binary")
    out = sample_video_frames(df, "video", num_frames=2).collect()
    assert len(out) == 1
    got = out[0]["frames"]
    assert len(got) == 2
    for f in got:
        arr = decode_jpeg(bytes(f))
        assert arr.shape == (16, 16, 3)
