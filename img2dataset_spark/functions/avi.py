"""AVI (RIFF) container parsing + MJPEG frame extraction — no av library.

Closes the round-3 video gap for the one codec the repo can already
decode: an AVI is a RIFF container (the same chunk grammar the WebP/WAV
parsers walk) and Motion-JPEG frames are baseline JPEGs, which
functions/jpeg.py decodes from spec.  So MJPEG/AVI frame sampling is
REAL here; every other video codec still raises the honest pyav gate in
functions/multimodal.py.

Public-knowledge formats only: RIFF/AVI layout per the Microsoft
'AVI RIFF File Reference' (avih/strh/strf/movi chunks), MJPEG's
omitted-DHT convention per the de-facto MJPEG spec (frames may drop
their Huffman tables; decoders supply the T.81 K.3 defaults — the same
tables functions/jpeg.py already carries for encoding).

Reference parity note: the reference (rom1504/img2dataset) has no video
path at all — this is a beyond-reference operator (SURVEY §7 M6), so
there is no reference file to cite beyond the container conventions.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from img2dataset_spark.functions.jpeg import (
    _AC_CHROMA,
    _AC_LUMA,
    _DC_CHROMA,
    _DC_LUMA,
)


def _dht_segment(tc: int, th: int, spec) -> bytes:
    bits, values = spec
    return (
        b"\xff\xc4"
        + struct.pack(">HB", 19 + len(values), (tc << 4) | th)
        + bytes(bits)
        + bytes(values)
    )


# The four T.81 K.3 default tables, as one spliceable DHT run.
_STANDARD_DHT = (
    _dht_segment(0, 0, _DC_LUMA)
    + _dht_segment(1, 0, _AC_LUMA)
    + _dht_segment(0, 1, _DC_CHROMA)
    + _dht_segment(1, 1, _AC_CHROMA)
)


def ensure_mjpeg_huffman(frame: bytes) -> bytes:
    """Return ``frame`` with the standard Huffman tables spliced in
    before SOS when the stream carries none (the common MJPEG
    space-saving convention).  Frames that already have a DHT pass
    through untouched."""
    if frame[:2] != b"\xff\xd8":
        return frame
    pos = 2
    n = len(frame)
    sos_at = None
    while pos + 4 <= n:
        if frame[pos] != 0xFF:
            return frame  # malformed; let the decoder raise
        marker = frame[pos + 1]
        if marker == 0xC4:
            return frame  # has its own tables
        if marker == 0xDA:
            sos_at = pos
            break
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", frame[pos + 2 : pos + 4])
        pos += 2 + seglen
    if sos_at is None:
        return frame
    return frame[:sos_at] + _STANDARD_DHT + frame[sos_at:]


@dataclass
class AviInfo:
    width: int | None = None
    height: int | None = None
    fps: float | None = None
    codec: str | None = None
    n_frames: int = 0
    # (offset, size) of each video-stream data chunk payload, movi order
    frames: list[tuple[int, int]] = field(default_factory=list)


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_size, list_type) for each
    chunk in [pos, end); list_type is set for LIST/RIFF chunks."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = pos + 8
        if payload + size > len(data):
            size = max(0, len(data) - payload)  # tolerate truncation
        if fourcc in (b"LIST", b"RIFF"):
            ltype = data[payload : payload + 4]
            yield fourcc, payload + 4, size - 4, ltype
        else:
            yield fourcc, payload, size, None
        pos = payload + size + (size & 1)


def parse_avi(data: bytes) -> AviInfo | None:
    """Header + frame index for an AVI byte string; None when the bytes
    are not an AVI."""
    if len(data) < 16 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        return None
    info = AviInfo()
    video_stream: int | None = None
    stream_no = 0

    def walk_strl(start: int, end: int) -> None:
        nonlocal video_stream, stream_no
        for cc, p, sz, _lt in _walk_chunks(data, start, end):
            if cc == b"strh" and sz >= 28:
                fcc_type = data[p : p + 4]
                handler = data[p + 4 : p + 8]
                scale, rate = struct.unpack("<II", data[p + 20 : p + 28])
                if fcc_type == b"vids" and video_stream is None:
                    video_stream = stream_no
                    info.codec = handler.decode("ascii", "replace").strip("\x00 ")
                    if scale and rate:
                        info.fps = rate / scale
        stream_no += 1

    def walk(start: int, end: int, in_movi: bool) -> None:
        for cc, p, sz, ltype in _walk_chunks(data, start, end):
            if ltype is not None:
                if ltype == b"hdrl":
                    walk(p, p + sz, False)
                elif ltype == b"strl":
                    walk_strl(p, p + sz)
                elif ltype in (b"movi", b"rec "):
                    walk(p, p + sz, True)
                continue
            if cc == b"avih" and sz >= 40:
                (usec,) = struct.unpack("<I", data[p : p + 4])
                (total,) = struct.unpack("<I", data[p + 16 : p + 20])
                w, h = struct.unpack("<II", data[p + 32 : p + 40])
                info.width, info.height = w, h
                info.n_frames = total
                if info.fps is None and usec:
                    info.fps = 1_000_000 / usec
            elif in_movi and len(cc) == 4 and cc[2:4] in (b"dc", b"db"):
                try:
                    stream = int(cc[:2])
                except ValueError:
                    continue
                if video_stream is None or stream == video_stream:
                    info.frames.append((p, sz))

    walk(12, len(data), False)
    if not info.n_frames:
        info.n_frames = len(info.frames)
    return info


def sample_avi_frames(data: bytes, num_frames: int) -> list[bytes]:
    """Evenly-spaced MJPEG frames from an AVI, as standalone JPEG byte
    strings (standard Huffman tables spliced in when the stream omits
    them) — directly decodable by functions/jpeg.py.  Raises
    NotImplementedError for non-MJPEG codecs (the pyav gate) and
    ValueError for AVIs with no video frames."""
    info = parse_avi(data)
    if info is None:
        raise ValueError("not an AVI")
    if info.codec and info.codec.upper() not in ("MJPG", "MJPEG", "JPEG", "DIB"):
        raise NotImplementedError(
            f"AVI codec {info.codec!r}: only MJPEG is decodable without an "
            "av/ffmpeg library"
        )
    if not info.frames:
        raise ValueError("AVI contains no video frames")
    total = len(info.frames)
    picks = sorted(
        {min(total - 1, i * total // num_frames) for i in range(num_frames)}
    )
    out = []
    for i in picks:
        off, sz = info.frames[i]
        frame = data[off : off + sz]
        if frame[:2] == b"\xff\xd8":
            frame = ensure_mjpeg_huffman(frame)
        out.append(frame)
    return out
