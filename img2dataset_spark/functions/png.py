"""Pure-Python PNG codec (stdlib zlib + numpy) — the sandbox has no
PIL/OpenCV, but PNG is a small public spec (RFC 2083), so the pixel path
for PNG images is REAL, not stubbed: decode -> ndarray, ndarray ->
encode.  This is what lets the reference's pixel-exact blur golden
(/root/reference/tests/blur_test_files/, tests/test_blurrer.py) actually
execute in this repo's test suite.

Supported: bit depth 8; color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA); non-interlaced; all five filter types.
Interlaced (Adam7) and 16-bit images raise ValueError — detected, not
silently mis-decoded.

Encoding writes filter-type-0 rows with one zlib stream — bytes are
deterministic for a given array (fixed zlib level), which the sink tests
rely on.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# samples per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 ndarray of shape (H, W) or (H, W, C)."""
    if data[: len(_SIG)] != _SIG:
        raise ValueError("not a PNG")
    pos = len(_SIG)
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    palette: np.ndarray | None = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported bit depth {bit_depth} (only 8)")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type {color_type}")

    nch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * nch
    if len(raw) != height * (stride + 1):
        raise ValueError("truncated PNG pixel data")

    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = nch  # bytes per pixel at bit depth 8
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).copy()
        if ftype == 0:  # None
            pass
        elif ftype == 2:  # Up
            row += prev
        elif ftype == 1:  # Sub — sequential in x
            _unfilter_sub(row, bpp)
        elif ftype == 3:  # Average
            _unfilter_avg(row, prev, bpp)
        elif ftype == 4:  # Paeth
            _unfilter_paeth(row, prev, bpp)
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = row
        prev = row

    img = out.reshape(height, width, nch) if nch > 1 else out.reshape(height, width)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette image without PLTE")
        img = palette[img.reshape(height, width)]
    return img


def _unfilter_sub(row: np.ndarray, bpp: int) -> None:
    for i in range(bpp, len(row)):
        row[i] = (int(row[i]) + int(row[i - bpp])) & 0xFF


def _unfilter_avg(row: np.ndarray, prev: np.ndarray, bpp: int) -> None:
    for i in range(len(row)):
        a = int(row[i - bpp]) if i >= bpp else 0
        row[i] = (int(row[i]) + ((a + int(prev[i])) >> 1)) & 0xFF


def _unfilter_paeth(row: np.ndarray, prev: np.ndarray, bpp: int) -> None:
    for i in range(len(row)):
        a = int(row[i - bpp]) if i >= bpp else 0
        b = int(prev[i])
        c = int(prev[i - bpp]) if i >= bpp else 0
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            pred = a
        elif pb <= pc:
            pred = b
        else:
            pred = c
        row[i] = (int(row[i]) + pred) & 0xFF


def encode_png(img: np.ndarray, compress_level: int = 6) -> bytes:
    """uint8 ndarray (H, W) or (H, W, {1,2,3,4}) -> PNG bytes."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[nch]

    def chunk(typ: bytes, body: bytes) -> bytes:
        raw = typ + body
        return (
            struct.pack(">I", len(body)) + raw + struct.pack(">I", zlib.crc32(raw) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    stride = arr.reshape(h, w * nch)
    filt = np.zeros((h, w * nch + 1), dtype=np.uint8)
    filt[:, 1:] = stride  # filter type 0 on every row
    idat = zlib.compress(filt.tobytes(), compress_level)
    return _SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
