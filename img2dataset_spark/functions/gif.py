"""Pure-Python GIF decoder (stdlib + numpy) — first-frame raster decode
with no imaging library, completing the dependency-free pixel path for
the formats the reference accepts (resizer.py decodes any cv2-readable
container; cv2 returns the first frame for animated GIFs, which is what
this module mirrors).

GIF is a small public spec (GIF87a/GIF89a): logical screen descriptor,
optional global color table, extension blocks, image descriptors with
optional local color tables, LZW-compressed indexed pixels, optional
Adam-style row interlacing, and a GIF89a graphic-control extension that
can mark one palette index transparent.

`decode_gif` returns the FIRST image frame as uint8 (H, W, 3) RGB, or
(H, W, 4) RGBA when that frame declares a transparent index.  Malformed
streams raise ValueError.  The LZW inner loop is per-code Python
(inherently sequential, same tradeoff as the JPEG Huffman loop);
palette mapping and interlace reordering are vectorized numpy.
"""

from __future__ import annotations

import numpy as np


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> np.ndarray:
    """GIF LZW variant: code stream with CLEAR/EOI codes and growing
    code width, little-endian bit packing."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1

    # dictionary as a list of byte strings; rebuilt at CLEAR
    def fresh():
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh()
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = fresh()
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return np.frombuffer(bytes(out), dtype=np.uint8)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt GIF LZW stream")
            out.extend(entry)
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= expected:
                return np.frombuffer(bytes(out[:expected]), dtype=np.uint8)
    raise ValueError("truncated GIF LZW stream")


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes -> first frame as uint8 (H, W, 3) RGB or (H, W, 4) RGBA."""
    try:
        return _decode_gif(data)
    except (IndexError, ValueError) as e:
        # a truncated stream surfaces as an out-of-range read mid-parse;
        # normalize to the parser's single failure mode
        if isinstance(e, ValueError):
            raise
        raise ValueError("truncated GIF") from e


def _decode_gif(data: bytes) -> np.ndarray:
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw = int.from_bytes(data[6:8], "little")
    sh = int.from_bytes(data[8:10], "little")
    flags = data[10]
    pos = 13
    global_palette = None
    if flags & 0x80:
        gct_size = 2 << (flags & 0x07)
        global_palette = np.frombuffer(
            data, np.uint8, gct_size * 3, pos
        ).reshape(-1, 3)
        pos += gct_size * 3

    transparent_idx = None
    n = len(data)
    while pos < n:
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9 and data[pos] >= 4:  # graphic control
                packed = data[pos + 1]
                if packed & 0x01:
                    transparent_idx = data[pos + 4]
            while pos < n and data[pos] != 0:  # skip sub-blocks
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:  # not an image descriptor
            raise ValueError(f"unexpected GIF block 0x{b:02X}")
        # ---- image descriptor (first frame only)
        fw = int.from_bytes(data[pos + 5 : pos + 7], "little")
        fh = int.from_bytes(data[pos + 7 : pos + 9], "little")
        iflags = data[pos + 9]
        pos += 10
        palette = global_palette
        if iflags & 0x80:
            lct_size = 2 << (iflags & 0x07)
            palette = np.frombuffer(data, np.uint8, lct_size * 3, pos).reshape(
                -1, 3
            )
            pos += lct_size * 3
        if palette is None:
            raise ValueError("GIF frame has no color table")
        interlaced = bool(iflags & 0x40)
        min_code_size = data[pos]
        pos += 1
        chunks = bytearray()
        while pos < n and data[pos] != 0:
            ln = data[pos]
            chunks += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        indices = _lzw_decode(min_code_size, bytes(chunks), fw * fh)
        if len(indices) < fw * fh:
            raise ValueError("truncated GIF pixel data")
        grid = indices[: fw * fh].reshape(fh, fw)
        if interlaced:
            deinter = np.empty_like(grid)
            rows = np.concatenate([
                np.arange(0, fh, 8), np.arange(4, fh, 8),
                np.arange(2, fh, 4), np.arange(1, fh, 2),
            ])
            deinter[rows] = grid
            grid = deinter
        if int(grid.max()) >= len(palette):
            raise ValueError("GIF index out of palette range")
        rgb = palette[grid]
        if transparent_idx is not None and transparent_idx < len(palette):
            alpha = np.where(grid == transparent_idx, 0, 255).astype(np.uint8)
            return np.dstack([rgb, alpha])
        # frame may be smaller than the logical screen; cv2 (the
        # reference's decoder) returns the frame raster itself — do the
        # same rather than compositing onto the screen
        _ = (sw, sh)
        return rgb
    raise ValueError("GIF contains no image frame")


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit bottom-up BMP -> uint8 (H, W, 3|4) array
    (RGB/RGBA).  Compressed or paletted BMPs raise ValueError.

    The 4th channel of a 32-bit BI_RGB BMP is taken at face value as
    alpha — mirroring cv2 IMREAD_UNCHANGED (the reference's decoder) —
    even though it is frequently zeroed padding, in which case the
    downstream white matte yields a solid-white image, exactly as the
    reference would."""
    try:
        return _decode_bmp(data)
    except (IndexError, ValueError) as e:
        if isinstance(e, ValueError):
            raise
        raise ValueError("truncated BMP") from e


def _decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    pixel_off = int.from_bytes(data[10:14], "little")
    hdr_size = int.from_bytes(data[14:18], "little")
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    compression = int.from_bytes(data[30:34], "little")
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = h < 0
    h = abs(h)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    rows = np.frombuffer(data, np.uint8, stride * h, pixel_off).reshape(h, stride)
    img = rows[:, : w * nch].reshape(h, w, nch)
    if not top_down:
        img = img[::-1]
    # BMP stores BGR(A) — reorder to RGB(A)
    if nch == 3:
        return img[:, :, ::-1].copy()
    return np.dstack([img[:, :, 2], img[:, :, 1], img[:, :, 0], img[:, :, 3]])
