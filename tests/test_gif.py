"""functions/gif.py — dependency-free GIF / BMP first-frame decode.

No imaging library exists in this container to author GIFs, so the
tests build spec-valid streams by hand: the LZW stream emits a CLEAR
code before every literal (legal per the spec — the table just never
grows), which makes the encoder side of the fixture trivial while the
decoder under test still exercises real bit unpacking, sub-block
reassembly, palettes, interlacing, and transparency.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from img2dataset_spark.functions.gif import decode_bmp, decode_gif


def _lzw_literals(indices, min_code_size):
    """Bit-pack CLEAR,literal,CLEAR,literal,...,EOI at fixed width."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    acc = 0
    nbits = 0
    out = bytearray()
    codes = []
    for i in indices:
        codes += [clear, int(i)]
    codes.append(eoi)
    for code in codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def make_gif(grid, palette, interlaced=False, transparent=None, version=b"89a"):
    h, w = grid.shape
    ncol = len(palette)
    depth = max(1, (ncol - 1).bit_length())
    gct = bytearray()
    for r, g, b in palette:
        gct += bytes([r, g, b])
    gct += b"\x00" * ((2 ** depth) - ncol) * 3
    out = bytearray(b"GIF" + version)
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (depth - 1), 0, 0])
    out += gct
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    iflags = 0x40 if interlaced else 0x00
    out += b"\x2C" + struct.pack("<HHHH", 0, 0, w, h) + bytes([iflags])
    mcs = max(2, depth)
    out += bytes([mcs])
    if interlaced:
        order = np.concatenate([
            np.arange(0, h, 8), np.arange(4, h, 8),
            np.arange(2, h, 4), np.arange(1, h, 2),
        ])
        stream_rows = grid[order]
    else:
        stream_rows = grid
    lzw = _lzw_literals(stream_rows.ravel(), mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3B"
    return bytes(out)


PALETTE = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]


class TestGif:
    def test_basic_rgb(self):
        grid = np.array([[0, 1, 2], [3, 0, 1]], dtype=np.uint8)
        arr = decode_gif(make_gif(grid, PALETTE))
        assert arr.shape == (2, 3, 3)
        assert tuple(arr[0, 0]) == (255, 0, 0)
        assert tuple(arr[1, 0]) == (10, 20, 30)

    def test_interlaced(self):
        h, w = 11, 4
        grid = (np.arange(h * w).reshape(h, w) % 4).astype(np.uint8)
        plain = decode_gif(make_gif(grid, PALETTE, interlaced=False))
        inter = decode_gif(make_gif(grid, PALETTE, interlaced=True))
        assert np.array_equal(plain, inter)

    def test_transparency_gives_rgba(self):
        grid = np.array([[0, 1], [2, 1]], dtype=np.uint8)
        arr = decode_gif(make_gif(grid, PALETTE, transparent=1))
        assert arr.shape == (2, 2, 4)
        assert arr[0, 1, 3] == 0 and arr[0, 0, 3] == 255

    def test_real_lzw_table_growth(self):
        """A repetitive image exercises genuine LZW table growth when
        encoded by a real encoder; here the fixture's CLEAR-heavy
        stream at least pins code-width handling across many codes."""
        grid = np.tile(np.arange(4, dtype=np.uint8), (16, 16))[:, :16]
        arr = decode_gif(make_gif(grid, PALETTE))
        assert arr.shape == (16, 16, 3)
        assert np.array_equal(arr[:, 0], np.tile([255, 0, 0], (16, 1)))

    def test_not_a_gif(self):
        with pytest.raises(ValueError, match="not a GIF"):
            decode_gif(b"\x89PNG\r\n\x1a\n")

    def test_truncated(self):
        grid = np.zeros((4, 4), dtype=np.uint8)
        data = make_gif(grid, PALETTE)
        with pytest.raises(ValueError):
            decode_gif(data[: len(data) - 8])

    def test_pil_cross_decode(self):
        PIL = pytest.importorskip("PIL")
        import io

        from PIL import Image

        grid = (np.arange(48).reshape(6, 8) % 4).astype(np.uint8)
        data = make_gif(grid, PALETTE)
        ours = decode_gif(data)
        theirs = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        assert np.array_equal(ours, theirs)


def make_bmp(img, top_down=False):
    h, w, nch = img.shape
    bpp = nch * 8
    stride = (w * nch + 3) & ~3
    rows = bytearray()
    order = range(h) if top_down else range(h - 1, -1, -1)
    for y in order:
        row = bytearray()
        for x in range(w):
            px = img[y, x]
            row += bytes([px[2], px[1], px[0]] + ([px[3]] if nch == 4 else []))
        row += b"\x00" * (stride - len(row))
        rows += row
    pixel_off = 54
    header = b"BM" + struct.pack("<IHHI", pixel_off + len(rows), 0, 0, pixel_off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, bpp, 0,
        len(rows), 2835, 2835, 0, 0,
    )
    return bytes(header + dib + rows)


class TestBmp:
    @pytest.mark.parametrize("top_down", [False, True])
    @pytest.mark.parametrize("nch", [3, 4])
    def test_roundtrip(self, top_down, nch):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (5, 3, nch), dtype=np.uint8)
        arr = decode_bmp(make_bmp(img, top_down=top_down))
        assert np.array_equal(arr, img)

    def test_rejects_compressed(self):
        img = np.zeros((2, 2, 3), np.uint8)
        data = bytearray(make_bmp(img))
        data[30] = 1  # BI_RLE8
        with pytest.raises(ValueError, match="unsupported BMP"):
            decode_bmp(bytes(data))


class TestTransformIntegration:
    def test_gif_to_jpg_through_transform(self):
        from img2dataset_spark.functions.image import make_transform_fn
        from img2dataset_spark.functions.jpeg import decode_jpeg

        grid = (np.arange(256).reshape(16, 16) % 4).astype(np.uint8)
        gif = make_gif(grid, PALETTE)
        fn = make_transform_fn(
            resize_mode="keep_ratio", image_size=8, encode_format="jpg"
        )
        out = fn(gif)
        assert out[5] is None
        assert out[1:5] == (8, 8, 16, 16)
        assert decode_jpeg(out[0]).shape == (8, 8, 3)

    def test_bmp_to_png_through_transform(self):
        from img2dataset_spark.functions.image import make_transform_fn
        from img2dataset_spark.functions.png import decode_png

        img = np.full((12, 6, 3), 99, np.uint8)
        fn = make_transform_fn(
            resize_mode="border", image_size=8, encode_format="png"
        )
        out = fn(make_bmp(img))
        assert out[5] is None
        assert out[1:5] == (8, 8, 6, 12)
        dec = decode_png(out[0])
        assert dec.shape == (8, 8, 3)

class TestAlphaProbes:
    """Passthrough-exclusion probes: alpha-carrying gif/bmp inputs must
    not ride the same-format passthrough (inconsistent alpha semantics
    vs the unconditional white matte the reference applies)."""

    def test_gif_transparency_probe(self):
        from img2dataset_spark.functions.image import _gif_has_transparency

        grid = np.array([[0, 1], [2, 1]], dtype=np.uint8)
        assert _gif_has_transparency(make_gif(grid, PALETTE, transparent=1))
        assert not _gif_has_transparency(make_gif(grid, PALETTE))
        assert not _gif_has_transparency(b"not a gif at all....")

    def test_bmp_alpha_probe(self):
        from img2dataset_spark.functions.image import _bmp_has_alpha

        img3 = np.zeros((2, 2, 3), np.uint8)
        img4 = np.zeros((2, 2, 4), np.uint8)
        assert _bmp_has_alpha(make_bmp(img4))
        assert not _bmp_has_alpha(make_bmp(img3))
        assert not _bmp_has_alpha(b"BM")

    def test_transparent_gif_not_passed_through(self):
        """gif->gif, no resize: an opaque GIF passes original bytes
        through; a transparent one must NOT (it either re-encodes via a
        pixel lib or fails honestly)."""
        from img2dataset_spark.functions.image import make_transform_fn

        grid = np.array([[0, 1], [2, 1]], dtype=np.uint8)
        fn = make_transform_fn(resize_mode="no", encode_format="gif")
        opaque = make_gif(grid, PALETTE)
        out = fn(opaque)
        assert out[0] == opaque and out[5] is None
        transparent = make_gif(grid, PALETTE, transparent=1)
        out2 = fn(transparent)
        assert out2[0] != transparent

    def test_32bit_bmp_not_passed_through(self):
        from img2dataset_spark.functions.image import make_transform_fn

        fn = make_transform_fn(resize_mode="no", encode_format="bmp")
        bmp3 = make_bmp(np.zeros((2, 2, 3), np.uint8))
        out = fn(bmp3)
        assert out[0] == bmp3 and out[5] is None
        bmp4 = make_bmp(np.zeros((2, 2, 4), np.uint8))
        out2 = fn(bmp4)
        assert out2[0] != bmp4
