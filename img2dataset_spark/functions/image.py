"""T1-T9/T13: image decode, geometric resize, re-encode — as pandas UDFs.

Reference semantics (citations into /root/reference):
  - decode + filters + resize + encode order: img2dataset/resizer.py:143-228
  - size/area/aspect-ratio rejections happen on ORIGINAL dims, right
    after decode, before any resize work: resizer.py:161-168
  - resize modes no / keep_ratio / keep_ratio_largest / center_crop /
    border: resizer.py:178-215
  - resize_only_if_bigger gate: resizer.py:179-180,196-197
  - error strings: "image too small", "image area too large",
    "aspect ratio too large": resizer.py:161-168

What is REAL here vs stubbed (this container has no PIL/OpenCV):
  - Dimension extraction (T13) is real: pure-Python header parsers for
    PNG / JPEG / GIF / WebP / BMP.
  - Resize *geometry* (output dims per mode, the only_if_bigger gate,
    and the P5-P7 filters) is real, pure arithmetic.
  - PNG, JPEG (baseline + progressive), GIF, BMP, and lossless-WebP
    pixels are real with no imaging library: pure-Python codecs
    (functions/png.py, jpeg.py, gif.py, vp8l.py) + numpy resampling
    cover decode, resize, blur, re-encode, and conversion into
    png/jpg/webp-lossless.  If PIL is importable it is preferred
    (faster, plus lossy-webp encode at the configured quality).
  - Lossy (VP8) webp decode and gif/bmp encode targets without PIL
    raise a clearly-marked error — except in `mock` mode, where
    payloads are deterministic md5-derived byte strings whose formulas
    are also expressible in ANSI SQL (DuckDB oracle parity).

Scale notes: the decode->filter->resize->encode chain is deliberately
FUSED into one Arrow-batched UDF — Catalyst cannot reorder inside opaque
UDFs, and the reference's cheap-before-expensive ordering (filters
before resample) is preserved by construction (SURVEY §4).
"""

from __future__ import annotations

import hashlib
import struct as _struct
from typing import Iterator

import pandas as pd
from pyspark.sql.functions import pandas_udf

TRANSFORM_RESULT_SCHEMA = (
    "data binary, width int, height int, "
    "original_width int, original_height int, error string"
)

ERR_TOO_SMALL = "image too small"
ERR_AREA_TOO_BIG = "image area too large"
ERR_ASPECT_TOO_BIG = "aspect ratio too large"
ERR_DECODE = "decode failed"


# ---------------------------------------------------------------------------
# Real header parsing (T13) — pure Python, no imaging library needed.
# ---------------------------------------------------------------------------

def detect_format(data: bytes) -> str | None:
    """imghdr-style container detection ("jpeg"/"png"/"gif"/"bmp"/"webp"),
    matching the names the reference compares against its what_ext
    (resizer.py:120-126,148)."""
    if data is None or len(data) < 12:
        return None
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    return None


def parse_dimensions(data: bytes) -> tuple[int, int] | None:
    """Return (width, height) from PNG/JPEG/GIF/WebP/BMP headers."""
    if data is None or len(data) < 12:
        return None
    # PNG: 8-byte signature, IHDR at offset 16
    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
        w, h = _struct.unpack(">II", data[16:24])
        return int(w), int(h)
    # GIF87a / GIF89a
    if data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        w, h = _struct.unpack("<HH", data[6:10])
        return int(w), int(h)
    # BMP
    if data[:2] == b"BM" and len(data) >= 26:
        w, h = _struct.unpack("<ii", data[18:26])
        return int(w), abs(int(h))
    # WebP: RIFF....WEBP
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP" and len(data) >= 30:
        fmt = data[12:16]
        if fmt == b"VP8 ":
            w = _struct.unpack("<H", data[26:28])[0] & 0x3FFF
            h = _struct.unpack("<H", data[28:30])[0] & 0x3FFF
            return int(w), int(h)
        if fmt == b"VP8L":
            bits = _struct.unpack("<I", data[21:25])[0]
            return int((bits & 0x3FFF) + 1), int(((bits >> 14) & 0x3FFF) + 1)
        if fmt == b"VP8X":
            w = int.from_bytes(data[24:27], "little") + 1
            h = int.from_bytes(data[27:30], "little") + 1
            return int(w), int(h)
        return None
    # JPEG: scan for SOFn marker
    if data[:2] == b"\xff\xd8":
        i = 2
        n = len(data)
        while i + 9 < n:
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if i + 4 > n:
                return None
            seg_len = _struct.unpack(">H", data[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > n:
                    return None
                h, w = _struct.unpack(">HH", data[i + 5 : i + 9])
                return int(w), int(h)
            i += 2 + seg_len
        return None
    return None


# ---------------------------------------------------------------------------
# Resize geometry (T2-T6) — real arithmetic, identical formulas in SQL.
# ---------------------------------------------------------------------------

def _scaled(w: int, h: int, scale: float) -> tuple[int, int]:
    # floor(x*scale + 0.5): identical in Spark and DuckDB (unlike round(),
    # whose half-way tie-breaking differs between engines).
    return max(1, int(w * scale + 0.5)), max(1, int(h * scale + 0.5))


def resize_geometry(
    w: int,
    h: int,
    resize_mode: str,
    image_size: int,
    resize_only_if_bigger: bool,
    aspect_buckets=None,
) -> tuple[int, int]:
    """Output dimensions per resize mode (resizer.py:178-215).

    ``aspect_bucket`` (beyond-reference, operators/aspect.py): output
    dims are the image's nearest equal-area bucket — the SDXL-style
    training recipe where every batch member shares one tensor shape.
    ``resize_only_if_bigger`` is ignored for this mode (exact bucket
    dims are the contract; a passthrough would break same-shape
    batching), and ``image_size`` plays no role (the bucket set fixes
    the area)."""
    if resize_mode == "no":
        return w, h
    if resize_mode == "aspect_bucket":
        from img2dataset_spark.operators.aspect import nearest_bucket

        _, bw, bh = nearest_bucket(w, h, aspect_buckets)
        return bw, bh
    if resize_mode in ("keep_ratio", "center_crop"):
        if resize_only_if_bigger and min(w, h) <= image_size:
            return w, h
        nw, nh = _scaled(w, h, image_size / min(w, h))
        if resize_mode == "center_crop":
            return min(nw, image_size), min(nh, image_size)
        return nw, nh
    if resize_mode in ("keep_ratio_largest", "border"):
        if resize_only_if_bigger and max(w, h) <= image_size:
            return w, h
        if resize_mode == "border":
            return image_size, image_size
        return _scaled(w, h, image_size / max(w, h))
    raise ValueError(f"unknown resize mode {resize_mode}")


def check_filters(
    w: int,
    h: int,
    min_image_size: int,
    max_image_area: float,
    max_aspect_ratio: float,
) -> str | None:
    """P5-P7 rejections on original dims (resizer.py:161-168)."""
    if min(w, h) < min_image_size:
        return ERR_TOO_SMALL
    if w * h > max_image_area:
        return ERR_AREA_TOO_BIG
    if max(w, h) / min(w, h) > max_aspect_ratio:
        return ERR_ASPECT_TOO_BIG
    return None


def mock_decode_dims(data: bytes) -> tuple[int, int]:
    """Deterministic fake decode for hermetic/oracle runs.  The payload is
    an ascii md5-hex-derived string (functions.fetch.mock_payload); dims
    derive from the ascii codes of its first 4 chars:

        width  = 64 + (ascii(c1)*256 + ascii(c2)) % 1985
        height = 64 + (ascii(c3)*256 + ascii(c4)) % 1985

    SQL equivalent on url u:  m := md5(u);
        64 + (ascii(substr(m,1,1))*256 + ascii(substr(m,2,1))) % 1985
    """
    s = data[:4].decode("ascii", errors="replace")
    w = 64 + (ord(s[0]) * 256 + ord(s[1])) % 1985
    h = 64 + (ord(s[2]) * 256 + ord(s[3])) % 1985
    return w, h


def mock_encode(data: bytes, nw: int, nh: int) -> bytes:
    """Deterministic fake re-encode: md5 of '<payload-ascii>|<w>x<h>' as a
    32-byte ascii hex string.  SQL: md5(concat(payload_str,'|',w,'x',h))."""
    base = data.decode("ascii", errors="replace") + f"|{nw}x{nh}"
    return hashlib.md5(base.encode("ascii")).hexdigest().encode("ascii")


def mock_blur(data: bytes, n_boxes: int) -> bytes:
    """Deterministic fake blur marker for hermetic runs.
    SQL: md5(concat(payload_str, '|blur', n_boxes))."""
    base = data.decode("ascii", errors="replace") + f"|blur{n_boxes}"
    return hashlib.md5(base.encode("ascii")).hexdigest().encode("ascii")


INTERPOLATIONS = (
    "nearest", "linear", "bilinear", "cubic", "bicubic", "area", "lanczos", "lanczos4",
)


def select_interpolation(
    w: int,
    h: int,
    resize_mode: str,
    image_size: int,
    upscale: str = "lanczos",
    downscale: str = "area",
    aspect_buckets=None,
) -> str:
    """T7: per-image interpolation choice (resizer.py:114-115,177-198):
    the DOWNSCALE filter when the controlling original side exceeds the
    target (min side for keep_ratio/center_crop, max side for
    keep_ratio_largest/border), else the UPSCALE filter.  For
    ``aspect_bucket`` the controlling factor is the cover scale
    max(bw/w, bh/h): below 1 the resize shrinks."""
    if resize_mode in ("keep_ratio", "center_crop"):
        is_down = min(w, h) > image_size
    elif resize_mode in ("keep_ratio_largest", "border"):
        is_down = max(w, h) > image_size
    elif resize_mode == "aspect_bucket":
        from img2dataset_spark.operators.aspect import nearest_bucket

        _, bw, bh = nearest_bucket(w, h, aspect_buckets)
        is_down = bw < w and bh < h  # cover scale max(bw/w, bh/h) < 1
    else:
        return downscale
    return downscale if is_down else upscale


def _pil_filter(name: str):  # pragma: no cover - needs PIL
    from PIL import Image

    return {
        "nearest": Image.NEAREST,
        "linear": Image.BILINEAR,
        "bilinear": Image.BILINEAR,
        "cubic": Image.BICUBIC,
        "bicubic": Image.BICUBIC,
        "area": Image.BOX,
        "lanczos": Image.LANCZOS,
        "lanczos4": Image.LANCZOS,
    }[name]


def _pil_transform(
    data: bytes,
    resize_mode: str,
    image_size: int,
    resize_only_if_bigger: bool,
    encode_format: str,
    encode_quality: int,
    bboxes=None,
    upscale_interpolation: str = "lanczos",
    downscale_interpolation: str = "area",
    aspect_buckets=None,
):  # pragma: no cover - exercised only when PIL is installed
    """Real pixel path, used when PIL is importable."""
    import io

    from PIL import Image

    def _blur(im):
        # T9: blur AFTER the aspect-preserving resize but BEFORE crop/pad
        # (resizer.py:186-205) — relative bboxes stay valid only while the
        # frame is a pure scale of the original.
        if bboxes is not None and len(bboxes) > 0:
            import numpy as np

            from img2dataset_spark.functions.blur import blur_bboxes

            return Image.fromarray(blur_bboxes(np.asarray(im), bboxes))
        return im

    img = Image.open(io.BytesIO(data))
    if img.mode in ("RGBA", "LA", "PA") or (
        img.mode == "P" and "transparency" in img.info
    ):
        # reference parity (resizer.py:155-158): alpha mattes onto a
        # WHITE background (PIL's bare convert("RGB") would drop alpha
        # over black instead)
        rgba = img.convert("RGBA")
        canvas = Image.new("RGBA", rgba.size, (255, 255, 255, 255))
        img = Image.alpha_composite(canvas, rgba).convert("RGB")
    else:
        img = img.convert("RGB")
    w, h = img.size
    nw, nh = resize_geometry(
        w, h, resize_mode, image_size, resize_only_if_bigger, aspect_buckets
    )
    resample = _pil_filter(
        select_interpolation(
            w, h, resize_mode, image_size, upscale_interpolation,
            downscale_interpolation, aspect_buckets,
        )
    )
    if resize_mode in ("center_crop", "border", "aspect_bucket") and (nw, nh) != (w, h):
        if resize_mode == "center_crop":
            sw, sh = _scaled(w, h, image_size / min(w, h))
            img = _blur(img.resize((sw, sh), resample))
            left, top = (sw - nw) // 2, (sh - nh) // 2
            img = img.crop((left, top, left + nw, top + nh))
        elif resize_mode == "aspect_bucket":
            # scale-to-cover the bucket, then center-crop to exactly
            # (bw, bh) — the NovelAI/SDXL recipe; clamp the rounded
            # cover size so it never undershoots the crop target
            sw, sh = _scaled(w, h, max(nw / w, nh / h))
            sw, sh = max(sw, nw), max(sh, nh)
            img = _blur(img.resize((sw, sh), resample))
            left, top = (sw - nw) // 2, (sh - nh) // 2
            img = img.crop((left, top, left + nw, top + nh))
        else:
            sw, sh = _scaled(w, h, image_size / max(w, h))
            img = _blur(img.resize((sw, sh), resample))
            canvas = Image.new("RGB", (image_size, image_size), (255, 255, 255))
            canvas.paste(img, ((image_size - sw) // 2, (image_size - sh) // 2))
            img = canvas
    elif (nw, nh) != (w, h):
        img = _blur(img.resize((nw, nh), resample))
    else:
        img = _blur(img)
    buf = io.BytesIO()
    fmt = {"jpg": "JPEG", "png": "PNG", "webp": "WEBP"}[encode_format]
    img.save(buf, format=fmt, quality=encode_quality)
    return buf.getvalue(), nw, nh, w, h, None


def _png_has_alpha(data: bytes) -> bool:
    """Cheap header probe: PNG color type 4/6 (alpha channel) or a tRNS
    chunk on a palette/gray/RGB image."""
    if len(data) < 26 or data[:8] != b"\x89PNG\r\n\x1a\n":
        return False
    color_type = data[25]
    if color_type in (4, 6):
        return True
    # scan chunk headers for tRNS (appears before IDAT)
    pos = 8
    while pos + 8 <= len(data):
        (length,) = _struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        if ctype == b"tRNS":
            return True
        if ctype == b"IDAT":
            return False
        pos += 12 + length
    return False


def _gif_has_transparency(data: bytes) -> bool:
    """Cheap header probe: first Graphic Control Extension's transparency
    flag (GIF89a, block 0x21 0xF9, packed-byte bit 0).  Later frames'
    GCEs are irrelevant here: the decoder takes the first frame only."""
    if len(data) < 14 or data[:6] not in (b"GIF87a", b"GIF89a"):
        return False
    packed = data[10]
    pos = 13
    if packed & 0x80:  # global color table present
        pos += 3 * (2 << (packed & 0x07))
    while pos + 1 < len(data):
        b = data[pos]
        if b == 0x21:  # extension block
            if pos + 3 >= len(data):
                return False
            label = data[pos + 1]
            p = pos + 2
            if label == 0xF9 and data[p] >= 4 and p + 1 < len(data):
                return bool(data[p + 1] & 0x01)
            while p < len(data) and data[p] != 0:  # skip sub-blocks
                p += 1 + data[p]
            pos = p + 1
        else:
            # image descriptor (0x2C) with no preceding GCE, trailer
            # (0x3B), or junk — no transparency before first frame
            return False
    return False


def _webp_has_alpha(data: bytes) -> bool:
    """Cheap header probe: VP8X alpha flag (bit 4), an ALPH chunk, or
    the VP8L alpha-hint bit (bit 28 of the stream header)."""
    if len(data) < 21 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        return False
    pos = 12
    while pos + 8 <= len(data):
        cc = data[pos : pos + 4]
        (size,) = _struct.unpack("<I", data[pos + 4 : pos + 8])
        p = pos + 8
        if cc == b"VP8X" and size >= 1:
            if data[p] & 0x10:
                return True
        elif cc == b"ALPH":
            return True
        elif cc == b"VP8L" and size >= 5 and data[p] == 0x2F:
            # header: sig byte, then 14+14 bits dims, then alpha bit
            return bool(data[p + 4] & 0x10)
        pos = p + size + (size & 1)
    return False


def _bmp_has_alpha(data: bytes) -> bool:
    """Cheap header probe: 32 bits-per-pixel BMP.  The 4th byte is taken
    at face value as alpha by the decoder (mirroring cv2
    IMREAD_UNCHANGED), so a 32-bit BMP is treated as carrying alpha even
    when it is BI_RGB padding."""
    if len(data) < 30 or data[:2] != b"BM":
        return False
    return int.from_bytes(data[28:30], "little") == 32


def _white_matte(arr):
    """Reference parity (resizer.py:154-159): a decoded image with an
    alpha channel is matted onto a WHITE background right after decode,
    so every downstream stage (resize/blur/encode) sees gray or RGB.
    `np.rint(clip(alpha/255*color + 255 - alpha))`, exactly the
    reference's formula."""
    import numpy as np

    if arr.ndim != 3 or arr.shape[2] not in (2, 4):
        return arr
    color = arr[:, :, :-1].astype(np.float64)
    alpha = arr[:, :, -1:].astype(np.float64)
    out = np.rint((alpha / 255.0 * color + 255.0 - alpha).clip(0, 255))
    out = out.astype(np.uint8)
    return out[:, :, 0] if out.shape[2] == 1 else out


def _codec_decode(data: bytes):
    """Format-dispatched pure-Python decode (PNG, JPEG incl.
    progressive, GIF first-frame, uncompressed BMP, lossless WebP/VP8L).
    Lossy WebP (VP8 — a video intra codec) is the only
    reference-accepted encoding still left to an imaging library."""
    fmt = detect_format(data)
    if fmt == "webp":
        from img2dataset_spark.functions.vp8l import decode_webp

        return decode_webp(data)
    if fmt == "png":
        from img2dataset_spark.functions.png import decode_png

        return decode_png(data)
    if fmt == "jpeg":
        from img2dataset_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(data)
    if fmt == "gif":
        from img2dataset_spark.functions.gif import decode_gif

        return decode_gif(data)
    if fmt == "bmp":
        from img2dataset_spark.functions.gif import decode_bmp

        return decode_bmp(data)
    raise NotImplementedError(
        f"no dependency-free decoder for format {fmt!r} (png/jpeg/gif/bmp)"
    )


def _codec_encode(img, encode_format: str, quality: int = 95) -> bytes:
    """Format-dispatched pure-Python encode (PNG + baseline JPEG).
    RGBA -> JPEG follows the reference's alpha handling: matte onto a
    white background (resizer.py:154-159)."""
    import numpy as np

    if encode_format == "png":
        from img2dataset_spark.functions.png import encode_png

        return encode_png(img)
    if encode_format in ("jpg", "jpeg"):
        from img2dataset_spark.functions.jpeg import encode_jpeg

        # alpha must not reach the JPEG encoder; _numpy_transform mattes
        # at decode, this covers direct callers
        return encode_jpeg(_white_matte(np.asarray(img)), quality)
    if encode_format == "webp":
        from img2dataset_spark.functions.vp8l import encode_webp_lossless

        # Documented deviation: the reference writes quality-`quality`
        # LOSSY webp via cv2 (resizer.py:143-148); without an imaging
        # library this writes LOSSLESS webp (VP8L) — every compliant
        # webp reader accepts it, at larger file size.
        return encode_webp_lossless(np.asarray(img))
    raise NotImplementedError(
        f"no dependency-free encoder for format {encode_format!r} "
        "(png/jpg/webp)"
    )


def _numpy_transform(
    data: bytes,
    resize_mode: str,
    image_size: int,
    resize_only_if_bigger: bool,
    encode_format: str,
    encode_quality: int = 95,
    bboxes=None,
    upscale_interpolation: str = "lanczos",
    downscale_interpolation: str = "area",
    aspect_buckets=None,
):
    """Real pixel path without any imaging library: pure-Python PNG and
    baseline-JPEG codecs + numpy resampling (functions/png.py,
    functions/jpeg.py, functions/resample.py).  Mirrors the reference
    pipeline order (resizer.py:178-215): aspect-preserving resize ->
    blur -> center-crop / white-pad."""
    from img2dataset_spark.functions.blur import blur_bboxes
    from img2dataset_spark.functions.resample import crop_center, pad_center, resize

    def _blur(arr):
        # T9: blur AFTER the aspect-preserving resize but BEFORE crop/pad
        # (resizer.py:186-205) — relative bboxes stay valid only while
        # the frame is a pure scale of the original.
        if bboxes is not None and len(bboxes) > 0:
            return blur_bboxes(arr, bboxes)
        return arr

    img = _white_matte(_codec_decode(data))
    h, w = img.shape[:2]
    nw, nh = resize_geometry(
        w, h, resize_mode, image_size, resize_only_if_bigger, aspect_buckets
    )
    mode = select_interpolation(
        w, h, resize_mode, image_size, upscale_interpolation,
        downscale_interpolation, aspect_buckets,
    )
    if resize_mode in ("center_crop", "border", "aspect_bucket") and (nw, nh) != (w, h):
        if resize_mode == "center_crop":
            sw, sh = _scaled(w, h, image_size / min(w, h))
            img = _blur(resize(img, sw, sh, mode))
            img = crop_center(img, nw, nh)
        elif resize_mode == "aspect_bucket":
            # scale-to-cover + center-crop (NovelAI/SDXL recipe); the
            # rounded cover size is clamped to never undershoot the crop
            sw, sh = _scaled(w, h, max(nw / w, nh / h))
            sw, sh = max(sw, nw), max(sh, nh)
            img = _blur(resize(img, sw, sh, mode))
            img = crop_center(img, nw, nh)
        else:
            sw, sh = _scaled(w, h, image_size / max(w, h))
            img = _blur(resize(img, sw, sh, mode))
            img = pad_center(img, image_size, image_size, value=255)
    elif (nw, nh) != (w, h):
        img = _blur(resize(img, nw, nh, mode))
    else:
        img = _blur(img)
    return _codec_encode(img, encode_format, encode_quality), nw, nh, w, h, None


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def make_transform_fn(
    resize_mode: str = "border",
    image_size: int = 256,
    resize_only_if_bigger: bool = False,
    min_image_size: int = 0,
    max_image_area: float = float("inf"),
    max_aspect_ratio: float = float("inf"),
    encode_format: str = "jpg",
    encode_quality: int = 95,
    disable_all_reencoding: bool = False,
    skip_reencode: bool = False,
    mock: bool = False,
    upscale_interpolation: str = "lanczos",
    downscale_interpolation: str = "area",
    aspect_buckets=None,
):
    """Row-level transform closure shared by the pandas UDF and unit tests:
    (data, bboxes) -> (data, width, height, original_width, original_height,
    error)."""
    use_pil = not mock and _pil_available()

    def transform_one(data: bytes | None, bboxes=None):
        null = (None, None, None, None, None)
        if data is None:
            return null + (ERR_DECODE,)
        if disable_all_reencoding:
            # resizer.py:143-148 — bypass decode entirely; dims unknown
            return (data, None, None, None, None, None)
        if mock:
            dims = mock_decode_dims(data)
        else:
            dims = parse_dimensions(data)
        if dims is None:
            return null + (ERR_DECODE,)
        w, h = dims
        err = check_filters(w, h, min_image_size, max_image_area, max_aspect_ratio)
        if err is not None:
            return null + (err,)
        nw, nh = resize_geometry(
            w, h, resize_mode, image_size, resize_only_if_bigger, aspect_buckets
        )
        n_boxes = 0 if bboxes is None else len(bboxes)
        if mock:
            out = data if (nw, nh) == (w, h) else mock_encode(data, nw, nh)
            if n_boxes > 0:
                out = mock_blur(out, n_boxes)
            return (out, nw, nh, w, h, None)
        # Reference re-encode gate (resizer.py:148): with skip_reencode,
        # passthrough only when the DETECTED container already matches
        # encode_format; otherwise re-encoding is always needed.  A png
        # input with encode_format="jpg" must never land as raw PNG bytes
        # in a column named "jpg".
        what_ext = {"jpg": "jpeg"}.get(encode_format, encode_format)
        src_fmt = detect_format(data)
        encode_needed = (src_fmt != what_ext) if skip_reencode else True
        if (nw, nh) == (w, h) and n_boxes == 0 and not encode_needed:
            # skip_reencode fast path (resizer.py:224-228)
            return (data, nw, nh, w, h, None)
        if use_pil:  # pragma: no cover
            try:
                return _pil_transform(
                    data, resize_mode, image_size, resize_only_if_bigger,
                    encode_format, encode_quality, bboxes=bboxes,
                    upscale_interpolation=upscale_interpolation,
                    downscale_interpolation=downscale_interpolation,
                    aspect_buckets=aspect_buckets,
                )
            except Exception as e:
                return null + (str(e) or type(e).__name__,)
        if (
            (nw, nh) == (w, h)
            and n_boxes == 0
            and src_fmt == what_ext
            and not (src_fmt == "png" and _png_has_alpha(data))
            and not (src_fmt == "gif" and _gif_has_transparency(data))
            and not (src_fmt == "bmp" and _bmp_has_alpha(data))
            and not (src_fmt == "webp" and _webp_has_alpha(data))
        ):
            # Same-format re-encode with no imaging library: the
            # reference would decode+re-encode (new bytes, same pixels);
            # passing the original bytes through is the documented
            # no-pixel-lib deviation — container and pixels are already
            # exactly what was asked for (and for JPEG it also avoids a
            # pointless generation loss).  Alpha-carrying inputs (alpha
            # PNGs, transparent GIFs, 32-bit BMPs) are excluded so alpha
            # semantics stay consistent: the reference mattes alpha onto
            # white and re-encodes unconditionally (resizer.py:155-159),
            # so they take the pixel path below (or fail honestly when
            # no encoder exists for the target container).
            return (data, nw, nh, w, h, None)
        # png/jpeg/gif/bmp/webp(VP8L) pixel path is REAL without any
        # imaging library: pure-Python codecs (functions/png.py,
        # jpeg.py, gif.py, vp8l.py) + numpy resampling + the
        # golden-verified numpy Gaussian blur.  Covers decode, resize,
        # blur, re-encode, and cross-format conversion into
        # png/jpg/webp-lossless.  Lossy (VP8) webp inputs surface an
        # honest error row from the decode dispatch inside.
        if src_fmt in ("png", "jpeg", "gif", "bmp", "webp") and what_ext in (
            "png",
            "jpeg",
            "webp",
        ):
            try:
                return _numpy_transform(
                    data, resize_mode, image_size, resize_only_if_bigger,
                    encode_format, encode_quality=encode_quality,
                    bboxes=bboxes,
                    upscale_interpolation=upscale_interpolation,
                    downscale_interpolation=downscale_interpolation,
                    aspect_buckets=aspect_buckets,
                )
            except Exception as e:
                return null + (str(e) or type(e).__name__,)
        if (nw, nh) == (w, h) and n_boxes == 0:
            # gif/bmp encode targets genuinely require an imaging library
            return null + ("re-encode not available: no imaging library installed",)
        if (nw, nh) == (w, h):
            # blur requested but no pixel decoder for this format
            return null + ("blur not available: no imaging library installed",)
        # STUB: pixel work on gif/bmp ENCODE targets requires an imaging
        # library (PIL/OpenCV), absent here.  (Decode side is fully
        # covered above for png/jpeg/gif/bmp/webp-lossless.)
        return null + ("resize not available: no imaging library installed",)

    return transform_one


def make_transform_udf(with_blur: bool = False, **kwargs):
    """Build the transform pandas UDF:
    data:binary -> struct<data,width,height,original_width,original_height,error>.

    With ``with_blur`` the UDF takes a second array<array<double>> column
    of relative [x0,y0,x1,y1] bboxes (T9, blurrer.py:20-92).
    Keyword args are forwarded to :func:`make_transform_fn`.
    """
    transform_one = make_transform_fn(**kwargs)

    columns = [
        "data",
        "width",
        "height",
        "original_width",
        "original_height",
        "error",
    ]

    if with_blur:

        @pandas_udf(TRANSFORM_RESULT_SCHEMA)
        def transform_blur(
            batches: Iterator[tuple[pd.Series, pd.Series]],
        ) -> Iterator[pd.DataFrame]:
            for data_s, bbox_s in batches:
                rows = [transform_one(d, b) for d, b in zip(data_s, bbox_s)]
                yield pd.DataFrame(rows, columns=columns)

        return transform_blur

    @pandas_udf(TRANSFORM_RESULT_SCHEMA)
    def transform(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for series in batches:
            rows = [transform_one(d) for d in series]
            yield pd.DataFrame(rows, columns=columns)

    return transform
