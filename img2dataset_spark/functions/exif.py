"""T10: EXIF extraction as a JSON-string column.

Reference: /root/reference/img2dataset/downloader.py:324-336 parses EXIF
tags with the `exifread` library and serializes to a JSON string.

This container has no EXIF library; the parser below is a real TIFF/EXIF
walker over the public EXIF 2.3 spec constants: IFD0, the EXIF sub-IFD
(pointer tag 0x8769) and the GPS IFD (0x8825), covering ASCII, BYTE,
SHORT, LONG, RATIONAL, SRATIONAL and UNDEFINED value types.  Tag names
use exifread's "<group> <TagName>" convention ("Image Make",
"EXIF ExposureTime", "GPS GPSLatitude") and values serialize exactly as
exifread prints them:

- rationals are reduced fractions (exifread's ``Ratio`` subclasses
  ``Fraction``): 25400/1000 prints "127/5", 72/1 prints "72";
- multi-value tags print like a python list ("[127/5, 72]");
- the sub-IFD pointer tags themselves appear as numeric entries
  ("Image ExifOffset", "Image GPSInfo"), as exifread emits them;
- UNDEFINED version tags (ExifVersion, FlashPixVersion) print their
  ASCII payload ("0210"); ComponentsConfiguration maps bytes through
  {1: Y, 2: Cb, 3: Cr, 4: Red, 5: Green, 6: Blue} ("YCbCr");
  FileSource / SceneType map through their enum tables;
- UserComment (0x9286) and MakerNote (0x927C) are skipped, matching
  ``exifread.process_file(details=False)`` — the exact call the
  reference makes (downloader.py:330);
- enum SHORT/BYTE tags render exifread's printable strings
  (Orientation -> "Horizontal (normal)", Flash, LightSource,
  MeteringMode, SceneCaptureType, ...); enum tags outside the table
  below emit the numeric value — the (small) documented deviation.

Parity is pinned by golden tests over the reference repo's committed
photos (tests/test_exif_golden.py).
"""

from __future__ import annotations

import json
import math as _math
import struct as _struct
from typing import Iterator

import pandas as pd
from pyspark.sql.functions import pandas_udf

# (EXIF 2.3 spec, public) — tag id -> exifread-style name, per IFD group.
_IFD0_TAGS = {
    0x010E: "Image ImageDescription",
    0x010F: "Image Make",
    0x0110: "Image Model",
    0x0112: "Image Orientation",
    0x011A: "Image XResolution",
    0x011B: "Image YResolution",
    0x0128: "Image ResolutionUnit",
    0x0131: "Image Software",
    0x0132: "Image DateTime",
    0x013B: "Image Artist",
    0x0213: "Image YCbCrPositioning",
    0x8298: "Image Copyright",
}
_EXIF_TAGS = {
    0x829A: "EXIF ExposureTime",
    0x829D: "EXIF FNumber",
    0x8822: "EXIF ExposureProgram",
    0x8827: "EXIF ISOSpeedRatings",
    0x9000: "EXIF ExifVersion",
    0x9003: "EXIF DateTimeOriginal",
    0x9004: "EXIF DateTimeDigitized",
    0x9101: "EXIF ComponentsConfiguration",
    0x9201: "EXIF ShutterSpeedValue",
    0x9202: "EXIF ApertureValue",
    0x9204: "EXIF ExposureBiasValue",
    0x9205: "EXIF MaxApertureValue",
    0x9206: "EXIF SubjectDistance",
    0x9207: "EXIF MeteringMode",
    0x9208: "EXIF LightSource",
    0x9209: "EXIF Flash",
    0x920A: "EXIF FocalLength",
    0x9290: "EXIF SubSecTime",
    0x9291: "EXIF SubSecTimeOriginal",
    0x9292: "EXIF SubSecTimeDigitized",
    0xA000: "EXIF FlashPixVersion",
    0xA001: "EXIF ColorSpace",
    0xA002: "EXIF ExifImageWidth",
    0xA003: "EXIF ExifImageLength",
    0xA217: "EXIF SensingMethod",
    0xA300: "EXIF FileSource",
    0xA301: "EXIF SceneType",
    0xA401: "EXIF CustomRendered",
    0xA402: "EXIF ExposureMode",
    0xA403: "EXIF WhiteBalance",
    0xA404: "EXIF DigitalZoomRatio",
    0xA405: "EXIF FocalLengthIn35mmFilm",
    0xA406: "EXIF SceneCaptureType",
    0xA407: "EXIF GainControl",
    0xA408: "EXIF Contrast",
    0xA409: "EXIF Saturation",
    0xA40A: "EXIF Sharpness",
    0xA40C: "EXIF SubjectDistanceRange",
}
_GPS_TAGS = {
    0x0000: "GPS GPSVersionID",
    0x0001: "GPS GPSLatitudeRef",
    0x0002: "GPS GPSLatitude",
    0x0003: "GPS GPSLongitudeRef",
    0x0004: "GPS GPSLongitude",
    0x0005: "GPS GPSAltitudeRef",
    0x0006: "GPS GPSAltitude",
    0x0007: "GPS GPSTimeStamp",
    0x0012: "GPS GPSMapDatum",
    0x001D: "GPS GPSDate",
}
_EXIF_IFD_POINTER = 0x8769
_GPS_IFD_POINTER = 0x8825

# Descriptive renderings for single-value SHORT/BYTE enum tags, matching
# exifread's printable strings (which are the EXIF 2.3 spec's own value
# descriptions).  Tags without an entry keep their numeric rendering —
# that remaining subset is the documented deviation.
_DESCRIPTIONS: dict[int, dict[int, str]] = {
    0x0112: {  # Orientation
        1: "Horizontal (normal)",
        2: "Mirrored horizontal",
        3: "Rotated 180",
        4: "Mirrored vertical",
        5: "Mirrored horizontal then rotated 90 CCW",
        6: "Rotated 90 CW",
        7: "Mirrored horizontal then rotated 90 CW",
        8: "Rotated 90 CCW",
    },
    0x0128: {1: "Not Absolute", 2: "Pixels/Inch", 3: "Pixels/Centimeter"},
    0x8822: {  # ExposureProgram
        0: "Unidentified",
        1: "Manual",
        2: "Program Normal",
        3: "Aperture Priority",
        4: "Shutter Priority",
        5: "Program Creative",
        6: "Program Action",
        7: "Portrait Mode",
        8: "Landscape Mode",
    },
    0x9207: {  # MeteringMode
        0: "Unidentified",
        1: "Average",
        2: "CenterWeightedAverage",
        3: "Spot",
        4: "MultiSpot",
        5: "Pattern",
        6: "Partial",
        255: "other",
    },
    0xA001: {1: "sRGB", 2: "Adobe RGB", 65535: "Uncalibrated"},
    0xA402: {0: "Auto Exposure", 1: "Manual Exposure", 2: "Auto Bracket"},
    0xA403: {0: "Auto", 1: "Manual"},
    0x0213: {1: "Centered", 2: "Co-sited"},  # YCbCrPositioning
    0x9208: {  # LightSource
        0: "Unknown",
        1: "Daylight",
        2: "Fluorescent",
        3: "Tungsten (incandescent light)",
        4: "Flash",
        9: "Fine weather",
        10: "Cloudy weather",
        11: "Shade",
        12: "Daylight fluorescent (D 5700 - 7100K)",
        13: "Day white fluorescent (N 4600 - 5400K)",
        14: "Cool white fluorescent (W 3900 - 4500K)",
        15: "White fluorescent (WW 3200 - 3700K)",
        17: "Standard light A",
        18: "Standard light B",
        19: "Standard light C",
        20: "D55",
        21: "D65",
        22: "D75",
        23: "D50",
        24: "ISO studio tungsten",
        255: "other light source",
    },
    0x9209: {  # Flash (bitfield with enumerated printable strings)
        0: "Flash did not fire",
        1: "Flash fired",
        5: "Strobe return light not detected",
        7: "Strobe return light detected",
        9: "Flash fired, compulsory flash mode",
        13: "Flash fired, compulsory flash mode, return light not detected",
        15: "Flash fired, compulsory flash mode, return light detected",
        16: "Flash did not fire, compulsory flash mode",
        24: "Flash did not fire, auto mode",
        25: "Flash fired, auto mode",
        29: "Flash fired, auto mode, return light not detected",
        31: "Flash fired, auto mode, return light detected",
        32: "No flash function",
        65: "Flash fired, red-eye reduction mode",
        69: "Flash fired, red-eye reduction mode, return light not detected",
        71: "Flash fired, red-eye reduction mode, return light detected",
        73: "Flash fired, compulsory flash mode, red-eye reduction mode",
        77: (
            "Flash fired, compulsory flash mode, red-eye reduction mode, "
            "return light not detected"
        ),
        79: (
            "Flash fired, compulsory flash mode, red-eye reduction mode, "
            "return light detected"
        ),
        89: "Flash fired, auto mode, red-eye reduction mode",
        93: "Flash fired, auto mode, return light not detected, red-eye reduction mode",
        95: "Flash fired, auto mode, return light detected, red-eye reduction mode",
    },
    0xA217: {  # SensingMethod
        1: "Not defined",
        2: "One-chip color area",
        3: "Two-chip color area",
        4: "Three-chip color area",
        5: "Color sequential area",
        7: "Trilinear",
        8: "Color sequential linear",
    },
    0xA401: {0: "Normal", 1: "Custom"},  # CustomRendered
    0xA406: {0: "Standard", 1: "Landscape", 2: "Portrait", 3: "Night"},
    0xA407: {  # GainControl
        0: "None",
        1: "Low gain up",
        2: "High gain up",
        3: "Low gain down",
        4: "High gain down",
    },
    0xA408: {0: "Normal", 1: "Soft", 2: "Hard"},  # Contrast
    0xA409: {0: "Normal", 1: "Soft", 2: "Hard"},  # Saturation
    0xA40A: {0: "Normal", 1: "Soft", 2: "Hard"},  # Sharpness
    0xA40C: {1: "Macro", 2: "Close view", 3: "Distant view"},
}

# UNDEFINED (type 7) tags whose payload is ASCII text (version tags).
_UNDEFINED_ASCII = {0x9000, 0xA000}
# UNDEFINED tags mapped byte-by-byte (ComponentsConfiguration) or as a
# single-byte enum (FileSource, SceneType).
_COMPONENTS = {0: "", 1: "Y", 2: "Cb", 3: "Cr", 4: "Red", 5: "Green", 6: "Blue"}
_UNDEFINED_ENUM = {
    0xA300: {1: "Film Scanner", 2: "Reflection Print Scanner", 3: "Digital Camera"},
    0xA301: {1: "Directly Photographed"},
}

# TIFF value types: type id -> (struct code, byte size).  ASCII (2) and
# rationals (5, 10) are handled specially.
_SCALAR_TYPES = {1: ("B", 1), 3: ("H", 2), 4: ("I", 4), 9: ("i", 4)}


def extract_exif_json(data: bytes | None) -> str:
    if not data or data[:2] != b"\xff\xd8":
        return "{}"
    try:
        i, n = 2, len(data)
        while i + 4 < n:
            if data[i] != 0xFF:
                return "{}"
            marker = data[i + 1]
            seg_len = _struct.unpack(">H", data[i + 2 : i + 4])[0]
            if marker == 0xE1 and data[i + 4 : i + 10] == b"Exif\x00\x00":
                return _parse_tiff(data[i + 10 : i + 2 + seg_len])
            i += 2 + seg_len
        return "{}"
    except Exception:
        return "{}"


def _read_values(tiff: bytes, endian: str, entry_off: int):
    """Decode one 12-byte IFD entry -> python value or None."""
    tag, typ, n_vals, _ = _struct.unpack(
        endian + "HHII", tiff[entry_off : entry_off + 12]
    )
    if typ == 2:  # ASCII
        size = n_vals
        off = _value_offset(tiff, endian, entry_off, size)
        raw = tiff[off : off + n_vals]
        return tag, raw.rstrip(b"\x00").decode("ascii", "replace")
    if typ == 7:  # UNDEFINED: raw bytes, rendered per-tag like exifread
        off = _value_offset(tiff, endian, entry_off, n_vals)
        raw = tiff[off : off + n_vals]
        if tag in _UNDEFINED_ASCII:
            return tag, raw.decode("ascii", "replace")
        if tag == 0x9101:  # ComponentsConfiguration
            return tag, "".join(_COMPONENTS.get(b, str(b)) for b in raw)
        if tag in _UNDEFINED_ENUM and n_vals == 1:
            desc = _UNDEFINED_ENUM[tag].get(raw[0])
            return tag, desc if desc is not None else str(raw[0])
        return tag, None
    if typ in _SCALAR_TYPES:
        code, unit = _SCALAR_TYPES[typ]
        size = unit * n_vals
        off = _value_offset(tiff, endian, entry_off, size)
        vals = _struct.unpack(endian + code * n_vals, tiff[off : off + size])
        if n_vals == 1 and tag in _DESCRIPTIONS:
            desc = _DESCRIPTIONS[tag].get(int(vals[0]))
            if desc is not None:
                return tag, desc
        return tag, _fmt_list([str(v) for v in vals])
    if typ in (5, 10):  # RATIONAL / SRATIONAL: two (u)int32 per value
        code = "II" if typ == 5 else "ii"
        size = 8 * n_vals
        off = _value_offset(tiff, endian, entry_off, size)
        parts = _struct.unpack(endian + code * n_vals, tiff[off : off + size])
        vals = []
        for k in range(n_vals):
            num, den = parts[2 * k], parts[2 * k + 1]
            vals.append(_fmt_ratio(num, den))
        return tag, _fmt_list(vals)
    return tag, None


def _value_offset(tiff: bytes, endian: str, entry_off: int, size: int) -> int:
    if size <= 4:
        return entry_off + 8
    (off,) = _struct.unpack(endian + "I", tiff[entry_off + 8 : entry_off + 12])
    return off


def _fmt_list(vals: list[str]) -> str:
    return vals[0] if len(vals) == 1 else "[" + ", ".join(vals) + "]"


def _fmt_ratio(num: int, den: int) -> str:
    """Render a (S)RATIONAL exactly as exifread's Ratio (a Fraction
    subclass) prints it: reduced, sign on the numerator, plain integer
    when the reduced denominator is 1.  A zero denominator (invalid per
    TIFF 6.0) falls back to the raw "num/0" text."""
    if den == 0:
        return f"{num}/0"
    if den < 0:
        num, den = -num, -den
    g = _math.gcd(num, den)
    num //= g
    den //= g
    return str(num) if den == 1 else f"{num}/{den}"


def _parse_ifd(
    tiff: bytes, endian: str, ifd_off: int, names: dict[int, str], out: dict
) -> dict[int, int]:
    """Parse one IFD's named tags into `out`; returns sub-IFD pointers."""
    if ifd_off + 2 > len(tiff):
        return {}
    (count,) = _struct.unpack(endian + "H", tiff[ifd_off : ifd_off + 2])
    pointers: dict[int, int] = {}
    for k in range(count):
        e = ifd_off + 2 + k * 12
        if e + 12 > len(tiff):
            break
        tag, typ, n_vals, val = _struct.unpack(endian + "HHII", tiff[e : e + 12])
        if tag in (_EXIF_IFD_POINTER, _GPS_IFD_POINTER) and typ == 4:
            pointers[tag] = val
            # exifread emits the pointer entries themselves
            name = "Image ExifOffset" if tag == _EXIF_IFD_POINTER else "Image GPSInfo"
            out[name] = str(val)
            continue
        if tag not in names:
            continue
        try:
            _, decoded = _read_values(tiff, endian, e)
        except Exception:
            decoded = None
        if decoded is not None:
            out[names[tag]] = decoded
    return pointers


def _parse_tiff(tiff: bytes) -> str:
    if len(tiff) < 8:
        return "{}"
    endian = "<" if tiff[:2] == b"II" else ">"
    (ifd_off,) = _struct.unpack(endian + "I", tiff[4:8])
    out: dict[str, str] = {}
    pointers = _parse_ifd(tiff, endian, ifd_off, _IFD0_TAGS, out)
    if _EXIF_IFD_POINTER in pointers:
        _parse_ifd(tiff, endian, pointers[_EXIF_IFD_POINTER], _EXIF_TAGS, out)
    if _GPS_IFD_POINTER in pointers:
        _parse_ifd(tiff, endian, pointers[_GPS_IFD_POINTER], _GPS_TAGS, out)
    # insertion order (Image tags, then EXIF, then GPS — each in file
    # order) matches json.dumps over exifread's dict, so the serialized
    # string byte-matches the reference's meta["exif"] value
    return json.dumps(out)


def make_exif_udf():
    # built lazily: pandas_udf parses its DDL schema against the active
    # SparkSession, so it cannot be created at import time
    @pandas_udf("string")
    def exif_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in batches:
            yield series.map(extract_exif_json)

    return exif_udf
