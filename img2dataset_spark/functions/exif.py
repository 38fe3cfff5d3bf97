"""T10: EXIF extraction as a JSON-string column.

Reference: /root/reference/img2dataset/downloader.py:324-336 parses EXIF
tags with the `exifread` library and serializes to a JSON string.

This container has no EXIF library; the parser below is a minimal real
implementation for the common case (JPEG APP1/TIFF IFD0 ASCII tags) and
returns "{}" for everything else — the Spark-side plumbing (UDF
signature, schema, queryability via from_json/get_json_object) is real
and tested with synthetic EXIF blobs.
"""

from __future__ import annotations

import json
import struct as _struct
from typing import Iterator

import pandas as pd
from pyspark.sql.functions import pandas_udf

# Tag ids for IFD0 ASCII tags commonly present (EXIF 2.3 spec, public).
_TAG_NAMES = {
    0x010E: "Image ImageDescription",
    0x010F: "Image Make",
    0x0110: "Image Model",
    0x0131: "Image Software",
    0x0132: "Image DateTime",
    0x013B: "Image Artist",
    0x8298: "Image Copyright",
}


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


def _parse_tiff(tiff: bytes) -> str:
    if len(tiff) < 8:
        return "{}"
    endian = "<" if tiff[:2] == b"II" else ">"
    (ifd_off,) = _struct.unpack(endian + "I", tiff[4:8])
    if ifd_off + 2 > len(tiff):
        return "{}"
    (count,) = _struct.unpack(endian + "H", tiff[ifd_off : ifd_off + 2])
    out: dict[str, str] = {}
    for k in range(count):
        e = ifd_off + 2 + k * 12
        if e + 12 > len(tiff):
            break
        tag, typ, n_vals, val = _struct.unpack(endian + "HHII", tiff[e : e + 12])
        if tag in _TAG_NAMES and typ == 2:  # ASCII
            off = val if n_vals > 4 else e + 8
            raw = tiff[off : off + n_vals]
            out[_TAG_NAMES[tag]] = raw.rstrip(b"\x00").decode("ascii", "replace")
    return json.dumps(out, sort_keys=True)


def make_exif_udf():
    # built lazily: pandas_udf parses its DDL schema against the active
    # SparkSession, so it cannot be created at import time
    @pandas_udf("string")
    def exif_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in batches:
            yield series.map(extract_exif_json)

    return exif_udf
