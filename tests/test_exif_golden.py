"""EXIF descriptive-rendering parity, pinned against the reference
repo's committed photos.

The reference extracts EXIF with ``exifread.process_file(details=False)``
and serializes ``{k: str(v).strip()}`` via json.dumps
(/root/reference/img2dataset/downloader.py:324-336).  The goldens below
are the exact strings that call produces for the committed test photos:
tag names use exifread's "<group> <TagName>" convention, rationals are
reduced fractions (exifread's Ratio subclasses Fraction, so 25400/1000
prints "127/5"), UNDEFINED version tags print their ASCII payload,
ComponentsConfiguration maps bytes to "YCbCr", the sub-IFD pointer tags
appear as numeric "Image ExifOffset" entries, and UserComment (0x9286,
present in every one of these files) is absent because details=False
skips it.  When exifread is importable the test also cross-checks the
goldens against the real library.
"""

from __future__ import annotations

import io
import json

import pytest

from img2dataset_spark.functions.exif import extract_exif_json

REF_DIR = "/root/reference/tests/resize_test_image"

# One photo per distinct EXIF payload shape in the reference set
# (72 dpi vs 25400/1000 dpi variants; two files carry no APP1 at all).
GOLDENS = {
    "208_495.jpg": {
        "Image Orientation": "Horizontal (normal)",
        "Image XResolution": "127/5",
        "Image YResolution": "127/5",
        "Image ResolutionUnit": "Pixels/Inch",
        "Image YCbCrPositioning": "Centered",
        "Image ExifOffset": "102",
        "EXIF ExifVersion": "0210",
        "EXIF ComponentsConfiguration": "YCbCr",
        "EXIF FlashPixVersion": "0100",
        "EXIF ColorSpace": "Uncalibrated",
        "EXIF ExifImageWidth": "208",
        "EXIF ExifImageLength": "495",
    },
    "416_264.jpg": {
        "Image Orientation": "Horizontal (normal)",
        "Image XResolution": "72",
        "Image YResolution": "72",
        "Image ResolutionUnit": "Pixels/Inch",
        "Image YCbCrPositioning": "Centered",
        "Image ExifOffset": "102",
        "EXIF ExifVersion": "0210",
        "EXIF ComponentsConfiguration": "YCbCr",
        "EXIF FlashPixVersion": "0100",
        "EXIF ColorSpace": "Uncalibrated",
        "EXIF ExifImageWidth": "416",
        "EXIF ExifImageLength": "264",
    },
}


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_reference_photo_exif_matches_exifread_serialization(name):
    data = open(f"{REF_DIR}/{name}", "rb").read()
    got = extract_exif_json(data)
    want = json.dumps(GOLDENS[name])
    assert got == want, f"{name}: {got} != {want}"


@pytest.mark.parametrize("name", ["123_456.jpg", "456_123.jpg"])
def test_reference_photo_without_app1_yields_empty_json(name):
    data = open(f"{REF_DIR}/{name}", "rb").read()
    assert extract_exif_json(data) == "{}"


def test_usercomment_present_in_bytes_but_skipped():
    # details=False parity: the raw APP1 contains tag 0x9286 but the
    # serialized output must not.
    data = open(f"{REF_DIR}/208_495.jpg", "rb").read()
    assert b"Picsum ID" in data
    assert "UserComment" not in extract_exif_json(data)


def test_cross_check_against_exifread_if_available():
    exifread = pytest.importorskip("exifread")
    for name in GOLDENS:
        data = open(f"{REF_DIR}/{name}", "rb").read()
        tags = exifread.process_file(io.BytesIO(data), details=False)
        ref = {k: str(v).strip() for k, v in tags.items() if v is not None}
        assert json.loads(extract_exif_json(data)) == ref
