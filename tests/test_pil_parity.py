"""Real-pixel resize parity with the reference, gated on PIL.

This container ships no imaging library, so these tests SKIP here — but
wherever PIL exists they pin the real-JPEG behavior of the PIL pixel
path against the reference's resize contract:

  - geometry per mode (reference resizer.py:178-215, exactly the checks
    of reference tests/fixtures.py:check_one_image_size);
  - the resize_only_if_bigger gate (resizer.py:179-180,196-197);
  - reported dims == dims decoded back from the emitted bytes, original
    dims == dims of the input (reference tests/test_resizer.py:33-65).

The inputs are the reference's own committed test JPEGs, so any
environment with PIL runs the same corpus the reference CI runs.
"""

from __future__ import annotations

import glob
import io
import os

import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from img2dataset_spark.functions.image import _pil_transform  # noqa: E402

REF_IMAGES = sorted(glob.glob("/root/reference/tests/resize_test_image/*"))

pytestmark = pytest.mark.skipif(
    not REF_IMAGES, reason="reference test images not available"
)

MODES = [
    ("no", False),
    ("border", False),
    ("border", True),
    ("keep_ratio", False),
    ("keep_ratio", True),
    ("keep_ratio_largest", False),
    ("keep_ratio_largest", True),
    ("center_crop", False),
    ("center_crop", True),
]


def _check_geometry(w, h, ow, oh, image_size, mode, only_if_bigger):
    """Port of reference tests/fixtures.py:116-150 (check_one_image_size)."""
    if only_if_bigger:
        small = (
            mode == "border"
            and max(ow, oh) <= image_size
            or mode in ("keep_ratio", "center_crop")
            and min(ow, oh) <= image_size
        )
        if small:
            assert (w, h) == (ow, oh)
            return
    if mode == "border":
        assert (w, h) == (image_size, image_size)
    elif mode == "center_crop":
        assert (w, h) == (image_size, image_size)
    elif mode == "keep_ratio":
        r = float(image_size) / min(ow, oh)
        assert (w, h) == (round(ow * r), round(oh * r))
    elif mode == "keep_ratio_largest":
        if max(ow, oh) > image_size or not only_if_bigger:
            r = float(image_size) / max(ow, oh)
            assert (w, h) == (round(ow * r), round(oh * r))
    elif mode == "no":
        assert (w, h) == (ow, oh)


@pytest.mark.parametrize("image_size", [256, 512])
@pytest.mark.parametrize("mode,only_if_bigger", MODES)
@pytest.mark.parametrize("encode_format", ["jpg", "png"])
def test_pil_resize_contract(image_size, mode, only_if_bigger, encode_format):
    for path in REF_IMAGES:
        with open(path, "rb") as f:
            data = f.read()
        with Image.open(io.BytesIO(data)) as im:
            ow0, oh0 = im.size
        out, w, h, ow, oh, err = _pil_transform(
            data,
            resize_mode=mode,
            image_size=image_size,
            resize_only_if_bigger=only_if_bigger,
            encode_format=encode_format,
            encode_quality=95 if encode_format == "jpg" else 9,
        )
        assert err is None, (path, err)
        assert (ow, oh) == (ow0, oh0), os.path.basename(path)
        with Image.open(io.BytesIO(out)) as res:
            assert res.size == (w, h), os.path.basename(path)
        _check_geometry(w, h, ow, oh, image_size, mode, only_if_bigger)


def test_pil_alpha_mattes_onto_white():
    """Alpha inputs matte onto WHITE in the PIL path too (reference
    resizer.py:155-158), matching the numpy path's formula."""
    import numpy as np

    from img2dataset_spark.functions.png import encode_png

    rgba = np.zeros((8, 8, 4), np.uint8)
    rgba[:, :, 0] = 200
    rgba[:, :, 3] = 128
    out, w, h, ow, oh, err = _pil_transform(
        encode_png(rgba), "no", 64, False, "png", 9
    )
    assert err is None
    arr = np.asarray(Image.open(io.BytesIO(out)).convert("RGB"))
    # rint(128/255*200 + 127) = 227 over white; PIL's compositor may
    # round a level differently
    assert abs(int(arr[0, 0, 0]) - 227) <= 1
    assert abs(int(arr[0, 0, 1]) - 127) <= 1


def test_pil_blur_keeps_frame_scaled():
    """Bbox blur composes with resize: blurred output has the same
    geometry as unblurred (blur happens on the aspect-preserved frame,
    reference resizer.py:186-205)."""
    path = REF_IMAGES[0]
    with open(path, "rb") as f:
        data = f.read()
    plain = _pil_transform(
        data, "keep_ratio", 256, False, "jpg", 95
    )
    blurred = _pil_transform(
        data, "keep_ratio", 256, False, "jpg", 95,
        bboxes=[[0.1, 0.1, 0.4, 0.4]],
    )
    assert plain[1:5] == blurred[1:5]  # (w, h, ow, oh) identical
    assert blurred[5] is None
    assert blurred[0] != plain[0]  # pixels actually changed