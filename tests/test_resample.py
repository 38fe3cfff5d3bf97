"""Numpy resampling tests: analytically exact cases per mode, plus the
full png->png resize path through the fused transform closure (T2-T5
pixel semantics, reference resizer.py:178-215)."""

from __future__ import annotations

import numpy as np

from img2dataset_spark.functions.png import decode_png, encode_png
from img2dataset_spark.functions.resample import (
    _axis_weights,
    crop_center,
    pad_center,
    resize,
)


class TestWeights:
    def test_rows_sum_to_one(self):
        for mode in ("nearest", "bilinear", "cubic", "lanczos4", "area"):
            W = _axis_weights(13, 5, mode)
            assert np.allclose(W.sum(axis=1), 1.0), mode
            W = _axis_weights(5, 13, mode)
            assert np.allclose(W.sum(axis=1), 1.0), mode


class TestResize:
    def test_identity(self):
        img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
        for mode in ("nearest", "bilinear", "cubic", "lanczos4", "area"):
            assert np.array_equal(resize(img, 4, 4, mode), img)

    def test_area_integer_downscale_is_box_mean(self):
        img = np.array(
            [[0, 4, 8, 12], [2, 6, 10, 14], [16, 20, 24, 28], [18, 22, 26, 30]],
            dtype=np.uint8,
        )
        out = resize(img, 2, 2, "area")
        # each 2x2 block's exact mean
        expect = np.array([[3, 11], [19, 27]], dtype=np.uint8)
        assert np.array_equal(out, expect)

    def test_bilinear_preserves_constant_and_ramp(self):
        const = np.full((6, 6), 77, dtype=np.uint8)
        assert np.array_equal(resize(const, 13, 9, "bilinear"), np.full((9, 13), 77))
        # a linear ramp stays linear under bilinear: interior values equal
        # the analytic ramp at the mapped centers
        ramp = np.tile(np.arange(0, 160, 10, dtype=np.uint8), (4, 1))  # 4x16
        out = resize(ramp.astype(np.float64), 31, 4, "bilinear")
        centers = (np.arange(31) + 0.5) * (16 / 31) - 0.5
        inner = (centers >= 0) & (centers <= 15)
        assert np.allclose(out[0, inner], 10 * centers[inner], atol=1e-9)

    def test_lanczos_upscale_reasonable(self):
        img = np.zeros((8, 8), dtype=np.uint8)
        img[2:6, 2:6] = 200
        out = resize(img, 16, 16, "lanczos4")
        assert out.shape == (16, 16)
        assert out[7, 7] > 150  # center stays bright
        assert out[0, 0] < 50  # corners stay dark

    def test_crop_and_pad_center(self):
        img = np.arange(24, dtype=np.uint8).reshape(4, 6)
        c = crop_center(img, 2, 2)
        assert np.array_equal(c, img[1:3, 2:4])
        p = pad_center(img, 8, 6, value=255)
        assert p.shape == (6, 8)
        assert p[0, 0] == 255 and np.array_equal(p[1:5, 1:7], img)


class TestPngResizeEndToEnd:
    def _png(self, w, h):
        rng = np.random.default_rng(11)
        return encode_png(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))

    def _fn(self, **kw):
        from img2dataset_spark.functions.image import make_transform_fn

        return make_transform_fn(encode_format="png", **kw)

    def test_border_mode_pads_white(self):
        fn = self._fn(resize_mode="border", image_size=64)
        data, w, h, ow, oh, err = fn(self._png(100, 50))
        assert err is None and (w, h, ow, oh) == (64, 64, 100, 50)
        out = decode_png(data)
        assert out.shape == (64, 64, 3)
        # 100x50 -> 64x32 centered; rows 0..15 and 48..63 are white padding
        assert (out[:16] == 255).all() and (out[48:] == 255).all()
        assert not (out[16:48] == 255).all()

    def test_center_crop_mode_dims(self):
        fn = self._fn(resize_mode="center_crop", image_size=32)
        data, w, h, ow, oh, err = fn(self._png(100, 50))
        assert err is None and (w, h) == (32, 32)
        assert decode_png(data).shape == (32, 32, 3)

    def test_keep_ratio_upscale(self):
        fn = self._fn(resize_mode="keep_ratio", image_size=64)
        data, w, h, ow, oh, err = fn(self._png(32, 16))
        assert err is None and (w, h) == (128, 64)
        assert decode_png(data).shape == (64, 128, 3)

    def test_only_if_bigger_passthrough(self):
        src = self._png(32, 16)
        fn = self._fn(resize_mode="border", image_size=64,
                      resize_only_if_bigger=True, skip_reencode=True)
        data, w, h, ow, oh, err = fn(src)
        assert err is None and (w, h) == (32, 16)
        assert data == src  # skip_reencode fast path, bytes untouched

    def test_jpeg_resize_is_real(self):
        """JPEG pixels resize for real via functions/jpeg.py (this was a
        stub before the dependency-free codec existed)."""
        import numpy as np

        from img2dataset_spark.functions.image import make_transform_fn
        from img2dataset_spark.functions.jpeg import decode_jpeg, encode_jpeg

        jpg = encode_jpeg(np.full((16, 32, 3), 90, np.uint8), 95)
        fn = make_transform_fn(
            resize_mode="border", image_size=64, encode_format="jpg"
        )
        data, w, h, ow, oh, err = fn(jpg)
        assert err is None and (w, h, ow, oh) == (64, 64, 32, 16)
        dec = decode_jpeg(data)
        assert dec.shape == (64, 64, 3)
        # border mode pads with white around the scaled content
        assert abs(float(dec[32, 32].mean()) - 90.0) < 4
        assert abs(float(dec[4, 32].mean()) - 255.0) < 4

    def test_alpha_png_matted_onto_white(self):
        """Reference parity (resizer.py:155-159): an alpha PNG is matted
        onto white and re-encoded even when geometry is a no-op — never
        passed through with its alpha intact."""
        import numpy as np

        from img2dataset_spark.functions.image import make_transform_fn
        from img2dataset_spark.functions.png import encode_png

        rgba = np.zeros((10, 10, 4), np.uint8)
        rgba[:, :, 0] = 200
        rgba[:, :, 3] = 128
        src = encode_png(rgba)
        fn = make_transform_fn(resize_mode="no", encode_format="png")
        data, w, h, ow, oh, err = fn(src)
        assert err is None and (w, h) == (10, 10)
        assert data != src
        out = decode_png(data)
        assert out.shape == (10, 10, 3)
        # rint(128/255*200 + 255-128) = 227 red over white; G/B = 127
        assert tuple(out[0, 0]) == (227, 127, 127)

    def test_truncated_jpeg_errors_cleanly(self):
        fn = self._fn(resize_mode="border", image_size=64)
        jpg = (b"\xff\xd8\xff\xc0\x00\x11\x08\x00\x10\x00\x20\x03"
               b"\x01\x22\x00\x02\x11\x01\x03\x11\x01\xff\xd9")
        out = fn(jpg)
        assert out[0] is None and out[5]  # loud error, no silent bytes
