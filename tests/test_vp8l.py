"""VP8L (lossless WebP) codec tests: spec-structure pins, full
encode/decode roundtrips across every transform and coding feature,
corrupt-stream fuzzing, transform-pipeline integration, and PIL-gated
cross-decoding."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from img2dataset_spark.functions.vp8l import (
    DISTANCE_MAP,
    _PrefixCode,
    canonical_codes,
    decode_vp8l_stream,
    decode_webp,
    encode_vp8l_stream,
    encode_webp_lossless,
    huffman_lengths,
)

RNG = np.random.default_rng(29)


def rand_img(h, w, ch=3):
    return RNG.integers(0, 256, (h, w, ch), dtype=np.uint8)


class TestSpecStructures:
    def test_distance_map_documented_prefix(self):
        """First rows of the spec's 120-entry near-distance table."""
        expect = [
            (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
            (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
            (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
            (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
            (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
        ]
        assert DISTANCE_MAP[: len(expect)] == expect
        assert len(DISTANCE_MAP) == 120
        assert len(set(DISTANCE_MAP)) == 120
        # every entry within the documented neighborhood
        for dx, dy in DISTANCE_MAP:
            assert 0 <= dy <= 8 and -8 <= dx <= 8
            assert dx * dx + dy * dy <= 74

    def test_huffman_lengths_kraft_complete(self):
        freqs = {i: (i % 7) + 1 for i in range(40)}
        lens = huffman_lengths(freqs, max_len=15)
        assert sum(2 ** -l for l in lens.values()) == 1.0
        # depth limit respected even for pathological skew
        skew = {i: 2 ** i for i in range(20)}
        lens = huffman_lengths(skew, max_len=7)
        assert max(lens.values()) <= 7
        assert sum(2 ** -l for l in lens.values()) == 1.0

    def test_prefix_code_rejects_incomplete(self):
        with pytest.raises(ValueError, match="not complete"):
            _PrefixCode([2, 2, 2, 0])  # kraft 3/4
        with pytest.raises(ValueError, match="not complete"):
            _PrefixCode([1, 1, 1])  # oversubscribed

    def test_canonical_assignment_matches_decoder(self):
        lengths = [2, 2, 3, 3, 3, 4, 4, 0]  # kraft-complete
        codes = canonical_codes(lengths)
        pc = _PrefixCode(lengths)
        for sym, (code, l) in codes.items():
            assert pc.table[(l, code)] == sym


class TestRoundtrip:
    @pytest.mark.parametrize(
        "opts",
        [
            {},
            {"subtract_green": True},
            {"cache_bits": 5},
            {"use_rle": True},
            {"use_rle": True, "use_plane_codes": True},
            {"subtract_green": True, "cache_bits": 3, "use_rle": True},
            {"color_transform": (30, 200, 5)},
            {"meta_bits": 2},
            {"subtract_green": True, "color_transform": (100, 50, 250),
             "predictor_bits": 2, "predictor_mode": 5},
        ],
    )
    def test_rgb(self, opts):
        img = rand_img(19, 23)
        out = decode_webp(encode_webp_lossless(img, **opts))
        assert np.array_equal(out, img), opts

    @pytest.mark.parametrize("mode", range(14))
    def test_every_predictor_mode(self, mode):
        img = rand_img(17, 11)
        out = decode_webp(
            encode_webp_lossless(img, predictor_bits=3, predictor_mode=mode)
        )
        assert np.array_equal(out, img)

    def test_rgba_preserved(self):
        img = rand_img(9, 7, 4)
        out = decode_webp(encode_webp_lossless(img))
        assert out.shape == (9, 7, 4)
        assert np.array_equal(out, img)

    def test_opaque_alpha_collapses_to_rgb(self):
        img = rand_img(5, 5, 4)
        img[..., 3] = 255
        out = decode_webp(encode_webp_lossless(img))
        assert out.shape == (5, 5, 3)
        assert np.array_equal(out, img[..., :3])

    @pytest.mark.parametrize("ncol", [2, 3, 4, 9, 16, 17, 200])
    def test_palette_all_packing_widths(self, ncol):
        pal = RNG.integers(0, 256, (ncol, 3), dtype=np.uint8)
        img = pal[RNG.integers(0, ncol, (11, 23))]
        out = decode_webp(encode_webp_lossless(img, palette=True))
        assert np.array_equal(out, img)

    def test_rle_flat_image_compresses(self):
        flat = np.full((64, 64, 3), 123, np.uint8)
        data = encode_webp_lossless(flat, use_rle=True)
        assert len(data) < 200  # backward refs actually used
        assert np.array_equal(decode_webp(data), flat)

    def test_single_pixel(self):
        img = np.array([[[1, 2, 3]]], np.uint8)
        assert np.array_equal(decode_webp(encode_webp_lossless(img)), img)

    def test_gradient_uses_many_codes(self):
        g = np.linspace(0, 255, 64, dtype=np.uint8)
        img = np.dstack([np.tile(g, (64, 1))] * 3)
        out = decode_webp(encode_webp_lossless(img, subtract_green=True))
        assert np.array_equal(out, img)


class TestContainer:
    def test_vp8x_extended_layout(self):
        img = rand_img(6, 8)
        stream = encode_vp8l_stream(img)
        vp8x = b"VP8X" + struct.pack("<I", 10) + bytes(10)
        vp8l = b"VP8L" + struct.pack("<I", len(stream)) + stream
        if len(stream) & 1:
            vp8l += b"\x00"
        body = b"WEBP" + vp8x + vp8l
        data = b"RIFF" + struct.pack("<I", len(body)) + body
        assert np.array_equal(decode_webp(data), img)

    def test_lossy_raises_not_implemented(self):
        body = b"WEBP" + b"VP8 " + struct.pack("<I", 8) + bytes(8)
        data = b"RIFF" + struct.pack("<I", len(body)) + body
        with pytest.raises(NotImplementedError, match="lossy"):
            decode_webp(data)

    def test_not_webp(self):
        with pytest.raises(ValueError, match="not a WebP"):
            decode_webp(b"RIFF\x08\x00\x00\x00WAVEdata")

    def test_oversized_header_rejected_before_alloc(self):
        bw_bits = (16383) | (16383 << 14)
        hdr = b"\x2f" + struct.pack("<I", bw_bits)
        with pytest.raises(ValueError, match="too large"):
            decode_vp8l_stream(hdr + bytes(64))


class TestFuzz:
    def test_byte_corruption_is_valueerror(self):
        """Flip bytes throughout valid streams: every failure mode must
        be ValueError (or a silent wrong image), never IndexError/
        KeyError/struct.error."""
        img = rand_img(13, 17)
        for opts in ({}, {"use_rle": True, "cache_bits": 4},
                     {"predictor_bits": 3}):
            base = bytearray(encode_webp_lossless(img, **opts))
            for pos in range(20, len(base), 3):
                for delta in (1, 0x80):
                    mut = bytearray(base)
                    mut[pos] = (mut[pos] + delta) & 0xFF
                    try:
                        decode_webp(bytes(mut))
                    except (ValueError, NotImplementedError):
                        pass
                    # silent wrong pixels are acceptable for payload
                    # corruption; wrong exception types are not

    def test_truncation_is_valueerror(self):
        data = encode_webp_lossless(rand_img(9, 9))
        for cut in range(12, len(data), 2):
            with pytest.raises(ValueError):
                decode_webp(data[:cut])


class TestTransformIntegration:
    def test_webp_to_jpg_conversion(self):
        from img2dataset_spark.functions.image import make_transform_fn
        from img2dataset_spark.functions.jpeg import decode_jpeg

        img = rand_img(16, 16)
        webp = encode_webp_lossless(img)
        fn = make_transform_fn(
            resize_mode="keep_ratio", image_size=8, encode_format="jpg"
        )
        out = fn(webp)
        assert out[5] is None
        assert out[1:5] == (8, 8, 16, 16)
        assert decode_jpeg(out[0]).shape == (8, 8, 3)

    def test_jpg_to_webp_conversion(self):
        from img2dataset_spark.functions.image import make_transform_fn
        from img2dataset_spark.functions.jpeg import encode_jpeg

        img = rand_img(12, 12)
        fn = make_transform_fn(resize_mode="no", encode_format="webp")
        out = fn(encode_jpeg(img, 90))
        assert out[5] is None
        got = decode_webp(out[0])
        assert got.shape == (12, 12, 3)

    def test_opaque_webp_to_webp_passthrough(self):
        from img2dataset_spark.functions.image import make_transform_fn

        webp = encode_webp_lossless(rand_img(8, 8))
        out = make_transform_fn(resize_mode="no", encode_format="webp")(webp)
        assert out[0] == webp and out[5] is None

    def test_alpha_webp_not_passed_through(self):
        from img2dataset_spark.functions.image import (
            _webp_has_alpha,
            make_transform_fn,
        )

        img = rand_img(8, 8, 4)
        img[..., 3] = 128
        webp = encode_webp_lossless(img)
        assert _webp_has_alpha(webp)
        out = make_transform_fn(resize_mode="no", encode_format="webp")(webp)
        assert out[0] != webp  # re-encoded (white-matted), not passed through

    def test_webp_resize_pixels(self):
        """Full pixel path: decode VP8L, resize, re-encode lossless —
        constant image stays constant through resampling."""
        from img2dataset_spark.functions.image import make_transform_fn

        img = np.full((32, 32, 3), 77, np.uint8)
        fn = make_transform_fn(
            resize_mode="keep_ratio", image_size=16, encode_format="webp"
        )
        out = fn(encode_webp_lossless(img))
        assert out[5] is None
        got = decode_webp(out[0])
        assert got.shape == (16, 16, 3)
        assert (got == 77).all()

    def test_image_features_on_webp(self):
        from img2dataset_spark.functions.multimodal import image_pixel_features

        img = np.full((10, 10, 3), 200, np.uint8)
        feat = image_pixel_features(encode_webp_lossless(img))
        assert feat[6] is None
        assert feat[:3] == (10, 10, 3)
        assert feat[3] == 200.0


import importlib.util

@pytest.mark.skipif(
    importlib.util.find_spec("PIL") is None, reason="PIL not installed"
)
class TestPilParity:  # pragma: no cover
    def test_pil_decodes_our_streams(self):
        import io

        from PIL import Image

        img = rand_img(15, 21)
        for opts in ({}, {"subtract_green": True}, {"use_rle": True}):
            data = encode_webp_lossless(img, **opts)
            got = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
            assert np.array_equal(got, img), opts

    def test_we_decode_pil_streams(self):
        import io

        from PIL import Image

        img = rand_img(14, 10)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="WEBP", lossless=True)
        got = decode_webp(buf.getvalue())
        assert np.array_equal(got, img)
