"""Unit tests for pure functions: header parsing, resize geometry,
filters, robots directives, tfrecord encoding, exif parsing.
Mirrors the reference's operator-unit layer (SURVEY §5.4)."""

from __future__ import annotations

import struct
import zlib

import pytest

from img2dataset_spark.functions.fetch import parse_robots_directives
from img2dataset_spark.functions.image import (
    ERR_AREA_TOO_BIG,
    ERR_ASPECT_TOO_BIG,
    ERR_TOO_SMALL,
    check_filters,
    mock_decode_dims,
    parse_dimensions,
    resize_geometry,
)
from img2dataset_spark.sinks.tfrecord import crc32c, encode_example, write_tfrecord
from tests.conftest import make_png


class TestParseDimensions:
    def test_png(self):
        assert parse_dimensions(make_png(320, 240)) == (320, 240)

    def test_gif(self):
        data = b"GIF89a" + struct.pack("<HH", 640, 480) + b"\x00" * 100
        assert parse_dimensions(data) == (640, 480)

    def test_bmp(self):
        hdr = b"BM" + b"\x00" * 16 + struct.pack("<ii", 800, -600) + b"\x00" * 40
        assert parse_dimensions(hdr) == (800, 600)

    def test_jpeg_sof0(self):
        # SOI + APP0 stub + SOF0 with h=100 w=200
        app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"\x00\x00"
        sof = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(
            ">HH", 100, 200
        ) + b"\x03\x00\x00\x00"
        assert parse_dimensions(b"\xff\xd8" + app0 + sof) == (200, 100)

    def test_webp_vp8l(self):
        bits = (511 - 1) | ((255 - 1) << 14)
        data = (
            b"RIFF" + b"\x00" * 4 + b"WEBP" + b"VP8L" + b"\x00" * 4
            + b"\x2f" + struct.pack("<I", bits) + b"\x00" * 10
        )
        assert parse_dimensions(data) == (511, 255)

    def test_garbage(self):
        assert parse_dimensions(b"not an image at all") is None
        assert parse_dimensions(b"") is None
        assert parse_dimensions(None) is None


class TestResizeGeometry:
    def test_no(self):
        assert resize_geometry(1000, 500, "no", 256, False) == (1000, 500)

    def test_keep_ratio(self):
        # smallest side -> 256
        assert resize_geometry(1000, 500, "keep_ratio", 256, False) == (512, 256)

    def test_keep_ratio_largest(self):
        assert resize_geometry(1000, 500, "keep_ratio_largest", 256, False) == (256, 128)

    def test_center_crop(self):
        assert resize_geometry(1000, 500, "center_crop", 256, False) == (256, 256)

    def test_border(self):
        assert resize_geometry(1000, 500, "border", 256, False) == (256, 256)

    def test_only_if_bigger_skips_small(self):
        assert resize_geometry(100, 80, "keep_ratio", 256, True) == (100, 80)
        assert resize_geometry(100, 80, "border", 256, True) == (100, 80)

    def test_only_if_bigger_resizes_big(self):
        assert resize_geometry(1000, 500, "keep_ratio", 256, True) == (512, 256)

    def test_upscale(self):
        assert resize_geometry(100, 50, "keep_ratio", 256, False) == (512, 256)

    def test_rounding_half(self):
        # 333 * (256/200) = 426.24 -> 426 ; floor(x+0.5) semantics
        assert resize_geometry(333, 200, "keep_ratio", 256, False) == (426, 256)


class TestCheckFilters:
    def test_too_small(self):
        assert check_filters(100, 300, 150, float("inf"), float("inf")) == ERR_TOO_SMALL

    def test_area(self):
        assert check_filters(2000, 2000, 0, 1e6, float("inf")) == ERR_AREA_TOO_BIG

    def test_aspect(self):
        assert check_filters(1000, 100, 0, float("inf"), 4.0) == ERR_ASPECT_TOO_BIG

    def test_pass(self):
        assert check_filters(500, 400, 100, 1e6, 2.0) is None

    def test_order_small_before_area(self):
        # both violated -> "too small" wins (resizer.py:161-168 order)
        assert check_filters(10, 10, 100, 50, 1.0) == ERR_TOO_SMALL


class TestRobotsDirectives:
    def test_global(self):
        assert parse_robots_directives("noai, noindex", None) == {"noai", "noindex"}

    def test_ua_scoped_matches(self):
        assert parse_robots_directives("mybot: noai", "mybot") == {"noai"}

    def test_ua_scoped_other_bot(self):
        assert parse_robots_directives("otherbot: noai", "mybot") == set()

    def test_unavailable_after_ignored(self):
        assert parse_robots_directives("unavailable_after: 2030-01-01", "mybot") == set()

    def test_mixed(self):
        got = parse_robots_directives("noindex, mybot: noai", "mybot")
        assert got == {"noindex", "noai"}


class TestTfrecord:
    def test_crc32c_known_vector(self):
        # public test vector: crc32c of 32 zero bytes
        assert crc32c(b"\x00" * 32) == 0x8A9136AA
        assert crc32c(b"123456789") == 0xE3069283

    def test_example_roundtrip_framing(self, tmp_path):
        path = str(tmp_path / "x.tfrecord")
        write_tfrecord(
            path,
            [
                {"key": "0001", "jpg": b"\x01\x02", "width": 32, "score": 0.5,
                 "labels": [1, 2, 3]},
            ],
        )
        raw = open(path, "rb").read()
        (length,) = struct.unpack("<Q", raw[:8])
        payload = raw[12 : 12 + length]
        assert len(raw) == 8 + 4 + length + 4
        # protobuf: field 1 (features), length-delimited
        assert payload[0] == 0x0A
        assert b"key" in payload and b"jpg" in payload and b"labels" in payload

    def test_example_deterministic(self):
        a = encode_example({"b": 1, "a": "x"})
        b = encode_example({"a": "x", "b": 1})
        assert a == b  # sorted feature order

    @staticmethod
    def _pb_fields(buf):
        """Minimal protobuf walker: yield (field_no, wire_type, value)."""
        i = 0
        while i < len(buf):
            tag = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                tag |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            field_no, wire = tag >> 3, tag & 7
            if wire == 2:  # length-delimited
                ln = 0
                shift = 0
                while True:
                    b = buf[i]
                    i += 1
                    ln |= (b & 0x7F) << shift
                    shift += 7
                    if not b & 0x80:
                        break
                yield field_no, wire, buf[i : i + ln]
                i += ln
            elif wire == 0:  # varint
                v = 0
                shift = 0
                while True:
                    b = buf[i]
                    i += 1
                    v |= (b & 0x7F) << shift
                    shift += 7
                    if not b & 0x80:
                        break
                yield field_no, wire, v
            else:
                raise AssertionError(f"unexpected wire type {wire}")

    def test_example_decodes_as_map_entries(self):
        """Map entries must carry key as field 1 and the Feature message
        as field 2 — a spliced Feature shows up as fields [1,1] or [1,3]
        and TF would mis-parse every record."""
        ex = encode_example({"jpg": b"\xff\xd8", "width": 32, "score": 0.5})
        (outer,) = list(self._pb_fields(ex))
        assert outer[0] == 1  # Example.features
        entries = {}
        for fno, _, entry in self._pb_fields(outer[2]):
            assert fno == 1  # Features.feature map entry
            fields = list(self._pb_fields(entry))
            assert [f[0] for f in fields] == [1, 2], (
                "map entry must be [key=1, value=2], got "
                f"{[f[0] for f in fields]}"
            )
            entries[fields[0][2].decode()] = fields[1][2]
        assert set(entries) == {"jpg", "width", "score"}
        # jpg -> Feature{bytes_list=1{value=1}}
        (bl,) = list(self._pb_fields(entries["jpg"]))
        assert bl[0] == 1
        (bv,) = list(self._pb_fields(bl[2]))
        assert bv[0] == 1 and bv[2] == b"\xff\xd8"
        # width -> Feature{int64_list=3{packed value=1}}
        (il,) = list(self._pb_fields(entries["width"]))
        assert il[0] == 3
        (iv,) = list(self._pb_fields(il[2]))
        assert iv[0] == 1 and iv[2] == b"\x20"  # varint 32, packed
        # score -> Feature{float_list=2}
        (fl,) = list(self._pb_fields(entries["score"]))
        assert fl[0] == 2


class TestMockDecode:
    def test_deterministic(self):
        from img2dataset_spark.functions.fetch import mock_payload

        p = mock_payload("http://x/1.jpg")
        assert len(p) == 256
        w, h = mock_decode_dims(p)
        assert 64 <= w <= 2048 and 64 <= h <= 2048
        assert mock_decode_dims(p) == (w, h)


class TestExif:
    def test_synthetic_exif_jpeg(self):
        from img2dataset_spark.functions.exif import extract_exif_json
        import json

        # build JPEG with APP1/EXIF: IFD0 with Make tag (0x010F), ASCII "Test\0"
        tiff = (
            b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
            + struct.pack("<H", 1)                       # 1 entry
            + struct.pack("<HHII", 0x010F, 2, 5, 26)     # Make, ASCII, len 5, offset
            + struct.pack("<I", 0)                       # next IFD
            + b"Test\x00"
        )
        exif_seg = b"Exif\x00\x00" + tiff
        app1 = b"\xff\xe1" + struct.pack(">H", len(exif_seg) + 2) + exif_seg
        data = b"\xff\xd8" + app1 + b"\xff\xd9"
        out = json.loads(extract_exif_json(data))
        assert out == {"Image Make": "Test"}

    def test_non_jpeg(self):
        from img2dataset_spark.functions.exif import extract_exif_json

        assert extract_exif_json(b"\x89PNG") == "{}"
        assert extract_exif_json(None) == "{}"

    def test_descriptive_enum_renderings(self):
        import json

        from img2dataset_spark.functions.exif import extract_exif_json

        # IFD0: Orientation=6 (SHORT) + ResolutionUnit=2 (SHORT)
        tiff = (
            b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
            + struct.pack("<H", 2)
            + struct.pack("<HHIHH", 0x0112, 3, 1, 6, 0)
            + struct.pack("<HHIHH", 0x0128, 3, 1, 2, 0)
            + struct.pack("<I", 0)
        )
        exif_seg = b"Exif\x00\x00" + tiff
        app1 = b"\xff\xe1" + struct.pack(">H", len(exif_seg) + 2) + exif_seg
        out = json.loads(extract_exif_json(b"\xff\xd8" + app1 + b"\xff\xd9"))
        assert out == {
            "Image Orientation": "Rotated 90 CW",
            "Image ResolutionUnit": "Pixels/Inch",
        }

    def test_unmapped_enum_stays_numeric(self):
        import json

        from img2dataset_spark.functions.exif import extract_exif_json

        # Orientation=99: outside the spec enum -> numeric fallback
        tiff = (
            b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
            + struct.pack("<H", 1)
            + struct.pack("<HHIHH", 0x0112, 3, 1, 99, 0)
            + struct.pack("<I", 0)
        )
        exif_seg = b"Exif\x00\x00" + tiff
        app1 = b"\xff\xe1" + struct.pack(">H", len(exif_seg) + 2) + exif_seg
        out = json.loads(extract_exif_json(b"\xff\xd8" + app1 + b"\xff\xd9"))
        assert out == {"Image Orientation": "99"}

    @staticmethod
    def _jpeg_with_tiff(tiff: bytes) -> bytes:
        exif_seg = b"Exif\x00\x00" + tiff
        app1 = b"\xff\xe1" + struct.pack(">H", len(exif_seg) + 2) + exif_seg
        return b"\xff\xd8" + app1 + b"\xff\xd9"

    def test_exif_sub_ifd_short_rational_gps(self):
        """EXIF sub-IFD (0x8769 pointer) + GPS IFD (0x8825): SHORT,
        RATIONAL (incl. multi-value), SRATIONAL, and the N/1 -> N
        rendering."""
        import json

        from img2dataset_spark.functions.exif import extract_exif_json

        # layout (little endian): header(8) | IFD0 @8 (42 B) |
        # EXIF IFD @50 (30 B) | GPS IFD @100 (30 B) | value area @130
        ifd0 = (
            struct.pack("<H", 3)
            + struct.pack("<HHIHxx", 0x0112, 3, 1, 6)   # Orientation SHORT=6 inline
            + struct.pack("<HHII", 0x8769, 4, 1, 50)    # EXIF IFD pointer
            + struct.pack("<HHII", 0x8825, 4, 1, 100)   # GPS IFD pointer
            + struct.pack("<I", 0)
        )
        exif_ifd = (
            struct.pack("<H", 2)
            + struct.pack("<HHII", 0x829A, 5, 1, 130)    # ExposureTime 1/200
            + struct.pack("<HHII", 0x9204, 10, 1, 138)   # ExposureBias -1/3
            + struct.pack("<I", 0)
        )
        gps_ifd = (
            struct.pack("<H", 2)
            + struct.pack("<HHII", 0x0002, 5, 3, 146)    # GPSLatitude 3 rationals
            + struct.pack("<HHI", 0x0001, 2, 2) + b"N\x00\x00\x00"  # LatitudeRef inline
            + struct.pack("<I", 0)
        )
        header = b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
        assert len(header + ifd0) == 50 and len(exif_ifd) == 30 and len(gps_ifd) == 30
        tiff = bytearray(200)
        tiff[0:8] = header
        tiff[8 : 8 + len(ifd0)] = ifd0
        tiff[50 : 50 + len(exif_ifd)] = exif_ifd
        tiff[100 : 100 + len(gps_ifd)] = gps_ifd
        tiff[130:138] = struct.pack("<II", 1, 200)        # 1/200
        tiff[138:146] = struct.pack("<ii", -1, 3)         # -1/3
        tiff[146:170] = struct.pack("<IIIIII", 40, 1, 26, 1, 30, 1)  # 40,26,30 deg/min/sec
        out = json.loads(extract_exif_json(self._jpeg_with_tiff(bytes(tiff))))
        assert out["Image Orientation"] == "Rotated 90 CW"
        assert out["EXIF ExposureTime"] == "1/200"
        assert out["EXIF ExposureBiasValue"] == "-1/3"
        assert out["GPS GPSLatitudeRef"] == "N"
        assert out["GPS GPSLatitude"] == "[40, 26, 30]"   # N/1 prints as N

    def test_big_endian_tiff(self):
        import json

        from img2dataset_spark.functions.exif import extract_exif_json

        tiff = (
            b"MM" + struct.pack(">H", 42) + struct.pack(">I", 8)
            + struct.pack(">H", 1)
            + struct.pack(">HHIHxx", 0x0112, 3, 1, 3)
            + struct.pack(">I", 0)
        )
        out = json.loads(extract_exif_json(self._jpeg_with_tiff(tiff)))
        assert out == {"Image Orientation": "Rotated 180"}


class TestReencodeGate:
    """Reference resizer.py:148: encode_needed = (detected != what_ext) if
    skip_reencode else True — a png input must never pass through into a
    jpg-named payload column."""

    def _fn(self, **kw):
        from img2dataset_spark.functions.image import make_transform_fn

        return make_transform_fn(resize_mode="no", encode_format="jpg", **kw)

    def test_png_to_jpg_really_converts_default(self):
        from img2dataset_spark.functions.jpeg import decode_jpeg

        png = make_png(32, 16)
        out = self._fn()(png)
        # real png -> jpg conversion via the dependency-free codecs:
        # output must be actual JPEG bytes with the same dims, never
        # PNG bytes mislabeled as jpg
        assert out[5] is None
        assert out[0][:2] == b"\xff\xd8"
        assert decode_jpeg(out[0]).shape[:2] == (16, 32)
        assert out[1:5] == (32, 16, 32, 16)

    def test_png_to_jpg_really_converts_skip_reencode(self):
        png = make_png(32, 16)
        out = self._fn(skip_reencode=True)(png)
        assert out[5] is None
        assert out[0][:2] == b"\xff\xd8"

    def test_jpg_to_jpg_skip_reencode_passthrough(self):
        jpg = (b"\xff\xd8\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
               b"\xff\xc0\x00\x11\x08\x00\x10\x00\x20\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
               b"\xff\xd9")
        out = self._fn(skip_reencode=True)(jpg)
        assert out[0] == jpg  # identical bytes, skip path
        assert out[1:5] == (32, 16, 32, 16)
        assert out[5] is None

    def test_png_to_png_passthrough(self):
        from img2dataset_spark.functions.image import make_transform_fn

        png = make_png(8, 8)
        out = make_transform_fn(resize_mode="no", encode_format="png")(png)
        assert out[0] == png
        assert out[5] is None

    def test_detect_format(self):
        from img2dataset_spark.functions.image import detect_format

        assert detect_format(make_png(4, 4)) == "png"
        assert detect_format(b"\xff\xd8" + b"\x00" * 16) == "jpeg"
        assert detect_format(b"GIF89a" + b"\x00" * 8) == "gif"
        assert detect_format(b"RIFF\x00\x00\x00\x00WEBPVP8 ") == "webp"
        assert detect_format(b"garbage bytes!") is None


class TestUserAgent:
    def test_always_present_without_token(self):
        from img2dataset_spark.functions.fetch import build_user_agent

        ua = build_user_agent(None)
        assert ua.startswith("Mozilla/5.0")
        assert "compatible" not in ua

    def test_token_appended(self):
        from img2dataset_spark.functions.fetch import build_user_agent

        ua = build_user_agent("img2dataset")
        assert ua.startswith("Mozilla/5.0")
        assert "(compatible; img2dataset; +https://github.com/rom1504/img2dataset)" in ua

    def test_header_sent_on_real_request(self):
        import http.server
        import threading

        from img2dataset_spark.functions.fetch import _fetch_one, build_user_agent

        seen = {}

        class H(http.server.BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802
                seen["ua"] = self.headers.get("User-Agent")
                self.send_response(200)
                self.send_header("Content-Length", "2")
                self.end_headers()
                self.wfile.write(b"ok")

            def log_message(self, *a):  # silence
                pass

        srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            data, err = _fetch_one(
                f"http://127.0.0.1:{srv.server_address[1]}/x.jpg",
                timeout=5,
                user_agent_string=build_user_agent(None),
                user_agent_token=None,
                disallowed=frozenset(),
                ignore_ssl_certificate=False,
            )
        finally:
            srv.shutdown()
        assert err is None and data == b"ok"
        assert seen["ua"].startswith("Mozilla/5.0")
