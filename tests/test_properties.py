"""Property-based tests (hypothesis) over the pure kernels: codecs,
geometry, resampling weights, and hashes.  These cover input shapes the
example-based tests can't enumerate."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from img2dataset_spark.functions.image import resize_geometry
from img2dataset_spark.functions.png import decode_png, encode_png
from img2dataset_spark.functions.resample import _axis_weights, resize

dims = st.integers(min_value=1, max_value=24)


class TestPngCodec:
    @settings(max_examples=40, deadline=None)
    @given(
        w=dims, h=dims,
        nch=st.sampled_from([1, 2, 3, 4]),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_roundtrip_any_shape(self, w, h, nch, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, nch), dtype=np.uint8)
        out = decode_png(encode_png(img))
        if nch == 1:
            assert np.array_equal(out, img[:, :, 0])
        else:
            assert np.array_equal(out, img)

    @settings(max_examples=20, deadline=None)
    @given(data=st.binary(min_size=0, max_size=64))
    def test_garbage_never_crashes_silently(self, data):
        try:
            decode_png(data)
        except ValueError:
            pass  # the only acceptable failure mode
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"unexpected {type(e).__name__}") from e


class TestJpegCodec:
    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 40), h=st.integers(1, 40),
        quality=st.integers(50, 100),
        sub=st.sampled_from(["420", "444"]),
        gray=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_roundtrip_any_shape(self, w, h, quality, sub, gray, seed):
        """Smooth content must survive encode->decode at any size,
        quality, subsampling, and channel count: exact shape back,
        bounded error (JPEG is lossy, but a correct codec's error on a
        CONSTANT image is a couple of levels, not garbage)."""
        from img2dataset_spark.functions.jpeg import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(seed)
        base = int(rng.integers(30, 226))
        shape = (h, w) if gray else (h, w, 3)
        img = np.full(shape, base, dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img, quality, subsampling=sub))
        assert dec.shape == shape
        assert np.abs(dec.astype(int) - base).max() <= 3

    @settings(max_examples=20, deadline=None)
    @given(data=st.binary(min_size=0, max_size=96))
    def test_garbage_never_crashes_silently(self, data):
        from img2dataset_spark.functions.jpeg import decode_jpeg

        try:
            decode_jpeg(b"\xff\xd8" + data)
        except ValueError:
            pass  # the only acceptable failure mode
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"unexpected {type(e).__name__}") from e


class TestGifCodec:
    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 24), h=st.integers(1, 24),
        ncol=st.integers(2, 4),
        interlaced=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_roundtrip_any_shape(self, w, h, ncol, interlaced, seed):
        from img2dataset_spark.functions.gif import decode_gif
        from tests.test_gif import make_gif

        rng = np.random.default_rng(seed)
        palette = [tuple(int(x) for x in rng.integers(0, 256, 3))
                   for _ in range(ncol)]
        grid = rng.integers(0, ncol, (h, w)).astype(np.uint8)
        arr = decode_gif(make_gif(grid, palette, interlaced=interlaced))
        assert arr.shape == (h, w, 3)
        expect = np.array(palette, dtype=np.uint8)[grid]
        assert np.array_equal(arr, expect)

    @settings(max_examples=20, deadline=None)
    @given(data=st.binary(min_size=0, max_size=96))
    def test_garbage_never_crashes_silently(self, data):
        from img2dataset_spark.functions.gif import decode_gif

        try:
            decode_gif(b"GIF89a" + data)
        except ValueError:
            pass
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"unexpected {type(e).__name__}") from e


class TestResampleWeights:
    @settings(max_examples=60, deadline=None)
    @given(
        n_in=st.integers(1, 40), n_out=st.integers(1, 40),
        mode=st.sampled_from(["nearest", "bilinear", "cubic", "lanczos4", "area"]),
    )
    def test_partition_of_unity(self, n_in, n_out, mode):
        W = _axis_weights(n_in, n_out, mode)
        assert W.shape == (n_out, n_in)
        assert np.allclose(W.sum(axis=1), 1.0)

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(1, 16), h=st.integers(1, 16),
        ow=st.integers(1, 16), oh=st.integers(1, 16),
        v=st.integers(0, 255),
        mode=st.sampled_from(["nearest", "bilinear", "cubic", "lanczos4", "area"]),
    )
    def test_constant_image_invariant(self, w, h, ow, oh, v, mode):
        img = np.full((h, w, 3), v, dtype=np.uint8)
        out = resize(img, ow, oh, mode)
        assert out.shape == (oh, ow, 3)
        assert (out == v).all()  # partition of unity => constants preserved


class TestResizeGeometry:
    @settings(max_examples=100, deadline=None)
    @given(
        w=st.integers(1, 10_000), h=st.integers(1, 10_000),
        size=st.integers(1, 4096),
        mode=st.sampled_from(
            ["no", "keep_ratio", "keep_ratio_largest", "center_crop", "border"]
        ),
        bigger=st.booleans(),
    )
    def test_bounds_and_modes(self, w, h, size, mode, bigger):
        nw, nh = resize_geometry(w, h, mode, size, bigger)
        assert nw >= 1 and nh >= 1
        if mode == "no":
            assert (nw, nh) == (w, h)
        if mode == "border" and not (bigger and max(w, h) <= size):
            assert (nw, nh) == (size, size)
        if mode == "center_crop" and not (bigger and min(w, h) <= size):
            assert max(nw, nh) <= size  # crop never exceeds the target box
        if mode == "keep_ratio_largest" and not (bigger and max(w, h) <= size):
            assert max(nw, nh) == size
        if bigger and mode != "no":
            controlling = min(w, h) if mode in ("keep_ratio", "center_crop") else max(w, h)
            if controlling <= size:
                assert (nw, nh) == (w, h)  # only_if_bigger passthrough

    @settings(max_examples=60, deadline=None)
    @given(w=st.integers(2, 10_000), h=st.integers(2, 10_000), size=st.integers(1, 4096))
    def test_keep_ratio_preserves_aspect(self, w, h, size):
        nw, nh = resize_geometry(w, h, "keep_ratio", size, False)
        assert min(nw, nh) in (size, size + 1) or min(w, h) == 1
        # aspect preserved within rounding of 1 pixel on the scaled side
        scale = size / min(w, h)
        assert abs(nw - w * scale) <= 0.5 + 1e-9
        assert abs(nh - h * scale) <= 0.5 + 1e-9


class TestTfrecordRoundtrip:
    @settings(max_examples=40, deadline=None)
    @given(
        feats=st.dictionaries(
            st.text(alphabet="abcdefgh_", min_size=1, max_size=8),
            st.one_of(
                st.binary(max_size=16),
                st.integers(min_value=-(2**62), max_value=2**62),
                st.text(max_size=12),
            ),
            min_size=1, max_size=5,
        )
    )
    def test_map_entries_decode(self, feats):
        from img2dataset_spark.sinks.tfrecord import encode_example
        from tests.test_functions import TestTfrecord

        ex = encode_example(feats)
        (outer,) = list(TestTfrecord._pb_fields(ex))
        names = []
        for _, _, entry in TestTfrecord._pb_fields(outer[2]):
            fields = list(TestTfrecord._pb_fields(entry))
            assert [f[0] for f in fields] == [1, 2]
            names.append(fields[0][2].decode())
        assert sorted(names) == sorted(feats)


class TestRollingHash:
    @settings(max_examples=60, deadline=None)
    @given(s=st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40))
    def test_matches_direct_horner(self, s):
        """The Spark expression implements h = fold((acc*B + code) % M);
        reimplement directly and compare via the same normalization."""
        import re

        from img2dataset_spark.functions.text import ROLLING_BASE, ROLLING_MOD

        norm = re.sub(r"\s+", " ", s.strip().lower())
        h = 0
        for ch in norm:
            h = (h * ROLLING_BASE + ord(ch)) % ROLLING_MOD
        assert 0 <= h < ROLLING_MOD
        # associativity-free: prefix property h(s+c) = (h(s)*B + c) % M
        if norm:
            h_prefix = 0
            for ch in norm[:-1]:
                h_prefix = (h_prefix * ROLLING_BASE + ord(ch)) % ROLLING_MOD
            assert h == (h_prefix * ROLLING_BASE + ord(norm[-1])) % ROLLING_MOD


class TestExifRatioRendering:
    """_fmt_ratio must agree with exifread's Ratio (a Fraction subclass
    whose str() is the reduced fraction, or the plain numerator when the
    reduced denominator is 1)."""

    @given(
        num=st.integers(min_value=-(2**31), max_value=2**32 - 1),
        den=st.integers(min_value=1, max_value=2**32 - 1),
    )
    @settings(max_examples=300, deadline=None)
    def test_matches_fraction_str(self, num, den):
        from fractions import Fraction

        from img2dataset_spark.functions.exif import _fmt_ratio

        f = Fraction(num, den)
        want = str(f.numerator) if f.denominator == 1 else f"{f.numerator}/{f.denominator}"
        assert _fmt_ratio(num, den) == want

    @given(num=st.integers(min_value=-(2**31), max_value=2**32 - 1))
    @settings(max_examples=50, deadline=None)
    def test_zero_denominator_is_verbatim(self, num):
        from img2dataset_spark.functions.exif import _fmt_ratio

        assert _fmt_ratio(num, 0) == f"{num}/0"


class TestUrlCanonicalProperties:
    """Structural properties of functions/url.py over a seeded grammar
    sweep — ONE Spark job per property (per-example jobs would make
    hypothesis impractically slow for Column expressions)."""

    @staticmethod
    def _urls(n=400):
        import hashlib

        schemes = ["http", "HTTP", "https", "HtTpS", ""]
        hosts = ["Example.COM", "img.site", "WWW.Photos.NET", "a.b.c.d"]
        ports = ["", ":80", ":443", ":8080"]
        paths = ["", "/", "/a/b.jpg", "/X/Y/z.PNG", "/p%20q"]
        queries = ["", "?b=2&a=1", "?utm_source=m", "?a=1&utm_x=2&b=2",
                   "?gclid=z", "?ref=r&refine=3", "?a=&=x&&b=1"]
        frags = ["", "#f", "#a=1"]
        out = []
        for i in range(n):
            h = int(hashlib.md5(f"u:{i}".encode()).hexdigest()[:10], 16)
            sch = schemes[h % len(schemes)]; h //= len(schemes)
            host = hosts[h % len(hosts)]; h //= len(hosts)
            port = ports[h % len(ports)]; h //= len(ports)
            path = paths[h % len(paths)]; h //= len(paths)
            q = queries[h % len(queries)]; h //= len(queries)
            fr = frags[h % len(frags)]
            pre = f"{sch}://" if sch else ""
            out.append(f"{pre}{host}{port}{path}{q}{fr}")
        return out

    def test_idempotent_and_structural(self, spark):
        from pyspark.sql import functions as F

        from img2dataset_spark.functions.url import canonical_url

        urls = self._urls()
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        rows = df.select(
            "url",
            canonical_url(F.col("url")).alias("c1"),
            canonical_url(canonical_url(F.col("url"))).alias("c2"),
        ).collect()
        for r in rows:
            # the defining canonicalizer property: a fixed point
            assert r["c1"] == r["c2"], (r["url"], r["c1"], r["c2"])
            assert r["c1"] is not None
            # no fragment ever survives (any input class)
            assert "#" not in r["c1"]
            if "://" not in r["url"]:
                continue  # schemeless: pass-through minus fragment
            # with a scheme: no tracking param survives, params sorted
            assert "utm_" not in r["c1"] and "gclid" not in r["c1"]
            if "?" in r["c1"]:
                params = r["c1"].split("?", 1)[1].split("&")
                assert params == sorted(params) and all(params)


class TestSubstringSpanProperties:
    def test_span_invariants_on_seeded_corpus(self, spark):
        """Spans are in-range, ≥ k tokens, per-doc non-overlapping, and
        MAXIMAL (consecutive spans separated by > k-1 positions — else
        the islands merge would have joined them)."""
        import hashlib

        from pyspark.sql import functions as F

        from img2dataset_spark.functions.text import token_count
        from img2dataset_spark.operators.substring import duplicated_spans

        words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
                 "theta", "iota", "kappa"]
        docs = []
        for i in range(120):
            h = int(hashlib.md5(f"d:{i}".encode()).hexdigest(), 16)
            n = 5 + h % 40
            toks = []
            for j in range(n):
                toks.append(words[(h >> (j % 48)) % len(words)])
            docs.append((i, " ".join(toks)))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        k = 5
        spans = duplicated_spans(df, k=k).collect()
        totals = {
            r["doc_id"]: r["n"]
            for r in df.select(
                "doc_id", token_count(F.col("text")).alias("n")
            ).collect()
        }
        per_doc: dict[int, list] = {}
        for r in spans:
            assert r["span_tokens"] == r["span_end"] - r["span_start"] >= k
            assert 0 <= r["span_start"] < r["span_end"] <= totals[r["doc_id"]]
            per_doc.setdefault(r["doc_id"], []).append(
                (r["span_start"], r["span_end"])
            )
        assert per_doc, "seeded corpus produced no duplicated spans"
        for doc, ss in per_doc.items():
            ss.sort()
            for (s1, e1), (s2, e2) in zip(ss, ss[1:]):
                assert s2 >= e1, (doc, ss)  # non-overlapping
                # maximality: start-gram gap > k-1 (merge condition)
                assert s2 - (e1 - k) > k - 1, (doc, ss)
