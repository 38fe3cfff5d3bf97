"""T9 bbox blur (pure-numpy Gaussian) + A3/W7 streaming progress."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from img2dataset_spark.functions.blur import (
    blur_bboxes,
    gaussian_blur,
    gaussian_kernel_1d,
)


class TestGaussian:
    def test_kernel_normalized_symmetric(self):
        k = gaussian_kernel_1d(9, 1.5)
        assert k.shape == (9,)
        assert abs(k.sum() - 1.0) < 1e-6
        assert np.allclose(k, k[::-1])
        assert k[4] == k.max()

    def test_blur_preserves_constant_image(self):
        img = np.full((16, 16, 3), 128.0, dtype=np.float32)
        out = gaussian_blur(img, 7, 1.2)
        assert np.allclose(out, 128.0, atol=1e-3)

    def test_blur_smooths_impulse(self):
        img = np.zeros((21, 21), dtype=np.float32)
        img[10, 10] = 1.0
        out = gaussian_blur(img, 7, 1.0)
        assert abs(out.sum() - 1.0) < 1e-5  # energy preserved
        assert out[10, 10] < 1.0 and out[10, 10] == out.max()
        assert out[10, 9] == pytest.approx(out[10, 11])
        assert out[9, 10] == pytest.approx(out[11, 10])


class TestBboxBlur:
    def _img(self):
        rng = np.random.RandomState(7)
        return rng.randint(0, 256, size=(64, 80, 3), dtype=np.uint8)

    def test_no_bboxes_passthrough(self):
        img = self._img()
        assert blur_bboxes(img, []) is img

    def test_blur_changes_box_keeps_far_field(self):
        img = self._img()
        out = blur_bboxes(img, [[0.25, 0.25, 0.5, 0.5]])
        assert out.shape == img.shape and out.dtype == np.uint8
        box = (slice(18, 30), slice(22, 38))
        assert not np.array_equal(out[box], img[box])  # blurred inside
        # far corner untouched (mask + its blur never reaches it)
        assert np.array_equal(out[:4, 64:], img[:4, 64:])

    def test_deterministic(self):
        img = self._img()
        a = blur_bboxes(img, [[0.1, 0.1, 0.4, 0.6]])
        b = blur_bboxes(img.copy(), [[0.1, 0.1, 0.4, 0.6]])
        assert np.array_equal(a, b)

    def test_multiple_boxes_union(self):
        img = self._img()
        both = blur_bboxes(img, [[0.0, 0.0, 0.2, 0.2], [0.7, 0.7, 1.0, 1.0]])
        tl = blur_bboxes(img, [[0.0, 0.0, 0.2, 0.2]])
        assert not np.array_equal(both, tl)


class TestPipelineBlurWiring:
    def test_mock_pipeline_with_bboxes(self, spark, tmp_path):
        from img2dataset_spark import PipelineConfig, build_pipeline
        from img2dataset_spark.functions.fetch import mock_payload
        from img2dataset_spark.functions.image import (
            mock_blur,
            mock_decode_dims,
            mock_encode,
            resize_geometry,
        )

        urls = [f"http://fixture.local/img/{i}.jpg" for i in range(6)]
        boxes = [[[0.1, 0.1, 0.5, 0.5]] if i % 2 == 0 else [] for i in range(6)]
        p = str(tmp_path / "in.parquet")
        pd.DataFrame({"url": urls, "bboxes": boxes}).to_parquet(p)
        cfg = PipelineConfig(
            url_list=p, input_format="parquet", bbox_col="bboxes",
            fetch_mode="mock", resize_mode="border", image_size=128,
            compute_hash=None,
        )
        df = build_pipeline(spark, cfg)
        assert "bboxes" in df.columns  # bbox col rides along in metadata
        rows = {r["url"]: r for r in df.collect()}
        for i, u in enumerate(urls):
            r = rows[u]
            assert r["status"] == "success"
            raw = mock_payload(u)
            w, h = mock_decode_dims(raw)
            nw, nh = resize_geometry(w, h, "border", 128, False)
            expect = raw if (nw, nh) == (w, h) else mock_encode(raw, nw, nh)
            if i % 2 == 0:
                expect = mock_blur(expect, 1)
            assert bytes(r["jpg"]) == expect


class TestStreamingProgress:
    def test_progress_over_stats_stream(self, spark, tmp_path):
        from img2dataset_spark import PipelineConfig, download
        from img2dataset_spark.streaming import start_progress_stream

        urls = [f"http://fixture.local/img/{i}.jpg" for i in range(25)] + [
            "http://fixture.local/missing/x.jpg"
        ]
        p = str(tmp_path / "in.parquet")
        pd.DataFrame({"url": urls}).to_parquet(p)
        out = str(tmp_path / "out")
        cfg = PipelineConfig(
            url_list=p, input_format="parquet", output_folder=out,
            output_format="dummy", number_sample_per_shard=10, fetch_mode="mock",
        )
        download(cfg, spark=spark)
        assert len([f for f in os.listdir(out) if f.endswith("_stats.json")]) == 3

        q = start_progress_stream(
            spark, out, str(tmp_path / "ckpt"), query_name="t_progress",
            available_now=True,
        )
        q.awaitTermination(120)
        row = spark.table("t_progress").collect()[0]
        assert row["shards_done"] == 3
        assert row["total"] == 26
        assert row["successes"] == 25
        assert row["failed_to_download"] == 1
        assert row["success_rate"] == pytest.approx(25 / 26)
        assert row["samples_per_second"] is None or row["samples_per_second"] > 0
