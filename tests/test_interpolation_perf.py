"""T7 interpolation selection + reference-style performance smoke gates
(tests/test_main.py:431-433 semantics: a bounded e2e wall-clock)."""

from __future__ import annotations

import time

import pandas as pd

from img2dataset_spark.functions.image import select_interpolation


class TestInterpolationSelection:
    def test_keep_ratio_controlled_by_min_side(self):
        # min side 300 > 256 -> downscale filter
        assert select_interpolation(300, 800, "keep_ratio", 256) == "area"
        # min side 200 <= 256 -> upscale filter (even though max side is big)
        assert select_interpolation(200, 800, "keep_ratio", 256) == "lanczos"
        assert select_interpolation(200, 800, "center_crop", 256) == "lanczos"

    def test_border_controlled_by_max_side(self):
        assert select_interpolation(100, 300, "border", 256) == "area"
        assert select_interpolation(100, 200, "border", 256) == "lanczos"
        assert select_interpolation(100, 200, "keep_ratio_largest", 256) == "lanczos"

    def test_custom_filters(self):
        assert (
            select_interpolation(300, 300, "keep_ratio", 256, upscale="cubic",
                                 downscale="nearest")
            == "nearest"
        )
        assert (
            select_interpolation(100, 100, "keep_ratio", 256, upscale="cubic",
                                 downscale="nearest")
            == "cubic"
        )


class TestPerfSmoke:
    def test_mock_pipeline_1000_urls_bounded(self, spark, tmp_path):
        """Reference CI gate: 1000-url e2e < 100 s (ours: mock fetch,
        webdataset sink, generous bound for shared-CI noise)."""
        from img2dataset_spark import PipelineConfig, download

        urls = [f"http://fixture.local/img/{i}.jpg" for i in range(1000)]
        p = str(tmp_path / "in.parquet")
        pd.DataFrame({"url": urls}).to_parquet(p)
        cfg = PipelineConfig(
            url_list=p, input_format="parquet",
            output_folder=str(tmp_path / "out"), output_format="webdataset",
            number_sample_per_shard=100, fetch_mode="mock",
            compute_hash="sha256",
        )
        t0 = time.time()
        stats = download(cfg, spark=spark)
        wall = time.time() - t0
        assert sum(r["count"] for r in stats) == 1000
        assert wall < 60, f"1000-url mock pipeline took {wall:.1f}s (gate: 60s)"
