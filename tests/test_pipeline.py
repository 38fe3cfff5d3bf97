"""End-to-end pipeline tests: hermetic HTTP fixture (real fetch over a
local server with X-Robots-Tag on /disallowed/, like the reference's
tests/conftest.py), plus mock-mode determinism and sink layout.
"""

from __future__ import annotations

import json
import os
import tarfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from img2dataset_spark import PipelineConfig, build_pipeline, download


def _input_parquet(tmp_path, urls, captions=None, **extra) -> str:
    d = {"url": urls}
    if captions is not None:
        d["caption"] = captions
    d.update(extra)
    p = str(tmp_path / "in.parquet")
    pd.DataFrame(d).to_parquet(p)
    return p


class TestRealHttpFetch:
    def test_fetch_resize_no(self, spark, http_fixture, tmp_path):
        base, images = http_fixture
        names = sorted(images)
        urls = (
            [f"{base}/allowed/{n}" for n in names[:6]]
            + [f"{base}/disallowed/{names[6]}"]
            + [f"{base}/missing/nope.png"]
        )
        cfg = PipelineConfig(
            url_list=_input_parquet(tmp_path, urls),
            input_format="parquet",
            output_folder=str(tmp_path / "out"),
            output_format="parquet",
            number_sample_per_shard=100,
            resize_mode="no",
            # PNG inputs: matching encode_format so the no-op resize is a
            # legitimate passthrough (png bytes into a jpg column would be
            # a format-conversion failure per resizer.py:148)
            encode_format="png",
            compute_hash="sha256",
            fetch_mode="http",
            thread_count=8,
        )
        download(cfg, spark=spark)
        meta = pd.read_parquet(str(tmp_path / "out" / "00000.parquet"))
        by_url = meta.set_index("url")
        for n in names[:6]:
            row = by_url.loc[f"{base}/allowed/{n}"]
            assert row["status"] == "success"
            # real header parsing on real PNG bytes
            assert (row["width"], row["height"]) == (32 + names.index(n) * 8,
                                                     24 + names.index(n) * 4)
            assert row["png"] is not None and bytes(row["png"]) == images[n]
        dis = by_url.loc[f"{base}/disallowed/{names[6]}"]
        assert dis["status"] == "failed_to_download"
        assert "X-Robots-Tag" in dis["error_message"]
        mis = by_url.loc[f"{base}/missing/nope.png"]
        assert mis["status"] == "failed_to_download"
        assert "404" in mis["error_message"]

    def test_min_size_filter_real_images(self, spark, http_fixture, tmp_path):
        base, images = http_fixture
        urls = [f"{base}/allowed/{n}" for n in sorted(images)]
        cfg = PipelineConfig(
            url_list=_input_parquet(tmp_path, urls),
            input_format="parquet",
            output_folder=str(tmp_path / "out2"),
            output_format="dummy",
            resize_mode="no",
            encode_format="png",
            min_image_size=40,  # images 0,1 have min side 24,28 -> rejected...
            fetch_mode="http",
            thread_count=4,
        )
        df = build_pipeline(spark, cfg)
        got = {r["url"]: r for r in df.collect()}
        for i, n in enumerate(sorted(images)):
            r = got[f"{base}/allowed/{n}"]
            if min(32 + i * 8, 24 + i * 4) < 40:
                assert r["status"] == "failed_to_resize"
                assert r["error_message"] == "image too small"
            else:
                assert r["status"] == "success"


class TestMockPipeline:
    def _cfg(self, tmp_path, urls, **kw):
        defaults = dict(
            url_list=_input_parquet(tmp_path, urls, captions=[f"c{i}" for i in range(len(urls))]),
            input_format="parquet",
            caption_col="caption",
            output_folder=str(tmp_path / "out"),
            output_format="webdataset",
            number_sample_per_shard=10,
            fetch_mode="mock",
            compute_hash="sha256",
        )
        defaults.update(kw)
        return PipelineConfig(**defaults)

    def test_webdataset_layout_and_determinism(self, spark, tmp_path):
        urls = [f"http://fixture.local/img/{i}.jpg" for i in range(25)]
        cfg = self._cfg(tmp_path, urls)
        stats = download(cfg, spark=spark)
        assert sorted(r["shard_id"] for r in stats) == [0, 1, 2]
        assert {r["shard_id"]: r["count"] for r in stats} == {0: 10, 1: 10, 2: 5}
        out = cfg.output_folder
        names = sorted(os.listdir(out))
        assert names == [
            "00000.parquet", "00000.tar", "00000_stats.json",
            "00001.parquet", "00001.tar", "00001_stats.json",
            "00002.parquet", "00002.tar", "00002_stats.json",
        ]
        with tarfile.open(os.path.join(out, "00000.tar")) as t:
            members = t.getnames()
            # shard size 10 -> in-shard index width = ceil(log10(10)) = 1
            assert members[:3] == ["000000.jpg", "000000.txt", "000000.json"]
            j = json.load(t.extractfile("000000.json"))
            assert j["status"] == "success"
            assert set(j) >= {"url", "caption", "key", "status", "width", "height",
                              "original_width", "original_height", "sha256"}
        # byte-determinism: rerun in overwrite mode produces identical tar
        tar0 = open(os.path.join(out, "00000.tar"), "rb").read()
        cfg2 = self._cfg(tmp_path, urls, incremental_mode="overwrite")
        download(cfg2, spark=spark)
        assert open(os.path.join(out, "00000.tar"), "rb").read() == tar0

    def test_files_sink(self, spark, tmp_path):
        urls = [f"http://fixture.local/img/{i}.jpg" for i in range(5)]
        cfg = self._cfg(tmp_path, urls, output_format="files",
                        number_sample_per_shard=100)
        download(cfg, spark=spark)
        shard_dir = os.path.join(cfg.output_folder, "00000")
        files = sorted(os.listdir(shard_dir))
        assert "0000000.jpg" in files and "0000000.json" in files and "0000000.txt" in files

    def test_tfrecord_sink(self, spark, tmp_path):
        urls = [f"http://fixture.local/img/{i}.jpg" for i in range(5)]
        cfg = self._cfg(tmp_path, urls, output_format="tfrecord",
                        number_sample_per_shard=100)
        download(cfg, spark=spark)
        p = os.path.join(cfg.output_folder, "00000.tfrecord")
        assert os.path.getsize(p) > 100
        # metadata parquet written alongside
        assert os.path.exists(os.path.join(cfg.output_folder, "00000.parquet"))

    def test_stats_sidecar_schema(self, spark, tmp_path):
        urls = [f"http://fixture.local/img/{i}.jpg" for i in range(4)] + [
            "http://fixture.local/missing/x.jpg"
        ]
        cfg = self._cfg(tmp_path, urls, output_format="dummy",
                        number_sample_per_shard=100)
        download(cfg, spark=spark)
        s = json.load(open(os.path.join(cfg.output_folder, "00000_stats.json")))
        assert s["count"] == 5 and s["successes"] == 4
        assert s["failed_to_download"] == 1 and s["failed_to_resize"] == 0
        assert "duration" in s and "start_time" in s and "end_time" in s
        assert json.loads(s["status_dict"]) == {"HTTP Error 404: Not Found": 1}

    def test_verify_hash_mismatch(self, spark, tmp_path):
        from img2dataset_spark.functions.fetch import mock_payload
        import hashlib

        urls = [f"http://fixture.local/img/{i}.jpg" for i in range(4)]
        goods = [hashlib.md5(mock_payload(u)).hexdigest() for u in urls]
        goods[2] = "0" * 32  # deliberate mismatch
        p = _input_parquet(tmp_path, urls, md5s=goods)
        cfg = PipelineConfig(
            url_list=p, input_format="parquet",
            output_folder=str(tmp_path / "out"), output_format="dummy",
            verify_hash=("md5s", "md5"), compute_hash=None, fetch_mode="mock",
        )
        df = build_pipeline(spark, cfg)
        rows = sorted(df.collect(), key=lambda r: r["url"])
        assert [r["status"] for r in rows] == [
            "success", "success", "failed_to_download", "success"]
        assert rows[2]["error_message"] == "hash mismatch"
        assert rows[2]["md5"] is None  # F3: mismatching row has null hash
        assert rows[0]["md5"] == goods[0]

    def test_extract_exif_wiring(self, spark, tmp_path):
        urls = [f"http://fixture.local/img/{i}.jpg" for i in range(3)]
        cfg = self._cfg(tmp_path, urls, output_format="dummy", extract_exif=True)
        df = build_pipeline(spark, cfg)
        assert "exif" in df.columns
        rows = df.collect()
        assert all(r["exif"] == "{}" for r in rows if r["status"] == "success")


class TestIncremental:
    def test_incremental_and_extend(self, spark, tmp_path):
        urls = [f"http://fixture.local/img/{i}.jpg" for i in range(20)]
        p = _input_parquet(tmp_path, urls)
        out = str(tmp_path / "out")
        cfg = PipelineConfig(
            url_list=p, input_format="parquet", output_folder=out,
            output_format="dummy", number_sample_per_shard=10, fetch_mode="mock",
        )
        assert len(download(cfg, spark=spark)) == 2
        # incremental rerun: everything done
        assert len(download(cfg, spark=spark)) == 0
        # extend: continues numbering
        cfg_e = PipelineConfig(
            url_list=p, input_format="parquet", output_folder=out,
            output_format="dummy", number_sample_per_shard=10, fetch_mode="mock",
            incremental_mode="extend",
        )
        stats = download(cfg_e, spark=spark)
        assert sorted(r["shard_id"] for r in stats) == [2, 3]
        # overwrite: starts fresh
        cfg_o = PipelineConfig(
            url_list=p, input_format="parquet", output_folder=out,
            output_format="dummy", number_sample_per_shard=10, fetch_mode="mock",
            incremental_mode="overwrite",
        )
        stats = download(cfg_o, spark=spark)
        assert sorted(r["shard_id"] for r in stats) == [0, 1]
        assert sorted(os.listdir(out)) == ["00000_stats.json", "00001_stats.json"]


class TestSubjobBatching:
    """R2: subjob batching (reference distributor.py:45-58) as bounded
    shard waves, each its own job with its own commit + retry scope."""

    def _cfg(self, tmp_path, urls, out="out", **kw):
        defaults = dict(
            url_list=_input_parquet(tmp_path, urls),
            input_format="parquet",
            output_folder=str(tmp_path / out),
            output_format="parquet",
            number_sample_per_shard=5,
            fetch_mode="mock",
        )
        defaults.update(kw)
        return PipelineConfig(**defaults)

    def test_waves_match_single_job(self, spark, tmp_path, monkeypatch):
        urls = [f"http://fixture.local/img/{i}.jpg" for i in range(32)]
        # count the independent jobs (write_output calls): 7 shards in
        # waves of 3 -> ceil(7/3) = 3 waves
        import img2dataset_spark.plans.pipeline as pl
        from img2dataset_spark.sinks.shard_writer import write_output as real_write

        calls = []
        monkeypatch.setattr(
            "img2dataset_spark.sinks.shard_writer.write_output",
            lambda df, cfg: calls.append(1) or real_write(df, cfg),
        )
        cfg = self._cfg(tmp_path, urls, out="waves", subjob_size=3)
        stats_w = pl.download(cfg, spark=spark)
        assert len(calls) == 3
        cfg_s = self._cfg(tmp_path, urls, out="single")
        stats_s = pl.download(cfg_s, spark=spark)
        assert sorted(r["shard_id"] for r in stats_w) == sorted(
            r["shard_id"] for r in stats_s
        ) == list(range(7))

        def read_all(folder):
            frames = [
                pd.read_parquet(os.path.join(folder, f))
                for f in sorted(os.listdir(folder))
                if f.endswith(".parquet")
            ]
            return (
                pd.concat(frames).sort_values("url").reset_index(drop=True)
            )

        pd.testing.assert_frame_equal(
            read_all(cfg.output_folder), read_all(cfg_s.output_folder)
        )

    def test_waves_compose_with_incremental_resume(self, spark, tmp_path):
        urls = [f"http://fixture.local/img/{i}.jpg" for i in range(20)]
        cfg = self._cfg(tmp_path, urls, output_format="dummy", subjob_size=2)
        assert len(download(cfg, spark=spark)) == 4
        # rerun: every wave sees its shards already done
        assert len(download(cfg, spark=spark)) == 0
        # partial resume: drop one mid-range shard's sidecar; only that
        # shard reruns (the wave filter + done-skip compose)
        os.remove(os.path.join(cfg.output_folder, "00002_stats.json"))
        stats = download(cfg, spark=spark)
        assert [r["shard_id"] for r in stats] == [2]

    def test_span_scan_does_not_fetch(self, spark, tmp_path):
        # Wave discovery (distinct shard-id buckets) runs on a fetch-free
        # projection: Catalyst must prune the Python UDF columns out of
        # that first job.
        urls = [f"http://fixture.local/img/{i}.jpg" for i in range(8)]
        cfg = self._cfg(tmp_path, urls, subjob_size=100)
        df = build_pipeline(spark, cfg)
        plan = (
            df.select(F.floor(F.col("shard_id") / 100).alias("b"))
            .distinct()
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "EvalPython" not in plan  # no Arrow/Batch UDF stage

    def test_wave_sidecars_and_streaming_rollup(self, spark, tmp_path):
        """R2 observability: one '_wavestats.json' per executed wave,
        never double-counted as a shard sidecar, and aggregable by the
        streaming progress query."""
        import json

        urls = [f"http://fixture.local/img/{i}.jpg" for i in range(32)]
        cfg = self._cfg(tmp_path, urls, out="wstats", subjob_size=3)
        stats = download(cfg, spark=spark)  # 7 shards -> 3 waves
        wave_files = sorted(
            f for f in os.listdir(cfg.output_folder)
            if f.endswith("_wavestats.json")
        )
        assert wave_files == [
            "wave_00000_wavestats.json",
            "wave_00001_wavestats.json",
            "wave_00002_wavestats.json",
        ]
        rollups = [
            json.load(open(os.path.join(cfg.output_folder, f)))
            for f in wave_files
        ]
        assert [r["shards"] for r in rollups] == [3, 3, 1]
        assert sum(r["count"] for r in rollups) == len(urls)
        assert sum(r["successes"] for r in rollups) == sum(
            r["successes"] for r in stats
        )
        # shard-side discovery must not see wave rollups as shards
        from img2dataset_spark.plans.incremental import existing_shard_ids

        assert existing_shard_ids(cfg.output_folder) == set(range(7))
        # the streaming rollup drains the sidecars to one run-level row
        from img2dataset_spark.streaming.progress import (
            aggregate_wave_progress,
            wave_stats_stream,
        )

        q = (
            aggregate_wave_progress(wave_stats_stream(spark, cfg.output_folder))
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("wave_progress_test")
            .option("checkpointLocation", str(tmp_path / "wave_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        row = spark.table("wave_progress_test").collect()[0]
        assert row["waves_done"] == 3
        assert row["shards_done"] == 7
        assert row["total"] == len(urls)

    def test_sparse_shard_ids_skip_empty_waves(self, spark, tmp_path, monkeypatch):
        """A sparse shard-id space (e.g. a caller-remapped plan) must
        cost one wave per NON-EMPTY bucket — not one per id-range gap
        (ids 5000 buckets apart would otherwise pay ~5000 empty waves,
        each a full input scan)."""
        import img2dataset_spark.plans.pipeline as pl
        from img2dataset_spark.sinks.shard_writer import write_output as real_write

        urls = [f"http://fixture.local/img/{i}.jpg" for i in range(10)]
        cfg = self._cfg(tmp_path, urls, out="sparse", subjob_size=2)
        base = build_pipeline(spark, cfg)
        # 10 urls / 5 per shard = shards {0,1}; remap to {0, 10000}
        sparse = base.withColumn(
            "shard_id", F.col("shard_id") * 10000
        )
        calls = []
        monkeypatch.setattr(
            "img2dataset_spark.sinks.shard_writer.write_output",
            lambda df, c: calls.append(1) or real_write(df, c),
        )
        monkeypatch.setattr(pl, "build_pipeline", lambda *a, **k: sparse)
        stats = pl.download(cfg, spark=spark)
        assert sorted(r["shard_id"] for r in stats) == [0, 10000]
        assert len(calls) == 2  # one wave per populated bucket, no gaps

    def test_subjob_size_validation(self, tmp_path):
        with pytest.raises(ValueError, match="subjob_size"):
            PipelineConfig(url_list="u.txt", subjob_size=0)


class TestCli:
    def test_parse_args_types(self):
        from img2dataset_spark.__main__ import parse_args

        cfg = parse_args([
            "--url_list", "urls.txt", "--image_size=128",
            "--resize_only_if_bigger",  # bare boolean
            "--caption_col", "null",
            "--save_additional_columns", "a,b",
            "--verify_hash", "m,md5",
            "--max_aspect_ratio", "4.5",
            "--fetch_mode", "mock",
        ])
        assert cfg.url_list == "urls.txt"
        assert cfg.image_size == 128
        assert cfg.resize_only_if_bigger is True
        assert cfg.caption_col is None
        assert cfg.save_additional_columns == ["a", "b"]
        assert cfg.verify_hash == ("m", "md5")
        assert cfg.max_aspect_ratio == 4.5

    def test_parse_args_rejects_unknown(self):
        import pytest as _pytest

        from img2dataset_spark.__main__ import parse_args

        with _pytest.raises(SystemExit, match="unknown option"):
            parse_args(["--url_list", "x", "--frobnicate", "1"])
        with _pytest.raises(SystemExit, match="url_list is required"):
            parse_args(["--image_size", "64"])

    def test_cli_subprocess_end_to_end(self, tmp_path):
        """python -m img2dataset_spark produces a shard + stats sidecar
        from a txt url list (reference main.py:277-278 CLI parity)."""
        import subprocess
        import sys

        urls = tmp_path / "urls.txt"
        urls.write_text("".join(f"http://x/{i}.jpg\n" for i in range(8)))
        out = tmp_path / "out"
        proc = subprocess.run(
            [sys.executable, "-m", "img2dataset_spark",
             "--url_list", str(urls), "--input_format", "txt",
             "--output_folder", str(out), "--output_format", "webdataset",
             "--number_sample_per_shard", "5", "--fetch_mode", "mock",
             "--shuffle_partitions", "4"],
            capture_output=True, text=True, timeout=300,
            cwd="/root/repo",
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "success" in proc.stdout
        made = sorted(p.name for p in out.iterdir())
        assert "00000.tar" in made and "00000_stats.json" in made
        assert "00001.tar" in made  # 8 urls / 5 per shard -> 2 shards


class TestUnorderedExtend:
    def test_extend_mode_offsets_hash_shards(self, spark, tmp_path):
        """A rerun in extend mode with ordered_sharding=False must continue
        shard numbering, not restart at 0 and overwrite earlier output."""
        urls = [f"http://fixture.local/img/{i}.jpg" for i in range(20)]
        def cfg():
            return PipelineConfig(
                url_list=_input_parquet(tmp_path, urls,
                                        captions=[f"c{i}" for i in range(20)]),
                input_format="parquet", caption_col="caption",
                output_folder=str(tmp_path / "out"), output_format="webdataset",
                number_sample_per_shard=10, fetch_mode="mock",
                ordered_sharding=False, incremental_mode="extend",
                resize_mode="no",
            )
        s1 = sorted(r["shard_id"] for r in download(cfg(), spark=spark))
        s2 = sorted(r["shard_id"] for r in download(cfg(), spark=spark))
        assert min(s2) > max(s1)  # disjoint, continuing numbering
        made = sorted(p.name for p in (tmp_path / "out").iterdir()
                      if p.name.endswith(".tar"))
        assert len(made) == len(s1) + len(s2)  # nothing overwritten


class TestUrlDedup:
    """[spark] pre-fetch canonical-URL dedup (config.dedup_urls)."""

    def test_duplicate_spellings_fetch_once(self, spark, tmp_path):
        rows = pd.DataFrame(
            {
                "url": [
                    "HTTP://Fixture.LOCAL:80/img/1.jpg?utm_source=m#f",
                    "http://fixture.local/img/1.jpg",
                    "http://fixture.local/img/2.jpg?b=2&a=1",
                    "http://fixture.local/img/2.jpg?a=1&b=2&gclid=x",
                    "http://fixture.local/img/3.jpg",
                ],
                "caption": [f"c{i}" for i in range(5)],
            }
        )
        inp = str(tmp_path / "u.parquet")
        rows.to_parquet(inp)
        cfg = PipelineConfig(
            url_list=inp,
            input_format="parquet",
            caption_col="caption",
            output_folder=str(tmp_path / "out"),
            output_format="parquet",
            number_sample_per_shard=10,
            fetch_mode="mock",
            dedup_urls=True,
        )
        stats = download(cfg, spark=spark)
        assert sum(r["count"] for r in stats) == 3  # 5 rows -> 3 canonicals
        meta = pd.read_parquet(os.path.join(cfg.output_folder, "00000.parquet"))
        # survivor = smallest raw url per canonical group
        assert sorted(meta["url"]) == [
            "HTTP://Fixture.LOCAL:80/img/1.jpg?utm_source=m#f",
            "http://fixture.local/img/2.jpg?a=1&b=2&gclid=x",
            "http://fixture.local/img/3.jpg",
        ]

    def test_null_urls_exempt(self, spark, tmp_path):
        """NULL-url rows pass through dedup_urls un-merged (the window's
        null-equality would otherwise keep ONE survivor from all of
        them); the reference fetches and stats-reports every input
        row."""
        rows = pd.DataFrame(
            {
                "url": [
                    None,
                    None,
                    "http://fixture.local/img/1.jpg",
                    "http://fixture.local/img/1.jpg#frag",
                ],
                "caption": ["a", "b", "c", "d"],
            }
        )
        inp = str(tmp_path / "unull.parquet")
        rows.to_parquet(inp)
        cfg = PipelineConfig(
            url_list=inp,
            input_format="parquet",
            caption_col="caption",
            output_folder=str(tmp_path / "outnull"),
            output_format="dummy",
            number_sample_per_shard=10,
            fetch_mode="mock",
            dedup_urls=True,
        )
        stats = download(cfg, spark=spark)
        # 4 rows -> 3 processed: both NULLs kept, the spelling pair merged
        assert sum(r["count"] for r in stats) == 3

    def test_off_by_default(self, spark, tmp_path):
        rows = pd.DataFrame(
            {
                "url": [
                    "http://fixture.local/img/1.jpg",
                    "http://fixture.local/img/1.jpg#frag",
                ],
                "caption": ["a", "b"],
            }
        )
        inp = str(tmp_path / "u2.parquet")
        rows.to_parquet(inp)
        cfg = PipelineConfig(
            url_list=inp,
            input_format="parquet",
            caption_col="caption",
            output_folder=str(tmp_path / "out2"),
            output_format="dummy",
            number_sample_per_shard=10,
            fetch_mode="mock",
        )
        stats = download(cfg, spark=spark)
        assert sum(r["count"] for r in stats) == 2  # reference behavior
