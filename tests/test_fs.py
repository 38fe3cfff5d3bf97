"""IO-layer tests: sink writers and incremental state over file:// and
memory:// URLs (the reference routes all output IO through fsspec,
writer.py:107-113; this layer recreates that contract)."""

from __future__ import annotations

import io
import json
import tarfile

import pandas as pd
import pytest

from img2dataset_spark.io import fs


@pytest.fixture(autouse=True)
def _clean_memory():
    fs.memory_fs_clear()
    yield
    fs.memory_fs_clear()


def _shard_pdf():
    return pd.DataFrame(
        {
            "key": ["0000000", "0000001", "0000002"],
            "caption": ["a", None, "c"],
            "url": ["u0", "u1", "u2"],
            "status": ["success", "failed_to_download", "success"],
            "error_message": [None, "404", None],
            "width": [10, None, 12],
            "height": [10, None, 12],
            "original_width": [10, None, 12],
            "original_height": [10, None, 12],
            "jpg": [b"\x01", None, b"\x03"],
            "shard_id": [0, 0, 0],
        }
    )


class TestFsPrimitives:
    def test_roundtrip_memory(self):
        with fs.open_write("memory://a/b.bin") as fh:
            fh.write(b"xyz")
        with fs.open_read("memory://a/b.bin") as fh:
            assert fh.read() == b"xyz"

    def test_roundtrip_text_memory(self):
        with fs.open_write("memory://t/x.json", text=True) as fh:
            json.dump({"k": 1}, fh)
        with fs.open_read("memory://t/x.json", text=True) as fh:
            assert json.load(fh) == {"k": 1}

    def test_roundtrip_file_url(self, tmp_path):
        p = f"file://{tmp_path}/sub/dir/x.bin"
        with fs.open_write(p) as fh:  # parent dirs auto-created
            fh.write(b"ok")
        with fs.open_read(p) as fh:
            assert fh.read() == b"ok"

    def test_glob_and_rmtree_memory(self):
        for name in ["out/00000_stats.json", "out/00001_stats.json", "out/x.tar"]:
            with fs.open_write(f"memory://{name}") as fh:
                fh.write(b"{}")
        got = fs.glob("memory://out/*_stats.json")
        assert got == [
            "memory://out/00000_stats.json",
            "memory://out/00001_stats.json",
        ]
        assert fs.isdir("memory://out")
        fs.rmtree("memory://out")
        assert fs.glob("memory://out/*") == []
        assert not fs.isdir("memory://out")

    def test_join_preserves_scheme(self):
        assert fs.join("memory://a", "b", "c.tar") == "memory://a/b/c.tar"
        assert fs.join("/x/y", "z") == "/x/y/z"

    def test_unknown_scheme_raises_informative(self):
        with pytest.raises(ImportError, match="fsspec"):
            with fs.open_write("s3://bucket/key"):
                pass


class TestSinksOverMemory:
    """Every sink writer runs unchanged over memory:// (same code path a
    real fsspec backend would take: file-object handles only)."""

    def test_webdataset(self):
        from img2dataset_spark.sinks.shard_writer import write_shard_webdataset

        write_shard_webdataset(_shard_pdf(), "memory://out", "00000", "jpg", True)
        snap = fs.memory_fs_snapshot()
        assert "out/00000.tar" in snap
        with tarfile.open(fileobj=io.BytesIO(snap["out/00000.tar"])) as tar:
            names = sorted(tar.getnames())
        # failed row excluded; jpg+txt+json per success
        assert names == [
            "0000000.jpg", "0000000.json", "0000000.txt",
            "0000002.jpg", "0000002.json", "0000002.txt",
        ]

    def test_files(self):
        from img2dataset_spark.sinks.shard_writer import write_shard_files

        write_shard_files(_shard_pdf(), "memory://out", "00000", "jpg", True)
        snap = fs.memory_fs_snapshot()
        assert snap["out/00000/0000000.jpg"] == b"\x01"
        assert "out/00000/0000001.json" in snap  # failed rows keep metadata
        assert "out/00000/0000001.jpg" not in snap

    def test_parquet(self):
        from img2dataset_spark.sinks.shard_writer import write_shard_parquet

        write_shard_parquet(_shard_pdf(), "memory://out", "00000", True, "jpg")
        snap = fs.memory_fs_snapshot()
        meta = pd.read_parquet(io.BytesIO(snap["out/00000.parquet"]))
        assert len(meta) == 3 and "jpg" in meta.columns

    def test_tfrecord(self):
        from img2dataset_spark.sinks.shard_writer import write_shard_tfrecord

        write_shard_tfrecord(_shard_pdf(), "memory://out", "00000", "jpg")
        snap = fs.memory_fs_snapshot()
        assert snap["out/00000.tfrecord"][:1] != b""  # framed records present


class TestIncrementalOverMemory:
    def test_existing_shard_ids_and_overwrite(self):
        from img2dataset_spark.config import PipelineConfig
        from img2dataset_spark.plans.incremental import (
            existing_shard_ids,
            resolve_incremental,
        )

        for sid in (0, 1, 7):
            with fs.open_write(f"memory://out/{sid:05d}_stats.json", text=True) as fh:
                fh.write("{}")
        assert existing_shard_ids("memory://out") == {0, 1, 7}

        cfg = PipelineConfig(
            url_list="u", output_folder="memory://out",
            incremental_mode="extend",
        )
        done, start = resolve_incremental(None, cfg)
        assert (done, start) == (set(), 8)

        cfg2 = PipelineConfig(
            url_list="u", output_folder="memory://out",
            incremental_mode="overwrite",
        )
        done2, start2 = resolve_incremental(None, cfg2)
        assert (done2, start2) == (set(), 0)
        assert fs.glob("memory://out/*") == []  # cleared
