"""The README's documented examples actually run.

Three layers:
- every ``from img2dataset_spark...`` import line in README.md resolves
  (guards the docs against API drift);
- the Python quickstart (PipelineConfig -> download) runs end-to-end in
  mock-fetch mode and produces the documented shard outputs;
- the CLI example's argv surface parses to the same config, and the
  curation chain runs verbatim on the documents table.
"""

from __future__ import annotations

import glob
import importlib
import os
import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

README = os.path.join(os.path.dirname(__file__), "..", "README.md")


def _python_blocks() -> list[str]:
    text = open(README).read()
    return re.findall(r"```python\n(.*?)```", text, re.DOTALL)


def test_readme_python_blocks_compile_and_imports_resolve():
    blocks = _python_blocks()
    assert blocks, "README lost its python examples"
    for block in blocks:
        compile(block, "<README>", "exec")  # syntax
        for m in re.finditer(r"from (img2dataset_spark[\w.]*) import (.+)", block):
            mod = importlib.import_module(m.group(1))
            for name in m.group(2).split(","):
                assert hasattr(mod, name.strip()), f"README imports missing {name}"


@pytest.fixture(scope="module")
def spark():
    from img2dataset_spark.session import get_spark

    return get_spark(shuffle_partitions=8)


def test_readme_load_example(spark, tmp_path):
    from img2dataset_spark import load

    pq.write_table(
        pa.table(
            {
                "url": ["http://a/1.jpg", "http://a/2.jpg"],
                "caption": ["x", "y"],
                "md5": ["0" * 32, "1" * 32],
            }
        ),
        str(tmp_path / "urls.parquet"),
    )
    df = load(
        spark,
        str(tmp_path / "urls.parquet"),
        input_format="parquet",
        caption_col="caption",
        verify_hash=("md5", "md5"),
    )
    assert set(df.columns) == {"url", "caption", "md5"}
    assert df.count() == 2


def test_readme_quickstart_download(spark, tmp_path):
    from img2dataset_spark import PipelineConfig, download

    urls = [f"http://example.com/{i}.jpg" for i in range(30)]
    pq.write_table(
        pa.table({"url": urls, "caption": [f"c{i}" for i in range(30)]}),
        str(tmp_path / "urls.parquet"),
    )
    cfg = PipelineConfig(
        url_list=str(tmp_path / "urls.parquet"),
        input_format="parquet",
        caption_col="caption",
        output_folder=str(tmp_path / "out"),
        output_format="webdataset",
        number_sample_per_shard=10,
        compute_hash="sha256",
        fetch_mode="mock",  # hermetic: no network in CI
    )
    stats = download(cfg, spark=spark)
    assert len(stats) == 3  # 30 urls / 10 per shard
    tars = sorted(glob.glob(str(tmp_path / "out" / "*.tar")))
    assert [os.path.basename(t) for t in tars] == [
        "00000.tar",
        "00001.tar",
        "00002.tar",
    ]
    assert len(glob.glob(str(tmp_path / "out" / "*_stats.json"))) == 3


def test_readme_cli_surface_parses(tmp_path):
    from img2dataset_spark.__main__ import parse_args

    cfg = parse_args(
        [
            "--url_list",
            "urls.txt",
            "--output_folder",
            "out",
            "--output_format",
            "webdataset",
            "--number_sample_per_shard",
            "10000",
        ]
    )
    assert cfg.url_list == "urls.txt"
    assert cfg.output_format == "webdataset"
    assert cfg.number_sample_per_shard == 10000


def test_readme_curation_chain_runs(spark):
    from img2dataset_spark.operators.dedup import minhash_lsh_pairs
    from img2dataset_spark.operators.graph import (
        connected_components,
        dedup_representatives,
    )
    from img2dataset_spark.operators.quality import gopher_filter
    from img2dataset_spark.operators.decontaminate import decontaminate
    from img2dataset_spark.operators.mixture import resample_mixture

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n0 = docs.count()
    docs = dedup_representatives(docs, connected_components(minhash_lsh_pairs(docs)))
    docs = gopher_filter(docs)
    bench = docs.limit(5)  # stand-in benchmark table with the same schema
    docs = decontaminate(docs, bench, threshold=0.2)
    sources = [r["source"] for r in docs.select("source").distinct().collect()]
    fracs = {s: 1.0 / len(sources) for s in sources}
    out = resample_mixture(docs, fracs, group_col="source")
    n1 = out.count()
    assert 0 < n1 <= n0


def test_readme_packing_example_runs(spark):
    from img2dataset_spark.operators.packing import (
        materialize_blocks,
        packed_spans,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    spans = packed_spans(docs, block_size=2048)
    blocks = materialize_blocks(docs, block_size=2048)
    assert spans.columns == [
        "block_id", "doc_id", "doc_offset", "block_offset", "slice_len",
    ]
    first = blocks.orderBy("block_id").first()
    assert len(first["tokens"]) == 2048
