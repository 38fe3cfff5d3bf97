"""Whole-engine e2e over REAL images, no mock anywhere: the reference
repo's committed photos (5 of 7 progressive JPEG) are served over a
local HTTP server, fetched by the fetch UDF inside Spark executors,
decoded/resized/re-encoded by the dependency-free codecs, and written
as webdataset shards + metadata parquet.  This is the reference's own
end-to-end shape (tests/test_main.py) with zero imaging-library
dependence."""

from __future__ import annotations

import glob
import json
import os
import tarfile

import pytest

from img2dataset_spark import PipelineConfig, download
from pyspark.sql import functions as F
from img2dataset_spark.functions.jpeg import decode_jpeg

REF_IMAGES = sorted(glob.glob("/root/reference/tests/resize_test_image/*.jpg"))

pytestmark = pytest.mark.skipif(
    not REF_IMAGES, reason="reference test images not available"
)


def test_download_real_jpegs_end_to_end(spark, http_fixture, tmp_path):
    base, images = http_fixture
    # mount the reference photos on the session HTTP server
    names = []
    for p in REF_IMAGES:
        name = "real_" + os.path.basename(p)
        images[name] = open(p, "rb").read()
        names.append(name)

    inp = str(tmp_path / "urls.parquet")
    rows = [(f"{base}/allowed/{n}", f"photo {i}") for i, n in enumerate(names)]
    spark.createDataFrame(rows, "url string, caption string").write.parquet(inp)

    out = str(tmp_path / "out")
    cfg = PipelineConfig(
        url_list=inp,
        input_format="parquet",
        caption_col="caption",
        output_folder=out,
        output_format="webdataset",
        number_sample_per_shard=4,
        image_size=96,
        resize_mode="center_crop",
        encode_format="jpg",
        encode_quality=90,
        compute_hash="sha256",
        fetch_mode="http",
        thread_count=4,
    )
    stats = download(cfg, spark=spark)
    assert sum(s["successes"] for s in stats) == len(names)

    # every tar member must be a real JPEG at the requested geometry
    decoded = 0
    for tar_path in sorted(glob.glob(out + "/*.tar")):
        with tarfile.open(tar_path) as tf:
            for m in tf.getmembers():
                if not m.name.endswith(".jpg"):
                    continue
                data = tf.extractfile(m).read()
                arr = decode_jpeg(data)
                assert arr.shape == (96, 96, 3), m.name
                decoded += 1
    assert decoded == len(names)

    # stats sidecars agree with the tar contents
    total = 0
    for sp in sorted(glob.glob(out + "/*_stats.json")):
        total += json.load(open(sp))["successes"]
    assert total == len(names)


def test_original_dims_survive_to_metadata(spark, http_fixture, tmp_path):
    """The metadata parquet must carry the entropy-decoded original
    dims (filename-encoded ground truth), proving the progressive
    decode ran inside the pipeline, not just a header parse."""
    base, images = http_fixture
    name = "real_" + os.path.basename(REF_IMAGES[1])  # 208_495: progressive
    images[name] = open(REF_IMAGES[1], "rb").read()
    w, h = map(int, os.path.basename(REF_IMAGES[1])[:-4].split("_"))

    inp = str(tmp_path / "urls.parquet")
    spark.createDataFrame(
        [(f"{base}/allowed/{name}", "x")], "url string, caption string"
    ).write.parquet(inp)
    out = str(tmp_path / "out")
    cfg = PipelineConfig(
        url_list=inp,
        input_format="parquet",
        caption_col="caption",
        output_folder=out,
        output_format="parquet",
        number_sample_per_shard=4,
        image_size=64,
        resize_mode="keep_ratio",
        encode_format="jpg",
        fetch_mode="http",
    )
    download(cfg, spark=spark)
    meta = spark.read.parquet(out + "/00000.parquet").collect()
    assert len(meta) == 1
    r = meta[0]
    assert r["status"] == "success"
    assert (r["original_width"], r["original_height"]) == (w, h)
    assert min(r["width"], r["height"]) == 64
    arr = decode_jpeg(bytes(r["jpg"]))
    assert arr.shape[:2] == (r["height"], r["width"])

def test_compute_phash_dedups_respellings(spark, http_fixture, tmp_path):
    """compute_phash=True writes a perceptual hash of the STORED
    payload into the metadata; two spellings of the same photo (the
    original and a recompressed copy) land within a small Hamming
    distance and pair up via hamming_pairs64 over the metadata parquet
    — the pixel-level dedup byte hashes (sha256) cannot do."""
    from img2dataset_spark.functions.jpeg import decode_jpeg, encode_jpeg
    from img2dataset_spark.operators.dedup import hamming_pairs64

    base, images = http_fixture
    src = open(REF_IMAGES[0], "rb").read()
    # a re-encoded spelling: same pixels, different bytes
    respelled = encode_jpeg(decode_jpeg(src), quality=70)
    other = open(REF_IMAGES[-1], "rb").read()
    images["ph_a.jpg"] = src
    images["ph_b.jpg"] = respelled
    images["ph_c.jpg"] = other

    inp = str(tmp_path / "urls.parquet")
    spark.createDataFrame(
        [(f"{base}/allowed/ph_{k}.jpg", k) for k in ("a", "b", "c")],
        "url string, caption string",
    ).write.parquet(inp)
    out = str(tmp_path / "out")
    cfg = PipelineConfig(
        url_list=inp,
        input_format="parquet",
        caption_col="caption",
        output_folder=out,
        output_format="parquet",
        number_sample_per_shard=10,
        image_size=128,
        resize_mode="center_crop",
        encode_format="jpg",
        fetch_mode="http",
        compute_phash=True,
    )
    download(cfg, spark=spark)
    meta = spark.read.parquet(out + "/00000.parquet")
    rows = {r["caption"]: r for r in meta.collect()}
    assert all(rows[k]["phash"] is not None for k in ("a", "b", "c"))
    # sha256 sees three distinct byte strings; phash sees two scenes
    assert len({rows[k]["sha256"] for k in ("a", "b", "c")}) == 3
    keyed = meta.select(
        F.col("key").cast("long").alias("doc_id"), "phash"
    )
    pairs = hamming_pairs64(keyed, "phash", max_hamming=10).collect()
    key_of = {k: int(rows[k]["key"]) for k in ("a", "b", "c")}
    want = tuple(sorted((key_of["a"], key_of["b"])))
    assert {(p["id_a"], p["id_b"]) for p in pairs} == {want}
