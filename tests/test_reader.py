"""Input-surface tests: all 11 formats through one load() (SURVEY M1),
canonical renames, reserved-column validation, directory scans.
Mirrors /root/reference/tests/test_reader.py strategy."""

from __future__ import annotations

import gzip
import json
import os

import pandas as pd
import pytest

from img2dataset_spark.sources.reader import load

URLS = [f"http://x.local/img{i}.jpg" for i in range(7)]
CAPS = ["", "cap 1", "cap 2", "cap 3", "cap 4", "cap 5", "cap 6"]


def _write_all_formats(d: str) -> dict[str, str]:
    pdf = pd.DataFrame({"url": URLS, "caption": CAPS})
    paths = {}
    paths["txt"] = os.path.join(d, "u.txt")
    with open(paths["txt"], "w") as f:
        f.write("\n".join(URLS) + "\n")
    paths["txt.gz"] = os.path.join(d, "u.txt.gz")
    with gzip.open(paths["txt.gz"], "wt") as f:
        f.write("\n".join(URLS) + "\n")
    paths["csv"] = os.path.join(d, "u.csv")
    pdf.to_csv(paths["csv"], index=False)
    paths["csv.gz"] = os.path.join(d, "u.csv.gz")
    pdf.to_csv(paths["csv.gz"], index=False, compression="gzip")
    paths["tsv"] = os.path.join(d, "u.tsv")
    pdf.to_csv(paths["tsv"], index=False, sep="\t")
    paths["tsv.gz"] = os.path.join(d, "u.tsv.gz")
    pdf.to_csv(paths["tsv.gz"], index=False, sep="\t", compression="gzip")
    paths["json"] = os.path.join(d, "u.json")
    pdf.to_json(paths["json"])  # pandas column-oriented, like the reference
    paths["json.gz"] = os.path.join(d, "u.json.gz")
    pdf.to_json(paths["json.gz"], compression="gzip")
    paths["jsonl"] = os.path.join(d, "u.jsonl")
    with open(paths["jsonl"], "w") as f:
        for r in pdf.to_dict("records"):
            f.write(json.dumps(r) + "\n")
    paths["jsonl.gz"] = os.path.join(d, "u.jsonl.gz")
    with gzip.open(paths["jsonl.gz"], "wt") as f:
        for r in pdf.to_dict("records"):
            f.write(json.dumps(r) + "\n")
    paths["parquet"] = os.path.join(d, "u.parquet")
    pdf.to_parquet(paths["parquet"])
    return paths


@pytest.fixture(scope="module")
def format_files(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("formats"))
    return _write_all_formats(d)


@pytest.mark.parametrize(
    "fmt",
    ["txt", "txt.gz", "csv", "csv.gz", "tsv", "tsv.gz", "json", "json.gz",
     "jsonl", "jsonl.gz", "parquet"],
)
def test_all_formats(spark, format_files, fmt):
    has_caption = not fmt.startswith("txt")
    df = load(
        spark,
        format_files[fmt],
        input_format=fmt,
        caption_col="caption" if has_caption else None,
    )
    rows = df.orderBy("url").collect()
    assert [r["url"] for r in rows] == sorted(URLS)
    if has_caption:
        assert df.columns == ["url", "caption"]
        by_url = {r["url"]: r["caption"] for r in rows}
        assert by_url[URLS[1]] == "cap 1"
    else:
        assert df.columns == ["url"]


def test_rename_and_additional_columns(spark, tmp_path):
    pdf = pd.DataFrame(
        {"URL": URLS, "TEXT": CAPS, "NSFW": ["ok"] * 7, "similarity": [0.5] * 7}
    )
    p = str(tmp_path / "laion.parquet")
    pdf.to_parquet(p)
    df = load(
        spark, p, input_format="parquet", url_col="URL", caption_col="TEXT",
        save_additional_columns=["NSFW", "similarity"],
    )
    assert df.columns == ["url", "caption", "NSFW", "similarity"]
    assert df.count() == 7


def test_verify_hash_rename(spark, tmp_path):
    pdf = pd.DataFrame({"url": URLS, "sha256hash": ["x"] * 7})
    p = str(tmp_path / "h.parquet")
    pdf.to_parquet(p)
    df = load(spark, p, input_format="parquet", verify_hash=("sha256hash", "sha256"))
    assert df.columns == ["url", "sha256"]


def test_missing_column_raises(spark, format_files):
    with pytest.raises(ValueError, match="caption column"):
        load(spark, format_files["parquet"], input_format="parquet",
             caption_col="nope")
    with pytest.raises(ValueError, match="url column"):
        load(spark, format_files["parquet"], input_format="parquet", url_col="nope")


def test_reserved_additional_column_raises(spark, tmp_path):
    pdf = pd.DataFrame({"url": URLS, "status": ["x"] * 7})
    p = str(tmp_path / "r.parquet")
    pdf.to_parquet(p)
    with pytest.raises(ValueError, match="reserved"):
        load(spark, p, input_format="parquet", save_additional_columns=["status"])


def test_directory_scan_union(spark, tmp_path):
    """S8: a directory of homogeneous files = one logical table."""
    d = tmp_path / "many"
    d.mkdir()
    for i in range(3):
        pd.DataFrame({"url": [f"http://x/{i}_{j}.jpg" for j in range(4)]}).to_parquet(
            str(d / f"part{i}.parquet")
        )
    df = load(spark, str(d), input_format="parquet")
    assert df.count() == 12
