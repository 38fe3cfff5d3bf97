"""Input scans S1-S8: 11 input formats behind one `load()`.

Reference behavior being re-expressed (citations into /root/reference):
  - format dispatch + schema inference: img2dataset/reader.py:95-120
  - canonical renames url_col->url, caption_col->caption,
    verify_hash_col-><alg>: img2dataset/reader.py:124-133
  - column projection (url/caption/hash/additional): reader.py:66-79
  - directory scan = sorted multi-file union: reader.py:59-64,197-212
  - reserved-column enforcement: img2dataset/main.py:45-70

Spark-first notes: every format maps to a native `spark.read` source, so
column pruning and (for parquet) predicate pushdown come from Catalyst.
Gzip variants need no special casing — Hadoop codec inference handles
`.gz`.  A directory path is passed straight to the reader (implicit
UNION ALL over files, no driver-side loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from img2dataset_spark.config import RESERVED_COLUMNS


def _base_format(input_format: str) -> str:
    return input_format[:-3] if input_format.endswith(".gz") else input_format


def load(
    spark: SparkSession,
    path: str,
    input_format: str = "txt",
    url_col: str = "url",
    caption_col: str | None = None,
    verify_hash: tuple[str, str] | None = None,
    save_additional_columns: list[str] | None = None,
) -> DataFrame:
    """Read any supported input format into a canonical DataFrame with
    columns: url [, caption] [, <hash alg>] [, additional...]."""
    fmt = _base_format(input_format)

    if fmt == "txt":
        # reader.py:99-100 — one URL per line, single-column schema ["url"]
        df = spark.read.text(path).withColumnRenamed("value", url_col)
    elif fmt == "csv":
        df = spark.read.option("header", True).option("inferSchema", True).csv(path)
    elif fmt == "tsv":
        df = (
            spark.read.option("header", True)
            .option("inferSchema", True)
            .option("sep", "\t")
            .csv(path)
        )
    elif fmt == "jsonl":
        df = spark.read.json(path)
    elif fmt == "json":
        df = _read_whole_file_json(spark, path)
    elif fmt == "parquet":
        df = spark.read.parquet(path)
    else:
        raise ValueError(f"Unsupported input format: {input_format}")

    return _canonicalize(
        df,
        url_col=url_col,
        caption_col=caption_col,
        verify_hash=verify_hash,
        save_additional_columns=save_additional_columns,
    )


def _read_whole_file_json(spark: SparkSession, path: str) -> DataFrame:
    """Whole-file JSON (reference uses pandas.read_json, reader.py:101-102).

    Supports both a JSON array of records (native Spark multiLine) and the
    pandas column-oriented dict ({"col": {"0": v0, ...}}).  Whole-file JSON
    is inherently a small-file format (one document per file); jsonl is the
    scale path.
    """
    df = spark.read.option("multiLine", True).json(path)
    # Column-oriented pandas JSON parses as struct columns keyed by row
    # index — detect and fall back to a driver-side pandas parse.
    from pyspark.sql.types import StructType

    if df.schema.fields and all(isinstance(f.dataType, StructType) for f in df.schema.fields):
        import glob
        import os

        import pandas as pd

        if os.path.isdir(path):
            files = sorted(
                glob.glob(os.path.join(path, "*.json"))
                + glob.glob(os.path.join(path, "*.json.gz"))
            )
        else:
            files = sorted(glob.glob(path)) if any(c in path for c in "*?[") else [path]
        # This fallback parses on the DRIVER (pandas) — cap it so a
        # misrouted multi-GB input fails with advice instead of OOMing
        # the driver.  256 MB compressed is far beyond any sane
        # column-oriented JSON document.
        total = sum(os.path.getsize(f) for f in files if os.path.exists(f))
        if total > 256 * 1024 * 1024:
            raise ValueError(
                f"column-oriented JSON input is {total >> 20} MB; this "
                "format parses on the driver and is meant for small "
                "files — convert to jsonl (line-delimited) for a "
                "distributed scan"
            )
        parts = [pd.read_json(f) for f in files]
        pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        df = spark.createDataFrame(pdf)
    return df


def _canonicalize(
    df: DataFrame,
    url_col: str,
    caption_col: str | None,
    verify_hash: tuple[str, str] | None,
    save_additional_columns: list[str] | None,
) -> DataFrame:
    """Projection + canonical renames (reader.py:66-79,124-133) with
    reserved-namespace validation (main.py:45-70)."""
    if url_col not in df.columns:
        raise ValueError(f"url column {url_col!r} not found in input columns {df.columns}")

    column_list: list[tuple[str, str]] = [(url_col, "url")]  # (source, canonical)
    if caption_col is not None:
        if caption_col not in df.columns:
            raise ValueError(f"caption column {caption_col!r} not found")
        column_list.append((caption_col, "caption"))
    if verify_hash is not None:
        hash_col, hash_alg = verify_hash
        if hash_col not in df.columns:
            raise ValueError(f"verify-hash column {hash_col!r} not found")
        column_list.append((hash_col, hash_alg))
    if save_additional_columns:
        clashes = RESERVED_COLUMNS.intersection(save_additional_columns)
        if clashes:
            raise ValueError(
                f"additional columns clash with reserved namespace: {sorted(clashes)}"
            )
        for c in save_additional_columns:
            if c not in df.columns:
                raise ValueError(f"additional column {c!r} not found")
            column_list.append((c, c))

    return df.select([df[src].alias(dst) for src, dst in column_list])
