"""W1-W8: sharded sinks with deterministic per-shard file names.

Reference semantics (citations into /root/reference):
  - deterministic names '{shard:0{oom}d}.{tar|parquet|tfrecord}' or a
    subfolder per shard: img2dataset/writer.py:70-74,107-112,176-180,259-263
  - files sink: {key}.jpg + {key}.txt + {key}.json per row:
    writer.py:246-293
  - webdataset sink: tar of key.jpg/key.txt/key.json triples:
    writer.py:94-135
  - parquet sink: meta schema + binary payload column: writer.py:55-91
  - metadata parquet alongside every payload sink: writer.py:13-52
  - stats json per shard: img2dataset/logger.py:162-191
  - caption None -> "": writer.py:82,123,193,277

Spark-first design: Spark's native writers emit opaque part-file names,
so the "one deterministically-named file per shard" contract is
implemented as `groupBy(shard_id).applyInPandas(write_shard)` — each
shard (10k rows, the reference's unit of work) becomes one Arrow batch
handed to one task, which writes its files and RETURNS the shard's
stats row (A1).  One job therefore executes payload sink + metadata
sink + stats aggregation in a single pass with no extra shuffle beyond
the groupBy-by-shard (which the sharding step already keyed).

All paths go through img2dataset_spark.io.fs, so `output_folder`
accepts file:// (or bare paths), memory:// (tests/dry-runs), and — with
fsspec + a backend installed — s3://, gs://, hdfs://, matching the
reference's fsspec routing (writer.py:107-113).
"""

from __future__ import annotations

import io
import json
import tarfile
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from img2dataset_spark.config import PipelineConfig
from img2dataset_spark.io import fs
from img2dataset_spark.plans.pipeline import metadata_columns  # noqa: F401

STATS_SCHEMA = (
    "shard_id long, count long, successes long, failed_to_download long, "
    "failed_to_resize long, duration double, start_time double, "
    "end_time double, status_dict string"
)


def _shard_name(shard_id: int, oom: int) -> str:
    return f"{int(shard_id):0{oom}d}"


def _meta_records(pdf: pd.DataFrame, payload_col: str) -> list[dict]:
    meta = pdf.drop(columns=[payload_col, "shard_id"], errors="ignore")
    records = []
    for rec in meta.to_dict(orient="records"):
        clean = {}
        for k, v in rec.items():
            if isinstance(v, float) and pd.isna(v):
                v = None
            elif pd.api.types.is_scalar(v) and pd.isna(v):
                v = None
            if hasattr(v, "item"):  # numpy scalar -> python
                v = v.item()
            elif hasattr(v, "tolist"):  # T15: ndarray -> list
                v = v.tolist()
            clean[k] = v
        records.append(clean)
    return records


def write_shard_files(
    pdf: pd.DataFrame, out: str, shard: str, payload_col: str, caption: bool
) -> None:
    """W1: one file-triple per row in a per-shard subfolder."""
    d = fs.join(out, shard)
    fs.makedirs(d)
    for rec, payload in zip(
        _meta_records(pdf, payload_col), pdf[payload_col], strict=True
    ):
        key = rec["key"]
        if payload is not None:
            with fs.open_write(fs.join(d, f"{key}.{_ext(payload_col)}")) as fh:
                fh.write(payload)
            if caption:
                with fs.open_write(fs.join(d, f"{key}.txt"), text=True) as fh:
                    fh.write(rec.get("caption") or "")
        with fs.open_write(fs.join(d, f"{key}.json"), text=True) as fh:
            json.dump(rec, fh, default=str)


def write_shard_webdataset(
    pdf: pd.DataFrame, out: str, shard: str, payload_col: str, caption: bool
) -> None:
    """W2: tar per shard with key.jpg/key.txt/key.json members."""
    with fs.open_write(fs.join(out, f"{shard}.tar")) as raw:
        tar = tarfile.open(fileobj=raw, mode="w")
        for rec, payload in zip(
            _meta_records(pdf, payload_col), pdf[payload_col], strict=True
        ):
            if payload is None:
                continue
            key = rec["key"]
            _tar_add(tar, f"{key}.{_ext(payload_col)}", payload)
            if caption:
                _tar_add(tar, f"{key}.txt", (rec.get("caption") or "").encode())
            _tar_add(tar, f"{key}.json", json.dumps(rec, default=str).encode())
        tar.close()


def _tar_add(tar: tarfile.TarFile, name: str, data: bytes) -> None:
    info = tarfile.TarInfo(name=name)
    info.size = len(data)
    info.mtime = 0  # deterministic output bytes
    tar.addfile(info, io.BytesIO(data))


def write_shard_parquet(
    pdf: pd.DataFrame, out: str, shard: str, include_payload: bool, payload_col: str
) -> None:
    """W3/W6: parquet per shard (payload column included for the parquet
    output format, excluded for pure metadata)."""
    cols = pdf.drop(columns=["shard_id"], errors="ignore")
    if not include_payload:
        cols = cols.drop(columns=[payload_col], errors="ignore")
    table = pa.Table.from_pandas(cols, preserve_index=False)
    with fs.open_write(fs.join(out, f"{shard}.parquet")) as fh:
        pq.write_table(table, fh)


def write_shard_tfrecord(
    pdf: pd.DataFrame, out: str, shard: str, payload_col: str
) -> None:
    from img2dataset_spark.sinks.tfrecord import write_tfrecord

    examples = []
    for rec, payload in zip(
        _meta_records(pdf, payload_col), pdf[payload_col], strict=True
    ):
        if payload is None:
            continue
        ex = dict(rec)
        ex[payload_col] = bytes(payload)
        examples.append(ex)
    with fs.open_write(fs.join(out, f"{shard}.tfrecord")) as fh:
        write_tfrecord(fh, examples)


def _ext(payload_col: str) -> str:
    return payload_col


def make_shard_writer(config: PipelineConfig):
    """Build the applyInPandas function writing one shard + returning its
    stats row (F6 schema)."""
    out = config.output_folder
    oom = config.oom_shard_count
    payload_col = config.encode_format
    fmt = config.output_format
    has_caption = config.caption_col is not None

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        t0 = time.time()
        pdf = pdf.sort_values("key").reset_index(drop=True)
        shard_id = int(pdf["shard_id"].iloc[0])
        shard = _shard_name(shard_id, oom)
        fs.makedirs(out)

        if fmt == "files":
            write_shard_files(pdf, out, shard, payload_col, has_caption)
        elif fmt == "webdataset":
            write_shard_webdataset(pdf, out, shard, payload_col, has_caption)
        elif fmt == "parquet":
            write_shard_parquet(pdf, out, shard, True, payload_col)
        elif fmt == "tfrecord":
            write_shard_tfrecord(pdf, out, shard, payload_col)
        elif fmt == "dummy":
            pass  # W5: discard payload
        else:
            raise ValueError(f"unknown output format {fmt}")

        # W6: metadata parquet alongside every payload sink — except dummy,
        # whose writer emits nothing at all (writer.py:296-306)
        if fmt not in ("parquet", "dummy"):
            write_shard_parquet(pdf, out, shard, False, payload_col)

        # W7/A1: per-shard stats sidecar
        t1 = time.time()
        statuses = pdf["status"].value_counts().to_dict()
        errors = (
            pdf.loc[pdf["error_message"].notna(), "error_message"]
            .value_counts()
            .to_dict()
        )
        stats = {
            "shard_id": shard_id,
            "count": int(len(pdf)),
            "successes": int(statuses.get("success", 0)),
            "failed_to_download": int(statuses.get("failed_to_download", 0)),
            "failed_to_resize": int(statuses.get("failed_to_resize", 0)),
            "duration": t1 - t0,
            "start_time": t0,
            "end_time": t1,
            "status_dict": json.dumps(
                {str(k): int(v) for k, v in errors.items()}, sort_keys=True
            ),
        }
        with fs.open_write(fs.join(out, f"{shard}_stats.json"), text=True) as fh:
            json.dump(stats, fh)
        return pd.DataFrame([stats])

    return write_shard


def write_output(df, config: PipelineConfig):
    """Execute all sinks for a built pipeline DataFrame; returns the
    per-shard stats rows (A1) collected to the driver (tiny: 1/shard)."""
    writer = make_shard_writer(config)
    stats_df = df.groupby("shard_id").applyInPandas(writer, schema=STATS_SCHEMA)
    return stats_df.collect()


def write_wave_sidecar(
    output_folder: str,
    wave_id: int,
    lo_shard: int,
    hi_shard: int,
    shard_stats: list,
    start_time: float,
    end_time: float,
) -> dict:
    """R2 observability: one JSON sidecar per executed subjob wave, so a
    100-wave 100 TB run is monitorable mid-flight at WAVE granularity
    (the reference's logger stream shows batch progress the same way —
    logger.py:220-271 prints per-batch rollups).  The filename suffix
    '_wavestats.json' deliberately does NOT match the per-shard
    '*_stats.json' glob: the shard-level progress stream and the
    done-shard discovery (plans/incremental.py) must never double-count
    a wave rollup as a shard.  wave_id is the shard-space bucket
    (shard_id div subjob_size), stable across kill/resume — a re-run
    wave overwrites its own sidecar."""
    from img2dataset_spark.io import fs

    agg = {
        "wave_id": int(wave_id),
        "lo_shard": int(lo_shard),
        "hi_shard": int(hi_shard),
        "shards": len(shard_stats),
        "count": int(sum(r["count"] for r in shard_stats)),
        "successes": int(sum(r["successes"] for r in shard_stats)),
        "failed_to_download": int(
            sum(r["failed_to_download"] for r in shard_stats)
        ),
        "failed_to_resize": int(sum(r["failed_to_resize"] for r in shard_stats)),
        "duration": end_time - start_time,
        "start_time": start_time,
        "end_time": end_time,
    }
    if not fs.isdir(output_folder):
        fs.makedirs(output_folder)
    path = fs.join(output_folder, f"wave_{wave_id:05d}_wavestats.json")
    with fs.open_write(path, text=True) as fh:
        json.dump(agg, fh)
    return agg
