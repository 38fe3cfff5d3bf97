"""W8/J1/A5: incremental / overwrite / extend output management.

Reference semantics (citations into /root/reference):
  - done-shard discovery from existing '*_stats.json' names + skip:
    img2dataset/main.py:153-168, reader.py:138-142
  - extend mode resume point = max(existing shard id) + 1:
    main.py:163-165
  - overwrite mode clears the output folder: main.py:133-146

The done-shard skip is expressed downstream as a broadcast LEFT ANTI
join on shard_id (plans.pipeline.download) — partition pruning for
state that lives in the output directory, which Catalyst cannot infer
on its own (SURVEY §4).
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

from img2dataset_spark.config import PipelineConfig
from img2dataset_spark.io import fs

_STATS_RE = re.compile(r"(\d+)_stats\.json$")


def existing_shard_ids(output_folder: str) -> set[int]:
    """Shard ids recovered from '{shard}_stats.json' sidecars (A6)."""
    ids: set[int] = set()
    for path in fs.glob(fs.join(output_folder, "*_stats.json")):
        m = _STATS_RE.search(fs.basename(path))
        if m:
            ids.add(int(m.group(1)))
    return ids


def resolve_incremental(
    spark: SparkSession, config: PipelineConfig
) -> tuple[set[int], int]:
    """Returns (done_shards, start_shard_id) per the configured mode."""
    out = config.output_folder
    if config.incremental_mode == "overwrite":
        if fs.isdir(out):
            fs.rmtree(out)
        return set(), 0
    if config.incremental_mode == "incremental":
        return existing_shard_ids(out), 0
    if config.incremental_mode == "extend":
        done = existing_shard_ids(out)
        return set(), (max(done) + 1) if done else 0
    raise ValueError(f"unknown incremental mode {config.incremental_mode}")
