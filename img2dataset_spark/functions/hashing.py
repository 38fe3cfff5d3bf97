"""T11/P4: content hashing and hash verification — JVM built-ins only.

Reference semantics:
  - md5/sha256/sha512 hex digest of raw fetched bytes:
    /root/reference/img2dataset/downloader.py:338-340
  - hash verification: recompute digest of fetched bytes, compare to the
    expected column; mismatch => status failed_to_download, payload
    nulled, row KEPT: downloader.py:274-292

Spark-first: `md5()` and `sha2()` are whole-stage-codegen built-ins —
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash_column(data: Column, algorithm: str) -> Column:
    """Hex digest of a binary column using JVM built-ins."""
    if algorithm == "md5":
        return F.md5(data)
    if algorithm == "sha256":
        return F.sha2(data, 256)
    if algorithm == "sha512":
        return F.sha2(data, 512)
    raise ValueError(f"unsupported hash algorithm {algorithm}")


def hash_mismatch(data: Column, expected: Column, algorithm: str) -> Column:
    """True when the recomputed digest differs from the expected value
    (case-insensitive, as hex strings)."""
    return F.lower(expected) != hash_column(data, algorithm)
