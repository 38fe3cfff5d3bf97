"""SCALE.md §13 measurement: the refit recall ledger on the clustered
600k corpus (64 clusters, 16 of them wave-only — the r12
refit-economics drift scenario), production-ish books (m=8, k=16).

Usage: python tools/refit_ledger_600k.py [path]
Prints the four-family ledger plus wall time.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from img2dataset_spark.operators.recall import refit_recall_ledger
from img2dataset_spark.session import get_spark


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else ".scratch/clustered600k.parquet"
    spark = get_spark(app_name="refit_ledger_600k")
    df = spark.read.parquet(path)
    base = df.filter(F.col("vec_id") % 64 < 48)
    t0 = time.time()
    rows = refit_recall_ledger(
        df, base, num_cells=64, pq_subspaces=8, pq_codes=16,
        num_queries=8, nprobe=8, threshold=1.3,
    ).collect()
    wall = time.time() - t0
    for r in sorted(rows, key=lambda r: r["family"]):
        print(f"{r['family']}: mean={r['mean_recall']} min={r['min_recall']}")
    print(f"wall: {wall:.1f}s")


if __name__ == "__main__":
    main()
