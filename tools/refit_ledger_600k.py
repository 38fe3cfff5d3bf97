"""SCALE.md §13/§14 measurement: the refit recall ledger on the
clustered 600k corpus (64 clusters, 16 of them wave-only — the r12
refit-economics drift scenario), production-ish books (m=8, k=16).

Usage: python tools/refit_ledger_600k.py [path] [--refine]
Prints the four-family ledger plus wall time.  ``--refine`` adds the
r14 maintained-refine families (include_refine=True) at the
corpus-sized rf — recommended_refine_factor(600k, 64 cells) = 16, the
auto-rf the engine's production default would pick at this occupancy —
the measurement closing the r13 gap: the compressed stage at 10×
occupancy reads 0.025-0.16 even post-refit; the refine stage is the
recall remedy and must now be measured THROUGH the maintained index.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from img2dataset_spark.operators.recall import refit_recall_ledger
from img2dataset_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    refine = "--refine" in sys.argv[1:]
    # --nprobe=N: attribution knob — if doubling nprobe moves the
    # refined families but rf does not, the residual loss is PROBE
    # loss (a true neighbor in an unprobed cell), not pool size
    nprobe = 8
    rf = None
    for a in sys.argv[1:]:
        if a.startswith("--nprobe="):
            nprobe = int(a.split("=", 1)[1])
        if a.startswith("--rf="):
            rf = int(a.split("=", 1)[1])
    path = args[0] if args else ".scratch/clustered600k.parquet"
    spark = get_spark(app_name="refit_ledger_600k")
    df = spark.read.parquet(path)
    base = df.filter(F.col("vec_id") % 64 < 48)
    kw = {}
    if refine:
        from img2dataset_spark.operators.similarity import (
            recommended_refine_factor,
        )

        kw = dict(
            include_refine=True,
            refine_factor=(
                rf
                if rf is not None
                else recommended_refine_factor(df.count(), 64)
            ),
        )
        print(f"refine_factor: {kw['refine_factor']}"
              + ("" if rf is not None else " (auto, corpus-sized)"))
    t0 = time.time()
    print(f"nprobe: {nprobe}")
    rows = refit_recall_ledger(
        df, base, num_cells=64, pq_subspaces=8, pq_codes=16,
        num_queries=8, nprobe=nprobe, threshold=1.3, **kw,
    ).collect()
    wall = time.time() - t0
    for r in sorted(rows, key=lambda r: r["family"]):
        print(f"{r['family']}: mean={r['mean_recall']} min={r['min_recall']}")
    print(f"wall: {wall:.1f}s")


if __name__ == "__main__":
    main()
