"""Run the quantizer recall ledger at a scale point and print ONE JSON
line — the companion to bench.py for QUALITY numbers: SCALE.md records
(family, mean_recall, min_recall) per sf the same way it records
wall-times, so recall claims carry measurements instead of adjectives.

Usage: python tools/recall_ledger.py [sf_dir] [num_queries] [k] [nprobe]
                                     [pq_codes] [pq_subspaces]
(nprobe may be the literal ``auto`` to route the IVF families through
similarity.recommended_nprobe — the production default; sf_dir may be
a direct parquet path, e.g. tools/make_clustered.py output; pq_codes
defaults 16, pq_subspaces 8 — pass 256 for the FAISS-default sweep)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from img2dataset_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    num_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    nprobe_arg = sys.argv[4] if len(sys.argv) > 4 else "4"
    nprobe = None if nprobe_arg == "auto" else int(nprobe_arg)
    pq_codes = int(sys.argv[5]) if len(sys.argv) > 5 else 16
    pq_subspaces = int(sys.argv[6]) if len(sys.argv) > 6 else 8

    from img2dataset_spark.operators.recall import quantizer_recall_ledger

    spark = get_spark(app_name="recall_ledger")
    # sf_dir may be a scale dir (read its embeddings table) or a direct
    # parquet path (e.g. tools/make_clustered.py output)
    src = (
        sf_dir
        if sf_dir.endswith(".parquet")
        else os.path.join(sf_dir, "embeddings.parquet")
    )
    emb = spark.read.parquet(src)
    rows = quantizer_recall_ledger(
        emb, k=k, num_queries=num_queries, nprobe=nprobe,
        pq_codes=pq_codes, pq_subspaces=pq_subspaces,
    ).collect()
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "quantizer_recall_at_k",
                "k": k,
                "num_queries": num_queries,
                "nprobe": "auto" if nprobe is None else nprobe,
                "pq_codes": pq_codes,
                "pq_subspaces": pq_subspaces,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "families": {
                    r["family"]: {
                        "mean_recall": r["mean_recall"],
                        "min_recall": r["min_recall"],
                    }
                    for r in rows
                },
            }
        )
    )


if __name__ == "__main__":
    main()
