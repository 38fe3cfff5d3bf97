"""Clustered synthetic embeddings — the representative-recall corpus.

The driver's `embeddings` table is iid Gaussian noise, which SCALE.md
§10 measured as the ADVERSARIAL corpus for low-bit quantizers: at 600k
iid vectors the exact top-10 neighbors are nearly equidistant
(distance concentration), so PQ/BQ recall collapses (0.075/0.1) in a
way that says nothing about real embeddings.  Real text/image
embeddings CLUSTER — neighbors are same-cluster points separated from
the rest by a gap codes can resolve.  This generator makes that
corpus: a mixture of ``clusters`` Gaussians whose centers are spread
far (sigma_center = 1) relative to the within-cluster noise
(sigma_point = 0.2 by default), so expected intra-cluster distance
(~0.2·sqrt(2·64) ≈ 2.3) sits well under expected inter-center
distance (~sqrt(2·64) ≈ 11.3) — a resolvable neighbor structure at
any corpus size.

Everything is seeded and size-independent per row-block, so the same
(seed, clusters, dim) always yields the same vector for a given
vec_id regardless of total row count — recall ledgers at different
scales measure MORE corpus, not different data.

Usage:
    python tools/make_clustered.py --rows 60000 --out /tmp/clustered.parquet
"""

from __future__ import annotations

import argparse

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def clustered_embeddings(
    n: int,
    dim: int = 64,
    clusters: int = 64,
    sigma_point: float = 0.2,
    seed: int = 7,
) -> np.ndarray:
    """(n, dim) float32 mixture-of-Gaussians matrix.  Row i belongs to
    cluster i % clusters (so every cluster is populated at any n and
    occupancy is balanced) and equals center[cluster] + sigma_point ·
    N(0, I), with the noise seeded per-row so the matrix is a pure
    function of (i, seed) — prefix-stable across corpus sizes."""
    rng_c = np.random.default_rng(seed)
    centers = rng_c.standard_normal((clusters, dim))
    # per-row noise from a counter-based stream: one generator seeded
    # once, drawing n*dim in order, is prefix-stable for growing n
    rng_p = np.random.default_rng(seed + 1)
    noise = rng_p.standard_normal((n, dim))
    labels = np.arange(n) % clusters
    return (centers[labels] + sigma_point * noise).astype(np.float32)


def write_clustered(
    path: str,
    n: int,
    dim: int = 64,
    clusters: int = 64,
    sigma_point: float = 0.2,
    seed: int = 7,
    rows_per_file: int = 65536,
) -> None:
    """Write (vec_id, embedding) parquet in the testdata embeddings
    schema — a directory of part files past one row-group so Spark
    can split the scan (the make_scale.py layout rule)."""
    import os

    V = clustered_embeddings(n, dim, clusters, sigma_point, seed)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(V), pa.list_(pa.float32())),
        }
    )
    if n <= rows_per_file:
        pq.write_table(tbl, path)
        return
    os.makedirs(path, exist_ok=True)
    nparts = -(-n // rows_per_file)
    for i in range(nparts):
        chunk = tbl.slice(i * rows_per_file, rows_per_file)
        if chunk.num_rows:
            pq.write_table(chunk, f"{path}/part-{i:05d}.parquet")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=60_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--clusters", type=int, default=64)
    ap.add_argument("--sigma", type=float, default=0.2)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--out", default="/tmp/embeddings_clustered.parquet")
    args = ap.parse_args()
    write_clustered(args.out, args.rows, args.dim, args.clusters,
                    args.sigma, args.seed)
    print(f"{args.out}: {args.rows} rows, {args.clusters} clusters, "
          f"dim {args.dim}, sigma {args.sigma}")


if __name__ == "__main__":
    main()
