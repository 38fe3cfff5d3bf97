"""Scale-rehearsal data generator: replicate /root/testdata/sf0.1 to a
larger scale factor with disjoint key spaces per replica.

Usage:
    python tools/make_scale.py [--factor 10] [--out .scratch/sf1.0]

Design (why not naive row duplication):

- **Keys stay globally unique.** Every replica k shifts each table's
  primary key (and the foreign keys that reference it) by
  ``k * (max_key + 1)``, so joins keep the same per-key fan-out as the
  base data instead of multiplying it.
- **Duplicate density stays constant.** Exact ×N copies of `documents`
  text would turn the whole corpus into near-duplicates and measure the
  pair-explosion path, not scaling. Replica k>0 deterministically
  shuffles each document's words (seeded per (doc, replica)), which
  destroys shingle overlap while preserving length/char/language
  statistics, so dedup pair counts scale ~linearly like a real corpus.
- **Embedding geometry stays non-degenerate.** Replica k>0 draws fresh
  seeded Gaussian vectors (same dim / norm scale / label marginals)
  rather than copying, so hyperplane-LSH buckets grow linearly instead
  of collapsing every replica into one bucket.
- **Event-time range is preserved** (same ts values, new user/event
  ids), so watermark/session/window semantics see more concurrent
  users, not a longer timeline — which is how event streams actually
  scale.
- Dimension tables (`region`, `nation`) are copied unchanged: TPC-H
  scaling holds dims fixed, and the engine should keep broadcasting
  them.

Output schemas are byte-identical to the source (same arrow types,
``timestamp[us]`` preserved); row groups are capped at 256k rows so
Spark can split scans.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
# table -> primary key column whose (max+1) defines the replica stride
PK = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
# table -> {column: stride-source-table} for foreign keys
FK = {
    "orders": {"o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"user_id": "__events_user__"},
}


def _shift(tbl: pa.Table, col: str, delta: int) -> pa.Table:
    i = tbl.schema.get_field_index(col)
    shifted = pc.add(tbl.column(i), pa.scalar(delta, tbl.schema.field(i).type))
    return tbl.set_column(i, tbl.schema.field(i), shifted)


def _shuffle_words(text: str, rng: np.random.Generator) -> str:
    words = text.split(" ")
    rng.shuffle(words)
    return " ".join(words)


def scale_table(name: str, factor: int, strides: dict[str, int]) -> pa.Table:
    base = pq.read_table(f"{SRC}/{name}.parquet")
    if name in ("region", "nation"):
        return base
    reps = [base]
    for k in range(1, factor):
        t = base
        if name in PK:
            t = _shift(t, PK[name], k * strides[name])
        for col, ref in FK.get(name, {}).items():
            t = _shift(t, col, k * strides[ref])
        if name == "documents":
            rng = np.random.default_rng(1_000_003 * k)
            texts = t.column("text").to_pylist()
            texts = [_shuffle_words(s, rng) if s else s for s in texts]
            i = t.schema.get_field_index("text")
            t = t.set_column(i, t.schema.field(i), pa.array(texts, pa.string()))
        elif name == "embeddings":
            rng = np.random.default_rng(2_000_003 * k)
            emb = t.column("embedding").to_pylist()
            dim = len(emb[0])
            fresh = rng.standard_normal((len(emb), dim)).astype(np.float32)
            i = t.schema.get_field_index("embedding")
            t = t.set_column(
                i, t.schema.field(i), pa.array(list(fresh), pa.list_(pa.float32()))
            )
        reps.append(t)
    return pa.concat_tables(reps)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default=".scratch/sf1.0")
    args = ap.parse_args()

    strides: dict[str, int] = {}
    for name, pk in PK.items():
        col = pq.read_table(f"{SRC}/{name}.parquet", columns=[pk]).column(0)
        strides[name] = pc.max(col).as_py() + 1
    uid = pq.read_table(f"{SRC}/events.parquet", columns=["user_id"]).column(0)
    strides["__events_user__"] = pc.max(uid).as_py() + 1

    os.makedirs(args.out, exist_ok=True)
    for name in TABLES:
        out = scale_table(name, args.factor, strides)
        if name in ("region", "nation"):
            pq.write_table(out, f"{args.out}/{name}.parquet")
            print(f"{name}: {out.num_rows} rows -> 1 file")
            continue
        # At real scale a table is thousands of files; a single small
        # file is ONE byte-range split (spark.sql.files.maxPartitionBytes
        # is 128 MB), which would serialize every map stage onto one
        # core regardless of row-group count.  Mirror a distributed
        # writer's layout: a `name.parquet/` directory of part files,
        # one per available core (Spark and DuckDB both read the
        # directory transparently).
        nparts = min(32, max(1, out.num_rows // 4096))
        d = f"{args.out}/{name}.parquet"
        os.makedirs(d, exist_ok=True)
        step = -(-out.num_rows // nparts)
        for i in range(nparts):
            chunk = out.slice(i * step, step)
            if chunk.num_rows:
                pq.write_table(chunk, f"{d}/part-{i:05d}.parquet")
        print(f"{name}: {out.num_rows} rows -> {nparts} part files")


if __name__ == "__main__":
    main()
