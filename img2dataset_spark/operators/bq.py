"""Binary quantization (BQ) — 1-bit hyperplane codes + Hamming search.

The third standard embedding-compression family, completing the
triptych with PQ (operators/pq.py, subspace codebooks) and SQ8
(operators/sq.py, per-dimension bytes): each vector becomes
``num_planes`` SIGN BITS against the repo's deterministic md5-seeded
integer hyperplanes (:func:`similarity.hyperplane_coeffs` — the same
planes, same fixed-point quantization, and same sign convention the
embedding-LSH banding already oracle-mirrors), packed 32 bits per
int64 word.  num_planes/8 bytes per vector — the most aggressive
compression of the three (64 planes = 8 bytes/vector), with the
coarsest distance: Hamming distance between codes estimates the angle
(Charikar 2002, the simhash bound: P[bit differs] = θ/π).

Spark-first shape:

- **encode** is ONE Arrow pass with the (num_planes × dim) integer
  coefficient matrix broadcast: a single (n × d) @ (d × p) int64
  matmul, sign bits packed little-endian, 32 bits per word (words stay
  positive — no sign-bit hazard anywhere).  No fit step at all: the
  planes are pure functions of (j, i), so encode is embarrassingly
  parallel and two corpora encoded independently are directly
  comparable (the cross-corpus screening property PQ/SQ8 lack).
- **search** is pure codegen: the query's words are literals and each
  row costs ceil(p/32) ``bit_count(codes[w] ^ qw)`` terms summed —
  JVM popcount over longs, the cheapest scan of the three families —
  ranked (hamming asc, id asc) via TakeOrdered.

Composes with :func:`similarity.ivf_assign` partitioning for coarse
pruning like the other families.  SQL twin: the hyperplane dot, sign,
packing and xor/bit_count are mirrored term-for-term (DuckDB has
xor()/bit_count on BIGINT; 32-bit words keep every value far from the
sign bit in both engines).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from img2dataset_spark.operators.similarity import _QUANT, _as_double


def _plane_matrix(num_planes: int, dim: int) -> np.ndarray:
    from img2dataset_spark.operators.similarity import hyperplane_coeffs

    return np.asarray(hyperplane_coeffs(num_planes, dim), dtype=np.int64).T


def _pack_bits(bits: np.ndarray) -> np.ndarray:
    """(n × p) {0,1} -> (n × ceil(p/32)) int64 words, little-endian
    32 bits per word (word values < 2^32: no sign-bit handling needed
    in either engine)."""
    n, p = bits.shape
    words = np.zeros((n, (p + 31) // 32), dtype=np.int64)
    for j in range(p):
        words[:, j // 32] |= bits[:, j].astype(np.int64) << (j % 32)
    return words


def bq_encode(
    df: DataFrame,
    num_planes: int = 64,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes array<long>) — sign bit per hyperplane (exact int64
    dot over 2^-20 fixed-point quantized vectors; dot >= 0 -> 1, the
    embedding-LSH convention), packed 32 bits per word."""
    from pyspark.sql.functions import pandas_udf

    C = _plane_matrix(num_planes, dim)  # d x p
    bc = df.sparkSession.sparkContext.broadcast(C)

    @pandas_udf("array<long>")
    def encode(vs: pd.Series) -> pd.Series:
        M = bc.value
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        QV = np.floor(V * _QUANT + 0.5).astype(np.int64)
        bits = (QV @ M >= 0).astype(np.int64)
        return pd.Series(list(_pack_bits(bits)))

    e = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
    return e.select(id_col, encode(F.col("_v")).alias("codes"))


def encode_query_bits(
    query_vec: list[float], num_planes: int = 64, dim: int = 64
) -> np.ndarray:
    """The query's packed code words, driver-side — same integer dot,
    same sign rule, same packing as the distributed encode."""
    C = _plane_matrix(num_planes, dim)
    q = np.asarray(query_vec, dtype=np.float64)
    if q.shape[0] != dim:
        raise ValueError(f"query dim {q.shape[0]} != {dim}")
    qq = np.floor(q * _QUANT + 0.5).astype(np.int64)
    bits = (qq @ C >= 0).astype(np.int64)[None, :]
    return _pack_bits(bits)[0]


def bq_topk(
    codes_df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    num_planes: int = 64,
    dim: int = 64,
    id_col: str = "vec_id",
) -> DataFrame:
    """Hamming top-k over packed binary codes: the query's words are
    plan literals and each row is ceil(p/32) JVM popcounts —
    whole-stage codegen, no UDF, no join, no vector read.  Returns
    (id, hamming), (hamming asc, id asc), limit k."""
    qrow = query_df.select("query_vec").collect()
    if len(qrow) != 1:
        raise ValueError(f"query_df must have exactly 1 row, got {len(qrow)}")
    qw = encode_query_bits(
        [float(x) for x in qrow[0]["query_vec"]], num_planes, dim
    )
    dist = None
    for w, val in enumerate(qw):
        term = F.bit_count(
            F.col("codes")[w].bitwiseXOR(F.lit(int(val)).cast("long"))
        ).cast("long")
        dist = term if dist is None else dist + term
    # width guard: a codes table encoded with a DIFFERENT num_planes
    # yields null array reads -> null hamming, and Spark's default asc
    # ordering is NULLS FIRST — misconfigured rows would silently rank
    # top-k.  Fail loudly naming the mismatch instead.
    dist = F.when(
        F.size(F.col("codes")) != len(qw),
        F.raise_error(
            F.concat(
                F.lit(
                    f"bq_topk: codes width != {len(qw)} words "
                    f"(num_planes={num_planes}) — got "
                ),
                F.size(F.col("codes")).cast("string"),
            )
        ).cast("long"),
    ).otherwise(dist)
    scored = codes_df.select(F.col(id_col), dist.alias("hamming"))
    return scored.orderBy(F.asc("hamming"), F.asc(id_col)).limit(k)
