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

Role in the menu (r9 verdict): 1-bit Hamming is the coarsest signal of
the three families — binary codes are a SCREEN, not a ranker.  The
shipped compositions reflect that: :func:`bq_refine_topk` (popcount
screen → broadcast semi-join → exact-cosine re-rank, the
IndexRefineFlat shape of pq.ivfpq_refine_topk) recovers exact ranking
while the corpus-sized pass stays 8 B/row, and
:func:`ivfbq_index` / :func:`ivfbq_topk` compose the coarse IVF probe
with the popcount scan (FAISS ``IndexBinaryIVF``) so the screen also
partition-prunes.  SQL twin: the hyperplane dot, sign, packing and
xor/bit_count are mirrored term-for-term (DuckDB has xor()/bit_count
on BIGINT; 32-bit words keep every value far from the sign bit in both
engines).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from img2dataset_spark.operators.similarity import (
    _QUANT,
    _as_double,
    collect_query_rows as _collect_query_rows,
)


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


def make_bq_encode_udf(spark, num_planes: int = 64, dim: int = 64):
    """The sign-bit encode as a reusable Arrow UDF (factory — pandas
    UDFs need an active session): exact int64 dot over 2^-20
    fixed-point quantized vectors against the broadcast plane matrix,
    dot >= 0 -> 1, packed 32 bits per word.  Shared by the batch
    encode, the IVF+BQ index builder, and the streaming admission
    pre-screen so every surface mints bit-identical codes."""
    from pyspark.sql.functions import pandas_udf

    C = _plane_matrix(num_planes, dim)  # d x p
    bc = spark.sparkContext.broadcast(C)

    @pandas_udf("array<long>")
    def encode(vs: pd.Series) -> pd.Series:
        M = bc.value
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        QV = np.floor(V * _QUANT + 0.5).astype(np.int64)
        bits = (QV @ M >= 0).astype(np.int64)
        return pd.Series(list(_pack_bits(bits)))

    return encode


def hamming_between(a, b):
    """codegen Hamming distance between two packed code COLUMNS:
    zip_with xor -> bit_count -> sum, all JVM-side.  NULL (not 0) when
    either side is null or the widths differ — callers guard on null,
    so a misconfigured pair can never read as distance 0."""
    return F.when(
        a.isNotNull() & b.isNotNull() & (F.size(a) == F.size(b)),
        F.aggregate(
            F.zip_with(
                a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long")
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )


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
    encode = make_bq_encode_udf(df.sparkSession, num_planes, dim)
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


def _hamming_expr(qw: np.ndarray, num_planes: int):
    """The popcount scan expression: ceil(p/32) JVM ``bit_count(codes[w]
    ^ literal)`` terms summed — whole-stage codegen.  Guarded: a codes
    table encoded with a DIFFERENT num_planes yields null array reads
    -> null hamming, and Spark's default asc ordering is NULLS FIRST —
    misconfigured rows would silently rank top-k.  Fail loudly naming
    the mismatch instead."""
    dist = None
    for w, val in enumerate(qw):
        term = F.bit_count(
            F.col("codes")[w].bitwiseXOR(F.lit(int(val)).cast("long"))
        ).cast("long")
        dist = term if dist is None else dist + term
    # NULL codes must hit the error branch too: size(NULL) is NULL under
    # default sizeOfNull=false, the != predicate would evaluate NULL, the
    # when() would fall through, and the NULL hamming would rank top-k
    # under asc NULLS FIRST — the exact hazard this guard exists for.
    return F.when(
        F.col("codes").isNull() | (F.size(F.col("codes")) != len(qw)),
        F.raise_error(
            F.concat(
                F.lit(
                    f"bq: codes width != {len(qw)} words "
                    f"(num_planes={num_planes}) — got "
                ),
                # coalesce: concat(NULL) would null the whole message
                # and raise_error(NULL) reports nothing useful
                F.coalesce(
                    F.size(F.col("codes")).cast("string"), F.lit("NULL")
                ),
            )
        ).cast("long"),
    ).otherwise(dist)


def _query_words(query_df: DataFrame, num_planes: int, dim: int) -> np.ndarray:
    qrow = _collect_query_rows(query_df, ("query_vec",))
    if len(qrow) != 1:
        raise ValueError(f"query_df must have exactly 1 row, got {len(qrow)}")
    return encode_query_bits(
        [float(x) for x in qrow[0]["query_vec"]], num_planes, dim
    )


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
    qw = _query_words(query_df, num_planes, dim)
    scored = codes_df.select(
        F.col(id_col), _hamming_expr(qw, num_planes).alias("hamming")
    )
    return scored.orderBy(F.asc("hamming"), F.asc(id_col)).limit(k)


def bq_refine_topk(
    codes_df: DataFrame,
    vectors_df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    refine_factor: int | None = None,
    num_planes: int = 64,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    refine_target_occupancy: int = 1024,
) -> DataFrame:
    """Two-stage binary search — the role 1-bit codes are FOR (r9
    verdict: Hamming is a screen, not a ranker): stage 1 takes the top
    ``k·refine_factor`` candidates by popcount Hamming (the cheapest
    corpus scan of the three families, 8 B/row at 64 planes), stage 2
    re-ranks ONLY those candidates by exact cosine against their raw
    vectors via a BROADCAST semi-join into the vector table — never a
    full vector scan.  Output (id, cos_sim) follows cosine_topk's
    convention (round6 quantized cosine, desc, id-asc ties), directly
    comparable to the brute-force baseline and to ivfpq_refine_topk.
    Mirrors pq.ivfpq_refine_topk:294-341.

    ``refine_factor=None`` (the default since round 13) sizes the
    candidate pool from the CORPUS: a flat screen scans all n rows —
    one cell of occupancy n — so the tie-mass argument that sizes the
    IVF refine (recommended_refine_factor: Hamming at a fixed plane
    budget cannot separate more candidates than its code space, and
    the indistinguishable mass grows with the scanned row count)
    applies with num_cells = 1.  rf = 4·ceil(sqrt(n / 1024)) capped
    at 256; exact recall is monotone in rf (the re-rank is exact over
    a superset), so the auto size can only match or beat the old
    fixed 4.  Pass an int to pin the pre-r13 behavior."""
    from img2dataset_spark.operators.similarity import (
        _as_double,
        cosine,
        memoized_count,
        recommended_refine_factor,
        round6,
    )

    if refine_factor is None:
        refine_factor = recommended_refine_factor(
            memoized_count(codes_df),
            1,
            target_occupancy=refine_target_occupancy,
        )
    cand = bq_topk(
        codes_df, query_df, k=k * refine_factor,
        num_planes=num_planes, dim=dim, id_col=id_col,
    )
    e = vectors_df.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("_v")
    )
    pruned = e.join(F.broadcast(cand.select(id_col)), id_col, "left_semi")
    q = F.broadcast(query_df.select("query_vec"))
    scored = pruned.crossJoin(q).select(
        F.col(id_col),
        round6(cosine(F.col("_v"), F.col("query_vec"))).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def ivfbq_index(
    df: DataFrame,
    ivf_codebook: DataFrame,
    num_planes: int = 64,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cell, codes) — the FAISS ``IndexBinaryIVF`` index row:
    coarse IVF cell for partition pruning plus the packed sign-bit
    words for the popcount scan.  ONE pass over one scan: the coarse
    assignment and the BQ encode are two independent Arrow UDFs of the
    SAME select, so Spark fuses them into a single ArrowEvalPython
    stage — the corpus is read once and never shuffled (the delivery
    of bq.py's r9 composability claim).  Write partitioned by cell;
    a query then reads nprobe cells' 8-byte codes.  Flat and
    hierarchical coarse codebooks both work (ivf_assign dispatches)."""
    from img2dataset_spark.operators.similarity import ivf_assign

    encode = make_bq_encode_udf(df.sparkSession, num_planes, dim)
    tagged = ivf_assign(df, ivf_codebook, vec_col, id_col)
    return tagged.select(
        F.col(id_col), "cell", encode(F.col("v")).alias("codes")
    )


def ivfbq_refine_topk(
    index_df: DataFrame,
    ivf_codebook: DataFrame,
    vectors_df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    nprobe: int | None = None,
    refine_factor: int | None = None,
    num_planes: int = 64,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    refine_target_occupancy: int = 1024,
) -> DataFrame:
    """The full binary composition — coarse probe × popcount screen ×
    exact re-rank (FAISS IndexBinaryIVF + RefineFlat): stage 1 takes
    the top ``k·refine_factor`` Hamming candidates from the probed
    cells' 8-byte words (partition-pruned scan), stage 2 re-ranks ONLY
    those rows by exact cosine via a broadcast semi-join into the raw
    vector table.  Completes the IVF × {PQ, SQ8, BQ} × refine matrix.
    Output (id, cos_sim), cosine_topk's convention.
    ``refine_factor=None`` sizes the candidate multiplier from cell
    occupancy (similarity.recommended_refine_factor — the r12
    production default; two memoized counts, no extra jobs on reused
    frames)."""
    from img2dataset_spark.operators.similarity import (
        _as_double,
        codebook_num_cells,
        cosine,
        memoized_count,
        recommended_refine_factor,
        round6,
    )

    if refine_factor is None:
        refine_factor = recommended_refine_factor(
            memoized_count(index_df),
            codebook_num_cells(ivf_codebook),
            target_occupancy=refine_target_occupancy,
        )
    cand = ivfbq_topk(
        index_df, ivf_codebook, query_df, k=k * refine_factor,
        nprobe=nprobe, num_planes=num_planes, dim=dim, id_col=id_col,
    )
    e = vectors_df.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("_v")
    )
    pruned = e.join(F.broadcast(cand.select(id_col)), id_col, "left_semi")
    q = F.broadcast(query_df.select("query_vec"))
    scored = pruned.crossJoin(q).select(
        F.col(id_col),
        round6(cosine(F.col("_v"), F.col("query_vec"))).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def ivfbq_topk(
    index_df: DataFrame,
    ivf_codebook: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    nprobe: int | None = None,
    num_planes: int = 64,
    dim: int = 64,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-pruned Hamming search: rank coarse cells by cosine(query,
    centroid) (the shared probe rule — 6-dp rounded, cell-ascending
    ties), keep the top ``nprobe``, and popcount-scan ONLY those cells'
    packed words.  The cell filter is a broadcast join that becomes
    partition pruning over a cell-partitioned index; the scan is
    ceil(p/32) JVM popcounts in whole-stage codegen.  Returns
    (id, hamming), (asc, id asc), top k.  ``nprobe=None`` auto-sizes
    ceil(sqrt(num_cells)) via similarity.recommended_nprobe (the
    measured sf1 probe-loss fix, SCALE.md §10)."""
    from img2dataset_spark.operators.similarity import (
        codebook_num_cells,
        probe_cells,
        recommended_nprobe,
    )

    if nprobe is None:
        nprobe = recommended_nprobe(codebook_num_cells(ivf_codebook))
    from img2dataset_spark.operators.similarity import (
        _collect_flat_codebook,
        static_prune_cells,
    )

    # probe_cells is the SAME round6-cosine-desc/cell-asc rule this
    # function previously inlined — flat codebooks rank on the driver
    # (r14); the probed cells become a STATIC IN-list predicate
    # (planning-time partition pruning over a cell-partitioned index)
    probed = probe_cells(ivf_codebook, query_df, nprobe, "cosine")
    pruned = static_prune_cells(
        index_df, (c for c, _ in _collect_flat_codebook(probed))
    )
    return bq_topk(pruned, query_df, k=k, num_planes=num_planes,
                   dim=dim, id_col=id_col)


def ivfbq_multi_topk(
    index_df: DataFrame,
    ivf_codebook: DataFrame,
    queries_df: DataFrame,
    k: int = 10,
    nprobe: int | None = None,
    num_planes: int = 64,
    dim: int = 64,
    id_col: str = "vec_id",
    qid_col: str = "qid",
    probe_metric: str = "cosine",
) -> DataFrame:
    """Batch IVF+BQ search — every probe vector answered from ONE pass
    over the packed words (pq.ivfpq_multi_topk's one-scan shape for
    the binary family; the popcount scan amortizes identically, r11
    verdict item 7):

    - probe: :func:`similarity.multi_probe_cells` per qid —
      ``"cosine"`` is the DEFAULT here, unlike the L2 families: BQ's
      Hamming estimates the ANGLE, so the angle probe is this
      family's assignment-consistent rule;
    - scan: index ⋈ broadcast (qid, cell) pairs, distance = ceil(p/32)
      JVM popcounts of ``codes[w] XOR lit[qid][w]`` — per-word
      constant-folded literal arrays indexed by qid (q longs each);
      the bq width/NULL raise_error guard applies per row;
    - top-k: one row_number window per qid.

    ``queries_df`` is (qid, query_vec) with qid DENSE 0..q-1.
    Returns (qid, id, hamming), per-qid (hamming asc, id asc) top-k."""
    from pyspark.sql import Window

    from img2dataset_spark.operators.similarity import (
        codebook_num_cells,
        collect_dense_qids,
        flat_multi_probe_pairs,
        multi_probe_cells,
        recommended_nprobe,
        static_prune_cells,
    )

    if nprobe is None:
        nprobe = recommended_nprobe(codebook_num_cells(ivf_codebook))
    qrows = collect_dense_qids(queries_df, qid_col)
    qwords = {
        int(r[qid_col]): encode_query_bits(
            [float(x) for x in r["query_vec"]], num_planes, dim
        )
        for r in qrows
    }
    n_words = len(next(iter(qwords.values())))
    # q packed words per per-word literal array × n_words arrays ride
    # the plan — priced against the shared budget with a named remedy
    # (r13 verdict item 2: the ceiling was PQ-only).  BQ's literals are
    # the smallest of the three families (p/32 longs per query), so
    # this fires only at genuinely plan-breaking batch sizes.
    from img2dataset_spark.operators.pq import _check_plan_literal_budget

    _check_plan_literal_budget(
        len(qrows) * n_words,
        f"ivfbq_multi_topk: {len(qrows)} queries x {n_words} packed "
        "words",
        "chunk the probe set into smaller dense-qid batches (each "
        "chunk is still answered from one scan; the PQ/SQ chunked "
        "wrappers are the shape to mirror)",
    )
    # flat codebooks: driver-ranked probe pairs + STATIC IN-list prune
    # (planning-time partition pruning); hierarchical: distributed
    # probe, broadcast join only (r14)
    pairs = flat_multi_probe_pairs(
        ivf_codebook, queries_df, nprobe, probe_metric, qid_col
    )
    if pairs is not None:
        probed = ivf_codebook.sparkSession.createDataFrame(
            pairs, schema=f"{qid_col} bigint, cell bigint"
        )
        pre = static_prune_cells(index_df, (c for _, c in pairs))
    else:
        probed = multi_probe_cells(
            ivf_codebook, queries_df, nprobe, probe_metric, qid_col
        )
        pre = index_df
    pruned = pre.join(F.broadcast(probed), "cell")
    dist = None
    for w in range(n_words):
        from img2dataset_spark.operators.similarity import lit_long_array

        lit_w = lit_long_array(qwords[qi][w] for qi in range(len(qrows)))
        term = F.bit_count(
            F.col("codes")[w].bitwiseXOR(
                F.element_at(lit_w, F.col(qid_col).cast("int") + F.lit(1))
            )
        ).cast("long")
        dist = term if dist is None else dist + term
    dist = F.when(
        F.col("codes").isNull() | (F.size(F.col("codes")) != n_words),
        F.raise_error(
            F.concat(
                F.lit(
                    f"ivfbq_multi_topk: codes width != {n_words} words "
                    f"(num_planes={num_planes}) — got "
                ),
                F.coalesce(
                    F.size(F.col("codes")).cast("string"), F.lit("NULL")
                ),
            )
        ).cast("long"),
    ).otherwise(dist)
    scored = pruned.select(qid_col, F.col(id_col), dist.alias("hamming"))
    wk = Window.partitionBy(qid_col).orderBy(F.asc("hamming"), F.asc(id_col))
    return (
        scored.withColumn("_rk", F.row_number().over(wk))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
