"""ANN quality pins — recall properties of the approximate families.

The synthetic embeddings are iid-Gaussian-ish: the WORST case for
IVF/PQ (no cluster structure to exploit), so absolute recall floors
here are deliberately conservative; the load-bearing assertions are the
exactness limits (full-probe refine == brute force) and the
better-than-random margins that catch a broken lookup outright.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def raw(emb):
    V = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
         for r in emb.collect()}
    ids = sorted(V)
    return ids, np.stack([V[i] for i in ids])


def _qdf(spark, vec):
    return spark.createDataFrame(
        [([float(x) for x in vec],)], "query_vec array<double>"
    )


def test_refine_full_probe_equals_exact(spark, emb, raw):
    """The exactness limit: with every cell probed and the candidate
    pool covering the whole corpus, two-stage refine IS brute-force
    cosine_topk — identical rows, identical scores.  Guaranteed by
    construction; any divergence means the candidate or re-rank stage
    lost rows."""
    from img2dataset_spark.operators.pq import (
        ivfpq_index,
        ivfpq_refine_topk,
        pq_fit,
    )
    from img2dataset_spark.operators.similarity import cosine_topk, ivf_fit

    ids, M = raw
    ivf_cb = ivf_fit(emb, num_cells=5, iters=1)
    pq_cb = pq_fit(emb, num_subspaces=4, num_codes=8, iters=1)
    idx = ivfpq_index(emb, ivf_cb, pq_cb)
    q = _qdf(spark, M[ids.index(3)])
    want = [(r["vec_id"], r["cos_sim"])
            for r in cosine_topk(emb, q, k=10).collect()]
    got = [(r["vec_id"], r["cos_sim"])
           for r in ivfpq_refine_topk(
               idx, ivf_cb, pq_cb, emb, q, k=10, nprobe=5,
               refine_factor=len(ids) // 10 + 1).collect()]
    assert got == want


def test_sq8_recall_floor(spark, emb, raw):
    """SQ8 keeps per-dimension resolution, so even on unclustered data
    recall@10 vs exact L2 stays high (measured 0.7-1.0 on these
    queries; floor 0.5 with margin)."""
    from img2dataset_spark.operators.sq import sq_encode, sq_fit, sq_topk

    ids, M = raw
    bounds = sq_fit(emb)
    codes = sq_encode(emb, bounds)
    recalls = []
    for qid in (0, 3, 7):
        q = M[ids.index(qid)]
        exact = {ids[i] for i in
                 np.argsort(((M - q) ** 2).sum(axis=1), kind="stable")[:10]}
        got = {r["vec_id"] for r in
               sq_topk(codes, bounds, _qdf(spark, q), k=10).collect()}
        recalls.append(len(got & exact) / 10)
    assert min(recalls) >= 0.5, recalls


def test_pq_recall_beats_random(spark, emb, raw):
    """PQ on iid Gaussians is the family's worst case (nothing for the
    sub-codebooks to exploit), but a working ADC lookup still beats
    random by an order of magnitude: random recall@10 over 500 rows is
    0.02; a broken code/table alignment would land there."""
    from img2dataset_spark.operators.pq import pq_encode, pq_fit, pq_topk

    ids, M = raw
    cb = pq_fit(emb, num_subspaces=8, num_codes=16, iters=2)
    codes = pq_encode(emb, cb)
    recalls = []
    for qid in (0, 3, 7):
        q = M[ids.index(qid)]
        exact = {ids[i] for i in
                 np.argsort(((M - q) ** 2).sum(axis=1), kind="stable")[:10]}
        got = {r["vec_id"] for r in
               pq_topk(codes, cb, _qdf(spark, q), k=10).collect()}
        recalls.append(len(got & exact) / 10)
    assert max(recalls) >= 0.2 and min(recalls) >= 0.1, recalls


def test_bq_refine_recall_scales_with_budget(spark, emb, raw):
    """bq_refine_topk (popcount screen -> exact re-rank): recall@10 vs
    exact cosine is monotone in the candidate budget and reaches 1.0 at
    full budget (the exactness limit, pinned separately in test_bq).
    Measured on these iid-Gaussian queries (r10): mean 0.57 @ rf=4,
    0.65 @ rf=8, 0.85 @ rf=16 — BELOW SQ8's 0.7-1.0 at the smallest
    budget, which is the honest trade: the screen reads 8 B/row vs
    SQ8's 64 B/row, and unclustered data is Hamming's worst case.
    Floors sit under the measurements with margin; a broken screen
    (wrong plane/sign/packing) lands at random ≈ 0.02·rf."""
    from img2dataset_spark.operators.bq import bq_encode, bq_refine_topk

    ids, M = raw
    codes = bq_encode(emb, num_planes=64, dim=64)
    means = {}
    for rf in (4, 16):
        recalls = []
        for qid in (0, 3, 7, 11):
            q = M[ids.index(qid)]
            cos = (M @ q) / (np.linalg.norm(M, axis=1) * np.linalg.norm(q))
            exact = {ids[i] for i in np.argsort(-cos, kind="stable")[:10]}
            got = {r["vec_id"] for r in bq_refine_topk(
                codes, emb, _qdf(spark, q), k=10, refine_factor=rf
            ).collect()}
            recalls.append(len(got & exact) / 10)
        means[rf] = sum(recalls) / len(recalls)
    assert means[4] >= 0.3, means
    assert means[16] >= 0.6, means
    assert means[16] >= means[4], means
