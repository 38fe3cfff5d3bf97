"""operators/recall.py — the quantizer recall ledger."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from img2dataset_spark.operators.recall import (
    exact_l2_topk,
    recall_ledger,
    sample_query_vectors,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_exact_l2_topk_matches_numpy(spark, emb):
    V = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
         for r in emb.collect()}
    ids = sorted(V)
    M = np.stack([V[i] for i in ids])
    q = V[3]
    want = [ids[i] for i in
            np.argsort(((M - q) ** 2).sum(axis=1), kind="stable")[:10]]
    qdf = spark.createDataFrame([([float(x) for x in q],)],
                                "query_vec array<double>")
    got = [r["vec_id"] for r in exact_l2_topk(emb, qdf, k=10).collect()]
    assert got == want


def test_sample_query_vectors_deterministic(emb):
    a = sample_query_vectors(emb, num_queries=5)
    b = sample_query_vectors(emb, num_queries=5)
    assert a == b and len(a) == 5
    assert len({i for i, _ in a}) == 5


def test_exact_searcher_ledgers_recall_one(spark, emb):
    """Self-test of the meter: an EXACT searcher must ledger 1.0 on
    both metrics — anything less means the probe set, ground truth,
    or intersection math is broken."""
    from img2dataset_spark.operators.similarity import cosine_topk

    out = recall_ledger(
        emb,
        {
            "exact_l2": (lambda q: exact_l2_topk(emb, q, k=10), "l2"),
            "exact_cos": (lambda q: cosine_topk(emb, q, k=10), "cosine"),
        },
        k=10,
        num_queries=3,
    ).collect()
    assert {r["family"]: (r["mean_recall"], r["min_recall"]) for r in out} == {
        "exact_l2": (1.0, 1.0),
        "exact_cos": (1.0, 1.0),
    }
    assert all(r["num_queries"] == 3 and r["k"] == 10 for r in out)


def test_quantizer_menu_ledger_floors(spark, emb):
    """The full menu at production-ish settings on the sf0.001 corpus:
    ledger values are valid recalls, deterministic across runs, and the
    family floors match what test_ann_quality pins individually (sq8
    high, pq better-than-random, refine >= raw bq screen)."""
    from img2dataset_spark.operators.recall import quantizer_recall_ledger

    got = {r["family"]: r for r in
           quantizer_recall_ledger(emb, k=10, num_queries=3).collect()}
    assert set(got) == {"pq_adc", "ivfpq", "ivfpq_residual",
                        "ivfpq_res_refine", "sq8", "ivfsq", "bq",
                        "bq_refine", "ivfbq"}
    assert all(0.0 <= r["min_recall"] <= r["mean_recall"] <= 1.0
               for r in got.values())
    assert got["sq8"]["mean_recall"] >= 0.5
    assert got["pq_adc"]["mean_recall"] >= 0.1
    assert got["bq_refine"]["mean_recall"] >= got["bq"]["mean_recall"]


def test_recall_ledger_rejects_unknown_metric(emb):
    with pytest.raises(ValueError, match="unknown metric"):
        recall_ledger(emb, {"x": (lambda q: None, "hamming")}).collect()


def test_quantizer_ledger_clustered_floors(spark):
    """The representative corpus (r10 verdict item 3): on a clustered
    mixture (tools/make_clustered.py, 16 clusters x 250 rows) the
    ledger's floors are pinned at the measured values — sq8 holds,
    refine lifts residual PQ, and the full residual+refine composition
    clears the floor that makes 'PQ is usable' a number."""
    from tools.make_clustered import clustered_embeddings

    from img2dataset_spark.operators.recall import quantizer_recall_ledger

    V = clustered_embeddings(4000, dim=64, clusters=16, sigma_point=0.2,
                             seed=7)
    rows = [(int(i), [float(x) for x in V[i]]) for i in range(4000)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["family"]: r for r in
           quantizer_recall_ledger(df, k=10, num_queries=3, nprobe=4,
                                   pq_codes=64).collect()}
    # measured 2026-08 (seeded, deterministic): sq8/ivfsq 0.767,
    # residual 0.3, res_refine 0.533 — floors leave noise margin
    assert got["sq8"]["mean_recall"] >= 0.6
    assert got["ivfsq"]["mean_recall"] >= 0.6
    assert (got["ivfpq_res_refine"]["mean_recall"]
            >= got["ivfpq_residual"]["mean_recall"])
    assert got["ivfpq_res_refine"]["mean_recall"] >= 0.4


def test_refit_recall_ledger_recovery(spark):
    """The r13 promotion: refit RECOVERY as a relation.  On the
    clustered drift corpus (base fit on clusters 0-5, wave clusters
    piling into unseen cells) the ledger must emit all four maintained
    families and show post-refit recall >= pre-refit recall for BOTH —
    the refit can only improve the flagged cells' books (measured:
    residual 0.3 -> 0.633, raw 0.033 -> 0.3 on this seed)."""
    from tools.make_clustered import clustered_embeddings

    from img2dataset_spark.operators.recall import refit_recall_ledger

    V = clustered_embeddings(2000, dim=64, clusters=8, sigma_point=0.2,
                             seed=11)
    rows = [(int(i), [float(x) for x in V[i]]) for i in range(2000)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = df.filter(F.col("vec_id") % 8 < 6)
    got = {r["family"]: r for r in
           refit_recall_ledger(df, base, num_cells=8, pq_subspaces=8,
                               pq_codes=16, num_queries=3,
                               threshold=1.3).collect()}
    assert set(got) == {"versioned_raw_pre", "versioned_raw_post",
                        "versioned_residual_pre",
                        "versioned_residual_post"}
    for fam in ("versioned_raw", "versioned_residual"):
        pre = got[f"{fam}_pre"]["mean_recall"]
        post = got[f"{fam}_post"]["mean_recall"]
        assert post >= pre, (fam, pre, post)
    # the drifted clustered corpus is exactly where the refit pays:
    # the residual family must show a real recovery, not a tie
    assert (got["versioned_residual_post"]["mean_recall"]
            > got["versioned_residual_pre"]["mean_recall"])


def test_refit_recall_ledger_sq_family(spark):
    """include_sq=True adds the SQ pair to the ledger — measured on
    the CLIPPING corpus (wave clusters offset far past the base
    bounds): the stale index's recall collapses on drifted queries
    (their cells all-tie at saturated codes) and the bounds-refit
    recovers it, through the same relation schema.  The drift lives
    on clusters 0 and 4 so the md5-deterministic probe set contains
    BOTH drifted and base queries (the md5 order of ids 0..1599 puts
    clusters {0,4} in 4 of the first 8 samples)."""
    from tools.make_clustered import clustered_embeddings

    from img2dataset_spark.operators.recall import refit_recall_ledger

    V = clustered_embeddings(1600, dim=64, clusters=8, sigma_point=0.2,
                             seed=13)
    rows = []
    for i in range(1600):
        v = [float(x) for x in V[i]]
        if i % 8 in (0, 4):
            v = [x + 25.0 for x in v]
        rows.append((int(i), v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = df.filter(~(F.col("vec_id") % 8).isin([0, 4]))
    got = {r["family"]: r for r in
           refit_recall_ledger(df, base, num_cells=8, pq_subspaces=8,
                               pq_codes=16, num_queries=8,
                               threshold=1.3, include_sq=True,
                               include_refine=True).collect()}
    assert {"versioned_sq_pre", "versioned_sq_post",
            "versioned_sq_refine_pre", "versioned_sq_refine_post"} <= set(got)
    assert len(got) == 12  # 4 PQ + 4 PQ-refine + 2 SQ + 2 SQ-refine
    pre = got["versioned_sq_pre"]["mean_recall"]
    post = got["versioned_sq_post"]["mean_recall"]
    assert post > pre, (pre, post)
    assert post >= 0.7, (pre, post)
    # the SQ refine families obey the same recovery law, and the
    # refined post must not fall below the compressed post's level
    rpre = got["versioned_sq_refine_pre"]["mean_recall"]
    rpost = got["versioned_sq_refine_post"]["mean_recall"]
    assert rpost >= rpre, (rpre, rpost)
    assert rpost >= 0.7, (rpre, rpost)


def test_refit_recall_ledger_refine_families(spark):
    """include_refine=True adds the refine stage over the SAME
    maintained indexes (r13 verdict item 1: the compressed stage at
    high occupancy under-recalls even post-refit and the refine stage
    is the measured remedy — previously absent from the ledger): four
    more families, each the versioned screen at k*rf + exact cosine
    re-rank, measured against exact-cosine ground truth.  Floors: the
    refine post must beat the refine pre (same recovery law), and the
    refine stage must lift the residual family's post-refit recall
    above the compressed post (the whole point of the stage)."""
    from tools.make_clustered import clustered_embeddings

    from img2dataset_spark.operators.recall import refit_recall_ledger

    V = clustered_embeddings(2000, dim=64, clusters=8, sigma_point=0.2,
                             seed=11)
    rows = [(int(i), [float(x) for x in V[i]]) for i in range(2000)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = df.filter(F.col("vec_id") % 8 < 6)
    got = {r["family"]: r for r in
           refit_recall_ledger(df, base, num_cells=8, pq_subspaces=8,
                               pq_codes=16, num_queries=3,
                               threshold=1.3, include_refine=True).collect()}
    assert set(got) == {
        "versioned_raw_pre", "versioned_raw_post",
        "versioned_raw_refine_pre", "versioned_raw_refine_post",
        "versioned_residual_pre", "versioned_residual_post",
        "versioned_residual_refine_pre", "versioned_residual_refine_post",
    }
    for fam in ("versioned_raw_refine", "versioned_residual_refine"):
        pre = got[f"{fam}_pre"]["mean_recall"]
        post = got[f"{fam}_post"]["mean_recall"]
        assert post >= pre, (fam, pre, post)
    # the refine stage must lift the maintained residual family above
    # its compressed reading — the gap the r13 600k ledger measured
    assert (got["versioned_residual_refine_post"]["mean_recall"]
            >= got["versioned_residual_post"]["mean_recall"])
