"""similarity.recommended_nprobe — the corpus-aware probe default.

The recall ledger measured the failure mode (SCALE.md §10): at sf1 the
occupancy-pinned cell count (586) outgrew a fixed nprobe=4 and ivfsq
recall fell 0.9 → 0.55 while nprobe=16 recovered 0.85 — pure probe
loss.  nprobe=None now routes every IVF searcher through
ceil(sqrt(num_cells)); these tests pin the formula and the
auto-equals-explicit identity per family (the fixed-nprobe path is
the oracle-verified one, so equality transfers its evidence).
"""

import pytest
from pyspark.sql import functions as F

from img2dataset_spark.operators.similarity import (
    ivf_fit,
    recommended_nprobe,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def qdf(spark, emb):
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0)
         .select("embedding").first()[0]]
    return spark.createDataFrame([(q,)], "query_vec array<double>")


@pytest.fixture(scope="module")
def ivf_cb(emb):
    return ivf_fit(emb, num_cells=10, iters=2)


def test_recommended_nprobe_formula():
    # ceil(sqrt(k)) at the calibration points from the sf1 ledger
    assert recommended_nprobe(1) == 1
    assert recommended_nprobe(4) == 2
    assert recommended_nprobe(10) == 4
    assert recommended_nprobe(59) == 8
    assert recommended_nprobe(586) == 25  # >= the measured 16 recovery
    assert recommended_nprobe(0) == 1
    assert recommended_nprobe(2, min_nprobe=3) == 3


def test_ivfpq_auto_nprobe_equals_explicit(emb, qdf, ivf_cb):
    from img2dataset_spark.operators.pq import ivfpq_index, ivfpq_topk, pq_fit

    pq_cb = pq_fit(emb, num_subspaces=2, num_codes=4, iters=2)
    idx = ivfpq_index(emb, ivf_cb, pq_cb)
    # 10 surviving cells -> ceil(sqrt(10)) = 4
    auto = [tuple(r) for r in
            ivfpq_topk(idx, ivf_cb, pq_cb, qdf, k=10).collect()]
    want = [tuple(r) for r in
            ivfpq_topk(idx, ivf_cb, pq_cb, qdf, k=10, nprobe=4).collect()]
    assert auto == want and len(auto) == 10


def test_ivfsq_auto_nprobe_equals_explicit(emb, qdf, ivf_cb):
    from img2dataset_spark.operators.sq import ivfsq_index, ivfsq_topk, sq_fit

    bounds = sq_fit(emb, dim=64)
    idx = ivfsq_index(emb, ivf_cb, bounds)
    auto = [tuple(r) for r in
            ivfsq_topk(idx, ivf_cb, bounds, qdf, k=10).collect()]
    want = [tuple(r) for r in
            ivfsq_topk(idx, ivf_cb, bounds, qdf, k=10, nprobe=4).collect()]
    assert auto == want and len(auto) == 10


def test_ivfbq_auto_nprobe_equals_explicit(emb, qdf, ivf_cb):
    from img2dataset_spark.operators.bq import ivfbq_index, ivfbq_topk

    idx = ivfbq_index(emb, ivf_cb, num_planes=64, dim=64)
    auto = [tuple(r) for r in
            ivfbq_topk(idx, ivf_cb, qdf, k=10, num_planes=64, dim=64)
            .collect()]
    want = [tuple(r) for r in
            ivfbq_topk(idx, ivf_cb, qdf, k=10, nprobe=4, num_planes=64,
                       dim=64).collect()]
    assert auto == want and len(auto) == 10
