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
    # the uniform-cell worst-case bound (iid adversary: expected
    # recall ~ nprobe/num_cells): 0.8*20 = 16 — the measured recovery
    # point on the 20k iid corpus (SCALE.md §11)
    assert recommended_nprobe(20, worst_case_recall=0.8) == 16
    assert recommended_nprobe(586, worst_case_recall=0.5) == 293
    assert recommended_nprobe(10, worst_case_recall=0.1) == 4  # sqrt wins
    assert recommended_nprobe(20, worst_case_recall=1.0) == 20
    with pytest.raises(ValueError, match="worst_case_recall"):
        recommended_nprobe(20, worst_case_recall=1.5)


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


def test_probe_cells_l2_finds_assignment_cell(spark):
    """The measured probe-metric failure (SCALE.md §11): on a clustered
    corpus, a query L2-ASSIGNED to a drifted cell gets that cell ranked
    with NEGATIVE cosine (missed at nprobe=2), while the l2 probe —
    the assignment metric — ranks it first."""
    from tools.make_clustered import clustered_embeddings

    from img2dataset_spark.operators.similarity import (
        ivf_assign,
        ivf_fit,
        probe_cells,
    )

    V = clustered_embeddings(2000, dim=64, clusters=8, sigma_point=0.2,
                             seed=11)
    rows = [(int(i), [float(x) for x in V[i]]) for i in range(2000)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = df.filter(F.col("vec_id") % 8 < 6)
    cb = ivf_fit(base, num_cells=8, iters=2)

    # wave-cluster query vec_id=7: assigned cell is its true home
    home = {
        r["vec_id"]: r["cell"]
        for r in ivf_assign(
            df.filter(F.col("vec_id").isin([7, 15])), cb
        ).select("vec_id", "cell").collect()
    }
    for qid in (7, 15):
        q = spark.createDataFrame(
            [([float(x) for x in V[qid]],)], "query_vec array<double>"
        )
        l2 = [r["cell"] for r in probe_cells(cb, q, 2, "l2").collect()]
        cos = [r["cell"] for r in probe_cells(cb, q, 2, "cosine").collect()]
        assert home[qid] in l2, (qid, home[qid], l2)
        assert home[qid] not in cos, (qid, home[qid], cos)


def test_probe_metric_rejects_unknown(spark):
    import pytest as _pytest

    from img2dataset_spark.operators.similarity import ivf_fit, probe_cells

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cb = ivf_fit(emb, num_cells=4, iters=1)
    q = spark.createDataFrame([([0.0] * 64,)], "query_vec array<double>")
    with _pytest.raises(ValueError, match="unknown metric"):
        probe_cells(cb, q, 2, "dot")


def test_default_probe_metric_is_l2(spark, emb, qdf, ivf_cb):
    """The round-12 production default: probe_metric=None resolves to
    the ASSIGNMENT metric for the L2 families (the measured drift-
    scenario fix, SCALE.md §11) — the default call is bit-identical
    to an explicit "l2", and the pre-r12 "cosine" rule stays
    reachable as an explicit opt-out."""
    from img2dataset_spark.operators.pq import ivfpq_index, ivfpq_topk, pq_fit

    pq_cb = pq_fit(emb, num_subspaces=2, num_codes=4, iters=2)
    idx = ivfpq_index(emb, ivf_cb, pq_cb)
    default = [tuple(r) for r in
               ivfpq_topk(idx, ivf_cb, pq_cb, qdf, k=10, nprobe=2).collect()]
    l2 = [tuple(r) for r in
          ivfpq_topk(idx, ivf_cb, pq_cb, qdf, k=10, nprobe=2,
                     probe_metric="l2").collect()]
    assert default == l2 and len(default) == 10
    cos = [tuple(r) for r in
           ivfpq_topk(idx, ivf_cb, pq_cb, qdf, k=10, nprobe=2,
                      probe_metric="cosine").collect()]
    assert len(cos) == 10


def test_codebook_num_cells_memoized(spark, monkeypatch):
    """nprobe=None sizing counts the codebook ONCE per DataFrame object
    (r11 advice: the fitted path paid a fresh count() scan per search):
    the second call must come from the memo, pinned by making a second
    count() impossible."""
    from img2dataset_spark.operators import similarity as sim

    cb = spark.createDataFrame(
        [(i, [float(i)] * 4) for i in range(7)],
        "cell long, centroid array<double>",
    )
    assert sim.codebook_num_cells(cb) == 7
    monkeypatch.setattr(
        type(cb), "count", lambda self: (_ for _ in ()).throw(
            AssertionError("count() re-ran for a memoized codebook")
        )
    )
    assert sim.codebook_num_cells(cb) == 7


def test_recommended_refine_factor_rule():
    """base up to target occupancy, then base*ceil(sqrt(overshoot)),
    capped; degenerate inputs return base."""
    from img2dataset_spark.operators.similarity import (
        recommended_refine_factor as rf,
    )

    assert rf(1000, 10) == 4                      # occ 100 <= 1024
    assert rf(200, 10, target_occupancy=16) == 8  # occ 20 -> ceil(sqrt(1.25))=2
    assert rf(2000, 10, target_occupancy=16) == 16
    assert rf(20000, 10, target_occupancy=16) == 48
    assert rf(10**9, 10, target_occupancy=16) == 256  # max_factor cap
    assert rf(0, 10) == 4 and rf(100, 0) == 4


def test_ivfpq_refine_auto_rf_equals_explicit(spark, emb, qdf, ivf_cb):
    """refine_factor=None routes through recommended_refine_factor:
    identical to passing the computed value explicitly (and monotone —
    the exact re-rank over a superset can only match or improve)."""
    from img2dataset_spark.operators.pq import (
        ivfpq_index,
        ivfpq_refine_topk,
        pq_fit,
    )
    from img2dataset_spark.operators.similarity import (
        recommended_refine_factor,
    )

    pq_cb = pq_fit(emb, num_subspaces=2, num_codes=4, iters=2)
    idx = ivfpq_index(emb, ivf_cb, pq_cb)
    n = emb.count()
    want_rf = recommended_refine_factor(n, 10, target_occupancy=16)
    auto = [tuple(r) for r in
            ivfpq_refine_topk(idx, ivf_cb, pq_cb, emb, qdf, k=10, nprobe=2,
                              refine_target_occupancy=16).collect()]
    explicit = [tuple(r) for r in
                ivfpq_refine_topk(idx, ivf_cb, pq_cb, emb, qdf, k=10,
                                  nprobe=2,
                                  refine_factor=want_rf).collect()]
    assert auto == explicit and len(auto) == 10
