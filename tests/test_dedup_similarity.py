"""Dedup + similarity operator tests on small hand-built tables with
known expected outputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from img2dataset_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from img2dataset_spark.operators.similarity import (
    cosine_topk,
    embedding_dup_pairs,
    ivf_topk,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog", "a"),
    (1, "the quick brown fox jumps over the lazy cat", "a"),   # near-dup of 0
    (2, "THE  quick   brown fox jumps over the lazy dog", "a"),  # exact dup of 0 after normalization
    (3, "completely different text about spark engines and data", "a"),
    (4, "another unrelated document mentioning query planners here", "b"),
    (5, "the quick brown fox jumps over the lazy dog", "b"),   # exact dup of 0
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, source string")


def test_exact_dedup(docs_df):
    out = {r["doc_id"]: r["dup_count"] for r in exact_dedup(docs_df).collect()}
    # 0, 2, 5 normalize to the same fingerprint -> representative is 0
    assert out[0] == 3
    assert 2 not in out and 5 not in out
    assert out[1] == 1 and out[3] == 1 and out[4] == 1


def test_ngram_jaccard_pairs_blocked(docs_df):
    out = ngram_jaccard_pairs(docs_df, k=3, jaccard_threshold=0.5, block_col="source")
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    assert (0, 2) in pairs and pairs[(0, 2)] == 1.0  # identical shingle sets
    assert (0, 1) in pairs and 0.5 <= pairs[(0, 1)] < 1.0
    # 5 is in block "b": never paired with 0 (blocking is respected)
    assert (0, 5) not in pairs


def test_ngram_jaccard_pairs_full(docs_df):
    out = ngram_jaccard_pairs(
        docs_df, k=3, jaccard_threshold=0.99, allow_quadratic=True
    )
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (0, 5) in pairs and (0, 2) in pairs and (2, 5) in pairs


def test_ngram_jaccard_quadratic_requires_opt_in(docs_df):
    import pytest

    with pytest.raises(ValueError, match="quadratic"):
        ngram_jaccard_pairs(docs_df, k=3, jaccard_threshold=0.99)


def test_minhash_lsh_finds_exact_and_near_dups(docs_df):
    out = minhash_lsh_pairs(docs_df, k=3, jaccard_threshold=0.5)
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    # exact dups always collide in every band
    assert pairs[(0, 2)] == 1.0 and pairs[(0, 5)] == 1.0 and pairs[(2, 5)] == 1.0
    # unrelated docs never pass the jaccard verify
    assert all(a not in (3, 4) and b not in (3, 4) for a, b in pairs)


def test_simhash_pairs(docs_df):
    out = simhash_pairs(docs_df, k=3, max_hamming=0, block_bits=4)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (0, 2) in pairs and (0, 5) in pairs  # identical -> hamming 0


def test_h32_shingle_sets_preserve_jaccard(docs_df):
    """The compact h32 representation (doc_shingles stores 32-bit md5
    folds, not strings) must yield the SAME exact-Jaccard values as
    string sets on a collision-free corpus."""
    import hashlib

    from img2dataset_spark.operators.dedup import doc_shingles
    from img2dataset_spark.functions.text_fast import _shingle_set

    got = {r["doc_id"]: set(r["shingle_set"]) for r in doc_shingles(docs_df).collect()}
    for doc_id, text, _src in DOCS:
        strings = _shingle_set(text, 3)
        want = {int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in strings}
        assert got[doc_id] == want, doc_id
        assert len(want) == len(set(strings))  # collision-free here
    # pairwise Jaccard over h32 sets == over string sets (sets are
    # bijective when collision-free, so intersections map 1:1)
    out = minhash_lsh_pairs(docs_df, k=3, jaccard_threshold=0.5)
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    assert pairs[(0, 2)] == 1.0 and pairs[(0, 5)] == 1.0


def test_dedup_cache_scope_unpersists(docs_df, spark):
    """minhash_lsh_pairs' deliberate persists are released when the
    enclosing dedup_cache_scope exits — multi-corpus loops stay flat
    (the minhash twin of test_no_persisted_frames_leak)."""
    from img2dataset_spark.operators.dedup import dedup_cache_scope

    sc = spark.sparkContext
    # hermetic: earlier tests may have session-cached the SAME logical
    # plan (CacheManager dedupes), which this scope would then release
    spark.catalog.clearCache()
    before = len(sc._jsc.sc().getRDDStorageInfo())
    for _ in range(2):
        with dedup_cache_scope():
            minhash_lsh_pairs(docs_df, k=3, jaccard_threshold=0.5).count()
        assert len(sc._jsc.sc().getRDDStorageInfo()) == before
    # without a scope the session-lifetime default still applies
    # (CacheManager dedupes repeated identical plans into one entry)
    minhash_lsh_pairs(docs_df, k=3, jaccard_threshold=0.5).count()
    after = len(sc._jsc.sc().getRDDStorageInfo())
    assert after >= before
    spark.catalog.clearCache()


def test_dedup_cache_scope_is_thread_local(docs_df, spark):
    """Scopes are per-thread: a scope exiting on one thread must not
    unpersist frames another thread registered concurrently (the
    concurrent-driver-jobs pattern).  Thread B opens a scope, persists,
    and holds it open while thread A's scope enters and exits — B's
    frames must still be cached afterwards."""
    import threading

    from img2dataset_spark.operators.dedup import (
        _persisted,
        _scope_stack,
        dedup_cache_scope,
    )

    spark.catalog.clearCache()
    b_entered = threading.Event()
    a_done = threading.Event()
    b_frame = {}

    def thread_b():
        with dedup_cache_scope():
            b_frame["df"] = _persisted(docs_df.select("doc_id"))
            b_frame["df"].count()
            b_entered.set()
            a_done.wait(30)
            # A's scope exited while we were open: our frame survives
            b_frame["alive_during"] = (
                b_frame["df"].storageLevel.useMemory
                or b_frame["df"].storageLevel.useDisk
            )

    tb = threading.Thread(target=thread_b)
    tb.start()
    assert b_entered.wait(30)
    with dedup_cache_scope():
        # A's scope sees an EMPTY stack frame of its own, not B's
        assert _scope_stack()[-1] == []
    a_done.set()
    tb.join(30)
    assert b_frame["alive_during"]
    # after B's scope exits its own frame is released
    assert not (
        b_frame["df"].storageLevel.useMemory or b_frame["df"].storageLevel.useDisk
    )
    spark.catalog.clearCache()


VECS = [
    (0, [1.0, 0.0, 0.0], 0),
    (1, [0.9, 0.1, 0.0], 0),   # close to 0
    (2, [0.0, 1.0, 0.0], 0),
    (3, [0.0, 0.0, 1.0], 1),
    (4, [1.0, 0.05, 0.0], 1),  # close to 0 but other label
]


@pytest.fixture(scope="module")
def vecs_df(spark):
    return spark.createDataFrame(
        VECS, "vec_id long, embedding array<float>, label int"
    )


def _query(spark, vecs_df):
    return vecs_df.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("query_vec")
    )


def test_cosine_topk(spark, vecs_df):
    out = cosine_topk(vecs_df, _query(spark, vecs_df), k=3).collect()
    assert [r["vec_id"] for r in out] == [0, 4, 1]
    assert out[0]["cos_sim"] == 1.0
    assert out[1]["cos_sim"] > out[2]["cos_sim"] > 0.9


def test_ivf_topk_prunes_to_probed_cells(spark, vecs_df):
    # nprobe=1: only the label whose centroid is nearest the query
    out = ivf_topk(vecs_df, _query(spark, vecs_df), k=5, nprobe=1).collect()
    labels_present = {VECS[r["vec_id"]][2] for r in out}
    assert len(labels_present) == 1  # pruned to a single cell


def test_embedding_dup_pairs(spark, vecs_df):
    out = embedding_dup_pairs(vecs_df, threshold=0.95, label_col="label")
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert pairs == {(0, 1)}  # (0,4) blocked by label, (0,2) dissimilar


class TestEmbeddingLsh:
    def test_no_cartesian_in_plan(self, spark):
        """The label-free path must never fall back to a quadratic join."""
        from img2dataset_spark.operators.similarity import (
            embedding_dup_pairs,
            embedding_dup_pairs_lsh,
        )

        df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        for out in (
            embedding_dup_pairs_lsh(df, threshold=0.3),
            embedding_dup_pairs(df, threshold=0.3, label_col=None),
        ):
            plan = out._jdf.queryExecution().executedPlan().toString()
            assert "CartesianProduct" not in plan
            assert "BroadcastNestedLoopJoin" not in plan

    def test_lsh_recall_vs_exact_at_high_threshold(self, spark):
        """Every exact pair >= 0.5 whose members share a band must be
        found; LSH results are a subset of the exact pair set."""
        from pyspark.sql import functions as F

        from img2dataset_spark.operators.similarity import (
            cosine,
            embedding_dup_pairs_lsh,
            round6,
        )

        df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        lsh = {
            (r["id_a"], r["id_b"])
            for r in embedding_dup_pairs_lsh(df, threshold=0.5).collect()
        }
        a, b = df.alias("a"), df.alias("b")
        exact = {
            (r["id_a"], r["id_b"])
            for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
            .select(
                F.col("a.vec_id").alias("id_a"),
                F.col("b.vec_id").alias("id_b"),
                round6(cosine(F.col("a.embedding"), F.col("b.embedding"))).alias("s"),
            )
            .filter(F.col("s") >= 0.5)
            .collect()
        }
        assert lsh <= exact  # no false positives after exact verify

    def test_recommended_band_bits_scaling(self):
        """Bits grow with log2(n), pinning expected bucket occupancy —
        the scale knob for the structural saturation SCALE.md measured."""
        from img2dataset_spark.operators.similarity import (
            recommended_band_bits,
        )

        assert recommended_band_bits(0) == 8
        assert recommended_band_bits(10_000) == 8  # floor holds
        # each 2x in n adds at most one bit
        prev = recommended_band_bits(10_000)
        for n in (10**5, 10**6, 10**7, 10**8, 10**9):
            r = recommended_band_bits(n)
            assert r >= prev
            prev = r
        # occupancy target is actually met: n * bands / 2^r <= target
        for n in (10**6, 10**9, 10**12):
            r = recommended_band_bits(n, num_bands=4, target_bucket_size=200)
            assert n * 4 / 2**r <= 200
            assert n * 4 / 2 ** (r - 1) > 200  # and not oversized

    def test_wider_bands_cut_candidates_on_real_vectors(self, spark):
        """Doubling band bits shrinks the candidate (pre-verify) pair
        set on the test embeddings, and survivors stay a subset of the
        exact pair set."""
        from pyspark.sql import functions as F

        from img2dataset_spark.operators.similarity import (
            embedding_dup_pairs_lsh,
        )

        df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        narrow = embedding_dup_pairs_lsh(
            df, threshold=0.5, num_planes=32, num_bands=4
        )
        wide = embedding_dup_pairs_lsh(
            df, threshold=0.5, num_planes=64, num_bands=4
        )
        n, w = narrow.count(), wide.count()
        # wide bands may lose some low-sim pairs, never invent them
        assert w <= n

    def test_bench_auto_variant_degrades_to_fixed_at_small_n(self, spark):
        """bench.py's auto-sized twin: at test scale the recommended
        bits hit the 8-bit floor, so it must produce EXACTLY the fixed
        query's pairs (and at large n only the plane count changes)."""
        from bench import _q_embedding_dup_pairs_lsh_auto
        from img2dataset_spark.queries import ALL_QUERIES

        sf = "/root/testdata/sf0.001"
        auto = {
            (r["id_a"], r["id_b"])
            for r in _q_embedding_dup_pairs_lsh_auto(spark, sf).collect()
        }
        fixed = {
            (r["id_a"], r["id_b"])
            for r in ALL_QUERIES["embedding_dup_pairs_lsh"](spark, sf).collect()
        }
        assert auto == fixed

    def test_default_params_equal_pinned_at_small_n(self, spark):
        """Round-5 contract: calling with DEFAULTS (auto band sizing)
        at small n must produce exactly the pinned 32-plane/4-band
        registry output — the auto sizing floors at 8 bits/4 bands."""
        from img2dataset_spark.operators.similarity import (
            embedding_dup_pairs_lsh,
        )

        df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        auto = {
            (r["id_a"], r["id_b"], r["cos_sim"])
            for r in embedding_dup_pairs_lsh(df, threshold=0.3).collect()
        }
        pinned = {
            (r["id_a"], r["id_b"], r["cos_sim"])
            for r in embedding_dup_pairs_lsh(
                df, threshold=0.3, num_planes=32, num_bands=4
            ).collect()
        }
        assert auto == pinned

    def test_recommended_num_bands(self):
        """Band count recovers recall as bands widen: 4 at the 8-bit
        floor (historical default preserved), growing monotonically,
        with the 0.98-anchored recall target actually met."""
        import math

        from img2dataset_spark.operators.similarity import (
            recommended_num_bands,
        )

        assert recommended_num_bands(8) == 4
        prev = 4
        for r in (12, 16, 20, 24, 28):
            b = recommended_num_bands(r)
            assert b >= prev
            # the target recall is met: 1-(1-p^r)^b >= 0.9
            p = (1 - math.acos(0.98) / math.pi) ** r
            assert 1 - (1 - p) ** b >= 0.9
            prev = b
        assert recommended_num_bands(20) == 8  # pinned from the docstring

    def test_no_persisted_frames_leak(self, spark):
        """Repeated embedding_dup_pairs_lsh calls in one session must
        leave storage memory flat — the round-4 persist leak is gone."""
        from img2dataset_spark.operators.similarity import (
            embedding_dup_pairs_lsh,
        )

        df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        before = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
        for _ in range(2):
            embedding_dup_pairs_lsh(df, threshold=0.5).count()
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        assert len(infos) == before, [str(i) for i in infos]

    def test_hyperplane_coeffs_deterministic(self):
        from img2dataset_spark.operators.similarity import hyperplane_coeffs

        a = hyperplane_coeffs(4, 8)
        b = hyperplane_coeffs(4, 8)
        assert a == b
        assert all(-1000 <= c <= 1000 for row in a for c in row)
        # planes must differ (md5-seeded, not an LCG ramp)
        assert a[0] != a[1]


class TestSimhashMultiprobe:
    def test_multiprobe_is_superset_of_single_probe(self, spark):
        from img2dataset_spark.operators.dedup import simhash_pairs

        d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        single = {
            (r["id_a"], r["id_b"])
            for r in simhash_pairs(d, max_hamming=10, block_bits=8).collect()
        }
        multi = {
            (r["id_a"], r["id_b"])
            for r in simhash_pairs(d, max_hamming=10, block_bits=8, probes=4).collect()
        }
        assert single <= multi  # rotations only ADD co-blocking chances


def test_semantic_dedup_survivor_rule(spark, vecs_df):
    """SemDeDup survivors = all ids minus every id that appears as the
    LARGER id of a within-cell pair at/above the threshold; pairs only
    ever form inside one k-means cell."""
    from img2dataset_spark.operators.similarity import (
        ivf_assign,
        ivf_fit,
        semantic_dedup,
        semantic_dedup_pairs,
    )

    vecs = vecs_df.select("vec_id", "embedding")
    cb = ivf_fit(vecs, num_cells=2, iters=2, vec_col="embedding")
    pairs = semantic_dedup_pairs(
        vecs, threshold=0.9, dim=3, codebook=cb
    ).collect()
    cells = {
        r["vec_id"]: r["cell"]
        for r in ivf_assign(vecs, cb, vec_col="embedding").collect()
    }
    for p in pairs:
        assert p["id_a"] < p["id_b"]
        assert cells[p["id_a"]] == cells[p["id_b"]] == p["cell"]
        assert p["cos_sim"] >= 0.9
    dropped = {p["id_b"] for p in pairs}
    surv = {
        r["vec_id"]: r["cell"]
        for r in semantic_dedup(vecs, threshold=0.9, dim=3, codebook=cb).collect()
    }
    assert set(surv) == set(cells) - dropped
    assert all(surv[i] == cells[i] for i in surv)
    # the fixture has at least one 0.9-cosine pair (vectors 0/1/4)
    assert dropped, "fixture no longer exercises the dedup path"


def test_semantic_dedup_codebook_reuse_and_cap(spark, vecs_df):
    """Passing a prefit codebook gives the same result as the internal
    fit (fit is deterministic); max_cell_size=1 disables pairing
    entirely (every cell capped) so all vectors survive."""
    from img2dataset_spark.operators.similarity import ivf_fit, semantic_dedup

    vecs = vecs_df.select("vec_id", "embedding")
    cb = ivf_fit(vecs, num_cells=2, iters=2, vec_col="embedding")
    a = sorted(
        (r["vec_id"], r["cell"])
        for r in semantic_dedup(vecs, num_cells=2, iters=2, threshold=0.9, dim=3).collect()
    )
    b = sorted(
        (r["vec_id"], r["cell"])
        for r in semantic_dedup(vecs, threshold=0.9, dim=3, codebook=cb).collect()
    )
    assert a == b
    capped = semantic_dedup(
        vecs, threshold=0.9, dim=3, codebook=cb, max_cell_size=1
    )
    assert capped.count() == vecs.count()


def test_semantic_dedup_auto_cell_sizing(spark, vecs_df):
    """num_cells=None sizes k from the corpus (occupancy-pinned, the
    SemDeDup scale rule); at tiny n that is one cell, and the result
    equals the explicit num_cells=1 call."""
    from img2dataset_spark.operators.similarity import (
        recommended_num_cells,
        semantic_dedup,
    )

    assert recommended_num_cells(0) == 1
    assert recommended_num_cells(1024) == 1
    assert recommended_num_cells(1025) == 2
    assert recommended_num_cells(600_000) == 586

    vecs = vecs_df.select("vec_id", "embedding")
    auto = sorted(
        (r["vec_id"], r["cell"])
        for r in semantic_dedup(vecs, threshold=0.9, dim=3).collect()
    )
    pinned = sorted(
        (r["vec_id"], r["cell"])
        for r in semantic_dedup(vecs, num_cells=1, threshold=0.9, dim=3).collect()
    )
    assert auto == pinned


def test_semantic_dedup_vs_survivors(spark):
    """Cross-corpus SemDeDup: a new vector survives iff no corpus
    vector in its cell sits within the threshold; corpus side always
    wins (no new-vs-new pairing); codebook reuse across waves gives
    identical verdicts."""
    from img2dataset_spark.operators.similarity import (
        ivf_assign,
        ivf_fit,
        semantic_dedup_pairs_vs,
        semantic_dedup_vs,
    )

    rows = [
        (0, [1.0, 0.0, 0.0]),    # corpus
        (1, [0.0, 1.0, 0.0]),    # corpus
        (10, [0.99, 0.05, 0.0]), # new, dup of 0
        (11, [0.0, 0.0, 1.0]),   # new, orthogonal to corpus
        (12, [0.98, 0.08, 0.0]), # new, dup of 0 AND near 10 (new-new ignored)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    corpus = df.filter(F.col("vec_id") < 10)
    new = df.filter(F.col("vec_id") >= 10)
    cb = ivf_fit(corpus, num_cells=1, iters=1, vec_col="embedding")
    pairs = semantic_dedup_pairs_vs(
        new, corpus, threshold=0.9, dim=3, codebook=cb
    ).collect()
    assert {(p["id_a"], p["id_b"]) for p in pairs} == {(10, 0), (12, 0)}
    assert all(p["cos_sim"] >= 0.9 for p in pairs)
    surv = semantic_dedup_vs(new, corpus, threshold=0.9, dim=3, codebook=cb)
    assert {r["vec_id"] for r in surv.collect()} == {11}
    # auto-fit path (codebook=None, num_cells sized from the corpus)
    surv2 = semantic_dedup_vs(new, corpus, threshold=0.9, dim=3)
    assert {r["vec_id"] for r in surv2.collect()} == {11}
    # corpus-side cell cap disables pairing -> every new vector survives
    surv3 = semantic_dedup_vs(
        new, corpus, threshold=0.9, dim=3, codebook=cb, max_cell_size=1
    )
    assert surv3.count() == new.count()


class TestHierarchicalCodebook:
    """ivf_fit_hierarchical: the beyond-FLAT_CODEBOOK_MAX_CELLS scale
    path — driver/broadcast artifacts bounded at O(sqrt(k) · d), fine
    codebook born and kept distributed."""

    def test_single_coarse_cell_parity_with_flat(self, spark):
        """With coarse_cells=1 the fine level IS a global Lloyd fit:
        same seeds, same quantized argmin, same cells — centroids agree
        to the fp64-vs-decimal summation noise (documented divergence,
        _local_lloyd docstring) and the quantized ASSIGNMENT, the
        operator-visible output, matches the flat path exactly."""
        import numpy as np

        from img2dataset_spark.operators.similarity import (
            ivf_assign,
            ivf_fit,
            ivf_fit_hierarchical,
        )

        e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        flat = ivf_fit(e, num_cells=4, iters=2)
        hier = ivf_fit_hierarchical(e, num_cells=4, iters=2, coarse_cells=1)
        cb_f = {r["cell"]: r["centroid"] for r in flat.collect()}
        cb_h = {
            r["cell"]: r["centroid"]
            for r in hier.filter(F.col("level") == "fine").collect()
        }
        assert set(cb_f) == set(cb_h)  # global fine id = 0*k + local
        for c in cb_f:
            np.testing.assert_allclose(cb_f[c], cb_h[c], rtol=0, atol=1e-9)
        af = sorted((r["vec_id"], r["cell"]) for r in ivf_assign(e, flat).collect())
        ah = sorted((r["vec_id"], r["cell"]) for r in ivf_assign(e, hier).collect())
        assert af == ah

    def test_driver_materialization_bounded_by_coarse_cells(self, spark, monkeypatch):
        """THE scale property the hierarchical path exists for: no
        DataFrame.collect during fit returns more rows than the coarse
        cell count, however large num_cells is — the fine codebook is
        never driver-materialized."""
        from img2dataset_spark.operators import similarity as S

        e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        seen: list[int] = []
        cls = type(e)  # the concrete (classic) DataFrame class
        orig = cls.collect

        def spy(self):
            rows = orig(self)
            seen.append(len(rows))
            return rows

        monkeypatch.setattr(cls, "collect", spy)
        for num_cells in (16, 256):  # 16x the cells, same driver bound
            seen.clear()
            cb = S.ivf_fit_hierarchical(e, num_cells, iters=2, coarse_cells=4)
            assert cb.filter(F.col("level") == "fine").count() > 4
            assert seen, "fit no longer collects anything? update the test"
            assert max(seen) <= 4

    def test_flat_fit_autoroutes_past_ceiling(self, spark):
        """ivf_fit beyond FLAT_CODEBOOK_MAX_CELLS returns a hierarchical
        codebook, and ivf_assign dispatches on it transparently."""
        from img2dataset_spark.operators import similarity as S

        e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        cb = S.ivf_fit(e, num_cells=S.FLAT_CODEBOOK_MAX_CELLS + 1, iters=1)
        assert "level" in cb.columns
        assigned = S.ivf_assign(e, cb)
        assert assigned.count() == e.count()
        fine = {r["cell"] for r in cb.filter(F.col("level") == "fine").collect()}
        got = {r["cell"] for r in assigned.select("cell").distinct().collect()}
        assert got <= fine

    def test_fineless_coarse_cell_reroutes_instead_of_dropping(self, spark):
        """A coarse cell with NO fine children (possible when Lloyd's
        final re-assignment empties it) must not swallow out-of-corpus
        vectors: the coarse hop is restricted to cells that HAVE fine
        centroids, so every input row comes back exactly once, routed
        to the nearest USABLE coarse cell's best fine centroid."""
        from img2dataset_spark.operators.similarity import ivf_assign

        cb = spark.createDataFrame(
            [
                (0, 0, [0.0] * 64, "coarse"),
                (7, 7, [1.0] * 64, "coarse"),  # fine-less coarse cell
                (0, 0, [0.05] * 64, "fine"),
                (1, 0, [0.2] * 64, "fine"),
            ],
            "cell long, coarse long, centroid array<double>, level string",
        )
        data = spark.createDataFrame(
            [(i, [0.9] * 64) for i in range(10)]  # nearest coarse = 7
            + [(100 + i, [0.1] * 64) for i in range(3)],
            "vec_id long, embedding array<double>",
        )
        got = {r["vec_id"]: r["cell"] for r in ivf_assign(data, cb).collect()}
        assert len(got) == 13  # one-row-per-input: nothing dropped
        # 0.9-vectors re-route into coarse 0 and pick its nearest fine
        # centroid (0.2 -> fine cell 1); 0.1-vectors pick 0.05 -> cell 0
        assert all(got[i] == 1 for i in range(10))
        assert all(got[100 + i] == 0 for i in range(3))

    def test_cross_dataset_assignment_preserves_rows(self, spark):
        """ivf_assign with a hierarchical codebook applied to a DIFFERENT
        dataset than the training corpus returns exactly one row per
        input (the semantic_dedup_pairs_vs / ivfpq_index-over-fresh-data
        contract)."""
        from img2dataset_spark.operators.similarity import (
            ivf_assign,
            ivf_fit_hierarchical,
        )

        e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        train = e.filter(F.col("vec_id") < 100)
        cb = ivf_fit_hierarchical(train, num_cells=9, iters=1, coarse_cells=3)
        out = ivf_assign(e, cb)  # superset of the training corpus
        assert out.count() == e.count()
        fine = {r["cell"] for r in cb.filter(F.col("level") == "fine").collect()}
        got = {r["cell"] for r in out.select("cell").distinct().collect()}
        assert got <= fine

    def test_cogroup_salt_types_cohash_without_aqe(self, spark):
        """The cogroup's two children must hash-partition their keys
        with the SAME murmur3 function: the corpus salt is
        pmod(xxhash64)=bigint, so the replicated codebook salt must be
        cast to long too — an int literal hashes differently, the two
        Exchanges stop being co-partitioned, and every (coarse, salt)
        group silently mis-aligns.  AQE masked this at test scale by
        coalescing both sides to ONE partition; at sf10 it dropped all
        200k rows (found round 9).  Pin with AQE off, where the
        8-partition zip exposes any hash disagreement at any scale."""
        from img2dataset_spark.operators.similarity import (
            ivf_assign,
            ivf_fit_hierarchical,
        )

        e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        cb = ivf_fit_hierarchical(e, num_cells=4, iters=1, coarse_cells=1)
        old = spark.conf.get("spark.sql.adaptive.enabled")
        try:
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            assert ivf_assign(e, cb).count() == e.count()
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", old)

    def test_assignment_salt_invariant(self, spark):
        """The cogroup salt only bounds group size; the assignment is a
        pure function of (vector, codebook)."""
        from img2dataset_spark.operators.similarity import (
            _as_double,
            _assign_cells_hierarchical,
            ivf_fit_hierarchical,
        )

        df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        cb = ivf_fit_hierarchical(df, num_cells=9, iters=1, coarse_cells=3)
        e = df.select("vec_id", _as_double(F.col("embedding")).alias("v"))
        a1 = sorted(
            (r["vec_id"], r["cell"])
            for r in _assign_cells_hierarchical(e, cb, "v", "vec_id", num_salts=1).collect()
        )
        a8 = sorted(
            (r["vec_id"], r["cell"])
            for r in _assign_cells_hierarchical(e, cb, "v", "vec_id", num_salts=8).collect()
        )
        assert a1 == a8

    def test_hierarchical_codebook_parquet_roundtrip(self, spark, tmp_path):
        """The deployment story: write the hierarchical codebook to
        parquet once per corpus version, reload, and assignment is
        identical — the level/coarse columns carry everything."""
        import os

        from img2dataset_spark.operators.similarity import (
            ivf_assign,
            ivf_fit_hierarchical,
        )

        e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        cb = ivf_fit_hierarchical(e, num_cells=9, iters=1, coarse_cells=3)
        path = os.path.join(str(tmp_path), "codebook")
        cb.write.parquet(path)
        cb2 = spark.read.parquet(path)
        a1 = sorted((r["vec_id"], r["cell"]) for r in ivf_assign(e, cb).collect())
        a2 = sorted((r["vec_id"], r["cell"]) for r in ivf_assign(e, cb2).collect())
        assert a1 == a2

    def test_semantic_dedup_through_hierarchical_codebook(self, spark):
        """semantic_dedup survivors with an auto-routed hierarchical
        codebook keep the min-id invariant: every dropped id has a
        smaller-id within-cell neighbor at/above the threshold."""
        from img2dataset_spark.operators.similarity import (
            ivf_assign,
            ivf_fit_hierarchical,
            semantic_dedup,
            semantic_dedup_pairs,
        )

        e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        cb = ivf_fit_hierarchical(e, num_cells=9, iters=2, coarse_cells=3)
        pairs = semantic_dedup_pairs(e, threshold=0.3, codebook=cb).collect()
        assert pairs, "threshold no longer exercises the dedup path"
        cells = {r["vec_id"]: r["cell"] for r in ivf_assign(e, cb).collect()}
        for p in pairs:
            assert p["id_a"] < p["id_b"]
            assert cells[p["id_a"]] == cells[p["id_b"]] == p["cell"]
            assert p["cos_sim"] >= 0.3
        surv = {r["vec_id"] for r in semantic_dedup(e, threshold=0.3, codebook=cb).collect()}
        dropped = {p["id_b"] for p in pairs}
        assert surv == set(cells) - dropped


def test_embedding_lsh_bucket_stats_pins_capped_mass(spark):
    """Cap ledger vs a constructed degenerate cluster: 40 identical
    vectors band into the same bucket per band; cap 10 flags all 4."""
    from img2dataset_spark.operators.similarity import (
        embedding_lsh_bucket_stats,
    )

    rows = [(i, [1.0] * 64) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    s = embedding_lsh_bucket_stats(
        df, num_planes=32, num_bands=4, max_bucket_size=10
    ).collect()[0]
    assert s["n_buckets"] == 4
    assert s["n_capped_buckets"] == 4
    assert s["capped_row_mass"] == 4 * 40
    # and the verifier really does drop them: zero pairs out
    from img2dataset_spark.operators.similarity import embedding_dup_pairs_lsh

    assert (
        embedding_dup_pairs_lsh(
            df, threshold=0.9, num_planes=32, num_bands=4, max_bucket_size=10
        ).count()
        == 0
    )


def test_semantic_dedup_cell_stats_pins_capped_mass(spark, vecs_df):
    """max_cell_size=1 caps every multi-member cell; the ledger's
    capped row mass is exactly the rows the Gram verifier skips."""
    from img2dataset_spark.operators.similarity import (
        ivf_assign,
        ivf_fit,
        semantic_dedup_cell_stats,
    )

    vecs = vecs_df.select("vec_id", "embedding")
    cb = ivf_fit(vecs, num_cells=2, iters=2, vec_col="embedding")
    sizes = [
        r["count"]
        for r in ivf_assign(vecs, cb, vec_col="embedding")
        .groupBy("cell").count().collect()
    ]
    s = semantic_dedup_cell_stats(
        vecs, cb, vec_col="embedding", max_cell_size=1
    ).collect()[0]
    assert s["n_buckets"] == len(sizes)
    assert s["n_capped_buckets"] == sum(1 for c in sizes if c > 1)
    assert s["capped_row_mass"] == sum(c for c in sizes if c > 1)
    ok = semantic_dedup_cell_stats(
        vecs, cb, vec_col="embedding", max_cell_size=10_000
    ).collect()[0]
    assert ok["n_capped_buckets"] == 0 and ok["capped_row_mass"] == 0


def test_ivf_assign_partitioned_write_prunes_files(spark, vecs_df, tmp_path):
    """The 100 TB IVF deployment story end-to-end: fit a codebook,
    write vectors PARTITIONED BY cell, and confirm a probe-filtered
    read plans only the probed cells' files (physical partition
    pruning — the disk-level analog of ivf_topk's cell pruning)."""
    import os

    from img2dataset_spark.operators.similarity import ivf_assign, ivf_fit

    out = os.path.join(str(tmp_path), "ivf")
    cb = ivf_fit(vecs_df, num_cells=3, iters=1)
    assigned = ivf_assign(vecs_df, cb)
    assigned.write.partitionBy("cell").parquet(out)

    cells = {r["cell"] for r in assigned.select("cell").distinct().collect()}
    assert len(cells) > 1, "fixture degenerated to one cell"
    probe = min(cells)
    rd = spark.read.parquet(out).filter(F.col("cell") == probe)
    # the partition predicate must reach the scan's PartitionFilters
    # (file-level pruning), not survive as a post-scan Filter only
    plan = rd._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell" in plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    # and the pruned read returns exactly that cell's rows
    want = assigned.filter(F.col("cell") == probe).count()
    assert rd.count() == want > 0


def test_minhash_lsh_pairs_vs_matches_self_join_cross_pairs(spark):
    """Cross-corpus pairs must equal the concatenated corpora's
    self-join restricted to cross pairs (same shingle/band formulas —
    a collision in one is a collision in the other).  Bucket caps are
    set high so neither variant's cap bites."""
    from img2dataset_spark.operators.dedup import minhash_lsh_pairs_vs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    new = docs.filter(F.col("doc_id") % 3 == 0)
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    cross = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs_vs(
            new, corpus, k=3, jaccard_threshold=0.3, max_bucket_size=10**6
        ).collect()
    }
    full = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(
            docs, k=3, jaccard_threshold=0.3, max_bucket_size=10**6
        ).collect()
    }
    want = {}
    for (a, b), j in full.items():
        if a % 3 == 0 and b % 3 != 0:
            want[(a, b)] = j
        elif b % 3 == 0 and a % 3 != 0:
            want[(b, a)] = j  # cross output is (new, corpus) ordered
    assert cross == want
    assert cross  # non-degenerate: the sf0.001 corpus has cross dups


def test_dedup_against_corpus_survivors(spark):
    """Survivors = new-wave rows with zero verified corpus matches;
    corpus rows are never dropped (they are the reference side)."""
    from img2dataset_spark.operators.dedup import (
        dedup_against_corpus,
        minhash_lsh_pairs_vs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    new = docs.filter(F.col("doc_id") % 3 == 0)
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    matched = {
        r["id_a"]
        for r in minhash_lsh_pairs_vs(new, corpus, jaccard_threshold=0.3)
        .select("id_a")
        .distinct()
        .collect()
    }
    surv = {r["doc_id"] for r in dedup_against_corpus(
        new, corpus, jaccard_threshold=0.3).select("doc_id").collect()}
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    assert surv == new_ids - matched
    assert matched  # the synthetic corpus has cross near-dups


def test_minhash_lsh_pairs_vs_corpus_cap_bounds_fanout(spark):
    """max_bucket_size caps CORPUS-side bands: with cap 0 every corpus
    band is dropped, so no pairs survive regardless of content."""
    from img2dataset_spark.operators.dedup import minhash_lsh_pairs_vs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    new = docs.filter(F.col("doc_id") % 3 == 0)
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    out = minhash_lsh_pairs_vs(
        new, corpus, jaccard_threshold=0.0, max_bucket_size=0
    )
    assert out.count() == 0


def test_minhash_index_parquet_roundtrip_equals_direct(spark, tmp_path):
    """build_minhash_index written to parquet and probed with
    minhash_lsh_pairs_vs_index must reproduce the direct two-frame
    call exactly — the wave-amortization path changes cost, not
    results."""
    from img2dataset_spark.operators.dedup import (
        build_minhash_index,
        minhash_lsh_pairs_vs,
        minhash_lsh_pairs_vs_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    new = docs.filter(F.col("doc_id") % 3 == 0)
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    path = str(tmp_path / "mh_index")
    build_minhash_index(corpus).write.parquet(path)
    stored = spark.read.parquet(path)
    via_index = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs_vs_index(
            new, stored, jaccard_threshold=0.3
        ).collect()
    }
    direct = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs_vs(new, corpus, jaccard_threshold=0.3).collect()
    }
    assert via_index == direct
    assert via_index  # non-degenerate
