"""Recall ledger — measured quality for the quantized ANN families.

The "no silent caps" observability discipline (dedup's
capped_bucket_stats, similarity's cap ledgers) applied to quantization
ERROR (r9 verdict item 6): every compressed index trades recall for
scan cost, and that trade should be a MEASURED relation per corpus —
like the wall-times in SCALE.md — not a claim.

Shape: sample ``num_queries`` corpus vectors DETERMINISTICALLY
(md5-order on the stable id — the sample_stratified trick, so the same
corpus always yields the same probe set and ledgers are comparable
across runs and scale points), run each family's searcher AND the
matching exact search per probe, and emit one row per family:
(family, k, num_queries, mean_recall, min_recall).  Every search is a
distributed Spark job; driver-side state is bounded by
``num_queries × k`` ids — never corpus-sized.

Ground truth is per-family: PQ/SQ approximate squared-L2, so they
ledger against :func:`exact_l2_topk`; BQ Hamming estimates the angle
and the refine stages re-rank by cosine, so they ledger against
:func:`similarity.cosine_topk`.  Measuring a family against the other
family's metric would manufacture recall loss that isn't the
quantizer's.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_l2_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force exact top-k by squared-L2 against a 1-row query_df
    (`query_vec` column) — the ground truth the L2-approximating
    families (PQ ADC, SQ8) are measured against.  One scan + codegen
    aggregate(zip_with(...)) + TakeOrdered; ties id-ascending."""
    from img2dataset_spark.operators.similarity import _as_double

    q = F.broadcast(query_df.select("query_vec"))
    scored = df.crossJoin(q).select(
        F.col(id_col),
        F.aggregate(
            F.zip_with(
                _as_double(F.col(vec_col)),
                F.col("query_vec"),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("l2_dist"),
    )
    return scored.orderBy(F.asc("l2_dist"), F.asc(id_col)).limit(k)


def exact_multi_topk(
    df: DataFrame,
    queries_df: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    metric: str = "l2",
) -> DataFrame:
    """Brute-force exact top-k for EVERY probe of a (qid, query_vec)
    frame in ONE corpus pass — the batch twin of :func:`exact_l2_topk`
    / :func:`similarity.cosine_topk` (r15: the recall ledgers ran one
    exact job per probe; q probes now cost one job, not q).  Scoring
    expressions are the single-probe ones verbatim; the per-qid window
    (dist, id) row_number cut selects exactly the rows the per-probe
    orderBy(...).limit(k) selects because ``id`` is unique — pinned by
    tests/test_r15_optimizations.py.  Returns (qid, id, score) rows;
    per-qid membership is the contract, like the multi searchers."""
    from pyspark.sql import Window

    from img2dataset_spark.operators.similarity import (
        _as_double,
        cosine,
        round6,
    )

    q = F.broadcast(queries_df.select("qid", "query_vec"))
    joined = df.crossJoin(q)
    if metric == "l2":
        scored = joined.select(
            F.col("qid"),
            F.col(id_col),
            F.aggregate(
                F.zip_with(
                    _as_double(F.col(vec_col)),
                    F.col("query_vec"),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("score"),
        )
        order = [F.asc("score"), F.asc(id_col)]
    elif metric == "cosine":
        scored = joined.select(
            F.col("qid"),
            F.col(id_col),
            round6(cosine(F.col(vec_col), F.col("query_vec"))).alias("score"),
        )
        order = [F.desc("score"), F.asc(id_col)]
    else:
        raise ValueError(f"unknown metric {metric!r}")
    w = Window.partitionBy("qid").orderBy(*order)
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def sample_query_vectors(
    df: DataFrame,
    num_queries: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[tuple[int, list[float]]]:
    """``num_queries`` (id, vector) probes in deterministic md5-of-id
    order — corpus-stable, engine-agnostic (the sample_stratified /
    Lloyd-seed ordering rule).  Driver materialization: num_queries
    rows."""
    rows = (
        df.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.md5(F.col(id_col).cast("string").cast("binary")),
                 F.col(id_col))
        .limit(num_queries)
        .collect()
    )
    return [(r[id_col], [float(x) for x in r[vec_col]]) for r in rows]


def recall_ledger(
    df: DataFrame,
    families: dict[str, tuple],
    k: int = 10,
    num_queries: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probes: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """(family, k, num_queries, mean_recall, min_recall) — recall@k of
    each family's searcher against its exact metric over the
    deterministic probe set.  ``families`` maps name -> (searcher,
    metric[, multi_searcher]): searcher takes a 1-row query DataFrame
    (`query_vec`) and returns a frame whose FIRST column is the id;
    metric is "l2" or "cosine" and selects the exact ground-truth
    search; the OPTIONAL multi_searcher takes a dense (qid, query_vec)
    frame and returns (qid, id, ...) rows whose per-qid id membership
    equals the per-probe searcher's (the ``*_multi_topk_versioned``
    contract, pinned by the multi-vs-single tests) — when present, the
    family's q probe jobs collapse into ONE batch job (r15).  Exact
    ground truth likewise runs as one :func:`exact_multi_topk` job per
    metric.  Recall math happens on 2·k ids per (family, probe), and
    the emitted relation is byte-identical to the per-probe loop's.

    ``probes`` overrides the probe sampling with pre-collected (id,
    vector) pairs — callers that already hold the deterministic sample
    (refit_recall_ledger overlaps the sampling job with its artifact
    builds) skip the collect here; the contract is exactly
    :func:`sample_query_vectors`'s output."""
    from concurrent.futures import ThreadPoolExecutor

    from img2dataset_spark.operators.similarity import (
        literal_multi_query_frame,
        literal_query_frame,
    )

    spark = df.sparkSession
    if probes is None:
        probes = sample_query_vectors(df, num_queries, vec_col, id_col)
    if not probes:
        raise ValueError("recall_ledger: empty corpus")

    def _qdf(vec: Sequence[float]) -> DataFrame:
        # memo-seeded literal frame: downstream searchers collect the
        # query row job-free (r14)
        return literal_query_frame(spark, vec)

    fams = {
        name: (t[0], t[1], t[2] if len(t) > 2 else None)
        for name, t in families.items()
    }
    metrics = {m for _, m, _ in fams.values()}
    for metric in metrics:
        if metric not in ("l2", "cosine"):
            raise ValueError(f"unknown metric {metric!r}")

    # Every exact job and every family's search is INDEPENDENT — run
    # them overlapped from a small thread pool (guide §2.6: actions are
    # only sequential because driver code calls them sequentially; FIFO
    # scheduling back-fills each job's task tail with the next job's
    # tasks).  Results land in pre-indexed slots, so the emitted
    # relation is byte-identical to the sequential loop's (r14).
    # ONE memo-seeded probe frame shared by every batch job below
    # (building it per-call would redo the createDataFrame round-trip
    # under the driver lock once per family)
    qs = literal_multi_query_frame(spark, [v for _, v in probes])

    def _exact_all(metric: str) -> list[set]:
        sets: list[set] = [set() for _ in probes]
        for r in exact_multi_topk(df, qs, k=k, vec_col=vec_col,
                                  id_col=id_col, metric=metric).collect():
            sets[int(r[0])].add(r[1])
        return sets

    def _approx(searcher, v):
        return {r[0] for r in searcher(_qdf(v)).collect()}

    def _approx_all(multi) -> list[set]:
        sets: list[set] = [set() for _ in probes]
        for r in multi(qs).collect():
            sets[int(r[0])].add(r[1])
        return sets

    with ThreadPoolExecutor(max_workers=8) as pool:
        exact_futs = {
            metric: pool.submit(_exact_all, metric) for metric in metrics
        }
        batch_futs = {
            name: pool.submit(_approx_all, multi)
            for name, (_, _, multi) in fams.items()
            if multi is not None
        }
        approx_futs = {
            (name, i): pool.submit(_approx, searcher, v)
            for name, (searcher, _, multi) in fams.items()
            if multi is None
            for i, (_, v) in enumerate(probes)
        }
        exact_ids = {m: f.result() for m, f in exact_futs.items()}
        out = []
        for name, (_, metric, multi) in fams.items():
            got = (
                batch_futs[name].result()
                if multi is not None
                else [approx_futs[(name, i)].result()
                      for i in range(len(probes))]
            )
            recalls = [
                len(got[i] & exact_ids[metric][i]) / k
                for i in range(len(probes))
            ]
            out.append((name, k, len(probes),
                        round(sum(recalls) / len(recalls), 6),
                        round(min(recalls), 6)))
    return spark.createDataFrame(
        out,
        "family string, k long, num_queries long, "
        "mean_recall double, min_recall double",
    )


def quantizer_recall_ledger(
    df: DataFrame,
    k: int = 10,
    num_queries: int = 4,
    nprobe: int | None = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    pq_subspaces: int = 8,
    pq_codes: int = 16,
) -> DataFrame:
    """The standard menu ledgered at production-ish settings (the
    bench's fitted-artifact parameters: m=8/k=16 PQ by default, SQ8
    bounds, 64-plane BQ, occupancy-pinned coarse cells): one fit per
    model, then one ledger relation covering pq_adc / ivfpq /
    ivfpq_residual / sq8 / ivfsq / bq / bq_refine / ivfbq.  This is
    what tools/recall_ledger.py runs per scale point for SCALE.md.
    ``nprobe=None`` routes the IVF variants through the corpus-aware
    recommended_nprobe default (ceil(sqrt(num_cells))).

    ``pq_subspaces``/``pq_codes`` size the PQ codebook (item-4 sweep:
    FAISS's production default is k=256 codes/subspace; 16 is the toy
    setting the oracle registry pins).  ``ivfpq_residual`` is in the
    menu because the clustered-corpus ledger showed WHY FAISS
    quantizes residuals: on mixture-of-Gaussians data every
    same-cluster point shares a raw-vector code word, so non-residual
    PQ ties the whole cluster (recall 0.025 at 60k/64 clusters) while
    residual codes resolve within-cluster structure."""
    from img2dataset_spark.operators.bq import (
        bq_encode,
        bq_refine_topk,
        bq_topk,
        ivfbq_index,
        ivfbq_topk,
    )
    from img2dataset_spark.operators.pq import (
        ivfpq_index,
        ivfpq_refine_topk,
        ivfpq_topk,
        pq_encode,
        pq_fit,
        pq_topk,
    )
    from img2dataset_spark.operators.similarity import (
        ivf_fit,
        recommended_num_cells,
    )
    from img2dataset_spark.operators.sq import (
        ivfsq_index,
        ivfsq_topk,
        sq_encode,
        sq_fit,
        sq_topk,
    )

    n_cells = recommended_num_cells(df.count())
    pq_cb = pq_fit(df, num_subspaces=pq_subspaces, num_codes=pq_codes,
                   iters=2, vec_col=vec_col, id_col=id_col, dim=dim)
    pq_codes_df = pq_encode(df, pq_cb, vec_col=vec_col,
                            id_col=id_col).persist()
    ivf_cb = ivf_fit(df, num_cells=n_cells, iters=2,
                     vec_col=vec_col, id_col=id_col)
    pq_idx = ivfpq_index(df, ivf_cb, pq_cb,
                         vec_col=vec_col, id_col=id_col).persist()
    # residual IVF+PQ (the FAISS IVFPQ recipe): reuse the SAME coarse
    # codebook (ivfpq_fit would refit it identically — md5-seeded
    # Lloyd is deterministic); fit the residual book separately
    from img2dataset_spark.operators.pq import residual_vectors

    res_cb = pq_fit(
        residual_vectors(df, ivf_cb, vec_col, id_col),
        num_subspaces=pq_subspaces, num_codes=pq_codes, iters=2,
        vec_col="rvec", id_col=id_col, dim=dim,
    )
    res_idx = ivfpq_index(df, ivf_cb, res_cb, vec_col=vec_col,
                          id_col=id_col, residual=True).persist()
    bounds = sq_fit(df, vec_col=vec_col, dim=dim)
    sq_codes = sq_encode(df, bounds, vec_col=vec_col, id_col=id_col).persist()
    sq_idx = ivfsq_index(df, ivf_cb, bounds,
                         vec_col=vec_col, id_col=id_col).persist()
    bq_codes = bq_encode(df, num_planes=dim, dim=dim,
                         vec_col=vec_col, id_col=id_col).persist()
    bq_idx = ivfbq_index(df, ivf_cb, num_planes=dim, dim=dim,
                         vec_col=vec_col, id_col=id_col).persist()
    families = {
        "pq_adc": (lambda q: pq_topk(pq_codes_df, pq_cb, q, k=k,
                                     id_col=id_col), "l2"),
        "ivfpq": (lambda q: ivfpq_topk(pq_idx, ivf_cb, pq_cb, q, k=k,
                                       nprobe=nprobe, id_col=id_col), "l2"),
        "ivfpq_residual": (lambda q: ivfpq_topk(
            res_idx, ivf_cb, res_cb, q, k=k, nprobe=nprobe,
            id_col=id_col, residual=True), "l2"),
        # the full production composition: residual codes screen,
        # exact re-rank of the k*refine_factor survivors
        "ivfpq_res_refine": (lambda q: ivfpq_refine_topk(
            res_idx, ivf_cb, res_cb, df, q, k=k, nprobe=nprobe,
            refine_factor=4, residual=True, vec_col=vec_col,
            id_col=id_col), "cosine"),
        "sq8": (lambda q: sq_topk(sq_codes, bounds, q, k=k,
                                  id_col=id_col), "l2"),
        "ivfsq": (lambda q: ivfsq_topk(sq_idx, ivf_cb, bounds, q, k=k,
                                       nprobe=nprobe, id_col=id_col), "l2"),
        "bq": (lambda q: bq_topk(bq_codes, q, k=k, num_planes=dim,
                                 dim=dim, id_col=id_col), "cosine"),
        "bq_refine": (lambda q: bq_refine_topk(
            bq_codes, df, q, k=k, refine_factor=4, num_planes=dim,
            dim=dim, vec_col=vec_col, id_col=id_col), "cosine"),
        "ivfbq": (lambda q: ivfbq_topk(bq_idx, ivf_cb, q, k=k,
                                       nprobe=nprobe, num_planes=dim,
                                       dim=dim, id_col=id_col), "cosine"),
    }
    try:
        return recall_ledger(df, families, k=k, num_queries=num_queries,
                             vec_col=vec_col, id_col=id_col)
    finally:
        for cached in (pq_codes_df, pq_idx, res_idx, sq_codes, sq_idx,
                       bq_codes, bq_idx):
            cached.unpersist()


def refit_recall_ledger(
    df: DataFrame,
    base_df: DataFrame,
    num_cells: int = 10,
    iters: int = 2,
    pq_subspaces: int = 2,
    pq_codes: int = 4,
    k: int = 10,
    num_queries: int = 3,
    nprobe: int = 4,
    threshold: float = 1.02,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    include_sq: bool = False,
    include_refine: bool = False,
    refine_factor: int = 4,
) -> DataFrame:
    """Refit RECOVERY as a queryable relation (r12 verdict item 1):
    the maintained families — versioned raw and versioned residual
    (true LOPQ), each BEFORE and AFTER the selective refit — ledgered
    against exact-L2 ground truth on the same deterministic probe set
    the static menu uses, so "what did drift cost and what did the
    refit recover" is a relation a scheduler can query per scale
    point, not a test assertion.

    ``include_sq=True`` adds the SQ maintenance loop's pair
    (``versioned_sq_pre`` / ``versioned_sq_post``): global bounds fit
    frozen on the base, per-cell bounds refit for the flagged cells
    (maintain.sq_refit_cells), both measured through
    :func:`operators.sq.ivfsq_topk_versioned` — the asymmetric
    reconstruction distance, empty overrides for pre.  Off by default
    so the driver row's SQL twin stays the four-family relation.

    ``include_refine=True`` adds the REFINE stage over the same
    maintained indexes (r13 verdict item 1: the 600k ledger showed the
    compressed stage at 10× occupancy reads 0.025-0.16 even post-refit
    while the refine stage at the corpus-sized rf reached 0.65 — but
    no refine family existed in this relation):
    ``versioned_{raw,residual}_refine_{pre,post}`` — each a
    :func:`operators.pq.ivfpq_refine_topk_versioned` search (versioned
    screen at ``k·refine_factor``, exact cosine re-rank) measured
    against exact-COSINE ground truth, the re-rank's own metric.
    ``refine_factor`` is explicit (default 4) so the relation is
    engine-reproducible; production callers use the auto-rf default on
    the searcher itself.  With ``include_sq=True`` as well, the SQ
    maintained pair also gets its refine families
    (``versioned_sq_refine_{pre,post}`` via
    :func:`operators.sq.ivfsq_refine_topk_versioned`) — the remedy
    stage measured across BOTH maintained codebook families.

    Pipeline inside one relation: coarse codebook + both global PQ
    books (raw; residual) fit FROZEN on ``base_df``; the full corpus
    indexed with each; drift flags from occupancy_drift at
    ``threshold``; per-cell refit books for the flagged cells
    (pq_refit_cells, raw and residual variants); flagged rows
    re-encoded; and four searchers measured through the ONE production
    code path — :func:`operators.pq.ivfpq_topk_versioned` — with an
    EMPTY override relation for the "pre" rows (version 0 everywhere,
    the stale index) and the refit relation for the "post" rows (the
    mixed index).  Emits the :func:`recall_ledger` schema with
    families ``versioned_raw_pre`` / ``versioned_raw_post`` /
    ``versioned_residual_pre`` / ``versioned_residual_post``.

    All model state is bounded (books, flags, probe rows); the mixed
    indexes are anti-join ∪ re-encode relations, never written.  The
    same promotion pq_distortion_ledger got in r11: meter → actuator →
    quality-proof, every stage a relation under the oracle."""
    from img2dataset_spark.operators.maintain import (
        index_occupancy,
        occupancy_drift,
        pq_reencode_cells,
        pq_refit_cells,
    )
    from img2dataset_spark.operators.pq import (
        ivfpq_index,
        ivfpq_topk_versioned,
        pq_fit,
        residual_vectors,
    )
    from img2dataset_spark.operators.similarity import ivf_assign, ivf_fit

    spark = df.sparkSession
    ivf_cb = ivf_fit(base_df, num_cells=num_cells, iters=iters,
                     vec_col=vec_col, id_col=id_col)
    # assign ONCE per side (r14): the corpus assignment feeds both
    # indexes, both refits, both re-encodes (and the SQ family), the
    # base assignment feeds the drift flags and the residual book fit —
    # previously each stage re-ran its own Arrow assignment pass
    tagged = ivf_assign(df, ivf_cb, vec_col, id_col).persist()
    btagged = ivf_assign(base_df, ivf_cb, vec_col, id_col).persist()
    # eager materialization: the concurrent fits/searches below would
    # otherwise thundering-herd the first computation of the shared
    # cached pass
    tagged.count()
    btagged.count()
    flagged = (
        occupancy_drift(
            index_occupancy(btagged),
            index_occupancy(tagged),
            threshold=threshold,
        )
        .filter(F.col("retrain"))
        .select("cell")
        .persist()
    )
    from img2dataset_spark.operators.pq import empty_overrides_frame

    empty_ovr = empty_overrides_frame(spark)
    cached = [flagged, tagged, btagged]
    families = {}

    # eager tiny materialization: both _prep_family threads below read
    # the persisted flagged frame; computing it once up front keeps the
    # concurrent refit collects from herding its first computation
    flagged.count()

    # The raw and residual book FITS are independent given (ivf_cb,
    # btagged) — overlap their Lloyd jobs from a 2-thread pool (guide
    # §2.6); the families dict below is still built in the fixed
    # (raw, residual) order, so the emitted relation is unchanged (r14)
    def _fit_book(residual: bool):
        if residual:
            return pq_fit(
                residual_vectors(base_df, ivf_cb, vec_col, id_col,
                                 assigned=btagged),
                num_subspaces=pq_subspaces, num_codes=pq_codes,
                iters=iters, vec_col="rvec", id_col=id_col, dim=dim,
            )
        return pq_fit(base_df, num_subspaces=pq_subspaces,
                      num_codes=pq_codes, iters=iters,
                      vec_col=vec_col, id_col=id_col, dim=dim)

    # The per-cell REFIT books and their re-encode pass depend only on
    # (ivf_cb, flagged, tagged) — never on the global books — and
    # pq_reencode_cells eagerly collects the override relation (the
    # per-cell Lloyd job).  Run both families' refit+collect chains on
    # pool threads CONCURRENTLY with the two global book fits (guide
    # §2.6); previously each family's override collect ran serially on
    # the main thread after both fits had already joined (~1.5 s each,
    # phase-measured).  The frames produced are identical — only the
    # submission order changed.
    def _prep_family(residual: bool):
        ovr = pq_refit_cells(df, ivf_cb, flagged,
                             num_subspaces=pq_subspaces,
                             num_codes=pq_codes, iters=iters,
                             vec_col=vec_col, id_col=id_col, dim=dim,
                             residual=residual, assigned=tagged).persist()
        reenc = pq_reencode_cells(df, ivf_cb, ovr, vec_col=vec_col,
                                  id_col=id_col, residual=residual,
                                  assigned=tagged)
        return ovr, reenc

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=5) as _pool:
        # the deterministic probe sample is independent of every
        # artifact — overlap its job with the fits (r15) and hand the
        # collected pairs to recall_ledger below, which then skips its
        # own sampling job
        _probe_fut = _pool.submit(sample_query_vectors, df, num_queries,
                                  vec_col, id_col)
        _books = {r: _pool.submit(_fit_book, r) for r in (False, True)}
        _preps = {r: _pool.submit(_prep_family, r) for r in (False, True)}
    probes = _probe_fut.result()
    for residual in (False, True):
        name = "versioned_residual" if residual else "versioned_raw"
        book = _books[residual].result()
        ovr, reenc = _preps[residual].result()
        idx = ivfpq_index(df, ivf_cb, book, vec_col=vec_col,
                          id_col=id_col, residual=residual,
                          assigned=tagged).persist()
        mixed = (
            idx.join(F.broadcast(flagged), "cell", "left_anti")
            .select(F.col(id_col), "cell", "codes")
            .unionByName(reenc.select(F.col(id_col), "cell", "codes"))
            .persist()
        )
        cached += [idx, ovr, mixed]
        # families stay PER-PROBE here: a same-JVM alternating A/B at
        # sf0.1/32c read the batch (*_multi_topk_versioned) wiring
        # ~1 s SLOWER min-of-5 (9.3 vs 8.3 s — the versioned batch
        # plans cost more driver-side construction than q overlapped
        # single-probe jobs cost to run at num_queries=3).  The batch
        # slot in recall_ledger stays available for probe sets where
        # the trade flips (see its docstring); the EXACT ground truths
        # are batched unconditionally — one corpus scan per metric.
        families[f"{name}_pre"] = (
            lambda q, _i=idx, _b=book, _r=residual: ivfpq_topk_versioned(
                _i, ivf_cb, _b, empty_ovr, q, k=k, nprobe=nprobe,
                id_col=id_col, residual=_r),
            "l2",
        )
        families[f"{name}_post"] = (
            lambda q, _m=mixed, _b=book, _o=ovr, _r=residual:
                ivfpq_topk_versioned(
                    _m, ivf_cb, _b, _o, q, k=k, nprobe=nprobe,
                    id_col=id_col, residual=_r),
            "l2",
        )
        if include_refine:
            from img2dataset_spark.operators.pq import (
                ivfpq_refine_topk_versioned,
            )

            families[f"{name}_refine_pre"] = (
                lambda q, _i=idx, _b=book, _r=residual:
                    ivfpq_refine_topk_versioned(
                        _i, ivf_cb, _b, empty_ovr, df, q, k=k,
                        nprobe=nprobe, refine_factor=refine_factor,
                        residual=_r, vec_col=vec_col, id_col=id_col),
                "cosine",
            )
            families[f"{name}_refine_post"] = (
                lambda q, _m=mixed, _b=book, _o=ovr, _r=residual:
                    ivfpq_refine_topk_versioned(
                        _m, ivf_cb, _b, _o, df, q, k=k,
                        nprobe=nprobe, refine_factor=refine_factor,
                        residual=_r, vec_col=vec_col, id_col=id_col),
                "cosine",
            )
    if include_sq:
        from img2dataset_spark.operators.maintain import (
            sq_reencode_cells,
            sq_refit_cells,
        )
        from img2dataset_spark.operators.sq import (
            ivfsq_index,
            ivfsq_topk_versioned,
            sq_fit,
        )

        bounds = sq_fit(base_df, vec_col=vec_col)
        sq_idx = ivfsq_index(df, ivf_cb, bounds, vec_col=vec_col,
                             id_col=id_col, assigned=tagged).persist()
        sq_ovr = sq_refit_cells(df, ivf_cb, flagged, vec_col=vec_col,
                                id_col=id_col, assigned=tagged).persist()
        sq_mixed = (
            sq_idx.join(F.broadcast(flagged), "cell", "left_anti")
            .select(F.col(id_col), "cell", "codes")
            .unionByName(
                sq_reencode_cells(df, ivf_cb, sq_ovr, vec_col=vec_col,
                                  id_col=id_col, assigned=tagged)
                .select(F.col(id_col), "cell", "codes")
            )
            .persist()
        )
        from img2dataset_spark.operators.sq import empty_cell_bounds_frame

        empty_sq_ovr = empty_cell_bounds_frame(spark)
        cached += [sq_idx, sq_ovr, sq_mixed]
        families["versioned_sq_pre"] = (
            lambda q: ivfsq_topk_versioned(
                sq_idx, ivf_cb, bounds, empty_sq_ovr, q, k=k,
                nprobe=nprobe, id_col=id_col),
            "l2",
        )
        families["versioned_sq_post"] = (
            lambda q: ivfsq_topk_versioned(
                sq_mixed, ivf_cb, bounds, sq_ovr, q, k=k,
                nprobe=nprobe, id_col=id_col),
            "l2",
        )
        if include_refine:
            from img2dataset_spark.operators.sq import (
                ivfsq_refine_topk_versioned,
            )

            families["versioned_sq_refine_pre"] = (
                lambda q: ivfsq_refine_topk_versioned(
                    sq_idx, ivf_cb, bounds, empty_sq_ovr, df, q, k=k,
                    nprobe=nprobe, refine_factor=refine_factor,
                    vec_col=vec_col, id_col=id_col),
                "cosine",
            )
            families["versioned_sq_refine_post"] = (
                lambda q: ivfsq_refine_topk_versioned(
                    sq_mixed, ivf_cb, bounds, sq_ovr, df, q, k=k,
                    nprobe=nprobe, refine_factor=refine_factor,
                    vec_col=vec_col, id_col=id_col),
                "cosine",
            )
    try:
        return recall_ledger(df, families, k=k, num_queries=num_queries,
                             vec_col=vec_col, id_col=id_col, probes=probes)
    finally:
        for c in cached:
            c.unpersist()
