"""Streaming deduplication — exact dedup as data arrives.

Batch `operators.dedup.exact_dedup` keeps one row per content
fingerprint with a hash aggregate.  The streaming twin answers the
ingestion-time question — "have I already accepted this document?" —
with Spark's `dropDuplicatesWithinWatermark`: state holds one entry
per fingerprint seen inside the watermark horizon and is evicted once
the event-time watermark passes, so state is O(fingerprints per
horizon), not O(corpus).

That horizon IS the semantic difference from batch dedup: a duplicate
arriving later than the watermark delay after the original is emitted
again.  For a training-data ingest (dedup against the recent crawl
window, with a periodic batch `exact_dedup` compaction over the
accumulated corpus) this is the standard lambda split: the stream
bounds state, the batch pass guarantees global exactness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from img2dataset_spark.functions.eventtime import ensure_event_time
from img2dataset_spark.functions.text import fingerprint


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Shared prep: attach the normalized-content fingerprint (same
    expression as batch exact_dedup, so stream and batch agree)."""
    return df.withColumn("fingerprint", fingerprint(F.col(text_col)))


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-seen rows of a streaming DataFrame, deduped by content
    fingerprint within the watermark horizon.  State per fingerprint is
    dropped when the watermark passes its event time + delay."""
    return (
        ensure_event_time(with_fingerprint(stream, text_col), ts_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def _row_exempt_key(cu, id_col: str, ts_col: str):
    """Per-row dedup key exempting NULL-canonical-url rows: falls back
    to '\\x00row:<id>:<ts>' — DETERMINISTIC row content, not uuid(), so
    a micro-batch replay after failure recomputes the same key and
    dropDuplicatesWithinWatermark state suppresses the replay (a fresh
    uuid per attempt would re-emit null-url rows on recovery).  NUL
    never appears in a canonical url (canonical_url strips it), so the
    exemption space cannot collide with a real url.

    Determinism trade-off: two DISTINCT null-url rows sharing
    (id, ts) — including both ids NULL — collide on one key and the
    second is dropped, where the old uuid() key kept both.  The key
    assumes (id, ts) identifies a row among null-url rows; feed a
    real id column (or fold a content column into ``id_col``) if the
    stream can't promise that."""
    return F.coalesce(
        cu,
        F.concat(
            F.lit("\x00row:"),
            F.col(id_col).cast("string"),
            F.lit(":"),
            F.col(ts_col).cast("string"),
        ),
    )


def streaming_url_dedup(
    stream: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-seen rows of a streaming URL feed, deduped by CANONICAL
    url (functions/url.py rule set — same expression as the batch
    `dedup_by_url` and the pipeline's `dedup_urls` stage, so stream
    and batch agree on what counts as the same resource) within the
    watermark horizon.  The ingestion-time twin of the pre-fetch
    bandwidth saver: a crawl frontier stream drops re-discovered
    spellings before they ever reach the fetch pool, with state
    bounded by the horizon exactly like streaming_exact_dedup.

    NULL-url rows are exempt from dedup (each gets a deterministic
    per-row state key from (id, ts) — see _row_exempt_key;
    dropDuplicates treats NULLs as equal, which would keep one
    survivor from ALL null-url rows); they pass through with
    canonical_url NULL, matching batch dedup_by_url."""
    from img2dataset_spark.functions.url import canonical_url

    cu = canonical_url(F.col(url_col))
    key = _row_exempt_key(cu, id_col, ts_col)
    return (
        ensure_event_time(
            stream.withColumn("canonical_url", cu).withColumn("_dedup_key", key),
            ts_col,
        )
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_dedup_key"])
        .drop("_dedup_key")
    )


def static_band_index(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 32,
    num_bands: int = 8,
) -> DataFrame:
    """(band, ref_id) MinHash-LSH index of an EXISTING batch corpus,
    for stream-static near-dup checks.  Same shingle/minhash/banding
    formulas as the batch pair generator (operators.dedup) — including
    the compact h32 shingle-set representation — so a stream-side
    collision means exactly "this band would have joined in
    minhash_lsh_pairs".  Persist the result: Spark re-reads the
    static side every micro-batch, and a persisted tiny index turns
    that into a memory lookup."""
    from img2dataset_spark.functions.text_fast import (
        make_minhash_bands_udf,
        make_shingle_h32_udf,
    )

    shingle_h32 = make_shingle_h32_udf(k)
    bands = make_minhash_bands_udf(num_hashes, num_bands)
    docs = corpus.select(
        F.col(id_col).alias("ref_id"),
        shingle_h32(F.col(text_col)).alias("_ss"),
    ).filter(F.size("_ss") > 0)
    return docs.select(
        "ref_id", F.explode(bands(F.col("_ss"))).alias("band")
    ).distinct()


def streaming_neardup_flags(
    stream: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    k: int = 3,
    num_hashes: int = 32,
    num_bands: int = 8,
) -> DataFrame:
    """Ingestion-time near-dup screening: each streaming document is
    banded with the SAME minhash formulas and stream-static LEFT-joined
    against ``index``; the per-document aggregation emits
    (id, ts, n_band_hits, is_neardup).

    The stream-static join is stateless (the static side is a lookup);
    the only state is the per-document aggregation, bounded by the
    watermark.  Documents too short to shingle have no bands and are
    emitted with n_band_hits = 0 via a zero-band placeholder, so every
    incoming document gets a verdict.  This answers "does the new doc
    collide with the EXISTING corpus"; duplicates *within* the stream
    are streaming_exact_dedup's job (and a periodic batch
    minhash_lsh_pairs compaction covers stream-vs-stream near-dups —
    the same lambda split documented in the module header)."""
    from img2dataset_spark.functions.text_fast import (
        make_minhash_bands_udf,
        make_shingle_h32_udf,
    )

    shingle_h32 = make_shingle_h32_udf(k)
    bands = make_minhash_bands_udf(num_hashes, num_bands)
    banded = (
        stream.select(
            F.col(id_col), F.col(ts_col),
            shingle_h32(F.col(text_col)).alias("_ss"),
        )
        .withColumn(
            "band",
            F.explode_outer(
                F.when(F.size("_ss") > 0, bands(F.col("_ss")))
            ),
        )
        .drop("_ss")
    )
    hits = ensure_event_time(banded.join(index, "band", "left"), ts_col)
    return (
        hits.withWatermark(ts_col, watermark)
        .groupBy(id_col, ts_col)
        .agg(
            F.count("ref_id").alias("n_band_hits"),
            F.max(F.col("ref_id").isNotNull()).alias("is_neardup"),
        )
    )


def streaming_wave_admission(
    stream: DataFrame,
    index: DataFrame,
    bloom: bytes,
    num_hashes: int,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    k: int = 3,
    mh_num_hashes: int = 32,
    mh_num_bands: int = 8,
    jaccard_threshold: float = 0.5,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """The INGEST admission story as ONE streaming query — the
    streaming twin of the batch ingest_wave_e2e composition:

    1. canonical-URL dedup within the watermark horizon (NULL urls
       exempt, matching streaming_url_dedup);
    2. Bloom exclusion against historical ids (map-only pandas-UDF
       probe — stateless, the broadcast bit array is the only data);
    3. near-dup screening vs a PREBUILT corpus index
       (operators.dedup.build_minhash_index read from parquet) with
       EXACT stream-static Jaccard verification: the index carries
       shingle_set alongside bands, so a band hit is verified with the
       same array_intersect expression the batch verifier uses — no
       state, no UDF, unlike streaming_neardup_flags which only counts
       band collisions.

    Verdict parity with the batch twin (minhash_lsh_pairs_vs) is exact
    by construction, not just on easy data: the corpus side applies the
    SAME max_bucket_size hot-band cap (bounding join fan-out on
    degenerate bands exactly like the batch plan); the Jaccard is
    floor-rounded to 6 dp with the shared operators.dedup.round6
    expression BEFORE the threshold compare (a boundary pair rounds the
    same way in both engines); and n_matches counts DISTINCT verified
    corpus documents (collect_set of matched ref ids inside the
    watermark aggregation — the streaming equivalent of the batch
    pair-level .distinct(), since a doc sharing three bands with one
    ref is still one near-dup).

    Emits one row per admitted-or-rejected document at watermark close:
    (id, ts, canonical_url, n_matches, admitted) where admitted means
    "no historical id hit AND no verified corpus near-dup"; URL-dup
    rows inside the horizon are dropped by stage 1 and never emitted.
    Two stateful operators (dedup + aggregation) chained under one
    watermark — supported append-mode shape.  At 100 TB the index is
    the static side of a stream-static join (partitioned scan, no
    state), and per-micro-batch cost is the wave's own shingle/band
    pass — identical economics to the batch wave probe."""
    from img2dataset_spark.functions.text_fast import (
        make_minhash_bands_udf,
        make_shingle_h32_udf,
    )
    from img2dataset_spark.functions.url import canonical_url
    from img2dataset_spark.operators.bloom import probe_bloom
    from img2dataset_spark.operators.dedup import round6

    cu = canonical_url(F.col(url_col))
    key = _row_exempt_key(cu, id_col, ts_col)
    deduped = (
        ensure_event_time(
            stream.withColumn("canonical_url", cu).withColumn("_dedup_key", key),
            ts_col,
        )
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_dedup_key"])
        .drop("_dedup_key")
    )
    probed = probe_bloom(deduped, id_col, bloom, num_hashes, flag_col="_seen")

    shingle_h32 = make_shingle_h32_udf(k)
    bands = make_minhash_bands_udf(mh_num_hashes, mh_num_bands)
    banded = probed.withColumn("_ss", shingle_h32(F.col(text_col))).withColumn(
        "band",
        F.explode_outer(F.when(F.size("_ss") > 0, bands(F.col("_ss")))),
    )
    # static side: explode the index, then drop hot bands — the same
    # corpus-side max_bucket_size cap as minhash_lsh_pairs_vs, computed
    # once on the static frame (stream-static join keeps it stateless)
    idx = index.select(
        F.col(id_col).alias("_ref_id"),
        F.col("shingle_set").alias("_ref_ss"),
        F.explode("bands").alias("band"),
    )
    bucket_sizes = idx.groupBy("band").count()
    idx = idx.join(
        bucket_sizes.filter(F.col("count") <= max_bucket_size).select("band"),
        "band",
    )
    hits = banded.join(idx, "band", "left")
    inter = F.size(F.array_intersect("_ss", "_ref_ss"))
    union = F.size("_ss") + F.size("_ref_ss") - inter
    # shared 6-dp rounding BEFORE the threshold compare — bit-identical
    # to the batch verifier's accept filter on boundary jaccards
    jacc = F.when(
        F.col("_ref_ss").isNotNull() & (union > 0), round6(inter / union)
    ).otherwise(F.lit(None))
    flagged = hits.withColumn(
        "_match_ref",
        F.when(jacc >= jaccard_threshold, F.col("_ref_id")),
    )
    return (
        flagged.groupBy(id_col, ts_col, "canonical_url", "_seen")
        # collect_set dedupes (doc, ref) across shared bands: n_matches
        # is the count of DISTINCT verified corpus near-dups, matching
        # the batch pair-level .distinct()
        .agg(
            F.size(F.collect_set("_match_ref")).cast("long").alias("n_matches"),
        )
        .select(
            id_col,
            ts_col,
            "canonical_url",
            "n_matches",
            (
                ~F.coalesce(F.col("_seen"), F.lit(False))
                & (F.col("n_matches") == 0)
            ).alias("admitted"),
        )
    )


def semantic_static_index(
    corpus: DataFrame,
    codebook: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cell_size: int = 10_000,
) -> DataFrame:
    """(cell, _ref_id, _ref_v) index of an EXISTING embedding corpus
    for stream-static semantic screening: the corpus assigned through
    the SAME quantized-argmin pass batch SemDeDup uses (ivf_assign),
    with the corpus-side cell cap applied ONCE on the static frame —
    mirroring semantic_dedup_pairs_vs's corpus-side max_cell_size rule
    (a giant corpus cell is a degenerate cluster; capping here bounds
    the stream-static join's fan-out exactly like the batch plan).
    Persist the result (or write it to parquet): Spark re-reads the
    static side every micro-batch."""
    from img2dataset_spark.operators.similarity import ivf_assign

    assigned = ivf_assign(corpus, codebook, vec_col, id_col)
    ok = (
        assigned.groupBy("cell")
        .count()
        .filter(F.col("count") <= max_cell_size)
        .select("cell")
    )
    return assigned.join(ok, "cell").select(
        "cell",
        F.col(id_col).alias("_ref_id"),
        F.col("v").alias("_ref_v"),
    )


def semantic_static_codes_index(
    corpus: DataFrame,
    codebook: DataFrame,
    num_planes: int = 64,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cell_size: int = 10_000,
) -> DataFrame:
    """(cell, _ref_id, _ref_codes) — the BQ-compressed twin of
    :func:`semantic_static_index` for the admission pre-screen (r9
    verdict item 4): the per-micro-batch stream-static join side
    carries ceil(num_planes/32) packed words per corpus vector instead
    of the d-dim float vector — 8 B vs d×8 B of static state, ~100× at
    768-dim.  Same quantized-argmin assignment and the same corpus-side
    cell cap, so the join fan-out rule is unchanged; codes come from
    the SAME encode the batch bq family uses (make_bq_encode_udf).
    Pair with a (id, vector) ref frame: only pre-screen SURVIVORS join
    back to full vectors for the exact-cosine verdict."""
    from img2dataset_spark.operators.bq import make_bq_encode_udf
    from img2dataset_spark.operators.similarity import ivf_assign

    encode = make_bq_encode_udf(corpus.sparkSession, num_planes, dim)
    assigned = ivf_assign(corpus, codebook, vec_col, id_col)
    ok = (
        assigned.groupBy("cell")
        .count()
        .filter(F.col("count") <= max_cell_size)
        .select("cell")
    )
    return assigned.join(ok, "cell").select(
        "cell",
        F.col(id_col).alias("_ref_id"),
        encode(F.col("v")).alias("_ref_codes"),
    )


def codebook_fingerprint(codebook: DataFrame) -> str:
    """Deterministic md5 of a coarse codebook's IDENTITY — sorted
    (level, cell, 2^-20-quantized centroid) tuples — the epoch stamp
    the codes-index accumulation loop pins its appends to (r13 verdict
    item 4).  Quantized, so the fingerprint is representation-stable
    across engines/roundtrips exactly like every distance in this
    repo; model-sized collect (the codebook relation)."""
    import hashlib

    import numpy as np

    from img2dataset_spark.operators.similarity import _QUANT

    has_level = "level" in codebook.columns
    cols = (["level"] if has_level else []) + ["cell", "centroid"]
    items = []
    for r in codebook.select(*cols).collect():
        cent = tuple(
            int(x)
            for x in np.floor(
                np.asarray(r["centroid"], dtype=np.float64) * _QUANT + 0.5
            ).astype(np.int64)
        )
        items.append(
            (r["level"] if has_level else "", int(r["cell"]), cent)
        )
    return hashlib.md5(repr(sorted(items)).encode()).hexdigest()


def _check_codebook_epoch(
    spark, codebook: DataFrame, index_path: str
) -> None:
    """The REBUILD CONTRACT between the accumulation loop and the
    maintenance loop (r13 verdict item 4): the persisted codes index's
    cell assignments were minted by ONE coarse codebook; appending a
    wave assigned by a DIFFERENT one (a re-cluster, the escalation
    sq_refit_escalation signals) would silently mix assignment
    versions — a probe routed by the new codebook never visits the
    cell an old row sits in, so the pre-screen quietly loses exactly
    the drifted corpus.  The fingerprint rides the index directory as
    an underscore-prefixed parquet sidecar (ignored by the index scan,
    portable to any Hadoop filesystem); a mismatch fails loudly naming
    the remedy: REBUILD the codes index from the full corpus with the
    new codebook (semantic_static_codes_index + partitioned write) —
    there is no incremental path across a coarse re-cluster, because
    every existing row's cell is stale.  A pre-contract index (no
    sidecar) is stamped on its first append."""
    fp = codebook_fingerprint(codebook)
    fp_path = f"{index_path}/_codebook_fp"
    try:
        stored = spark.read.parquet(fp_path).collect()[0]["fp"]
    except Exception:
        spark.createDataFrame([(fp,)], "fp string").coalesce(1).write.mode(
            "overwrite"
        ).parquet(fp_path)
        return
    if stored != fp:
        raise ValueError(
            "append_semantic_codes_index: the codebook does not match "
            "the one this codes index was built with (fingerprint "
            f"{fp} != stored {stored}) — a coarse re-fit invalidates "
            "every accumulated row's cell assignment; rebuild the codes "
            "index from the full corpus with the new codebook "
            "(semantic_static_codes_index + a partitionBy('cell') "
            "write) instead of appending across the refit epoch"
        )


def append_semantic_codes_index(
    wave: DataFrame,
    codebook: DataFrame,
    index_path: str,
    num_planes: int = 64,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cell_size: int = 10_000,
) -> DataFrame:
    """Append an ADMITTED wave's (cell, _ref_id, _ref_codes) rows to a
    cell-partitioned persisted codes index — the corpus-accumulation
    loop between micro-batch epochs (r10 verdict item 6): survivors of
    this wave's admission screen become static-side state for the NEXT
    wave without rebuilding the index from the full corpus.  The wave
    is encoded with the SAME frozen codebook and encode the index was
    built with (one map-only assignment+encode pass over the wave —
    maintain.append_to_index's economics applied to the screen state),
    and new files land only in the wave's cells' partition directories.

    The corpus-side ``max_cell_size`` cap is enforced on the UNION
    occupancy (existing index count + wave count, both cell-domain
    aggregations): cells that would CROSS the cap have their wave rows
    SKIPPED, never silently over-filled.  Returns the cap ledger —
    (cell, existing_n, wave_n, appended) — per the no-silent-caps
    discipline.  Two documented divergences from a from-scratch
    rebuild on the union corpus (which the pairing pytest pins equal
    in the common no-cap-interaction regime): a cell that crosses the
    cap keeps its EXISTING rows here but would be dropped whole by a
    rebuild, and a cell the original build capped out reads as
    existing_n=0 here so wave rows can re-open it.  Both are screen-
    recall-only effects (the screen is probabilistic by design, like
    every LSH band in this repo); schedule the periodic full rebuild
    off maintain.occupancy_drift when the ledger shows cap pressure.

    The index must already EXIST (build epoch 0 with
    :func:`semantic_static_codes_index` + a ``partitionBy("cell")``
    write) — a missing path raises a named ValueError rather than a
    raw AnalysisException.  Concurrent appenders to one ``index_path``
    are UNSUPPORTED: the cap decision is a read-then-write (existing_n
    is read before the append lands), so two racing waves could both
    admit rows into a near-cap cell; serialize appends per index (the
    micro-batch epoch loop this exists for is already serial)."""
    from img2dataset_spark.operators.maintain import append_to_index

    spark = wave.sparkSession
    rows = semantic_static_codes_index(
        wave, codebook, num_planes, dim, vec_col, id_col,
        max_cell_size=1 << 62,
    )
    try:
        existing_idx = spark.read.parquet(index_path)
    except Exception as exc:
        raise ValueError(
            f"append_semantic_codes_index: no existing index at "
            f"{index_path} — build the first epoch's index with "
            "semantic_static_codes_index + a partitionBy('cell') write, "
            "then append subsequent waves"
        ) from exc
    # refit-epoch contract: refuse to mix cell-assignment versions
    # (pre-contract indexes are stamped on first append)
    _check_codebook_epoch(spark, codebook, index_path)
    existing = existing_idx.groupBy("cell").agg(
        F.count(F.lit(1)).alias("existing_n")
    )
    ledger_rows = (
        rows.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("wave_n"))
        .join(existing, "cell", "left")
        .na.fill({"existing_n": 0})
        .select(
            "cell",
            "existing_n",
            "wave_n",
            (
                (F.col("existing_n") + F.col("wave_n"))
                <= F.lit(max_cell_size)
            ).alias("appended"),
        )
        # MATERIALIZE the decision before writing: the relation is
        # lazy, and after the append (+ refreshByPath) a re-read of
        # the index would recompute existing_n INCLUDING the rows just
        # appended — flipping near-cap cells' flag and misreporting
        # what actually happened.  Cell-domain-sized collect.
        .collect()
    )
    ok_cells = [int(r["cell"]) for r in ledger_rows if r["appended"]]
    ok = spark.createDataFrame([(c,) for c in ok_cells], "cell bigint")
    append_to_index(rows.join(F.broadcast(ok), "cell"), index_path)
    return spark.createDataFrame(
        ledger_rows,
        "cell bigint, existing_n bigint, wave_n bigint, appended boolean",
    )


def default_prescreen_hamming(
    cosine_threshold: float, num_planes: int = 64
) -> int:
    """Pre-screen cutoff from the Charikar bound: a pair AT the cosine
    threshold differs on an expected ``p·θ/π`` planes (θ = arccos t),
    and any TRUE match (cosine ≥ t) expects fewer — so cutoff =
    expected-at-threshold + 3σ of the worst-case binomial
    (σ = √p/2) keeps the false-negative probability negligible while
    still discarding the bulk of random pairs (expected Hamming p/2).
    The screen is PROBABILISTIC, like every LSH band in this repo: a
    true match past the cutoff is possible in principle; callers
    needing the exact-verify-everything behavior pass no codes index."""
    import math

    expected = num_planes * math.acos(max(-1.0, min(1.0, cosine_threshold))) / math.pi
    return math.ceil(expected + 1.5 * math.sqrt(num_planes))


def streaming_semantic_flags(
    stream: DataFrame,
    index: DataFrame | None,
    codebook: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    threshold: float = 0.98,
    dim: int = 64,
    codes_index: DataFrame | None = None,
    ref_vectors: DataFrame | None = None,
    prescreen_max_hamming: int | None = None,
    num_planes: int = 64,
) -> DataFrame:
    """Ingestion-time SEMANTIC screening — the embedding twin that
    completes the batch/stream screening triple (minhash:
    streaming_wave_admission, pHash: streaming_phash_flags, semantic:
    this).  Each streaming vector is cell-assigned with the SAME
    _assign_cells quantized-argmin matmul batch SemDeDup uses (the
    codebook must be FLAT — a hierarchical codebook's cogroup hop is
    not a streaming shape; screening corpora fit the flat ceiling or
    pass the fine level of a persisted codebook re-keyed flat),
    stream-static LEFT-joined against ``index``
    (:func:`semantic_static_index`) on the cell, and verified with the
    exact 6-dp quantized cosine (make_pair_qcosine_udf) against the
    shared threshold — so a flagged row means exactly
    "semantic_dedup_pairs_vs would have paired it with that corpus
    vector in that cell".

    Emits (id, ts, n_matches, is_semantic_dup) at watermark close;
    n_matches counts DISTINCT verified corpus neighbors (collect_set,
    the batch pair-level distinct).  The stream-static join is
    stateless; the only state is the watermark-bounded aggregation.
    Verification here is per-(stream row x corpus row) Arrow cosine
    rather than the batch per-cell Gram matmul: a stream micro-batch
    is wave-sized and the corpus fan-out is capped per cell, so the
    pair volume is bounded — bulk re-screens should use the batch
    semantic_dedup_vs (the lambda split in the module header).
    Unmatched cells (corpus has nothing there) produce n_matches = 0;
    rows must carry a non-NULL ``dim``-length vector (they come from
    an embedder).

    State knob (mirrors streaming_multimodal_admission): pass
    ``codes_index`` (:func:`semantic_static_codes_index`) +
    ``ref_vectors`` instead of the full-vector ``index`` and the
    per-micro-batch static join side carries 8-byte codes; a codegen
    popcount pre-screen gates the exact verify, which then runs only
    on survivors (probabilistic in the LSH-band sense)."""
    from img2dataset_spark.operators.similarity import (
        _as_double,
        _assign_cells,
        make_pair_qcosine_udf,
    )

    if "level" in codebook.columns:
        raise ValueError(
            "streaming_semantic_flags requires a FLAT codebook (cell, "
            "centroid); the hierarchical cogroup hop is not a streaming "
            "shape"
        )
    if index is None and codes_index is None:
        raise ValueError(
            "pass index (full-vector) or codes_index + ref_vectors "
            "(BQ pre-screen)"
        )
    e = stream.select(
        F.col(id_col), F.col(ts_col), _as_double(F.col(vec_col)).alias("_v")
    )
    assigned = _assign_cells(e, codebook, "_v", id_col)
    if codes_index is not None:
        from img2dataset_spark.operators.bq import (
            hamming_between,
            make_bq_encode_udf,
        )

        if ref_vectors is None:
            raise ValueError(
                "codes_index requires ref_vectors (the raw (id, vector) "
                "corpus) for the exact re-verify of pre-screen survivors"
            )
        cutoff = (
            prescreen_max_hamming
            if prescreen_max_hamming is not None
            else default_prescreen_hamming(threshold, num_planes)
        )
        # width check at WIRING time: hamming_between returns NULL on a
        # width mismatch, so a codes_index built with a different
        # num_planes would silently disable the whole screen (every
        # _cand NULL -> every duplicate admitted).  One static-side row
        # names the misconfiguration loudly instead, matching the batch
        # raise_error width guards.
        expected_words = (num_planes + 31) // 32
        probe = codes_index.select(
            F.size("_ref_codes").alias("_w")
        ).first()
        if probe is not None and probe["_w"] != expected_words:
            raise ValueError(
                f"streaming_semantic_flags: codes_index width {probe['_w']} "
                f"words != ceil(num_planes/32) = {expected_words} "
                f"(num_planes={num_planes}) — the index was encoded with a "
                "different plane count; the pre-screen would silently admit "
                "all duplicates"
            )
        enc = make_bq_encode_udf(stream.sparkSession, num_planes, dim)
        coded = assigned.withColumn("_codes", enc(F.col("_v")))
        cand = coded.join(codes_index, "cell", "left")
        ham = hamming_between(F.col("_codes"), F.col("_ref_codes"))
        cand = cand.withColumn(
            "_cand",
            F.when(ham.isNotNull() & (ham <= cutoff), F.col("_ref_id")),
        )
        rv = ref_vectors.select(
            F.col(id_col).alias("_rv_id"),
            _as_double(F.col(vec_col)).alias("_ref_v"),
        )
        joined = cand.join(rv, cand["_cand"] == rv["_rv_id"], "left")
        ref_present = F.col("_rv_id")
    else:
        joined = assigned.join(index, "cell", "left")
        ref_present = F.col("_ref_id")
    hits = ensure_event_time(joined, ts_col)
    qcos = make_pair_qcosine_udf(dim)
    # NULL ref rows (empty/capped corpus cell) ride a zero-vector into
    # the Arrow verifier so the UDF never sees a None (np.stack would
    # throw); their cos is NaN, and although Spark orders NaN ABOVE all
    # numbers the ref null-guard below keeps them from flagging
    zeros = F.array(*[F.lit(0.0)] * dim)
    cos6 = qcos(F.col("_v"), F.coalesce(F.col("_ref_v"), zeros))
    # ~isnan guard: a zero-NORM STREAM vector against a real corpus
    # neighbor also yields NaN, and Spark orders NaN above every number
    # (NaN >= t is TRUE) with the ref non-null — without the guard such
    # a row would be wrongly flagged.  The batch twin's numpy compare
    # treats NaN >= t as False, so the guard is also batch parity.
    matched = F.when(
        ref_present.isNotNull() & ~F.isnan(cos6) & (cos6 >= threshold),
        ref_present,
    )
    return (
        hits.withColumn("_m", matched)
        .withWatermark(ts_col, watermark)
        .groupBy(id_col, ts_col)
        .agg(F.size(F.collect_set("_m")).cast("long").alias("n_matches"))
        .withColumn("is_semantic_dup", F.col("n_matches") > 0)
    )


def streaming_phash_flags(
    stream: DataFrame,
    index: DataFrame,
    hash_col: str = "phash",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    max_hamming: int = 4,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Ingestion-time PERCEPTUAL image screening: each streaming
    document's 64-bit pHash (functions/phash.py, e.g. computed by the
    pipeline's compute_phash) is pigeonhole-banded with the SAME
    hash64_words expression the batch hamming_pairs64 uses and
    stream-static LEFT-joined against ``index`` — a static (ref_id,
    phash) frame of the accumulated corpus (the metadata parquet).  A
    word collision is verified with the same JVM bit_count(xor), so a
    flagged row means exactly "hamming_pairs64 would have paired it",
    with the pigeonhole recall guarantee intact (a <= max_hamming
    near-dup ALWAYS shares a word).

    Emits (id, ts, n_matches, is_dup) at watermark close, where
    n_matches counts DISTINCT corpus images within the radius
    (collect_set, mirroring the batch pair-level distinct).  NULL-hash
    rows (undecodable payloads) are emitted with n_matches = 0 via a
    zero-word placeholder — every incoming document gets a verdict.
    The static side applies the batch corpus-side max_bucket_size cap
    (degenerate flat-image buckets); the only state is the
    watermark-bounded aggregation — the stream-static join itself is
    stateless, the 100 TB shape."""
    from img2dataset_spark.operators.dedup import hash64_words

    banded = (
        stream.select(F.col(id_col), F.col(ts_col), F.col(hash_col))
        .withColumn(
            "blk",
            F.explode_outer(
                F.when(
                    F.col(hash_col).isNotNull(),
                    hash64_words(hash_col, max_hamming),
                )
            ),
        )
        .select(
            id_col, ts_col, hash_col,
            F.col("blk.w").alias("w"), F.col("blk.val").alias("val"),
        )
    )
    idx = index.select(
        F.col(id_col).alias("_ref_id"),
        F.col(hash_col).alias("_ref_hash"),
    ).select(
        "_ref_id", "_ref_hash",
        F.explode(hash64_words("_ref_hash", max_hamming)).alias("blk"),
    ).select(
        "_ref_id", "_ref_hash",
        F.col("blk.w").alias("w"), F.col("blk.val").alias("val"),
    )
    bucket_sizes = idx.groupBy("w", "val").count()
    idx = idx.join(
        bucket_sizes.filter(F.col("count") <= max_bucket_size).select("w", "val"),
        ["w", "val"],
    )
    hits = ensure_event_time(
        banded.join(idx, ["w", "val"], "left"), ts_col
    )
    hd = F.bit_count(F.col(hash_col).bitwiseXOR(F.col("_ref_hash")))
    matched = F.when(
        F.col("_ref_hash").isNotNull() & (hd <= max_hamming), F.col("_ref_id")
    )
    return (
        hits.withColumn("_m", matched)
        .withWatermark(ts_col, watermark)
        .groupBy(id_col, ts_col)
        .agg(F.size(F.collect_set("_m")).cast("long").alias("n_matches"))
        .withColumn("is_dup", F.col("n_matches") > 0)
    )


def streaming_multimodal_admission(
    stream: DataFrame,
    text_index: DataFrame,
    phash_index: DataFrame,
    semantic_index: DataFrame | None,
    codebook: DataFrame,
    bloom: bytes | None = None,
    bloom_num_hashes: int = 7,
    url_col: str = "url",
    text_col: str = "text",
    phash_col: str = "phash",
    vec_col: str = "embedding",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    k: int = 3,
    mh_num_hashes: int = 32,
    mh_num_bands: int = 8,
    jaccard_threshold: float = 0.5,
    max_hamming: int = 4,
    cosine_threshold: float = 0.98,
    dim: int = 64,
    max_bucket_size: int = 1000,
    semantic_codes_index: DataFrame | None = None,
    ref_vectors: DataFrame | None = None,
    prescreen_max_hamming: int | None = None,
    num_planes: int = 64,
) -> DataFrame:
    """The WHOLE multimodal ingest-admission story as ONE streaming
    query: canonical-URL dedup within the watermark, optional Bloom
    exclusion of historical ids, then all three corpus screens —
    text MinHash+exact-Jaccard (streaming_wave_admission's stage 3),
    perceptual pHash pigeonhole+bit_count (streaming_phash_flags),
    and semantic cell+quantized-cosine (streaming_semantic_flags) —
    each verified with the SAME expressions its batch twin uses.

    Semantic state knob (r9 verdict item 4): pass
    ``semantic_codes_index`` (:func:`semantic_static_codes_index`) +
    ``ref_vectors`` (the raw (id, vector) corpus) instead of the
    full-vector ``semantic_index`` and the per-micro-batch
    stream-static join side shrinks from d×8 B to ceil(p/32)×8 B per
    corpus vector (~100× at 768-dim): stream vectors are BQ-encoded
    with the batch family's exact UDF, a codegen popcount Hamming
    pre-screen (cutoff ``prescreen_max_hamming``, default
    :func:`default_prescreen_hamming` — expected-at-threshold + 3σ)
    drops non-candidates, and ONLY survivors join back to full vectors
    for the same exact-cosine verdict.  The pre-screen is
    probabilistic in the LSH-band sense; the parity test pins verdict
    equality with the unscreened query on the synthetic corpus.

    Composition shape: the three screens are built as separate
    stream-static left joins off the shared deduped base and then
    UNIONED (tagged by screen) before a single watermark-bounded
    aggregation — fan-outs ADD (bands + words + cell hits) instead of
    multiplying as a chained-join plan would, and the plan stays at
    two stateful operators (dedup + one aggregation), the supported
    append-mode shape of streaming_wave_admission.  Emits one verdict
    row per document at watermark close:

        (id, ts, canonical_url, n_text_matches, n_image_matches,
         n_semantic_matches, admitted)

    with each count = DISTINCT verified corpus matches for that
    modality and admitted = no historical id hit AND all three counts
    zero.  NULL text/phash rows pass their screen with 0 matches
    (placeholder rows, like the twins); vectors must be non-NULL
    ``dim``-length (they come from an embedder), and the codebook
    must be flat (streaming_semantic_flags' precondition)."""
    from img2dataset_spark.functions.text_fast import (
        make_minhash_bands_udf,
        make_shingle_h32_udf,
    )
    from img2dataset_spark.functions.url import canonical_url
    from img2dataset_spark.operators.dedup import hash64_words, round6
    from img2dataset_spark.operators.similarity import (
        _as_double,
        _assign_cells,
        make_pair_qcosine_udf,
    )

    if "level" in codebook.columns:
        raise ValueError(
            "streaming_multimodal_admission requires a FLAT codebook "
            "(streaming_semantic_flags precondition)"
        )
    if semantic_index is None and semantic_codes_index is None:
        raise ValueError(
            "pass semantic_index (full-vector) or semantic_codes_index "
            "+ ref_vectors (BQ pre-screen) — the semantic screen needs "
            "one of the two static shapes"
        )

    cu = canonical_url(F.col(url_col))
    key = _row_exempt_key(cu, id_col, ts_col)
    deduped = (
        ensure_event_time(
            stream.withColumn("canonical_url", cu).withColumn("_dedup_key", key),
            ts_col,
        )
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_dedup_key"])
        .drop("_dedup_key")
    )
    if bloom is not None:
        from img2dataset_spark.operators.bloom import probe_bloom

        base = probe_bloom(deduped, id_col, bloom, bloom_num_hashes, flag_col="_seen")
    else:
        base = deduped.withColumn("_seen", F.lit(False))
    keep = [id_col, ts_col, "canonical_url", "_seen"]

    # --- text screen: minhash bands -> capped index join -> exact jaccard
    shingle_h32 = make_shingle_h32_udf(k)
    bands = make_minhash_bands_udf(mh_num_hashes, mh_num_bands)
    t_banded = base.select(*keep, F.col(text_col)).withColumn(
        "_ss", shingle_h32(F.col(text_col))
    ).withColumn(
        "band",
        F.explode_outer(F.when(F.size("_ss") > 0, bands(F.col("_ss")))),
    )
    t_idx = text_index.select(
        F.col(id_col).alias("_ref_id"),
        F.col("shingle_set").alias("_ref_ss"),
        F.explode("bands").alias("band"),
    )
    t_sizes = t_idx.groupBy("band").count()
    t_idx = t_idx.join(
        t_sizes.filter(F.col("count") <= max_bucket_size).select("band"), "band"
    )
    t_hits = t_banded.join(t_idx, "band", "left")
    inter = F.size(F.array_intersect("_ss", "_ref_ss"))
    union = F.size("_ss") + F.size("_ref_ss") - inter
    jacc = F.when(
        F.col("_ref_ss").isNotNull() & (union > 0), round6(inter / union)
    )
    text_screen = t_hits.select(
        *keep,
        F.lit("text").alias("_screen"),
        F.when(jacc >= jaccard_threshold, F.col("_ref_id")).alias("_match_ref"),
    )

    # --- image screen: pigeonhole words -> capped index join -> bit_count
    p_banded = base.select(*keep, F.col(phash_col)).withColumn(
        "blk",
        F.explode_outer(
            F.when(F.col(phash_col).isNotNull(), hash64_words(phash_col, max_hamming))
        ),
    ).select(
        *keep, phash_col,
        F.col("blk.w").alias("w"), F.col("blk.val").alias("val"),
    )
    p_idx = phash_index.select(
        F.col(id_col).alias("_ref_id"), F.col(phash_col).alias("_ref_hash")
    ).select(
        "_ref_id", "_ref_hash",
        F.explode(hash64_words("_ref_hash", max_hamming)).alias("blk"),
    ).select(
        "_ref_id", "_ref_hash",
        F.col("blk.w").alias("w"), F.col("blk.val").alias("val"),
    )
    p_sizes = p_idx.groupBy("w", "val").count()
    p_idx = p_idx.join(
        p_sizes.filter(F.col("count") <= max_bucket_size).select("w", "val"),
        ["w", "val"],
    )
    p_hits = p_banded.join(p_idx, ["w", "val"], "left")
    hd = F.bit_count(F.col(phash_col).bitwiseXOR(F.col("_ref_hash")))
    image_screen = p_hits.select(
        *keep,
        F.lit("image").alias("_screen"),
        F.when(
            F.col("_ref_hash").isNotNull() & (hd <= max_hamming), F.col("_ref_id")
        ).alias("_match_ref"),
    )

    # --- semantic screen: cell assign -> index join -> quantized cosine
    s_base = base.select(*keep, _as_double(F.col(vec_col)).alias("_v"))
    s_assigned = _assign_cells(s_base, codebook, "_v", id_col)
    if semantic_codes_index is not None:
        # BQ pre-screen path: popcount Hamming over 8-byte static codes
        # gates the expensive exact verify; full vectors join by id for
        # SURVIVORS only.
        from img2dataset_spark.operators.bq import (
            hamming_between,
            make_bq_encode_udf,
        )

        if ref_vectors is None:
            raise ValueError(
                "semantic_codes_index requires ref_vectors (the raw "
                "(id, vector) corpus) for the exact re-verify of "
                "pre-screen survivors"
            )
        cutoff = (
            prescreen_max_hamming
            if prescreen_max_hamming is not None
            else default_prescreen_hamming(cosine_threshold, num_planes)
        )
        enc = make_bq_encode_udf(stream.sparkSession, num_planes, dim)
        s_coded = s_assigned.withColumn("_codes", enc(F.col("_v")))
        cand_hits = s_coded.join(semantic_codes_index, "cell", "left")
        ham = hamming_between(F.col("_codes"), F.col("_ref_codes"))
        cand_hits = cand_hits.withColumn(
            "_cand",
            F.when(ham.isNotNull() & (ham <= cutoff), F.col("_ref_id")),
        )
        rv = ref_vectors.select(
            F.col(id_col).alias("_rv_id"),
            _as_double(F.col(vec_col)).alias("_ref_v"),
        )
        s_hits = cand_hits.join(
            rv, cand_hits["_cand"] == rv["_rv_id"], "left"
        )
        ref_present = F.col("_rv_id")
    else:
        s_hits = s_assigned.join(semantic_index, "cell", "left")
        ref_present = F.col("_ref_id")
    qcos = make_pair_qcosine_udf(dim)
    zeros = F.array(*[F.lit(0.0)] * dim)
    cos6 = qcos(F.col("_v"), F.coalesce(F.col("_ref_v"), zeros))
    semantic_screen = s_hits.select(
        *keep,
        F.lit("semantic").alias("_screen"),
        F.when(
            # ~isnan: zero-norm stream vector vs a real neighbor is NaN,
            # and NaN >= t is TRUE in Spark (see streaming_semantic_flags)
            ref_present.isNotNull()
            & ~F.isnan(cos6)
            & (cos6 >= cosine_threshold),
            ref_present,
        ).alias("_match_ref"),
    )

    unioned = text_screen.unionByName(image_screen).unionByName(semantic_screen)

    def _count(screen: str):
        return F.size(
            F.collect_set(
                F.when(F.col("_screen") == screen, F.col("_match_ref"))
            )
        ).cast("long")

    return (
        unioned.groupBy(id_col, ts_col, "canonical_url", "_seen")
        .agg(
            _count("text").alias("n_text_matches"),
            _count("image").alias("n_image_matches"),
            _count("semantic").alias("n_semantic_matches"),
        )
        .select(
            id_col,
            ts_col,
            "canonical_url",
            "n_text_matches",
            "n_image_matches",
            "n_semantic_matches",
            (
                ~F.coalesce(F.col("_seen"), F.lit(False))
                & (F.col("n_text_matches") == 0)
                & (F.col("n_image_matches") == 0)
                & (F.col("n_semantic_matches") == 0)
            ).alias("admitted"),
        )
    )
