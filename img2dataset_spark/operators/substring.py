"""Exact duplicated-substring span detection — the ExactSubstr side of
training-data dedup (Lee et al., "Deduplicating Training Data Makes
Language Models Better", ACL 2022 — arXiv:2107.06499).

MinHash/SimHash (operators/dedup.py) answer "are these two DOCUMENTS
near-duplicates"; ExactSubstr answers the orthogonal question the paper
shows matters for LLMs: "which SPANS of this document also occur
elsewhere in the corpus" (boilerplate, licenses, templated headers,
copy-pasted passages living inside otherwise-unique pages).  The paper
builds a corpus-wide suffix array; a suffix array is a fundamentally
sequential index, so the Spark-first restatement uses the standard
distributed equivalence: a substring of length ≥ k repeats iff every
one of its k-token grams repeats, so marking duplicated k-grams and
merging overlapping marks yields exactly the maximal spans whose every
k-window occurs ≥ `min_count` times corpus-wide (k plays the paper's
min-match-length role; 50 tokens there, configurable here).

Plan shape (all codegen until the final window):

  tokens   — the shared BPE-ish regex tokenizer (one map pass; same
             regex as pack_sequences / text_fingerprint, mirrored
             verbatim in the SQL oracle)
  grams    — sequence(0, n-k) -> transform(slice) -> posexplode: one
             (doc_id, pos, gram) row per k-window, built JVM-side
  dup      — groupBy(gram).count >= min_count: ONE map-side-combinable
             aggregation; the shuffle carries distinct grams, not
             positions
  mark     — join positions back to duplicated grams (shuffle on gram;
             hot grams — stopword runs — are exactly the AQE skew-join
             case, and the join output is bounded by the position count)
  spans    — per-doc gaps-and-islands: positions p, q overlap as token
             ranges iff q - p <= k-1, so a lag + running-sum window
             keyed by doc_id merges overlapping marks into maximal
             spans.  The window partitions by doc_id — no global window
             anywhere.

At 100 TB: rows scale with token count (linear), the gram aggregation
is the only wide shuffle and combines map-side, and span merging is
per-doc.  The paper's suffix array is O(corpus) memory on one machine;
this is O(corpus/partitions) per task with no coordination.

Returns (doc_id, span_start, span_end, span_tokens): 0-based token
positions, end-exclusive; every token in [span_start, span_end) sits in
some k-window that occurs >= min_count times in the corpus.  Callers
cut or down-weight the spans (the paper's intervention) with a
tokens-slice, or aggregate span mass per doc as a quality signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

GRAM_SEP = "\x1f"  # unit separator; chr(31) in the SQL twin


def duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_count: int = 2,
    hash_grams: bool = True,
) -> DataFrame:
    """Maximal token spans whose every k-gram occurs ``>= min_count``
    times corpus-wide (including same-document repeats — a doc that
    repeats its own boilerplate is flagged too, matching the paper).

    ``hash_grams=True`` (the DEFAULT — A/B-measured 2.0x at sf3, 1.55x
    at sf10) replaces the gram STRING with its xxhash64 as the
    aggregation/join key — the wide shuffle then carries 8-byte longs
    instead of ~(5 + k·avg_token) byte strings, the scale knob for
    100 TB corpora.  The trade: a 64-bit collision falsely marks a
    span as duplicated (never misses one); at 10^9 distinct grams the
    expected collision count is ~0.03 — negligible against a near-dup
    corpus, but it makes the output engine-specific, so the
    oracle-checked registry query pins ``hash_grams=False`` (string
    grams, relationally replayable in SQL) and small-n equality of the
    two paths is test-pinned."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from img2dataset_spark.functions.text import BPE_TOKEN_RE

    toks = df.select(
        F.col(id_col),
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(BPE_TOKEN_RE), F.lit(0)
        ).alias("_toks"),
    )

    def gram_of(i):
        g = F.concat_ws(GRAM_SEP, F.slice("_toks", i + 1, k))
        return F.xxhash64(g) if hash_grams else g

    empty_type = "array<bigint>" if hash_grams else "array<string>"
    # sequence(0, size-k) would turn DESCENDING for docs shorter than k
    # (Spark fills backwards when stop < start) — guard to an empty list
    grams = toks.select(
        F.col(id_col),
        F.posexplode(
            F.when(
                F.size("_toks") >= k,
                F.transform(F.sequence(F.lit(0), F.size("_toks") - k), gram_of),
            ).otherwise(F.array().cast(empty_type))
        ).alias("pos", "gram"),
    )
    dup = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("_c"))
        .where(F.col("_c") >= min_count)
        .select("gram")
    )
    marked = grams.join(dup, "gram").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    flagged = marked.withColumn(
        "_new",
        F.when(
            F.col("pos") - F.lag("pos").over(w) <= (k - 1), F.lit(0)
        ).otherwise(F.lit(1)),
    )
    islands = flagged.withColumn("_isl", F.sum("_new").over(w))
    return (
        islands.groupBy(id_col, "_isl")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + k).cast("long").alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
        )
    )


def cut_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply the paper's intervention: REMOVE each doc's duplicated
    spans from its token sequence.  Returns (doc_id, text, n_tokens,
    n_cut) where `text` is rebuilt from the kept tokens — the BPE-ish
    tokens carry their leading spaces, so concatenation reconstructs
    the kept regions' content.  The rebuild is LOWERCASED: span
    positions index the match-time (lowercased) token sequence, and
    raw-case tokenization does NOT share its boundaries (the
    contraction alternatives `'s|'t|...` are lowercase-only, so
    "It'S" splits differently raw vs lowered) — for LLM training
    corpora the downstream tokenizer usually lowercases or is
    case-robust; when exact case matters, use the span token offsets
    to drive a char-offset cut downstream instead.

    Pure expressions: spans aggregate to a per-doc struct array (spans
    per doc are few — they merged maximal), the cut is one
    higher-order `filter(tokens, (t, i) -> no span covers i)`, and
    docs without spans keep everything via the left join.  Map-side
    except the one spans-to-doc join."""
    from img2dataset_spark.functions.text import BPE_TOKEN_RE

    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(BPE_TOKEN_RE), F.lit(0)
    )
    joined = df.withColumn("_toks", toks).join(per_doc, id_col, "left")
    kept = F.when(F.col("_spans").isNull(), F.col("_toks")).otherwise(
        F.filter(
            "_toks",
            lambda t, i: ~F.exists(
                "_spans",
                lambda sp: (i >= sp["span_start"]) & (i < sp["span_end"]),
            ),
        )
    )
    return joined.select(
        F.col(id_col),
        F.ltrim(F.array_join(kept, "")).alias(text_col),
        F.size(kept).cast("long").alias("n_tokens"),
        (F.size("_toks") - F.size(kept)).cast("long").alias("n_cut"),
    )


def duplication_profile(
    spans: DataFrame,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document rollup of :func:`duplicated_spans`: how much of each
    doc is corpus-duplicated text.  Join-once composition — (doc_id,
    n_spans, dup_tokens, total_tokens, dup_fraction); docs with no
    duplicated span appear with zeros (left join), so the output is a
    full-corpus quality column.

    total_tokens uses the SAME BPE-ish tokenizer the spans are indexed
    against (functions.text.bpe_token_count == BPE_TOKEN_RE), so
    numerator and denominator share units and dup_fraction is a true
    0..1 coverage ratio — a whitespace-token denominator would inflate
    it past 1.0 on punctuation-heavy docs."""
    from img2dataset_spark.functions.text import bpe_token_count

    agg = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_tokens").alias("dup_tokens"),
    )
    base = df.select(
        F.col(id_col),
        bpe_token_count(F.col(text_col)).cast("long").alias("total_tokens"),
    )
    return base.join(agg, id_col, "left").select(
        id_col,
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        "total_tokens",
        F.when(F.col("total_tokens") > 0,
               F.coalesce("dup_tokens", F.lit(0)) / F.col("total_tokens"))
        .otherwise(F.lit(0.0))
        .alias("dup_fraction"),
    )
