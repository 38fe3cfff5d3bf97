"""Text retrieval over the corpus: BM25 scoring and top-k search.

Beyond-reference operator (SURVEY §7 M6 family): the classic sparse
retrieval primitive every training-data pipeline eventually needs —
"find the documents most relevant to these terms" — for curriculum
mining, targeted decontamination audits, and corpus QA queries.  The
reference engine (a fetch/transform downloader) has nothing in this
class; we add it Spark-first.

Scoring is Lucene-flavored BM25:

    idf(t)  = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    s(d, t) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    score(d) = Σ_t s(d, t)

Scale shape (the whole point of doing this on Spark):
  - Document length dl is `token_count` — a pure codegen size(split),
    NO explode: the corpus-wide explode happens exactly once, already
    filtered to the query's terms (`array_contains` on a literal array
    — predicate applied before the aggregation, so the shuffle carries
    only matching (doc, term) rows, a tiny fraction of the token
    stream).
  - One hash-aggregate produces per-(doc, term) tf with map-side
    combine; per-term document frequencies df_t come from a
    term-partitioned window over that SAME aggregated frame — one
    tiny post-agg shuffle, never a second execution of the explode.
  - N and avgdl are a 1-row broadcast crossJoin (sum of dl is an exact
    integer, so avgdl is the same double in every engine).
  - Per-document summation over term scores is done in FIXED-POINT:
    each term's score is rounded to 6 dp and summed as a long — exact
    and order-independent, so Spark's partial/final aggregation and
    the SQL oracle's sum agree bit-for-bit (a double Σ would depend on
    fold order).
  - Top-k is a TakeOrdered with a deterministic (score desc, id asc)
    tie-break; no global sort materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from img2dataset_spark.functions.text import token_count, tokens


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 score against ``query_terms`` (documents with
    zero matching terms are absent).  Returns (id, n_terms, score) with
    score floor-rounded to 6 dp.  Tokenization = functions.text.tokens
    (lowercase + whitespace split), identical to text_vocab."""
    if not query_terms:
        raise ValueError("query_terms must be a non-empty list of terms")
    terms = sorted({t.lower() for t in query_terms})
    qlit = F.array(*[F.lit(t) for t in terms])

    docs = df.select(
        F.col(id_col), F.col(text_col).alias("_text"),
        token_count(F.col(text_col)).alias("dl"),
    )
    # corpus scalars: N docs + exact-integer token total -> avgdl
    corpus = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_dl"),
    )
    # the ONLY explode, pre-filtered to query terms
    tf = (
        docs.select(
            id_col, "dl", F.explode(tokens(F.col("_text"))).alias("term")
        )
        .where(F.array_contains(qlit, F.col("term")))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # per-term document frequency via a term-partitioned window over
    # the SAME aggregated frame — one extra (tiny, post-agg) shuffle
    # and NO second reference to the explode subtree (a df_t side-join
    # derived from tf would re-execute the corpus explode per side,
    # the classic double-reference trap)
    from pyspark.sql import Window

    tf = tf.withColumn(
        "df_t", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    n_docs = F.col("n_docs").cast("double")
    avgdl = F.col("total_dl").cast("double") / n_docs
    idf = F.log(
        F.lit(1.0) + (n_docs - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)
    )
    tfn = F.col("tf").cast("double")
    dln = F.col("dl").cast("double")
    term_score = (
        idf
        * tfn
        * (k1 + 1.0)
        / (tfn + k1 * (1.0 - b + b * dln / avgdl))
    )
    scored = (
        tf.crossJoin(F.broadcast(corpus))
        # fixed-point per-term score: exact long sum, order-independent
        .select(
            id_col,
            F.floor(term_score * 1e6 + F.lit(0.5)).cast("long").alias("_s6"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            (F.sum("_s6") / F.lit(1e6)).alias("score"),
        )
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 — TakeOrdered over :func:`bm25_scores`
    with a deterministic (score desc, id asc) tie-break."""
    s = bm25_scores(df, query_terms, text_col, id_col, k1, b)
    return s.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def bm25_multi_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    query_id_col: str = "query_id",
    term_col: str = "term",
) -> DataFrame:
    """BATCH BM25: top-k documents for EVERY query in a (query_id,
    term) DataFrame, in one corpus pass — the shape a real curation
    audit needs (hundreds of decontamination/curriculum probes scored
    together, not one driver-loop call per probe).

    Scale shape, relative to the single-query plan:
      - The ONE corpus explode is pre-filtered by a broadcast semi-ish
        join against the DISTINCT term set of all queries (replacing
        the literal `array_contains` — a term list from a DataFrame
        can be thousands of terms, past the literal-expression
        comfort zone, but still broadcast-sized).
      - tf and the term-window df_t are computed ONCE per (doc, term)
        — a term shared by ten queries is aggregated and idf-scored
        once, globally (df_t is a corpus property, not a query
        property), then fanned out to queries by a broadcast join on
        term.
      - Per-(query, doc) totals are the same exact fixed-point long
        sum; top-k is a row_number window partitioned by query_id —
        per-query state only, bounded by that query's matched docs.
    Returns (query_id, doc_id, n_terms, score) with at most k rows per
    query, score floor-rounded to 6 dp, (score desc, id asc) rank
    order within each query.  Duplicate terms within a query are
    deduped (scores count each term once, as the single-query path's
    set(terms) does)."""
    from pyspark.sql import Window

    qn = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.lower(F.col(term_col)).alias("term"),
    ).distinct()
    qterms = qn.select("term").distinct()

    docs = df.select(
        F.col(id_col), F.col(text_col).alias("_text"),
        token_count(F.col(text_col)).alias("dl"),
    )
    corpus = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_dl"),
    )
    tf = (
        docs.select(
            id_col, "dl", F.explode(tokens(F.col("_text"))).alias("term")
        )
        .join(F.broadcast(qterms), "term")
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    tf = tf.withColumn(
        "df_t", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    n_docs = F.col("n_docs").cast("double")
    avgdl = F.col("total_dl").cast("double") / n_docs
    idf = F.log(
        F.lit(1.0) + (n_docs - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)
    )
    tfn = F.col("tf").cast("double")
    dln = F.col("dl").cast("double")
    term_score = (
        idf
        * tfn
        * (k1 + 1.0)
        / (tfn + k1 * (1.0 - b + b * dln / avgdl))
    )
    scored = tf.crossJoin(F.broadcast(corpus)).select(
        id_col,
        "term",
        F.floor(term_score * 1e6 + F.lit(0.5)).cast("long").alias("_s6"),
    )
    per_q = (
        scored.join(F.broadcast(qn), "term")
        .groupBy("query_id", id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            (F.sum("_s6") / F.lit(1e6)).alias("score"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    )
    return (
        per_q.withColumn("_rn", rn)
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
