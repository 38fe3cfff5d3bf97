"""Unigram language-model quality scoring: fit a capped token->cost
table from a (reference) corpus, then score each document by its mean
negative log-probability — the classic cheap "how surprising is this
text" quality signal used to filter training data (a one-gram stand-in
for the KenLM-style filters in public pipelines).

Fit: token counts (one explode + map-side-combined hash agg), keep the
top ``max_vocab`` tokens by frequency (orderBy+limit = TakeOrdered, no
global window), cost = -ln(count/total).  Everything rarer is OOV and
costs -ln(1/total).  Capping the vocab is what makes the scale story
work: the broadcast side is bounded by construction (64k rows by
default), no matter how large the fit corpus is.

Score: explode tokens -> broadcast left join onto the vocab -> per-doc
aggregation.  One shuffle, keyed on doc id, and partial aggregation
collapses it to one row per document before the exchange.

Costs are carried as integer MICRO-NATS (floor(-ln(p)*1e6 + 0.5)), so
the per-doc sum is exact integer arithmetic — order-independent, hence
reproducible across partitionings and bit-identical to the DuckDB
oracle.  Summing raw doubles would make the result depend on float
addition order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from img2dataset_spark.functions.text import tokens


def fit_unigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    max_vocab: int = 65536,
) -> tuple[DataFrame, DataFrame]:
    """(vocab, oov): vocab = (token, nlp_micro) for the ``max_vocab``
    most frequent tokens (ties broken by token asc, deterministically);
    oov = single row (oov_micro,) costing unseen/rare tokens as
    probability 1/total."""
    tok = docs.select(F.explode(tokens(F.col(text_col))).alias("token")).filter(
        F.col("token") != ""
    )
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").alias("total"))
    vocab = (
        counts.orderBy(F.desc("c"), F.asc("token"))
        .limit(max_vocab)
        .crossJoin(F.broadcast(total))
        .select(
            "token",
            F.floor(F.log(F.col("total") / F.col("c")) * 1e6 + F.lit(0.5))
            .cast("long")
            .alias("nlp_micro"),
        )
    )
    oov = total.select(
        F.floor(F.log(F.col("total").cast("double")) * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("oov_micro")
    )
    return vocab, oov


def score_unigram(
    docs: DataFrame,
    vocab: DataFrame,
    oov: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_toks, nlp_mean_micro) per document with >= 1 token:
    mean token cost in micro-nats (lower = more typical text).  Filter
    on a threshold to drop gibberish / boilerplate outliers."""
    tok = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    ).filter(F.col("token") != "")
    j = (
        tok.join(F.broadcast(vocab), "token", "left")
        .crossJoin(F.broadcast(oov))
        .select(
            id_col,
            F.coalesce(F.col("nlp_micro"), F.col("oov_micro")).alias("_nlp"),
        )
    )
    return (
        j.groupBy(id_col)
        .agg(F.sum("_nlp").alias("_s"), F.count(F.lit(1)).alias("n_toks"))
        .select(
            id_col,
            "n_toks",
            F.floor(F.col("_s") / F.col("n_toks") + F.lit(0.5))
            .cast("long")
            .alias("nlp_mean_micro"),
        )
    )
