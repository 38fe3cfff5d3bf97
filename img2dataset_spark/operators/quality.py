"""Gopher-style composite quality filter: the individual text-quality
signals (functions/text.py, and the repetition aggregation) combined
into one pass/fail verdict with machine-readable reasons — the form a
training-data pipeline actually runs (the rule set popularized by the
Gopher dataset paper: token-count bounds, mean-word-length band,
stopword floor, symbol ceiling, repetition ceilings).

Output is (id, passed, reasons) where ``reasons`` is a comma-joined
list in FIXED rule order, so downstream can both filter and audit
*why* documents died (per-reason drop rates are the standard pipeline
health dashboard).

Plan shape: every per-row signal is a codegen expression over the text
column; only the repetition signals aggregate (two explode→hash-agg
passes keyed on doc id, map-side combined — same shape as
text_repetition), then one broadcast-free join back on doc id.  All
ratios round to 6 dp before threshold comparison, so verdicts are
bit-stable across engines (the SQL oracle compares the identically
rounded values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from img2dataset_spark.functions import text as X

# fixed rule order — reasons are emitted in this order
GOPHER_RULES: dict[str, float] = {
    "min_tokens": 30,
    "max_tokens": 90,
    "min_mean_tok_len": 3.0,
    "max_mean_tok_len": 10.0,
    "min_stopword_ratio": 0.02,
    "max_punct_ratio": 0.1,
    "max_top_token_frac": 0.1,
    "max_top_bigram_frac": 0.05,
}


def _round6(c):
    return F.floor(c * 1e6 + F.lit(0.5)) / 1e6


def quality_flags(
    df: DataFrame,
    rules: dict[str, float] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, passed, reasons) per document.  Repetition rules are
    skipped (never fail) for documents too short to have the gram —
    absence of evidence passes, mirroring the null semantics of
    text_repetition."""
    r = {**GOPHER_RULES, **(rules or {})}
    toks = X.tokens(F.col(text_col))
    n_tokens = F.size(toks)
    # mean token length == non-whitespace chars / tokens (tokens are a
    # whitespace split, so their concatenated length is exactly the
    # trimmed text minus its whitespace)
    n_chars_no_ws = F.length(
        F.regexp_replace(F.trim(F.col(text_col)), r"\s+", "")
    )
    mean_len = _round6(
        F.when(n_tokens > 0, n_chars_no_ws / n_tokens).otherwise(F.lit(0.0))
    )
    swr = _round6(X.stopword_ratio(toks))
    pr = _round6(X.punct_ratio(F.col(text_col)))

    base = df.select(
        F.col(id_col),
        n_tokens.alias("_nt"),
        mean_len.alias("_ml"),
        swr.alias("_swr"),
        pr.alias("_pr"),
    )

    tok_rows = df.select(
        F.col(id_col), F.explode(X.tokens(F.col(text_col))).alias("t")
    ).filter(F.col("t") != "")
    tok_stats = (
        tok_rows.groupBy(id_col, "t")
        .count()
        .groupBy(id_col)
        .agg(
            _round6(F.max("count") / F.sum("count")).alias("_ttf"),
        )
    )
    bg_rows = df.select(
        F.col(id_col),
        F.explode(X.shingles(X.tokens(F.col(text_col)), 2)).alias("b"),
    )
    bg_stats = (
        bg_rows.groupBy(id_col, "b")
        .count()
        .groupBy(id_col)
        .agg(
            _round6(F.max("count") / F.sum("count")).alias("_tbf"),
        )
    )
    j = base.join(tok_stats, id_col, "left").join(bg_stats, id_col, "left")

    checks = [
        ("too_few_tokens", F.col("_nt") < F.lit(int(r["min_tokens"]))),
        ("too_many_tokens", F.col("_nt") > F.lit(int(r["max_tokens"]))),
        (
            "mean_tok_len_out_of_range",
            (F.col("_ml") < F.lit(r["min_mean_tok_len"]))
            | (F.col("_ml") > F.lit(r["max_mean_tok_len"])),
        ),
        ("low_stopword_ratio", F.col("_swr") < F.lit(r["min_stopword_ratio"])),
        ("high_punct_ratio", F.col("_pr") > F.lit(r["max_punct_ratio"])),
        ("repeated_top_token", F.col("_ttf") > F.lit(r["max_top_token_frac"])),
        ("repeated_top_bigram", F.col("_tbf") > F.lit(r["max_top_bigram_frac"])),
    ]
    reasons = F.array_compact(
        F.array(*[F.when(cond, F.lit(name)) for name, cond in checks])
    )
    return j.select(
        id_col,
        (F.size(reasons) == 0).alias("passed"),
        F.array_join(reasons, ",").alias("reasons"),
    )


def gopher_filter(
    df: DataFrame,
    rules: dict[str, float] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Surviving rows of ``df`` under the rule set — the composition
    pipelines run after dedup and before mixing."""
    keep = quality_flags(df, rules, id_col, text_col).filter("passed").select(id_col)
    return df.join(keep, id_col, "left_semi")
