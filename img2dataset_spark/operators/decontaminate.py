"""Benchmark decontamination: score each corpus document by the
fraction of its k-token shingles that appear in an evaluation/benchmark
set, and drop documents above a threshold.

This is the standard "exact n-gram overlap" decontamination check run
before LLM training (the corpus must not contain eval-set text).  The
reference pipeline has no equivalent; this is part of the M6
training-data layer built on the same shingle definition as the dedup
family (functions/text_fast.py), so corpus fingerprints, near-dup
clusters, and contamination scores all agree on what a shingle is.

Scale shape — the asymmetry is the whole design: benchmarks are tiny
(MBs of text; at most a few million distinct shingles) while the corpus
is the 100 TB side.  So the benchmark's distinct shingle set is
collected ONCE on the driver (capped, loud failure if the "benchmark"
is actually big), broadcast to every executor, and scoring is a fused
tokenize→shingle→set-membership Arrow UDF over the corpus: a map-only
plan with ZERO shuffles and no join.  A broadcast-join formulation
would explode the corpus per-shingle (x50-500 rows) and re-aggregate on
doc id — one avoidable shuffle of the big side; set membership inside
the UDF does the same work without materializing the explosion.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from img2dataset_spark.functions.text_fast import _h32_set


def benchmark_shingle_set(
    benchmark: DataFrame,
    k: int = 3,
    text_col: str = "text",
    max_shingles: int = 5_000_000,
) -> frozenset[int]:
    """Distinct 32-bit k-shingle hashes of the benchmark, collected to
    the driver.  Hashes, not strings: the broadcast set is what every
    executor holds resident, and 8-byte ints keep a multi-million-
    shingle benchmark ~5-8x smaller than the strings (the same h32 fold
    the dedup family stores — text_fast._h32_set — so contamination,
    near-dup clusters, and corpus fingerprints still agree on what a
    shingle is).  Benchmarks are small by construction; the cap turns a
    mistakenly-huge "benchmark" into a loud error instead of a driver
    OOM."""
    from img2dataset_spark.functions.text_fast import make_shingle_h32_udf

    rows = (
        benchmark.select(
            F.explode(make_shingle_h32_udf(k)(F.col(text_col))).alias("s")
        )
        .distinct()
        .limit(max_shingles + 1)
        .collect()
    )
    if len(rows) > max_shingles:
        raise ValueError(
            f"benchmark has more than {max_shingles} distinct shingles; "
            "that is corpus-sized, not benchmark-sized — raise max_shingles "
            "explicitly if intended"
        )
    return frozenset(r["s"] for r in rows)


def make_contamination_udf(spark, bench_set: frozenset[int], k: int = 3):
    """Fused tokenize→shingle→hash→overlap-fraction scorer.  Returns
    floor(hits/n_shingles * 1e6 + 0.5) / 1e6 (the repo-wide 6-decimal
    rounding convention shared with the DuckDB oracles), or null for
    texts with no k-shingle.  Membership and the denominator are both
    over the DISTINCT h32 set (a 32-bit collision inside a doc merges
    two shingles — mirrored exactly by the oracle's list_distinct over
    the same fold)."""
    bc = spark.sparkContext.broadcast(bench_set)

    @pandas_udf("double")
    def contamination(texts: pd.Series) -> pd.Series:
        s = bc.value

        def score(t):
            ss = _h32_set(t, k)
            if not ss:
                return None
            hits = sum(1 for x in ss if x in s)
            return math.floor(hits / len(ss) * 1e6 + 0.5) / 1e6

        return texts.map(score)

    return contamination


def contamination_scores(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingles: int = 5_000_000,
) -> DataFrame:
    """(id, contamination) for every document with at least one
    k-shingle.  Map-only: no shuffle, no join (see module docstring)."""
    spark = docs.sparkSession
    bench = benchmark_shingle_set(benchmark, k, text_col, max_shingles)
    udf = make_contamination_udf(spark, bench, k)
    return (
        docs.select(F.col(id_col), udf(F.col(text_col)).alias("contamination"))
        .where(F.col("contamination").isNotNull())
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.2,
    k: int = 3,
    text_col: str = "text",
    max_shingles: int = 5_000_000,
) -> DataFrame:
    """Corpus rows whose benchmark overlap is below ``threshold``.
    Documents too short to have a k-shingle carry no evidence and are
    KEPT (score is null).  Same zero-shuffle plan: broadcast set +
    fused Arrow UDF filter."""
    spark = docs.sparkSession
    bench = benchmark_shingle_set(benchmark, k, text_col, max_shingles)
    udf = make_contamination_udf(spark, bench, k)
    c = udf(F.col(text_col))
    return docs.where(c.isNull() | (c < F.lit(float(threshold))))
