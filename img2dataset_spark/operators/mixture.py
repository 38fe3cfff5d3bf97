"""Corpus mixture resampling: downsample over-represented groups so
the output matches a target per-group mixture (e.g. "40% web, 30%
code, 30% books"), deterministically.

Training-data pipelines rarely get the mixture they want from raw
counts; the standard fix is static reweighting — compute, per group g
with target fraction f_g and observed count n_g, the largest feasible
output size S = min_g(n_g / f_g) (no upsampling), then keep each row
of g independently with rate r_g = S * f_g / n_g.  Row selection is
hash-deterministic (same md5-bucket trick as the stratified sampler),
so the same corpus yields the same sample on any cluster layout, and
the SQL oracle reproduces it bit-for-bit.

Scale shape: one map-side-combined count over the corpus (output =
#groups rows), a driver-free broadcast join of the per-group rates
back onto the corpus, and a codegen filter.  The 100 TB side is
scanned twice (count + filter) but never shuffled; if the upstream
frame is expensive to recompute, persist it before calling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from img2dataset_spark.functions.text import hex_to_int32

_BUCKETS = 1_000_000


def resample_mixture(
    df: DataFrame,
    target_fracs: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    weight=None,
) -> DataFrame:
    """Rows of ``df`` deterministically downsampled toward
    ``target_fracs`` (group value -> desired output fraction; fractions
    should sum to ~1).  Groups absent from the dict are dropped.  The
    group whose relative supply is scarcest keeps all rows; every other
    group is thinned to match.  Row keep-decisions hash ``id_col``, so
    membership is stable across runs and layouts.

    ``weight`` (optional Column) switches the mixture currency from row
    count to that weight's mass — pass a token count and the targets
    become TOKEN fractions, the actual budget currency of LLM training
    mixes.  The algebra is unchanged (per-group mass W_g replaces n_g;
    independent hash-thinning keeps the target mass in expectation);
    the plan gains only the weight expression inside the same
    map-side-combined aggregation."""
    if not target_fracs:
        raise ValueError("target_fracs must name at least one group")
    bad = {g: f for g, f in target_fracs.items() if not f > 0}
    if bad:
        raise ValueError(f"target fractions must be > 0: {bad}")
    frac_map = F.create_map(
        *[x for g, f in sorted(target_fracs.items())
          for x in (F.lit(g), F.lit(float(f)))]
    )
    mass = (
        F.sum(weight).cast("double") if weight is not None else F.count("*")
    )
    counts = (
        df.groupBy(group_col)
        .agg(mass.alias("_n"))
        .withColumn("_frac", frac_map[F.col(group_col)])
        .where(F.col("_frac").isNotNull())
    )
    scale = counts.agg(F.min(F.col("_n") / F.col("_frac")).alias("_scale"))
    rates = counts.crossJoin(F.broadcast(scale)).select(
        group_col,
        F.least(
            F.lit(1.0), F.col("_scale") * F.col("_frac") / F.col("_n")
        ).alias("_rate"),
    )
    bucket = F.pmod(
        hex_to_int32(F.md5(F.col(id_col).cast("string").cast("binary"))),
        F.lit(_BUCKETS),
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .where(bucket < F.floor(F.col("_rate") * _BUCKETS + F.lit(0.5)))
        .drop("_rate")
        .select(*df.columns)
    )


def mixture_report(
    df: DataFrame, group_col: str = "source"
) -> DataFrame:
    """(group, n, frac) — the observed mixture, one tiny aggregation;
    run before and after resample_mixture to see achieved vs target."""
    counts = df.groupBy(group_col).agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("_t"))
    return counts.crossJoin(F.broadcast(total)).select(
        group_col,
        "n",
        F.floor(F.col("n") / F.col("_t") * 1e6 + F.lit(0.5)).cast("double")
        .alias("frac_ppm"),
    )
