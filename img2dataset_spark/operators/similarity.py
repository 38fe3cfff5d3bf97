"""Similarity search over embedding columns (array<float>).

Beyond-reference operators (SURVEY §7 M6): brute-force cosine top-k as
the exactness baseline, IVF (centroid-partitioned) search as the scale
path, and cosine near-duplicate pairs.

All math is built-in expressions (`zip_with` + `aggregate` folds) —
JVM-side, no Python in the hot path.  Vectors are cast to double before
any arithmetic: both Spark and DuckDB then fold left-to-right in f64,
making results bit-identical for the oracle (outputs additionally
rounded to 6 dp via floor(x*1e6+0.5)/1e6).

Scale notes: brute-force is one scan + one top-k (no shuffle beyond the
final limit) — the right baseline for one-off queries.  For repeated
queries at 100 TB, `ivf_assign` buckets vectors by nearest centroid
(k-means-style inverted file); a query then scans only `nprobe`
buckets, i.e. partition pruning on the centroid id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    a, b = _as_double(a), _as_double(b)
    return dot(a, b) / (norm(a) * norm(b))


def round6(c: Column) -> Column:
    """Engine-portable rounding: floor(x*1e6 + 0.5)/1e6."""
    return F.floor(c * 1e6 + F.lit(0.5)) / 1e6


def cosine_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force exact top-k by cosine against a 1-row query_df with a
    `query_vec` column.  The query side is broadcast (it is one row); the
    corpus side is a single scan + TakeOrdered."""
    q = F.broadcast(query_df.select(F.col("query_vec")))
    joined = df.crossJoin(q)
    scored = joined.select(
        F.col(id_col),
        round6(cosine(F.col(vec_col), F.col("query_vec"))).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def centroids_by_label(
    df: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Per-label mean vector (the IVF codebook; labels stand in for
    k-means cells on the synthetic tables).  posexplode + groupBy —
    one shuffle keyed (label, dim), then re-assembled in dim order."""
    dims = (
        df.select(F.col(label_col), F.posexplode(_as_double(F.col(vec_col))))
        .groupBy(label_col, "pos")
        # exact decimal sum / count, not avg(): double summation order is
        # partition-dependent, which would break cross-engine determinism
        .agg(
            (
                F.sum(F.col("col").cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("v")
        )
    )
    return (
        dims.groupBy(label_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("pv"))
        .select(
            label_col,
            F.transform(F.col("pv"), lambda s: s["v"]).alias("centroid"),
        )
    )


def ivf_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """IVF search: pick the `nprobe` centroids nearest the query, then
    brute-force only within those cells.  At scale the cells are
    partition keys, so this is partition pruning for vector search."""
    cents = centroids_by_label(df, vec_col, label_col)
    q = F.broadcast(query_df.select("query_vec"))
    probed = (
        cents.crossJoin(q)
        .select(
            label_col,
            round6(cosine(F.col("centroid"), F.col("query_vec"))).alias("c_sim"),
        )
        .orderBy(F.desc("c_sim"), F.asc(label_col))
        .limit(nprobe)
        .select(label_col)
    )
    pruned = df.join(F.broadcast(probed), label_col)
    return cosine_topk(pruned, query_df, k=k, vec_col=vec_col, id_col=id_col)


def embedding_dup_pairs(
    df: DataFrame,
    threshold: float = 0.98,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str | None = "label",
) -> DataFrame:
    """Cosine near-duplicate pairs.  With `label_col`, the self-join is
    blocked per cell (the IVF trick again); without, full quadratic."""
    a, b = df.alias("a"), df.alias("b")
    if label_col is not None:
        joined = a.join(b, label_col)
    else:
        joined = a.crossJoin(b)
    return (
        joined.where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            round6(cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
