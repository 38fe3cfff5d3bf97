"""Aspect-ratio bucketing for multimodal training batches.

Variable-aspect image corpora can't be batched naively: resizing
everything to one square distorts geometry, and padding wastes compute.
The standard fix (NovelAI/SDXL-style bucketing) snaps each image to the
nearest of a fixed set of equal-area resolutions and forms batches
WITHIN a bucket, so every batch is one tensor shape.  This module is
the Spark-side implementation over the pipeline's extracted dimensions
(functions/image.py T13): assignment is pure codegen arithmetic, batch
numbering is a per-bucket window — both shapes that hold at 100 TB
(the window partitions by bucket, never a global sort).

Reference context: img2dataset resizes every image to ONE square size
(`resizer.py` image_size) — bucketing is the beyond-reference step a
training pipeline needs the moment it keeps native aspect ratios.

Determinism note (oracle-shared): the "nearest" metric avoids
logarithms — nearest-in-log-space argmin is equivalent to minimizing
max(a/r, r/a), and with a = w/h, r = bw/bh that ratio is
(w*bh)/(h*bw): ONE IEEE division of exact integer products, identical
in every engine, no ln() ulp hazard.  Ties break to the smaller bucket
id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# SDXL-flavored equal-area (~1024²) bucket set, portrait→landscape.
ASPECT_BUCKETS: list[tuple[int, int]] = [
    (512, 2048),
    (576, 1792),
    (640, 1536),
    (704, 1408),
    (768, 1344),
    (832, 1216),
    (896, 1152),
    (960, 1088),
    (1024, 1024),
    (1088, 960),
    (1152, 896),
    (1216, 832),
    (1344, 768),
    (1408, 704),
    (1536, 640),
    (1792, 576),
    (2048, 512),
]


def nearest_bucket(
    w: int, h: int, buckets: list[tuple[int, int]] | None = None
) -> tuple[int, int, int]:
    """(bucket_id, bucket_w, bucket_h) for positive dims — the plain-
    Python mirror of :func:`assign_aspect_bucket`'s codegen metric
    (same single IEEE division of exact integer products, same
    smaller-id tie-break via tuple ordering), used by the transform
    UDF's ``resize_mode="aspect_bucket"`` so the pixel path and the
    relational bucketing can never disagree about an image's bucket."""
    bl = buckets if buckets is not None else ASPECT_BUCKETS
    m, i, bw, bh = min(
        (max(w * bh, h * bw) / min(w * bh, h * bw), i, bw, bh)
        for i, (bw, bh) in enumerate(bl)
    )
    return i, bw, bh


def _stretch(w: Column, h: Column, bw: int, bh: int) -> Column:
    """max(a/r, r/a) for a = w/h, r = bw/bh, as a single division of
    exact integer products — the log-free nearest-aspect metric."""
    x = (w * F.lit(bh)).cast("double")
    y = (h * F.lit(bw)).cast("double")
    return F.greatest(x, y) / F.least(x, y)


def assign_aspect_bucket(
    df: DataFrame,
    width_col: str = "original_width",
    height_col: str = "original_height",
    buckets: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """Tag each row with its nearest aspect bucket: adds (bucket_id,
    bucket_w, bucket_h).  One array_min over a literal struct array —
    whole-stage codegen, no shuffle, no UDF.  Rows with NULL or
    non-positive dimensions get NULL bucket columns."""
    w, h = F.col(width_col), F.col(height_col)
    bl = buckets if buckets is not None else ASPECT_BUCKETS
    entries = F.array(
        *[
            F.struct(
                _stretch(w, h, bw, bh).alias("m"),
                F.lit(i).alias("bucket_id"),
                F.lit(bw).alias("bucket_w"),
                F.lit(bh).alias("bucket_h"),
            )
            for i, (bw, bh) in enumerate(bl)
        ]
    )
    best = F.when(
        w.isNotNull() & h.isNotNull() & (w > 0) & (h > 0),
        F.array_min(entries),
    )
    return df.withColumns(
        {
            "bucket_id": best["bucket_id"],
            "bucket_w": best["bucket_w"],
            "bucket_h": best["bucket_h"],
        }
    )


def aspect_bucket_batches(
    df: DataFrame,
    batch_size: int = 32,
    id_col: str = "doc_id",
    width_col: str = "original_width",
    height_col: str = "original_height",
    buckets: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """Assign buckets, then number fixed-size batches within each
    bucket: adds (bucket_id, bucket_w, bucket_h, batch_id) where
    batch_id is dense from 0 per bucket in ascending id order.  The
    window partitions by bucket_id, avoiding a GLOBAL single-partition
    sort — but with only ~len(buckets) distinct keys each bucket's
    full row set still sorts on one task, so this shape is bounded by
    the largest bucket, not the corpus.  For very large corpora,
    number batches in two phases: per-(bucket, salt) row_number +
    per-salt counts, then add the broadcast prefix offsets (the
    operators/packing.py distributed-prefix-sum pattern).
    NULL-dimension rows are excluded (they have no bucket)."""
    from pyspark.sql import Window

    assigned = assign_aspect_bucket(df, width_col, height_col, buckets)
    rn = F.row_number().over(
        Window.partitionBy("bucket_id").orderBy(F.col(id_col))
    )
    return (
        assigned.filter(F.col("bucket_id").isNotNull())
        .withColumn("batch_id", ((rn - F.lit(1)) / F.lit(batch_size)).cast("long"))
    )


def aspect_bucket_stats(
    df: DataFrame,
    batch_size: int = 32,
    id_col: str = "doc_id",
    width_col: str = "original_width",
    height_col: str = "original_height",
    buckets: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """Per-bucket batching summary: (bucket_id, bucket_w, bucket_h,
    n_images, n_batches, last_batch_fill) — the planning view a
    training job reads before building loaders.  n_batches is integer
    ceil(n/batch_size); last_batch_fill the remainder batch's size.
    One hash-aggregate over the bucket assignment."""
    assigned = assign_aspect_bucket(df, width_col, height_col, buckets)
    n = F.count(F.lit(1))
    return (
        assigned.filter(F.col("bucket_id").isNotNull())
        .groupBy("bucket_id", "bucket_w", "bucket_h")
        .agg(
            n.alias("n_images"),
            F.floor((n + batch_size - 1) / batch_size).cast("long").alias("n_batches"),
            F.when(n % batch_size == 0, F.lit(batch_size))
            .otherwise(n % batch_size)
            .cast("long")
            .alias("last_batch_fill"),
        )
    )
