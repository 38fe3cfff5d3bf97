"""As-of (nearest-prior) join — a time-series operator Spark lacks.

The reference pipeline has no as-of join, but any event/metrics corpus
at training-data scale needs one (attach the latest config/price/state
row at or before each observation).  DuckDB ships it natively as
``ASOF JOIN``; pandas as ``merge_asof``.  Spark has neither, so this
implements the classic scalable *union-merge* plan:

  1. tag both inputs and UNION them (no join yet),
  2. one shuffle: partition by the equi-key, order by (ts, tag),
  3. ``last(right_row_struct, ignorenulls=True)`` over the running
     window carries the most recent right-side row forward onto left
     rows (one struct, so all right columns come from the SAME row
     even when some of its fields are NULL),
  4. filter back to left rows.

Cost: a single hash-partition shuffle + one window sort — the same
shape as a groupBy over the key, with NO join explosion and no range
re-scan.  This is the plan you want at 100 TB: skew is bounded by the
per-key row count (same bound any per-key window has), and the window
is whole-stage-codegen'd JVM code.

A naive alternative — inequality join ``l.ts >= r.ts`` + row_number —
is quadratic per key and collapses at scale; it exists only as the SQL
oracle's formulation (DuckDB's native ASOF JOIN executes it smartly).

Tie semantics ("backward" direction): a right row with ts == left ts
IS eligible (matches DuckDB ``ON l.ts >= r.ts``); ``strict=True``
requires right.ts strictly earlier.  When several right rows share
(key, ts), the greatest ``seq_col`` wins, making the operator
deterministic on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    seq_col: str | None = None,
    strict: bool = False,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: for every ``left`` row, attach the nearest
    ``right`` row with the same ``on`` key — the most recent one with
    ``right.ts <= left.ts`` (``direction="backward"``, default) or the
    next one with ``right.ts >= left.ts`` (``direction="forward"``);
    ``strict`` excludes the equal-ts case.  Unmatched left rows keep
    NULL right columns (ASOF LEFT JOIN semantics).

    ``right`` value columns come back prefixed ``r_`` (plus
    ``r_<ts_col>`` = the matched row's timestamp).  ``seq_col`` breaks
    (key, ts) ties deterministically (greatest wins); when None, right
    should be unique per (key, ts).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    l_cols = list(left.columns)
    r_vals = [c for c in right.columns if c != on]  # keep right ts as a value

    # Deterministic tie-break: keep the max-seq right row per (key, ts).
    if seq_col is not None:
        w_tie = W.partitionBy(on, ts_col).orderBy(F.desc(seq_col))
        right = (
            right.withColumn("_rn", F.row_number().over(w_tie))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    r_struct_type = (
        "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in r_vals) + ">"
    )
    tagged_l = left.select(
        F.col(on).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in l_cols]).alias("_l"),
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    tagged_r = right.select(
        F.col(on).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{left.schema[c].dataType.simpleString()}" for c in l_cols) + ">"
        ).alias("_l"),
        F.struct(*[F.col(c) for c in r_vals]).alias("_r"),
    )
    u = tagged_l.unionByName(tagged_r)

    # Running "last right row seen" per key.  Non-strict: order
    # (ts, _side asc) puts a right row BEFORE a left row at the same ts,
    # so equal-ts rights are inside the frame.  Strict: order
    # (ts, _side desc) puts them AFTER, so the running frame holds only
    # strictly-earlier rights (a row's own _r is NULL, so including
    # itself is harmless).  Forward direction is the mirror image: walk
    # the key's timeline in DESCENDING ts order and "most recent seen"
    # becomes "next at-or-after".
    ts_order = F.col("_ts").desc() if direction == "forward" else F.col("_ts").asc()
    order = [ts_order, F.col("_side").desc() if strict else F.col("_side").asc()]
    w = W.partitionBy("_k").orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    matched = F.last("_r", ignorenulls=True).over(w).alias("_m")
    return (
        u.select("_side", "_l", matched)
        .filter(F.col("_side") == 1)
        .select(
            *[F.col(f"_l.{c}").alias(c) for c in l_cols],
            *[F.col(f"_m.{c}").alias(f"r_{c}") for c in r_vals],
        )
    )
