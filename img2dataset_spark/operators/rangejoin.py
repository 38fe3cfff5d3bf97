"""Bucketed range join — bounded time-interval joins without the
per-key cartesian blowup.

``l JOIN r ON l.key = r.key AND r.ts BETWEEN l.ts - w AND l.ts`` is the
workhorse of event attribution (clicks before a purchase, errors before
a crash).  Spark executes a raw inequality join as a per-key nested
loop — quadratic in key frequency, a scale-killer for hot keys.  The
standard fix (used by every production Spark shop; DuckDB/postgres get
it via their IEJoin/merge machinery natively) is TIME BUCKETING:

  1. bucket right rows once: b_r = floor(ts / w)  — each lands in ONE
     bucket;
  2. explode each left row to its two candidate buckets {b_l - 1, b_l}
     (a window of width w can only span two w-aligned buckets);
  3. EQUI-join on (key, bucket) — hash join, shuffles keyed on
     (key, bucket), so a hot key spreads across its time range;
  4. re-apply the exact range predicate to the survivors.

Each (left, right) pair can meet in at most one bucket (the right
row's), so no dedup pass is needed.  Join fan-out is bounded by rows
per (key, w-window) — the same density bound the QUERY ANSWER itself
has — instead of rows per key squared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from img2dataset_spark.functions.eventtime import ensure_event_time

_US = 1_000_000  # microseconds per second


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    window_sec: int,
    ts_col: str = "ts",
) -> DataFrame:
    """Inner bucketed range join: pairs where ``right.ts`` is within
    ``[left.ts - window_sec, left.ts]`` and the ``on`` keys match.
    Returns left columns plus right value columns prefixed ``r_``.
    """
    left = ensure_event_time(left, ts_col)
    right = ensure_event_time(right, ts_col)
    w_us = int(window_sec) * _US
    l_cols = list(left.columns)
    r_vals = [c for c in right.columns if c != on]

    bl = F.floor(F.unix_micros(F.col(ts_col)) / w_us)
    lb = left.withColumn("_b", F.explode(F.array(bl - 1, bl)))
    rb = right.select(
        F.col(on),
        F.floor(F.unix_micros(F.col(ts_col)) / w_us).alias("_b"),
        *[F.col(c).alias(f"r_{c}") for c in r_vals],
    )
    lo = F.col(ts_col) - F.expr(f"INTERVAL {int(window_sec)} SECOND")
    return (
        lb.join(rb, [on, "_b"])
        .where((F.col(f"r_{ts_col}") >= lo) & (F.col(f"r_{ts_col}") <= F.col(ts_col)))
        .select(*l_cols, *[f"r_{c}" for c in r_vals])
    )
