"""Custom stateful streaming operator: user sessionization.

Beyond-reference (SURVEY §2.10 — the reference has no stateful streaming
at all): group an event stream by user and emit one row per SESSION — a
maximal run of events with inter-event gaps below `gap`.  This is the
canonical operator Spark's built-ins cannot express over a stream
(session_window exists but only for windowed aggregation, not arbitrary
per-session payloads), so it is implemented with
`applyInPandasWithState`: per-key state holds the open session, event-
time timeouts close sessions when the watermark passes gap.

A batch equivalent (`sessionize_batch`) computes identical sessions with
a window lag/cumsum — used as the correctness oracle for the stateful
implementation and as the efficient path for static data (one shuffle on
user_id, no state store).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from img2dataset_spark.functions.eventtime import ensure_event_time

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
STATE_SCHEMA = "start long, end long, n long, total double"


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization: gap-based session ids via lag + running sum.
    One shuffle (partitionBy user), whole-stage codegen throughout."""
    gap_s = gap_minutes * 60
    events = ensure_event_time(events, "ts")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    new_session = (
        F.when(
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w) > gap_s,
            1,
        )
        .otherwise(0)
    )
    with_sid = events.withColumn(
        "_sid", F.sum(new_session).over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return (
        with_sid.groupBy("user_id", "_sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(27,4)")).cast("double").alias("total_value"),
        )
        .drop("_sid")
    )


def make_session_func(gap_minutes: int = 30):
    """Build the applyInPandasWithState function.  State per user is the
    open session (start/end/n/total, epoch micros); an event-time timeout
    flushes it once the watermark passes end + gap."""
    gap_us = gap_minutes * 60 * 1_000_000

    # Deviation note: total_value accumulates in float64 here (streaming
    # state must be a flat Spark struct; the batch twin uses exact decimal
    # sums).  At session cardinality (<1e6 values/session) the float64
    # error is <1 ulp per add and the oracle comparison rounds to 6
    # decimals, which absorbs it.
    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, end, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(end, unit="us")],
                    "n_events": [n],
                    "total_value": [total],
                }
            )
            return

        # (ts, event_id) tie-break matches the batch twin's
        # orderBy(ts, event_id) exactly on equal timestamps.
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        ts_us = rows["ts"].astype("int64") // 1000  # ns -> us
        vals = rows["value"].astype(float)

        closed = []
        if state.exists:
            start, end, n, total = state.get
        else:
            start = end = None  # type: ignore[assignment]
            n, total = 0, 0.0
        for t, v in zip(ts_us, vals):
            if start is None:
                start, end, n, total = t, t, 1, float(v)
            elif t - end > gap_us:
                closed.append((start, end, n, total))
                start, end, n, total = t, t, 1, float(v)
            else:
                end, n, total = t, n + 1, total + float(v)
        state.update((int(start), int(end), int(n), float(total)))
        # close the open session once the event-time watermark passes
        # end + gap (no wall-clock involved: pure event-time semantics).
        # applyInPandasWithState does NOT drop late rows, so a group fed
        # only late events can compute end+gap at or behind the current
        # watermark — Spark rejects such a timestamp and fails the query.
        # Clamp to watermark+1 ms so the session flushes on the next
        # microbatch instead.
        timeout_ms = int(end) // 1000 + gap_minutes * 60 * 1000
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(timeout_ms, wm_ms + 1))

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, *_ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, *_ in closed],
                    "n_events": [n_ for *_, n_, _t in closed],
                    "total_value": [t_ for *_, t_ in closed],
                }
            )

    return update


def streaming_sessionize(
    stream: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """Stateful streaming sessionization.  State is O(open sessions);
    event-time timeouts bound it — the watermark both admits late data
    and garbage-collects state."""
    return (
        ensure_event_time(stream, "ts")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_session_func(gap_minutes),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
