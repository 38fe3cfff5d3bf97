"""Event-time normalization at operator boundaries.

The engine's event-time operators (range join, sessionization,
watermarked streams) do epoch arithmetic (`unix_micros`) or declare
watermarks — both of which Spark 4 only permits on the zoned
``TIMESTAMP`` type.  Real-world parquet, however, arrives with the
same instant encoded three ways:

  - ``TIMESTAMP``      (isAdjustedToUTC=1)  — used directly;
  - ``TIMESTAMP_NTZ``  (isAdjustedToUTC=0)  — cast to ``TIMESTAMP``.
    The session timezone is pinned to UTC (session.py), so the cast is
    a deterministic re-tag, not a wall-clock shift, and matches how
    DuckDB (the test oracle) reads the same column;
  - ``BIGINT`` epoch **nanoseconds** — the legacy
    ``spark.sql.legacy.parquet.nanosAsLong`` representation of
    TIMESTAMP(NANOS) columns; converted via integer div to micros.

Every event-time operator calls :func:`ensure_event_time` on its input
instead of assuming one encoding, so a schema change in the data layer
cannot break the operator layer again (this bug class cost round 2 two
oracle queries and four tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    LongType,
    TimestampNTZType,
    TimestampType,
)


def ensure_event_time(df: DataFrame, *cols: str) -> DataFrame:
    """Return ``df`` with each named column normalized to ``TIMESTAMP``.

    Missing columns are ignored (callers pass their conventional names);
    unrecognized types raise so a silently-wrong epoch interpretation
    can't slip through.
    """
    by_name = {f.name: f.dataType for f in df.schema.fields}
    for c in cols:
        dt = by_name.get(c)
        if dt is None or isinstance(dt, TimestampType):
            continue
        if isinstance(dt, (TimestampNTZType, DateType)):
            # DATE tolerated too (the driver has re-encoded these
            # columns between rounds; midnight-UTC cast is deterministic
            # under the pinned session timezone)
            df = df.withColumn(c, F.col(c).cast("timestamp"))
        elif isinstance(dt, LongType):
            # legacy nanosAsLong read of TIMESTAMP(NANOS).  Floor
            # division, kept in bigint: `div` truncates toward zero, so
            # pre-1970 nanos would otherwise land up to 1µs late (and a
            # double-based floor(x/1000) loses precision past 2^53).
            df = df.withColumn(
                c,
                F.timestamp_micros(
                    F.expr(
                        f"(`{c}` div 1000) + "
                        f"(CASE WHEN `{c}` % 1000 < 0 THEN -1 ELSE 0 END)"
                    )
                ),
            )
        else:
            raise TypeError(
                f"column {c!r} has type {dt.simpleString()}; expected "
                "timestamp, timestamp_ntz, or bigint epoch-nanos"
            )
    return df
