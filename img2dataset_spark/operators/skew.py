"""Skew mitigation for shuffle joins: salted equality join.

At 100 TB the classic killer is a shuffle join on a zipfian key (web
domains, event types, languages): one reducer receives the hot key's
entire row set while the rest idle.  Three escapes, in order of
preference:

1. **Broadcast** the small side (no shuffle at all) — always first
   choice; Catalyst does it under the threshold and `F.broadcast`
   forces it.
2. **AQE skew-join split** (`spark.sql.adaptive.skewJoin.*`, on in
   session.py) — splits oversized sort-merge partitions at runtime,
   but only kicks in for sort-merge joins and only per-partition.
3. **Salting** (this module) — when the "small" side is itself too big
   to broadcast (per-domain stats over 100M domains) and the plan
   isn't AQE-splittable: give each big-side row a deterministic salt
   in [0, salt), replicate the small side salt times, join on
   (key, salt).  Each hot key now spreads over `salt` reducers.  Cost:
   small side shuffles salt× its size — pick salt ~ (hot-key rows /
   target partition rows), not thousands.

groupBy sum/count aggregations do NOT need salting — Spark's partial
(map-side) aggregation already bounds each reducer to one row per
(partition, key).  Salting matters for joins and for collect-style
aggregations whose partial states are as big as the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equality join with the big side's hot keys spread over ``salt``
    reducers.  Row-for-row identical to ``big.join(small, on, how)``.

    The salt is a deterministic hash of the whole big-side row (not
    rand(), which would break task-retry and any exactly-once sink),
    so replays land on the same reducer.  Supported ``how``: inner and
    left — the semantics-preserving cases (the small side is
    replicated, so right/full would need dedup of the replicas)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if not 1 <= salt <= 4096:
        raise ValueError(f"salt must be in [1, 4096], got {salt}")
    overlap = (set(big.columns) & set(small.columns)) - set(on)
    if overlap:
        raise ValueError(f"ambiguous non-key columns on both sides: {sorted(overlap)}")
    b = big.withColumn(
        _SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt)).cast("int"),
    )
    s = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return b.join(s, [*on, _SALT], how).drop(_SALT)
