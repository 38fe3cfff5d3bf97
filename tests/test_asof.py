"""operators/asof.py — as-of join semantics on hand-computed fixtures."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from img2dataset_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01 10:00:00")),
            (1, 101, _ts("2024-01-01 12:00:00")),
            (2, 200, _ts("2024-01-01 09:00:00")),  # before any right row
            (3, 300, _ts("2024-01-01 10:00:00")),  # user with no right rows
        ],
        "user_id long, event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:00:00"), 1.0),  # tie with left 100
            (1, 11, _ts("2024-01-01 10:00:00"), 2.0),  # same ts, higher seq
            (1, 12, _ts("2024-01-01 11:00:00"), None),  # NULL value column
            (2, 20, _ts("2024-01-01 09:30:00"), 4.0),
        ],
        "user_id long, event_id long, ts timestamp, value double",
    )
    return left, right


def _by_event(df):
    return {r["event_id"]: r for r in df.collect()}

def test_backward_match_and_tie_break(spark, frames):
    left, right = frames
    out = _by_event(asof_join(left, right, on="user_id", seq_col="event_id"))
    # equal-ts right row is eligible; among the two ts-tied rows the
    # greater event_id (11) wins
    assert out[100]["r_event_id"] == 11
    assert out[100]["r_value"] == 2.0
    # most recent earlier row, and its NULL value column must come from
    # THAT row (not an older non-null one)
    assert out[101]["r_event_id"] == 12
    assert out[101]["r_value"] is None
    assert out[101]["r_ts"] == _ts("2024-01-01 11:00:00")


def test_unmatched_lefts_keep_nulls(spark, frames):
    left, right = frames
    out = _by_event(asof_join(left, right, on="user_id", seq_col="event_id"))
    assert len(out) == 4  # left join: every left row survives
    assert out[200]["r_event_id"] is None  # right rows exist but all later
    assert out[300]["r_event_id"] is None  # no right rows for user


def test_strict_excludes_equal_ts(spark, frames):
    left, right = frames
    out = _by_event(
        asof_join(left, right, on="user_id", seq_col="event_id", strict=True)
    )
    assert out[100]["r_event_id"] is None  # only equal-ts rights exist
    assert out[101]["r_event_id"] == 12  # strictly earlier still matches


def test_forward_direction(spark, frames):
    left, right = frames
    out = _by_event(
        asof_join(left, right, on="user_id", seq_col="event_id", direction="forward")
    )
    # equal-ts right eligible (tie-broken to max seq 11)
    assert out[100]["r_event_id"] == 11
    # next right at-or-after 12:00 for user 1: none exist
    assert out[101]["r_event_id"] is None
    # user 2 at 09:00: the 09:30 right row is the next one
    assert out[200]["r_event_id"] == 20
    assert out[300]["r_event_id"] is None


def test_forward_strict(spark, frames):
    left, right = frames
    out = _by_event(
        asof_join(
            left, right, on="user_id", seq_col="event_id",
            direction="forward", strict=True,
        )
    )
    # equal-ts rights excluded; next strictly-after is the 11:00 row
    assert out[100]["r_event_id"] == 12


def test_bad_direction_raises(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="backward|forward"):
        asof_join(left, right, on="user_id", direction="sideways")


def test_single_shuffle_plan(spark, frames):
    """The physical plan must be the union-merge shape: no join operator
    at all (a SortMergeJoin/BroadcastHashJoin here would mean the
    quadratic fallback crept in)."""
    left, right = frames
    plan = asof_join(left, right, on="user_id")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan
