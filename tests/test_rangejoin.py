"""operators/rangejoin.py — bucketed range join semantics + plan shape."""

import datetime as dt

from pyspark.sql import functions as F

from img2dataset_spark.operators.rangejoin import range_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts("2024-01-01 10:00:00"))],
        "user_id long, event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:00:00"), 1.0),   # exactly ts - w: inclusive
            (1, _ts("2024-01-01 08:59:59.999999"), 2.0),  # just outside
            (1, _ts("2024-01-01 09:20:00"), 3.0),   # previous w-bucket, in range
            (1, _ts("2024-01-01 10:00:00"), 4.0),   # equal ts: inclusive
            (1, _ts("2024-01-01 10:00:00.000001"), 5.0),  # just after
            (2, _ts("2024-01-01 09:30:00"), 6.0),   # other key
        ],
        "user_id long, ts timestamp, value double",
    )
    return left, right


def test_boundaries_buckets_and_keys(spark):
    left, right = _frames(spark)
    out = range_join(left, right, on="user_id", window_sec=3600)
    vals = sorted(r["r_value"] for r in out.collect())
    assert vals == [1.0, 3.0, 4.0]


def test_no_duplicate_pairs(spark):
    left, right = _frames(spark)
    out = range_join(left, right, on="user_id", window_sec=3600)
    assert out.count() == out.dropDuplicates(["event_id", "r_ts"]).count()


def test_equi_join_plan(spark):
    """The physical join must be hash/sort-merge on (key, bucket) — a
    BroadcastNestedLoopJoin or CartesianProduct here means the
    inequality leaked into the join condition."""
    left, right = _frames(spark)
    plan = (
        range_join(left, right, on="user_id", window_sec=3600)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan
    assert "Cartesian" not in plan


def test_event_time_accepts_every_parquet_encoding(spark):
    """ensure_event_time must normalize timestamp / timestamp_ntz /
    bigint-nanos / DATE — the driver has re-encoded the testdata's time
    columns between rounds, and a DATE drop must not take down every
    query touching the table."""
    from pyspark.sql import functions as F

    from img2dataset_spark.functions.eventtime import ensure_event_time

    base = spark.createDataFrame([("2024-03-05 06:07:08",)], "s string")
    cases = {
        "timestamp": F.to_timestamp("s"),
        "ntz": F.to_timestamp("s").cast("timestamp_ntz"),
        "nanos": (F.unix_micros(F.to_timestamp("s")) * 1000).cast("long"),
        "date": F.to_date("s"),
    }
    for name, expr in cases.items():
        df = ensure_event_time(base.select(expr.alias("ts")), "ts")
        assert df.schema["ts"].dataType.simpleString() == "timestamp", name
        got = df.select(F.date_format("ts", "yyyy-MM-dd HH:mm:ss")).first()[0]
        expected = "2024-03-05 00:00:00" if name == "date" else "2024-03-05 06:07:08"
        assert got == expected, name
    # unknown encodings still fail loudly
    import pytest as _pytest

    with _pytest.raises(TypeError, match="expected"):
        ensure_event_time(base.select(F.col("s").alias("ts")), "ts")


def test_event_time_nanos_floor_for_pre_epoch(spark):
    """bigint-nanos -> micros must use FLOOR semantics: `div` truncates
    toward zero, which would land pre-1970 instants up to 1µs late."""
    from pyspark.sql import functions as F

    from img2dataset_spark.functions.eventtime import ensure_event_time

    ns_values = [-1, -1001, 999, 1001, 0]
    df = spark.createDataFrame([(v,) for v in ns_values], "ns bigint")
    micros = [
        r[0]
        for r in ensure_event_time(df, "ns")
        .select(F.unix_micros("ns"))
        .collect()
    ]
    assert dict(zip(ns_values, micros)) == {
        -1: -1, -1001: -2, 999: 0, 1001: 1, 0: 0
    }
