"""operators/skew.py — salted join correctness and plan shape."""

import pytest
from pyspark.sql import functions as F

from img2dataset_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def frames(spark):
    # heavily skewed: key 'hot' has 900 of 1000 rows
    big = spark.createDataFrame(
        [(i, "hot" if i < 900 else f"k{i % 7}", float(i)) for i in range(1000)],
        "row_id long, k string, v double",
    )
    small = spark.createDataFrame(
        [("hot", 1), ("k1", 2), ("k3", 3), ("nomatch", 9)],
        "k string, w int",
    )
    return big, small


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_inner_matches_plain_join(spark, frames):
    big, small = frames
    got = salted_join(big, small, ["k"], salt=8)
    want = big.join(small, ["k"], "inner")
    assert _rows(got) == _rows(want)
    assert got.columns == want.columns


def test_left_matches_plain_join(spark, frames):
    big, small = frames
    got = salted_join(big, small, ["k"], salt=8, how="left")
    want = big.join(small, ["k"], "left")
    assert _rows(got) == _rows(want)


def test_salt_spreads_hot_key(spark, frames):
    big, _ = frames
    n = (
        big.withColumn(
            "_salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8)),
        )
        .where(F.col("k") == "hot")
        .select("_salt")
        .distinct()
        .count()
    )
    assert n == 8  # the hot key occupies all salt buckets


def test_join_key_includes_salt(spark, frames):
    big, small = frames
    plan = (
        salted_join(big, small, ["k"], salt=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "_salt" in plan


def test_rejects_unsupported(spark, frames):
    big, small = frames
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(big, small, ["k"], how="right")
    with pytest.raises(ValueError, match="salt must be"):
        salted_join(big, small, ["k"], salt=0)
    with pytest.raises(ValueError, match="ambiguous"):
        salted_join(big, small.withColumn("v", F.lit(1.0)), ["k"])
