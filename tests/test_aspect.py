"""operators/aspect.py — aspect-ratio bucketing for training batches."""

import pytest
from pyspark.sql import functions as F

from img2dataset_spark.operators.aspect import (
    ASPECT_BUCKETS,
    aspect_bucket_batches,
    aspect_bucket_stats,
    assign_aspect_bucket,
)


@pytest.fixture(scope="module")
def dims_df(spark):
    rows = [
        (0, 1024, 1024),   # exactly square -> (1024, 1024)
        (1, 2000, 500),    # 4:1 landscape -> (2048, 512)
        (2, 500, 2000),    # 1:4 portrait -> (512, 2048)
        (3, 1100, 950),    # mild landscape -> nearest ratio bucket
        (4, None, 600),    # null width -> no bucket
        (5, 0, 600),       # degenerate -> no bucket
        (6, 640, 480),     # 4:3 -> (1152, 896) vs (1216, 832)?
    ]
    return spark.createDataFrame(rows, "doc_id long, original_width int, original_height int")


def _nearest(w, h):
    """Reference argmin over the same metric."""
    best = None
    for i, (bw, bh) in enumerate(ASPECT_BUCKETS):
        x, y = w * bh, h * bw
        m = max(x, y) / min(x, y)
        if best is None or (m, i) < best[:2]:
            best = (m, i, bw, bh)
    return best[1:]


def test_assignment_matches_reference(dims_df):
    got = {
        r["doc_id"]: (r["bucket_id"], r["bucket_w"], r["bucket_h"])
        for r in assign_aspect_bucket(dims_df).collect()
    }
    for i, w, h in [(0, 1024, 1024), (1, 2000, 500), (2, 500, 2000),
                    (3, 1100, 950), (6, 640, 480)]:
        assert got[i] == _nearest(w, h), (i, got[i])
    assert got[4] == (None, None, None)
    assert got[5] == (None, None, None)


def test_square_and_extremes(dims_df):
    got = {
        r["doc_id"]: (r["bucket_w"], r["bucket_h"])
        for r in assign_aspect_bucket(dims_df).collect()
    }
    assert got[0] == (1024, 1024)
    assert got[1] == (2048, 512)
    assert got[2] == (512, 2048)


def test_tie_breaks_to_smaller_bucket_id(spark):
    """An aspect exactly between two buckets takes the smaller id."""
    # ratio sqrt((832/1216)*(896/1152)) is equidistant in the stretch
    # metric between buckets 5 (832x1216) and 6 (896x1152) only if the
    # products tie exactly; construct an exact tie instead:
    # w/h such that w*1216 / (h*832) == h*896 / (w*1152) has no integer
    # solution, so assert the deterministic rule on a literal-equal
    # metric: duplicate bucket entries.
    dup = [(832, 1216), (832, 1216)]
    df = spark.createDataFrame(
        [(0, 832, 1216)], "doc_id long, original_width int, original_height int"
    )
    r = assign_aspect_bucket(df, buckets=dup).collect()[0]
    assert r["bucket_id"] == 0  # first of the two identical buckets


def test_batches_partition_per_bucket(spark):
    """120 identical-aspect rows at batch_size 50 -> batch ids 0,0..,1,..,2
    with sizes 50/50/20, numbered in ascending doc_id order."""
    rows = [(i, 100, 100) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, original_width int, original_height int")
    out = aspect_bucket_batches(df, batch_size=50).collect()
    assert all(r["bucket_w"] == 1024 for r in out)
    by_batch = {}
    for r in out:
        by_batch.setdefault(r["batch_id"], []).append(r["doc_id"])
    assert {k: len(v) for k, v in by_batch.items()} == {0: 50, 1: 50, 2: 20}
    assert sorted(by_batch[0]) == list(range(50))
    assert sorted(by_batch[2]) == list(range(100, 120))


def test_stats_ceil_and_fill(spark):
    rows = [(i, 100, 100) for i in range(120)] + [(200 + i, 500, 2000) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, original_width int, original_height int")
    got = {
        r["bucket_w"]: (r["n_images"], r["n_batches"], r["last_batch_fill"])
        for r in aspect_bucket_stats(df, batch_size=50).collect()
    }
    assert got[1024] == (120, 3, 20)
    assert got[512] == (50, 1, 50)  # exact multiple -> full last batch


def test_pure_codegen_no_shuffle_in_assignment(spark):
    df = spark.createDataFrame(
        [(0, 640, 480)], "doc_id long, original_width int, original_height int"
    )
    plan = (
        assign_aspect_bucket(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # map-only
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
