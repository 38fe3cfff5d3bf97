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


def test_nearest_bucket_mirrors_codegen(spark):
    """The plain-Python nearest_bucket must agree with the codegen
    assign_aspect_bucket on a dim sweep (same metric, same tie-break)."""
    from img2dataset_spark.operators.aspect import (
        assign_aspect_bucket,
        nearest_bucket,
    )

    dims = [(w, h) for w in (64, 333, 512, 1024, 1500, 2048)
            for h in (64, 400, 1024, 1900)]
    df = spark.createDataFrame(
        [(i, w, h) for i, (w, h) in enumerate(dims)],
        "doc_id long, original_width int, original_height int",
    )
    got = {
        r["doc_id"]: (r["bucket_id"], r["bucket_w"], r["bucket_h"])
        for r in assign_aspect_bucket(df).collect()
    }
    for i, (w, h) in enumerate(dims):
        assert got[i] == nearest_bucket(w, h), (w, h)


def test_aspect_bucket_resize_geometry_and_pixels():
    """resize_mode='aspect_bucket': geometry is exactly the assigned
    bucket's dims, and the REAL no-imaging-lib pixel path produces a
    decodable image of that shape (scale-to-cover + center-crop)."""
    import numpy as np

    from img2dataset_spark.functions.image import (
        make_transform_fn,
        resize_geometry,
        select_interpolation,
    )
    from img2dataset_spark.functions.png import decode_png, encode_png
    from img2dataset_spark.operators.aspect import nearest_bucket

    for (w, h) in [(2000, 500), (500, 2000), (1024, 1024), (300, 290)]:
        _, bw, bh = nearest_bucket(w, h)
        assert resize_geometry(w, h, "aspect_bucket", 256, False) == (bw, bh)
        # only-if-bigger is documented as ignored for this mode
        assert resize_geometry(w, h, "aspect_bucket", 256, True) == (bw, bh)
    # downscale vs upscale selection by the cover scale
    assert select_interpolation(4000, 1100, "aspect_bucket", 256) == "area"
    assert select_interpolation(300, 290, "aspect_bucket", 256) == "lanczos"

    # real pixels through the pure-Python codecs
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(120, 400, 3), dtype=np.uint8)  # 400x120
    data = bytes(encode_png(img))
    fn = make_transform_fn(resize_mode="aspect_bucket", encode_format="png")
    out, nw, nh, ow, oh, err = fn(data)
    assert err is None and (ow, oh) == (400, 120)
    _, bw, bh = nearest_bucket(400, 120)
    assert (nw, nh) == (bw, bh)
    arr = decode_png(out)
    assert arr.shape[:2] == (bh, bw)


def test_pipeline_aspect_bucket_geometry_postcondition(spark):
    """Every success row of an aspect_bucket pipeline run carries
    exactly its assigned bucket's dims — the fixtures-style geometry
    postcondition over the mock pipe."""
    from pyspark.sql import functions as F

    from img2dataset_spark.config import PipelineConfig
    from img2dataset_spark.operators.aspect import nearest_bucket
    from img2dataset_spark.plans.pipeline import build_pipeline

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    inp = d.select(
        F.concat(F.lit("http://x.local/img/"), F.col("doc_id").cast("string"),
                 F.lit(".jpg")).alias("url"),
        F.substring("text", 1, 16).alias("caption"),
        "doc_id",
    ).limit(80)
    cfg = PipelineConfig(
        url_list="unused", input_format="parquet", caption_col="caption",
        fetch_mode="mock", number_sample_per_shard=100,
        resize_mode="aspect_bucket", compute_hash=None,
    )
    rows = build_pipeline(spark, cfg, input_df=inp).filter(
        F.col("status") == "success"
    ).select("width", "height", "original_width", "original_height").collect()
    assert rows
    for r in rows:
        _, bw, bh = nearest_bucket(r["original_width"], r["original_height"])
        assert (r["width"], r["height"]) == (bw, bh)
