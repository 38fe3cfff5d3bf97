"""operators/mixture.py — deterministic mixture resampling."""

import pytest
from pyspark.sql import functions as F

from img2dataset_spark.operators.mixture import mixture_report, resample_mixture


@pytest.fixture(scope="module")
def corpus(spark):
    # a: 100 rows, b: 200, c: 400, d: 100 (d not in any target mix)
    rows = (
        [(i, "a") for i in range(100)]
        + [(100 + i, "b") for i in range(200)]
        + [(300 + i, "c") for i in range(400)]
        + [(700 + i, "d") for i in range(100)]
    )
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_scarcest_group_kept_whole(spark, corpus):
    # targets 50/25/25 with counts 100/200/400: a is scarcest
    # (100/0.5=200 < 200/0.25=800 < 400/0.25=1600) -> S=200, keep all
    # of a, rate_b=200*0.25/200=0.25, rate_c=200*0.25/400=0.125
    out = resample_mixture(corpus, {"a": 0.5, "b": 0.25, "c": 0.25})
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert got["a"] == 100
    assert "d" not in got  # untargeted group dropped
    # hash thinning is binomial around the exact rate; generous bounds
    assert 30 <= got["b"] <= 70 and 30 <= got["c"] <= 70


def test_deterministic_membership(spark, corpus):
    ids1 = sorted(
        r["doc_id"]
        for r in resample_mixture(corpus, {"b": 0.5, "c": 0.5}).collect()
    )
    ids2 = sorted(
        r["doc_id"]
        for r in resample_mixture(
            corpus.repartition(7), {"b": 0.5, "c": 0.5}
        ).collect()
    )
    assert ids1 == ids2 and len(ids1) > 0


def test_schema_preserved(spark, corpus):
    out = resample_mixture(corpus, {"a": 1.0})
    assert out.columns == corpus.columns


def test_invalid_fracs(spark, corpus):
    with pytest.raises(ValueError, match="at least one group"):
        resample_mixture(corpus, {})
    with pytest.raises(ValueError, match="must be > 0"):
        resample_mixture(corpus, {"a": 0.0})


def test_broadcast_no_sort_merge(spark, corpus):
    plan = (
        resample_mixture(corpus, {"a": 0.5, "b": 0.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_mixture_report(spark, corpus):
    rep = {r["source"]: (r["n"], r["frac_ppm"]) for r in
           mixture_report(corpus).collect()}
    assert rep["c"] == (400, 500000.0)
    assert rep["a"] == (100, 125000.0)
