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


def test_token_weighted_mixture(spark):
    """With weight=, the mixture currency is token mass: a group with
    few huge docs balances against one with many small docs."""
    # a: 10 docs x 100 tokens = 1000; b: 100 docs x 10 tokens = 1000
    rows = [(i, "a", 100) for i in range(10)] + [
        (100 + i, "b", 10) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, tok long")
    # equal targets + equal mass -> both groups keep EVERY row
    out = resample_mixture(
        df, {"a": 0.5, "b": 0.5}, weight=F.col("tok")
    )
    assert out.count() == 110
    # 80/20 target: b's mass must thin to 1000*(0.2/0.8)=250 expected
    out2 = resample_mixture(
        df, {"a": 0.8, "b": 0.2}, weight=F.col("tok")
    )
    got = {
        r["source"]: r["m"]
        for r in out2.groupBy("source").agg(F.sum("tok").alias("m")).collect()
    }
    assert got["a"] == 1000  # scarcest in relative mass: kept whole
    assert 100 <= got["b"] <= 400  # binomial around 250

    # row-count mode on the same frame behaves differently (b dominates
    # rows 10:1), proving weight= changes the currency
    out3 = resample_mixture(df, {"a": 0.5, "b": 0.5})
    counts = {
        r["source"]: r["n"]
        for r in out3.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts["a"] == 10
    assert counts["b"] < 30


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
