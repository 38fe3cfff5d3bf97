"""operators/decontaminate.py — benchmark n-gram overlap scoring."""

import pytest
from pyspark.sql import functions as F

from img2dataset_spark.operators.decontaminate import (
    benchmark_shingle_set,
    contamination_scores,
    decontaminate,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            # exact copy of a benchmark doc -> contamination 1.0
            (1, "the quick brown fox jumps over the lazy dog"),
            # half-overlapping: shares the 4-token prefix with bench doc
            (2, "the quick brown fox sat calmly at home"),
            # disjoint
            (3, "completely unrelated text about spark physical plans"),
            # too short for a 3-shingle -> no evidence, null score
            (4, "two words"),
        ],
        "doc_id long, text string",
    )


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )


def test_benchmark_shingle_set(spark, bench):
    from img2dataset_spark.functions.text_fast import _h32_one

    ss = benchmark_shingle_set(bench, k=3)
    # h32 representation: membership is by the shared 32-bit md5 fold
    assert _h32_one("the quick brown") in ss and len(ss) == 7


def test_benchmark_size_cap(spark, corpus):
    with pytest.raises(ValueError, match="corpus-sized"):
        benchmark_shingle_set(corpus, k=3, max_shingles=3)


def test_scores(spark, corpus, bench):
    rows = {
        r["doc_id"]: r["contamination"]
        for r in contamination_scores(corpus, bench, k=3).collect()
    }
    assert rows[1] == 1.0
    # doc 2: shingles of 8 tokens -> 6; overlap = {"the quick brown",
    # "quick brown fox"} -> 2/6
    assert rows[2] == pytest.approx(0.333333, abs=1e-6)
    assert rows[3] == 0.0
    assert 4 not in rows  # no 3-shingle -> excluded


def test_decontaminate_keeps_short_docs(spark, corpus, bench):
    kept = sorted(
        r["doc_id"] for r in decontaminate(corpus, bench, threshold=0.3).collect()
    )
    # 1 (1.0) and 2 (0.33) dropped; 3 clean; 4 short -> kept
    assert kept == [3, 4]
    all_kept = sorted(
        r["doc_id"] for r in decontaminate(corpus, bench, threshold=1.01).collect()
    )
    assert all_kept == [1, 2, 3, 4]


def test_zero_shuffle_plan(spark, corpus, bench):
    plan = contamination_scores(corpus, bench, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
