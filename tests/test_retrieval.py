"""operators/retrieval.py — BM25 scoring and top-k."""

import math

import pytest
from pyspark.sql import functions as F

from img2dataset_spark.operators.retrieval import bm25_scores, bm25_topk

DOCS = [
    (0, "spark window merge spark"),
    (1, "spark table join"),
    (2, "window window window window window window"),
    (3, "nothing relevant here"),
    (4, ""),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _ref_bm25(query, k1=1.2, b=0.75):
    """Plain-Python reference implementation over DOCS."""
    toks = {i: t.split() for i, t in DOCS}
    n = len(DOCS)
    dls = {i: len(ts) for i, ts in toks.items()}
    avgdl = sum(dls.values()) / n
    out = {}
    for term in sorted(set(w.lower() for w in query)):
        df_t = sum(1 for ts in toks.values() if term in ts)
        if df_t == 0:
            continue
        idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
        for i, ts in toks.items():
            tf = ts.count(term)
            if tf == 0:
                continue
            s = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls[i] / avgdl))
            cnt, acc = out.get(i, (0, 0))
            out[i] = (cnt + 1, acc + math.floor(s * 1e6 + 0.5))
    return {i: (cnt, acc / 1e6) for i, (cnt, acc) in out.items()}


def test_bm25_matches_reference(docs_df):
    got = {
        r["doc_id"]: (r["n_terms"], r["score"])
        for r in bm25_scores(docs_df, ["spark", "window"]).collect()
    }
    want = _ref_bm25(["spark", "window"])
    assert set(got) == set(want) == {0, 1, 2}
    for i in got:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], abs=2e-6)


def test_bm25_ranking_properties(docs_df):
    """Doc 0 (both terms, short) outranks doc 2 (one term, saturated
    tf) and doc 1 (one occurrence); non-matching docs are absent."""
    rows = bm25_topk(docs_df, ["spark", "window"], k=10).collect()
    ids = [r["doc_id"] for r in rows]
    assert ids[0] == 0
    assert set(ids) == {0, 1, 2}
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_bm25_term_case_and_dedup(docs_df):
    """Query terms are lowercased and deduplicated — 'SPARK spark'
    scores identically to 'spark'."""
    a = {r["doc_id"]: r["score"] for r in bm25_scores(docs_df, ["SPARK", "spark"]).collect()}
    b = {r["doc_id"]: r["score"] for r in bm25_scores(docs_df, ["spark"]).collect()}
    assert a == b


def test_bm25_empty_query_rejected(docs_df):
    with pytest.raises(ValueError):
        bm25_scores(docs_df, [])


def test_bm25_plan_shape(docs_df):
    """One Generate (the pre-filtered explode), no Python UDF, and the
    term filter applied BELOW the aggregation."""
    plan = (
        bm25_scores(docs_df, ["spark"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Generate") == 1
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_bm25_multi_topk_matches_singles(spark, docs_df):
    """Batch BM25 per query_id equals the single-query path run per
    query — shared-term tf/df_t computed once must not change scores."""
    from img2dataset_spark.operators.retrieval import bm25_multi_topk

    qsets = {10: ["spark", "window"], 11: ["merge"], 12: ["window", "join"]}
    qdf = spark.createDataFrame(
        [(qid, t) for qid, ts in qsets.items() for t in ts],
        "query_id long, term string",
    )
    multi = bm25_multi_topk(docs_df, qdf, k=3).collect()
    got = {}
    for r in multi:
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["n_terms"], r["score"])
        )
    for qid, terms in qsets.items():
        want = [
            (r["doc_id"], r["n_terms"], r["score"])
            for r in bm25_topk(docs_df, terms, k=3).collect()
        ]
        assert sorted(got[qid]) == sorted(want), qid


def test_bm25_multi_topk_plan_shape(spark, docs_df):
    """Still ONE corpus explode for the whole batch, term filtering via
    broadcast join below the aggregation, no Python UDF."""
    from img2dataset_spark.operators.retrieval import bm25_multi_topk

    qdf = spark.createDataFrame(
        [(0, "spark"), (1, "window")], "query_id long, term string"
    )
    plan = (
        bm25_multi_topk(docs_df, qdf, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Generate") == 1
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
