"""operators/lm.py — unigram LM fit/score."""

import math

import pytest
from pyspark.sql import functions as F

from img2dataset_spark.operators.lm import fit_unigram_lm, score_unigram


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat"),
            (3, "zebra quark flux"),  # all rare
        ],
        "doc_id long, text string",
    )


def test_fit_costs(spark, corpus):
    vocab, oov = fit_unigram_lm(corpus)
    v = {r["token"]: r["nlp_micro"] for r in vocab.collect()}
    # 12 tokens total; 'the' x3, 'sat' x2, rest x1
    assert v["the"] == math.floor(math.log(12 / 3) * 1e6 + 0.5)
    assert v["sat"] == math.floor(math.log(12 / 2) * 1e6 + 0.5)
    assert v["cat"] == math.floor(math.log(12 / 1) * 1e6 + 0.5)
    assert oov.collect()[0]["oov_micro"] == math.floor(math.log(12) * 1e6 + 0.5)


def test_vocab_cap_and_tiebreak(spark, corpus):
    vocab, _ = fit_unigram_lm(corpus, max_vocab=3)
    toks = sorted(r["token"] for r in vocab.collect())
    # 'the'(3), 'sat'(2), then count-1 tie broken by token asc: 'cat'
    assert toks == ["cat", "sat", "the"]


def test_score_mean_is_exact_integer_mean(spark, corpus):
    vocab, oov = fit_unigram_lm(corpus)
    got = {r["doc_id"]: (r["n_toks"], r["nlp_mean_micro"])
           for r in score_unigram(corpus, vocab, oov).collect()}
    c = {w: m for w, m in
         [("the", 3), ("cat", 1), ("sat", 2), ("on", 1), ("mat", 1),
          ("dog", 1), ("zebra", 1), ("quark", 1), ("flux", 1)]}
    def cost(w):
        return math.floor(math.log(12 / c[w]) * 1e6 + 0.5)
    d1 = [cost(w) for w in "the cat sat on the mat".split()]
    assert got[1] == (6, math.floor(sum(d1) / 6 + 0.5))
    # doc 3 is all singletons -> highest (most surprising) score
    assert got[3][1] > got[1][1] and got[3][1] > got[2][1]


def test_oov_scoring(spark, corpus):
    vocab, oov = fit_unigram_lm(corpus, max_vocab=2)  # only 'the','sat'
    got = {r["doc_id"]: r["nlp_mean_micro"]
           for r in score_unigram(corpus, vocab, oov).collect()}
    oov_cost = math.floor(math.log(12) * 1e6 + 0.5)
    assert got[3] == oov_cost  # every token OOV -> mean == oov cost


def test_no_sort_merge_join(spark, corpus):
    vocab, oov = fit_unigram_lm(corpus)
    plan = (
        score_unigram(corpus, vocab, oov)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan
