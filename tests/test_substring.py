"""operators/substring.py — ExactSubstr duplicated-span detection."""

from pyspark.sql import functions as F

from img2dataset_spark.operators.substring import (
    duplicated_spans,
    duplication_profile,
)


def _spans(df, **kw):
    return {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicated_spans(df, **kw).collect()
    }


def test_cross_document_shared_passage(spark):
    df = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog and runs away fast"),
            (1, "completely different text with no overlap at all in here today"),
            (2, "we said the quick brown fox jumps over the lazy dog yesterday"),
        ],
        "doc_id long, text string",
    )
    got = _spans(df, k=5)
    # shared passage " quick ... dog" = 8 BPE tokens (leading-space
    # tokenization makes doc 0's sentence-initial "the" a different
    # token from doc 2's mid-sentence " the")
    assert got == {(0, 1, 9, 8), (2, 3, 11, 8)}


def test_within_document_repetition_flagged(spark):
    df = spark.createDataFrame(
        [(7, "repeat me repeat me repeat me repeat me repeat me repeat me")],
        "doc_id long, text string",
    )
    got = _spans(df, k=5)
    # every 5-gram of the periodic text recurs within the doc itself
    assert len(got) == 1
    (doc, start, end, n), = got
    assert doc == 7 and start <= 1 and n >= 10


def test_short_docs_and_no_duplicates(spark):
    df = spark.createDataFrame(
        [(0, "tiny"), (1, "one unique sentence lives here"), (2, None)],
        "doc_id long, text string",
    )
    assert _spans(df, k=5) == set()


def test_min_count_threshold(spark):
    base = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [(i, base) for i in range(3)], "doc_id long, text string"
    )
    # gram occurs 3x -> present at min_count 3, absent at min_count 4
    assert len(_spans(df, k=5, min_count=3)) == 3
    assert _spans(df, k=5, min_count=4) == set()


def test_overlapping_marks_merge_to_maximal_span(spark):
    # two docs share a 10-token run; all 6 of its 5-gram marks must
    # merge into ONE maximal span per doc, not 6 fragments
    # mid-sentence in BOTH docs so all 10 shared tokens carry the BPE
    # leading space and tokenize identically
    shared = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(0, "x p " + shared + " tail a"), (1, "head b " + shared)],
        "doc_id long, text string",
    )
    got = {d: (s, e) for d, s, e, _ in _spans(df, k=5)}
    assert len(got) == 2
    assert got[0] == (2, 12)  # ONE merged 10-token span, not 6 fragments
    assert got[1] == (2, 12)


def test_profile_rollup_covers_all_docs(spark):
    df = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today ok"),
            (1, "the quick brown fox jumps over the lazy dog tomorrow no"),
            (2, "nothing shared in this one at all whatsoever really"),
        ],
        "doc_id long, text string",
    )
    prof = {
        r["doc_id"]: r
        for r in duplication_profile(duplicated_spans(df, k=5), df).collect()
    }
    assert set(prof) == {0, 1, 2}  # left join keeps span-free docs
    assert prof[2]["n_spans"] == 0 and prof[2]["dup_fraction"] == 0.0
    assert prof[0]["dup_tokens"] > 0
    assert 0 < prof[0]["dup_fraction"] <= 1.0


def test_profile_fraction_bounded_on_punctuation_heavy_text(spark):
    """dup_fraction numerator (BPE-token span mass) and denominator must
    share the SAME tokenizer: with a whitespace denominator a fully-
    duplicated punctuation-heavy doc scored 1.8; it must be exactly 1.0
    (every BPE token of the doc sits in a duplicated span)."""
    body = "x! y! z! q! r! " * 2
    df = spark.createDataFrame(
        [(0, body.strip()), (1, body.strip())], "doc_id long, text string"
    )
    prof = {
        r["doc_id"]: r
        for r in duplication_profile(duplicated_spans(df, k=5), df).collect()
    }
    for r in prof.values():
        assert r["dup_fraction"] == 1.0, r
        assert r["dup_tokens"] == r["total_tokens"]


def test_plan_shape(spark):
    """One wide shuffle (gram aggregation, map-side combinable), no
    cartesian anywhere, span merge windowed per doc."""
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = duplicated_spans(df, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashAggregate" in plan  # partial/final gram count
    assert "Window" in plan


def test_k_validation(spark):
    import pytest

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="k must be"):
        duplicated_spans(df, k=0)


def test_cut_spans_removes_duplicated_regions(spark):
    from img2dataset_spark.operators.substring import cut_spans

    df = spark.createDataFrame(
        [
            (0, "keep A the quick brown fox jumps over the lazy dog Zed Zero"),
            (1, "keep B the quick brown fox jumps over the lazy dog Yak One"),
            (2, "totally unique document nothing shared here at all folks"),
        ],
        "doc_id long, text string",
    )
    spans = duplicated_spans(df, k=5)
    out = {r["doc_id"]: r for r in cut_spans(df, spans).collect()}
    # the shared passage is gone from both docs; unique tails survive
    assert "quick brown fox" not in out[0]["text"]
    assert out[0]["text"].startswith("keep a")
    assert out[0]["text"].endswith("zed zero")
    assert out[1]["text"].endswith("yak one")
    assert out[0]["n_cut"] > 0 and out[0]["n_cut"] == out[1]["n_cut"]
    # span-free docs pass through whole (lowercased), zero cut
    assert out[2]["n_cut"] == 0
    assert out[2]["text"] == "totally unique document nothing shared here at all folks"
    assert out[2]["n_tokens"] == 9
    # conservation: kept + cut = total tokens
    from img2dataset_spark.functions.text import token_count
    totals = {r["doc_id"]: r["n"] for r in
              df.select("doc_id", token_count(F.col("text")).alias("n")).collect()}
    for d, r in out.items():
        assert r["n_tokens"] + r["n_cut"] == totals[d]


def test_cut_spans_pure_codegen_after_join(spark):
    from img2dataset_spark.operators.substring import cut_spans

    df = spark.createDataFrame([(0, "x y z")], "doc_id long, text string")
    spans = spark.createDataFrame([], "doc_id long, span_start long, span_end long, span_tokens long")
    plan = cut_spans(df, spans)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_hashed_grams_equal_string_grams_at_small_n(spark):
    """hash_grams=True must produce identical spans when no 64-bit
    collision occurs (always, at test scale)."""
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert _spans(df, k=5) == _spans(df, k=5, hash_grams=True)
