"""functions/url.py — URL canonicalization + canonical-URL dedup."""

import pytest
from pyspark.sql import functions as F

from img2dataset_spark.functions.url import canonical_url, dedup_by_url


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["c"] for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]


@pytest.mark.parametrize(
    "raw,want",
    [
        # host + scheme case, default port, fragment
        ("HTTP://Example.COM:80/a/b.jpg#frag", "http://example.com/a/b.jpg"),
        ("https://Example.com:443/x", "https://example.com/x"),
        # NON-default port survives
        ("http://example.com:8080/x", "http://example.com:8080/x"),
        # https keeps :80 (not its default)
        ("https://example.com:80/x", "https://example.com:80/x"),
        # empty path -> /
        ("http://example.com", "http://example.com/"),
        # tracking params dropped, remainder sorted, ? dropped when empty
        ("http://e.com/p?utm_source=m&utm_campaign=x", "http://e.com/p"),
        ("http://e.com/p?b=2&a=1", "http://e.com/p?a=1&b=2"),
        ("http://e.com/p?b=2&gclid=z&a=1&fbclid=q", "http://e.com/p?a=1&b=2"),
        # ref is tracking; refine is NOT (prefix must not over-match)
        ("http://e.com/p?ref=nav&refine=3", "http://e.com/p?refine=3"),
        # percent-encoding and www are deliberately untouched
        ("http://www.e.com/a%2Fb", "http://www.e.com/a%2Fb"),
    ],
)
def test_canonicalization_rules(spark, raw, want):
    assert _canon(spark, [raw]) == [want]


def test_null_and_schemeless(spark):
    got = _canon(spark, [None, "not a url#frag", "synth.local/x?a=1"])
    assert got[0] is None
    assert got[1] == "not a url"  # garbage minus fragment, unchanged
    assert got[2] == "synth.local/x?a=1"


def test_dedup_by_url_collapses_spellings(spark):
    rows = [
        (0, "HTTP://Img.Site:80/cat.jpg?utm_source=a#f"),
        (1, "http://img.site/cat.jpg"),
        (2, "http://img.site/dog.jpg?b=2&a=1"),
        (3, "http://img.site/dog.jpg?a=1&b=2&fbclid=x"),
        (4, "http://other.site/cat.jpg"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {
        r["canonical_url"]: (r["doc_id"], r["dup_count"])
        for r in dedup_by_url(df).collect()
    }
    assert out == {
        "http://img.site/cat.jpg": (0, 2),
        "http://img.site/dog.jpg?a=1&b=2": (2, 2),
        "http://other.site/cat.jpg": (4, 1),
    }


def test_fragment_query_not_extracted(spark):
    """A '?' inside the fragment is NOT a query: 'http://h/p#frag?x=1'
    must canonicalize to 'http://h/p' (fragment stripped, no invented
    query) and must NOT merge with the genuinely distinct resource
    'http://h/p?x=1'."""
    got = _canon(spark, ["http://h/p#frag?x=1", "http://h/p?x=1"])
    assert got[0] == "http://h/p"
    assert got[1] == "http://h/p?x=1"
    assert got[0] != got[1]
    # a real query followed by a '?'-bearing fragment keeps only the query
    assert _canon(spark, ["http://h/p?a=1#frag?x=9"]) == ["http://h/p?a=1"]


def test_null_urls_pass_through_dedup(spark):
    """NULL urls carry no dedup evidence: each NULL-url row survives
    (canonical_url NULL, dup_count 1) instead of all collapsing into
    one group — the reference pipeline fetches every input row."""
    rows = [
        (0, None),
        (1, None),
        (2, "http://img.site/cat.jpg"),
        (3, "http://img.site/cat.jpg#f"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = dedup_by_url(df).collect()
    nulls = sorted(r["doc_id"] for r in out if r["canonical_url"] is None)
    assert nulls == [0, 1]
    assert all(
        r["dup_count"] == 1 for r in out if r["canonical_url"] is None
    )
    assert {r["doc_id"]: r["dup_count"] for r in out if r["canonical_url"]} == {2: 2}


def test_nul_sentinel_cannot_collide(spark):
    """Adversarial input: a url string that literally starts with
    '\\x00id:' must NOT land in the null-exemption key space (it would
    silently merge with — and drop — a genuine NULL-url row of the
    matching doc).  canonical_url strips NUL bytes first, so the
    sentinel prefix is unreachable from any input string."""
    rows = [
        (7, None),                      # genuine NULL-url row, key '\x00id:7'
        (8, "\x00id:7"),                # adversarial spelling
        (9, "id:7"),                    # the honest NUL-less twin
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r for r in dedup_by_url(df).collect()}
    # the NULL row survives untouched
    assert 7 in out and out[7]["canonical_url"] is None and out[7]["dup_count"] == 1
    # the adversarial url is canonicalized NUL-stripped — it merges with
    # its honest twin (same resource spelling), never with the NULL row
    survivor = out[8] if 8 in out else out[9]
    assert survivor["canonical_url"] == "id:7"
    assert survivor["dup_count"] == 2
    assert len(out) == 2


def test_pure_codegen_no_python(spark):
    df = spark.createDataFrame([(0, "http://e.com/x")], "doc_id long, url string")
    plan = (
        dedup_by_url(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "HashAggregate" in plan  # single map-side-combinable aggregate
