"""URL canonicalization + canonical-URL dedup.

The reference pipeline keys its whole workload on raw `url` strings
(reader.py renames url_col -> url; the downloader fetches them as-is).
At crawl scale the same image hides behind trivially-different URLs —
case-shifted hosts, default ports, tracking parameters, reordered
query strings, fragments — so a URL-level dedup pass BEFORE the fetch
stage is the cheapest bandwidth saver a 100 TB ingest has (every
duplicate caught here is an HTTP fetch + decode + store never paid).

Everything is built-in string/array expressions (codegen, no Python),
written against constructs DuckDB mirrors verbatim so the oracle can
replay canonicalization bit-for-bit:

  - scheme and host lowercase; fragment stripped
  - default ports dropped (:80 for http, :443 for https)
  - empty path -> "/"
  - tracking params removed (utm_*, fbclid, gclid, msclkid, ref),
    remaining params SORTED (order-insensitive compare), "?" dropped
    when nothing survives

Deliberately NOT done (they change semantics): percent-decoding
(decoding can merge distinct resources), stripping "www.", collapsing
"//" in paths, IDN normalization.  The rule set is the conservative
subset that never merges two genuinely different resources for a
well-behaved server.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# params that never change the resource: analytics/click tracking
TRACKING_RE = "^(utm_[a-zA-Z0-9_]*|fbclid|gclid|msclkid|ref)="

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://"
_AUTH_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def canonical_url(url: Column) -> Column:
    """Canonical form of an absolute http(s)-style URL (see module
    docstring for the rule set).  NULL in -> NULL out; a string with no
    scheme://authority comes back unchanged minus fragment/tracking
    (garbage stays garbage, deterministically).

    NUL bytes are stripped first: \\x00 never appears in a valid URL,
    and the null-exemption dedup keys ('\\x00id:...', '\\x00row:...')
    rely on canonical urls never starting with NUL — without the strip,
    an adversarial input like '\\x00id:7' would land inside the
    exemption key space and could silently merge with (and drop) a
    genuine NULL-url row of doc 7."""
    url = F.regexp_replace(url, "\x00", "")
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(url, _AUTH_RE, 1))
    # default-port strip: the regexes are anchored to the full authority
    auth = F.when(
        (scheme == "http") & auth.rlike(":80$"),
        F.regexp_replace(auth, ":80$", ""),
    ).when(
        (scheme == "https") & auth.rlike(":443$"),
        F.regexp_replace(auth, ":443$", ""),
    ).otherwise(auth)
    path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # fragment-stripped form, shared by query extraction (a '?' INSIDE
    # the fragment is not a query — extracting from the raw url would
    # invent one and falsely merge with the real '?x=1' resource) and
    # by the no-scheme fallback below
    bare = F.regexp_replace(url, "#.*$", "")
    query = F.regexp_extract(bare, _QUERY_RE, 1)
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (p != "") & ~p.rlike(TRACKING_RE),
            )
        ),
        "&",
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit("")),
    )
    # no scheme -> leave the original (minus fragment) rather than
    # inventing "://" prefixes
    return F.when(url.isNull(), F.lit(None).cast("string")).when(
        scheme == "", bare
    ).otherwise(canon)


def null_exempt_key(cu: Column, id_col: Column) -> Column:
    """Dedup key that exempts NULL-url rows: a NULL canonical url falls
    back to a per-row unique key ('\\x00id:<id>' — NUL never appears in
    a URL), so NULL-url rows are never merged with each other.  The
    reference pipeline fetches (and stats-reports) every input row;
    collapsing all NULL urls into one survivor would silently drop the
    rest.  Shared by dedup_by_url, the pipeline's dedup_urls stage, and
    streaming_url_dedup so all three agree."""
    return F.coalesce(cu, F.concat(F.lit("\x00id:"), id_col.cast("string")))


def dedup_by_url(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """One representative (min id) per canonical URL — the same single
    hash-aggregate shape as exact_dedup, keyed on canonical_url.
    NULL-url rows pass through one-per-row (see null_exempt_key) with
    canonical_url NULL and dup_count 1.  Returns (id, canonical_url,
    dup_count); run BEFORE build_pipeline so duplicate fetches never
    happen."""
    cu = canonical_url(F.col(url_col))
    return (
        df.withColumn("_gk", null_exempt_key(cu, F.col(id_col)))
        .groupBy("_gk")
        # long-only aggregate buffers keep this a HashAggregate (a
        # min(string) buffer would demote it to SortAggregate); the
        # canonical url is recovered from the group key itself
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select(
            id_col,
            F.when(F.col("_gk").startswith("\x00id:"), F.lit(None).cast("string"))
            .otherwise(F.col("_gk"))
            .alias("canonical_url"),
            "dup_count",
        )
    )
