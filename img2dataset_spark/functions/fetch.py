"""S9/S10/P3: per-row HTTP fetch as an Arrow-batched pandas UDF.

Reference semantics (citations into /root/reference):
  - GET with UA token + timeout + optional SSL-noverify, returns
    (bytes | None, error | None): img2dataset/downloader.py:38-63
  - X-Robots-Tag directive filter (noai/noimageai/noindex/noimageindex),
    per-UA-token scoping: downloader.py:21-35, defaults main.py:114-117
  - retry loop: downloader.py:66-85
  - bounded in-flight concurrency (semaphore 2x thread count):
    downloader.py:203-235

Spark-first notes: this is the one operator that genuinely needs Python
(side-effecting network IO).  It is an *iterator* pandas UDF so the
thread pool is created once per task, not per batch; concurrency happens
inside each Arrow batch, so a task with 10k rows and thread_count=256
keeps 256 requests in flight regardless of partition size.

The "mock" fetcher is a hermetic, deterministic stand-in (no network):
payload and headers derive from md5(url) with formulas that are also
expressible in ANSI SQL, so the full pipeline can be verified against a
DuckDB oracle.  Real-network behavior is covered by tests against a
local HTTP server.
"""

from __future__ import annotations

import hashlib
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import pandas as pd
from pyspark.sql.functions import pandas_udf

FETCH_RESULT_SCHEMA = "data binary, error string"

DISALLOWED_ERROR = "Use of image disallowed by X-Robots-Tag directive"


def parse_robots_directives(header_value: str, user_agent_token: str | None) -> set[str]:
    """Parse an X-Robots-Tag header into the set of directives that apply
    to us (downloader.py:21-35): directives may be globally scoped
    ("noai, noindex") or scoped to a UA token ("examplebot: noai")."""
    directives: set[str] = set()
    for rule in header_value.split(","):
        rule = rule.strip()
        if not rule:
            continue
        if ":" in rule:
            scope, _, directive = rule.partition(":")
            scope = scope.strip().lower()
            directive = directive.strip().lower()
            # 'unavailable_after: <date>' style values are not UA scopes
            if scope == "unavailable_after":
                continue
            if user_agent_token is not None and scope == user_agent_token.lower():
                directives.add(directive)
        else:
            directives.add(rule.lower())
    return directives


def build_user_agent(user_agent_token: str | None) -> str:
    """The reference ALWAYS sends the Mozilla UA and appends the token
    clause only when set (downloader.py:42-44); UA-less requests get
    rejected by many CDNs, changing real-world success rates."""
    ua = "Mozilla/5.0 (X11; Ubuntu; Linux x86_64; rv:72.0) Gecko/20100101 Firefox/72.0"
    if user_agent_token:
        ua += f" (compatible; {user_agent_token}; +https://github.com/rom1504/img2dataset)"
    return ua


def _fetch_one(
    url: str,
    timeout: int,
    user_agent_string: str | None,
    user_agent_token: str | None,
    disallowed: frozenset[str],
    ignore_ssl_certificate: bool,
) -> tuple[bytes | None, str | None]:
    import urllib.request
    import ssl

    try:
        req = urllib.request.Request(url)
        if user_agent_string:
            req.add_header("User-Agent", user_agent_string)
        ctx = None
        if ignore_ssl_certificate:
            ctx = ssl.create_default_context()
            ctx.check_hostname = False
            ctx.verify_mode = ssl.CERT_NONE
        with urllib.request.urlopen(req, timeout=timeout, context=ctx) as resp:
            if disallowed:
                robots = resp.headers.get("X-Robots-Tag")
                if robots:
                    applied = parse_robots_directives(robots, user_agent_token)
                    if applied & disallowed:
                        return None, DISALLOWED_ERROR
            return resp.read(), None
    except Exception as err:  # error taxonomy: message string, like reference
        return None, str(err) or type(err).__name__

def _fetch_with_retries(
    url: str,
    retries: int,
    **kw,
) -> tuple[bytes | None, str | None]:
    """downloader.py:66-85 — re-issue up to `retries` times."""
    data, err = _fetch_one(url, **kw)
    for _ in range(retries):
        if data is not None or err == DISALLOWED_ERROR:
            break
        data, err = _fetch_one(url, **kw)
    return data, err


def mock_payload(url: str) -> bytes:
    """Deterministic hermetic payload: md5 hex of the url, repeated 8x
    (256 bytes).  SQL-equivalent: repeat(md5(url), 8)."""
    return (hashlib.md5(url.encode("utf-8")).hexdigest() * 8).encode("ascii")


def mock_fetch(url: str) -> tuple[bytes | None, str | None]:
    """Hermetic fetch: urls under /disallowed/ behave as robots-blocked,
    urls under /missing/ as 404s; everything else succeeds.  A NULL url
    yields the same error string the real path produces (the reference
    stats-reports every input row, so a null url must become a failed
    status, not a crash)."""
    if url is None:
        return None, "unknown url type: 'None'"
    if "/disallowed/" in url:
        return None, DISALLOWED_ERROR
    if "/missing/" in url:
        return None, "HTTP Error 404: Not Found"
    return mock_payload(url), None


def make_fetch_udf(
    timeout: int = 10,
    retries: int = 0,
    user_agent_token: str | None = None,
    disallowed_header_directives: tuple[str, ...] | None = None,
    ignore_ssl_certificate: bool = False,
    thread_count: int = 256,
    mock: bool = False,
):
    """Build the fetch pandas UDF: url:string -> struct<data,error>."""
    disallowed = frozenset(
        d.lower() for d in (disallowed_header_directives or ())
    )
    ua_string = build_user_agent(user_agent_token)

    @pandas_udf(FETCH_RESULT_SCHEMA)
    def fetch(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        if mock:
            for urls in batches:
                results = [mock_fetch(u) for u in urls]
                yield pd.DataFrame(
                    {"data": [r[0] for r in results], "error": [r[1] for r in results]}
                )
            return

        # Real network path: one pool per task; a semaphore caps in-flight
        # requests at 2x threads (reference downloader.py:203-212) so a
        # large Arrow batch cannot queue unbounded memory.
        pool = ThreadPoolExecutor(max_workers=thread_count)
        gate = threading.Semaphore(thread_count * 2)

        def fetch_gated(url: str) -> tuple[bytes | None, str | None]:
            try:
                return _fetch_with_retries(
                    url,
                    retries=retries,
                    timeout=timeout,
                    user_agent_string=ua_string,
                    user_agent_token=user_agent_token,
                    disallowed=disallowed,
                    ignore_ssl_certificate=ignore_ssl_certificate,
                )
            finally:
                gate.release()

        def submit(url: str):
            gate.acquire()
            return pool.submit(fetch_gated, url)

        try:
            for urls in batches:
                futures = [submit(u) for u in urls]
                results = [f.result() for f in futures]
                yield pd.DataFrame(
                    {"data": [r[0] for r in results], "error": [r[1] for r in results]}
                )
        finally:
            pool.shutdown(wait=False)

    return fetch
