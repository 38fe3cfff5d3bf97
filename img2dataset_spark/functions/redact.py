"""PII redaction: replace emails / IPv4 addresses / SSN-style ids /
phone-style numbers with typed placeholder tokens and count what was
removed.

Standard scrubbing pass for training-data pipelines (the reference has
no equivalent; M6 layer).  Everything is pure Catalyst —
``regexp_count`` + ``regexp_replace`` chains inside whole-stage
codegen, zero Python, zero shuffles — so at 100 TB this is a map-only
scan that fuses with whatever filter/projection surrounds it.

The patterns deliberately use only the regex subset with identical
semantics in Java (Spark), RE2 (DuckDB oracle), and Python (tests):
character classes, bounded quantifiers, and \\b word boundaries — no
backreferences or lookarounds.  Redaction order matters and is fixed:
emails first (their local part could otherwise be chewed up by number
patterns), then SSNs before phones (both dash-digit shapes; SSN is
3-2-4, phone 3-3-4 — disjoint, but the fixed order makes the
composition deterministic regardless of future pattern edits), then
IPv4 last.  Counts are taken on the progressively-redacted text, so a
substring already replaced is never double-counted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# name -> (pattern, replacement token); ORDER IS SEMANTIC (see docstring)
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IPV4>"),
]


def redact_expr(col: Column) -> tuple[Column, dict[str, Column]]:
    """(redacted text column, {kind: match-count column}).  Composable
    form for use inside arbitrary selects."""
    counts: dict[str, Column] = {}
    redacted = col
    for name, pat, token in PII_PATTERNS:
        counts[name] = F.regexp_count(redacted, F.lit(pat))
        redacted = F.regexp_replace(redacted, pat, token)
    return redacted, counts


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``text_col`` replaced by its redacted form, plus one
    ``n_<kind>`` count column per pattern."""
    redacted, counts = redact_expr(F.col(text_col))
    # single select: every expression must bind to the INPUT text column
    # (chained withColumn would rebind the counts to the replaced text)
    return df.select(
        *[
            redacted.alias(text_col) if c == text_col else F.col(c)
            for c in df.columns
        ],
        *[c.alias(f"n_{name}") for name, c in counts.items()],
    )
