"""Text-analysis column functions — all JVM-side built-ins (no UDFs).

Beyond-reference operators for LLM training-data pipelines (SURVEY §7
M6): tokenization, n-gram shingling, quality metrics, language-ID
heuristic, document fingerprinting, and cross-engine hashing helpers.

Every function here is built exclusively from `pyspark.sql.functions`
expressions so the hot path stays inside whole-stage codegen, and every
formula has an ANSI-SQL equivalent (used by the DuckDB oracle in
__spark_entry__.py).  Cross-engine determinism rules:

  - hashes are md5 hex STRINGS (lexicographic min == uniform minhash;
    avoids engine-specific 64-bit hash functions)
  - hex -> int uses an explicit per-hex-digit fold (both engines lack a
    common hex-parse builtin); 8 hex digits = 32 bits, overflow-safe
  - round-half behavior differs between engines, so derived floats are
    rounded via floor(x*10^n + 0.5)/10^n when exact parity is needed
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small public stopword/marker lists (standard function words).
EN_STOPWORDS = ["the", "a", "an", "of", "and", "to", "in", "is", "it", "that"]

LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "en": ["the", "a", "of", "and", "is", "to", "in", "it"],
    "es": ["el", "la", "de", "que", "y", "los", "es", "un"],
    "fr": ["le", "la", "de", "et", "est", "les", "des", "un"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization of lowercased trimmed text."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def token_count(text: Column) -> Column:
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(tokens(text))
    )


def shingles(toks: Column, k: int = 3) -> Column:
    """Word k-gram shingles joined by single spaces; [] when fewer than
    k tokens (guarded: Spark's sequence(1, n) DESCENDS for n < 1)."""
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def normalized_text(text: Column) -> Column:
    """Normalization for fingerprinting: lowercase, collapse whitespace."""
    return F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of normalized text."""
    return F.md5(normalized_text(text).cast("binary"))


def seeded_minhash(shingle_arr: Column, num_hashes: int = 32) -> Column:
    """MinHash signature as an array of md5-hex strings.

    Signature element s = min over shingles of md5('<s>|' || shingle);
    lexicographic min over a uniform hex hash is a valid minwise hash,
    and (unlike integer hashing) is bit-identical across engines.
    Empty shingle set -> nulls (no signature).
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda s: F.array_min(
            F.transform(
                shingle_arr,
                lambda x: F.md5(
                    F.concat(s.cast("string"), F.lit("|"), x).cast("binary")
                ),
            )
        ),
    )


def lsh_bands(signature: Column, num_bands: int, rows_per_band: int) -> Column:
    """Group a minhash signature into band keys 'b:md5(concat(rows))'."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_bands - 1)),
        lambda b: F.concat(
            b.cast("string"),
            F.lit(":"),
            F.md5(
                F.array_join(
                    F.slice(signature, b * rows_per_band + 1, rows_per_band), ","
                ).cast("binary")
            ),
        ),
    )


def _hex_digit_val(ch: Column) -> Column:
    a = F.ascii(ch)
    return F.when(a >= 97, a - 87).otherwise(a - 48)


def hex_to_int32(hex_str: Column) -> Column:
    """Fold the first 8 hex chars into a 32-bit int (engine-portable:
    the SQL oracle uses the same per-digit fold)."""
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(8)),
        F.lit(0).cast("long"),
        lambda acc, i: acc * 16 + _hex_digit_val(hex_str.substr(i, F.lit(1))).cast("long"),
    )


def simhash32(shingle_arr: Column) -> Column:
    """32-bit SimHash over shingles: bit b of the output is 1 when the
    majority of shingle hashes have bit b set (classic Charikar simhash
    with +/-1 votes)."""
    hashes = F.transform(shingle_arr, lambda x: hex_to_int32(F.md5(x.cast("binary"))))
    # bit extraction via arithmetic ((h div 2^b) mod 2): the pyspark
    # shiftright wrapper only takes literal shift amounts, and the same
    # formula runs verbatim in the SQL oracle
    pow2 = lambda b: F.pow(F.lit(2.0), b).cast("long")  # noqa: E731
    bit_vote = lambda b: F.aggregate(  # noqa: E731
        hashes,
        F.lit(0).cast("long"),
        lambda votes, h: votes + F.pmod(F.floor(h / pow2(b)).cast("long"), F.lit(2)) * 2 - 1,
    )
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(31)),
        F.lit(0).cast("long"),
        lambda acc, b: acc
        + F.when(bit_vote(b) > 0, pow2(b)).otherwise(F.lit(0).cast("long")),
    )


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    stripped = F.regexp_replace(text, r"[a-zA-Z0-9\s]", "")
    return F.when(F.length(text) > 0, F.length(stripped) / F.length(text)).otherwise(
        F.lit(0.0)
    )


def stopword_ratio(toks: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are (English) stopwords."""
    words = stopwords or EN_STOPWORDS
    lit_arr = F.array([F.lit(w) for w in words])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(lit_arr, t)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def lang_scores(toks: Column) -> dict[str, Column]:
    """Marker-word hit count per language (the lang-ID signal)."""
    out = {}
    for lang, words in LANG_MARKERS.items():
        lit_arr = F.array([F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(lit_arr, t)))
    return out


def predicted_lang(toks: Column) -> Column:
    """Deterministic language-ID: argmax marker-hit count, ties broken by
    language code (alphabetical), 'und' when no marker hits at all."""
    scores = lang_scores(toks)
    # build a struct array (score DESC, lang ASC) and take the max
    entries = F.array(
        *[
            F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
            for lang in sorted(LANG_MARKERS)
        ]
    )
    best = F.aggregate(
        entries,
        F.struct(F.lit(-1).alias("score"), F.lit("zzz").alias("lang")),
        lambda acc, e: F.when(
            (e["score"] > acc["score"])
            | ((e["score"] == acc["score"]) & (e["lang"] < acc["lang"])),
            e,
        ).otherwise(acc),
    )
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
