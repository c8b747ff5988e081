"""Text primitives shared by dedup / text-analysis operators.

Everything is a JVM-side column expression; the 32-bit stable token hash
(md5-prefix → int) is deliberately engine-portable so DuckDB oracles can
reproduce signatures bit-for-bit (Spark's xxhash64/hash are not).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Tiny per-language stopword lists for the n-gram/lexicon language-ID
# heuristic. Constants — identical lists are embedded in the oracle SQL.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "es": ["el", "la", "los", "que", "y", "es"],
    "fr": ["le", "les", "et", "dans", "est", "une"],
}


def normalize_text(c: Column) -> Column:
    """lower + trim + collapse whitespace (the dedup normalizer).
    DuckDB twin: lower(trim(regexp_replace(text, ' +', ' ', 'g')))."""
    return F.lower(F.trim(F.regexp_replace(c, " +", " ")))


def tokens(c: Column) -> Column:
    return F.split(c, " ")


def shingles(toks: Column, k: int = 3) -> Column:
    """k-token shingles: [t[i] .. t[i+k-1]] joined by spaces. Built as a
    zip_with fold over k shifted slices of the token array — stays
    JVM-side, no UDF. DuckDB twin:
    list_transform(range(1, len(l)-k+2), i -> l[i] || ' ' ...).

    Physical note: an earlier version indexed ``element_at(toks, i+j)``
    inside a transform lambda; when ``toks`` is itself an expression
    (CollapseProject re-inlines projections), everything inside the lambda
    re-evaluates PER ELEMENT — measured ~25× slower at sf0.1. Slices
    evaluate ``toks`` only k times per row regardless of inlining.
    """
    n = F.size(toks)
    cnt = n - k + 1
    out = F.slice(toks, 1, cnt)
    for j in range(1, k):
        out = F.zip_with(
            out, F.slice(toks, j + 1, cnt), lambda acc, x: F.concat_ws(" ", acc, x)
        )
    # guard: slice length would be <= 0 when n < k — emit [] instead
    # (CaseWhen evaluates only the taken branch, so the slice is safe)
    return F.when(n >= k, out).otherwise(F.array().cast("array<string>"))


def stable_hash32(c: Column) -> Column:
    """Engine-portable 32-bit hash: first 8 hex chars of md5 as a long in
    [0, 2^32). DuckDB twin: CAST(concat('0x', substr(md5(x),1,8)) AS BIGINT).
    """
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")
