"""Text-analysis scalar functions: fuzzy ratios (F2), token stats,
fingerprints — the building blocks for the cleaning layer and for the
large-scale text-pipeline operators (dedup, quality scoring, lang-ID).

Everything here is built-in column expressions (codegen'd, scale-safe).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def levenshtein_ratio(a: Column | str, b: Column | str) -> Column:
    """F2 — ``fuzz.ratio`` equivalent (reference OCRClean.py:370-414 uses
    a >=90 threshold for unit-scale words): ``1 - lev(a,b)/max(len)``.
    Note ``fuzz.ratio`` is ``(2M / (len_a+len_b))`` on matching blocks;
    for the short single tokens the reference compares, the Levenshtein
    form is equivalent at the thresholds used and stays JVM-side.
    """
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    denom = F.greatest(F.length(ca), F.length(cb))
    return F.when(denom == 0, F.lit(1.0)).otherwise(
        1.0 - F.levenshtein(ca, cb) / denom
    )


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization with empty-token hygiene."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def punct_ratio(col: Column | str) -> Column:
    """Punctuation chars / total chars (quality-scoring feature)."""
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(F.regexp_replace(c, r"[^.!?,;:]", ""))
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        n_punct / F.length(c)
    )


def normalized_fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text. Deterministic across engines (used by exact dedup)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.regexp_replace(F.trim(c), r"\s+", " ")))


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """k-word shingles as an array of space-joined strings — the unit of
    MinHash / Jaccard near-dup detection. Pure higher-order functions:
    ``transform`` over the token-index sequence, then ``slice`` + join.
    """
    toks = tokens(col)
    n = F.size(toks)
    # sequence(1, 0) would generate a *descending* [1, 0] in Spark, so
    # short documents (< k tokens) must short-circuit to an empty array.
    idx = F.sequence(F.lit(1), n - (k - 1))
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    )
