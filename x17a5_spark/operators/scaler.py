"""W6/F2 — unit-scale detection with per-CIK carry-forward
(``numeric_scaler``, reference OCRClean.py:370-414; cross-filing state
threading at run_ocr.py:96-99,218).

Semantics: scan the filing's page-text lines in order; the first line
containing a token fuzzy-matching a scale word (ratio >= 90, checked in
the fixed order thousands, hundreds, millions, billions) decides the
multiplier (1e3/1e2/1e6/1e9). If no line matches, fall back to the
previous filing's scale *for the same CIK* (the reference threads this
as mutable state across the processing loop — here it is a
carry-forward window over filing_date, which also pins the previously
implicit input-order dependence, SURVEY §7 hard part 7). Default 1.

The fuzzy token match is ``fuzz.ratio`` (indel-based: 2M/(la+lb)), which
differs from a plain Levenshtein ratio near the threshold (e.g.
'million' vs 'millions' scores 93 indel but 87.5 Levenshtein), so the
token scorer is a vectorized pandas UDF computing the exact indel ratio
— Arrow-batched, applied only to page-text tokens (bounded per filing),
not to balance-sheet data.
"""

from __future__ import annotations

from difflib import SequenceMatcher

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCALE_WORDS = [("thousands", 1e3), ("hundreds", 1e2), ("millions", 1e6), ("billions", 1e9)]


from functools import lru_cache


@lru_cache(maxsize=1 << 17)
def _token_word_mask(tok: str) -> int:
    """Bitmask of SCALE_WORDS indices this token fuzzy-matches
    (indel ratio >= 90). Memoized: page-text token vocabulary is tiny
    relative to line volume (headers repeat corpus-wide), so after
    warmup a token costs one dict hit instead of four difflib passes."""
    mask = 0
    for i, (word, _mult) in enumerate(SCALE_WORDS):
        if SequenceMatcher(None, word, tok).ratio() * 100 >= 90:
            mask |= 1 << i
    return mask


@lru_cache(maxsize=1 << 16)
def _line_scale_py(line: str) -> float | None:
    """First matching scale multiplier for one text line (null if
    none) — WORD-major order like the reference: 'thousands' against
    every token before 'hundreds' is tried, so the lowest matched word
    index decides. Exact fuzz.ratio semantics via difflib:
    ratio = 2M/(la+lb) * 100."""
    mask = 0
    for tok in line.lower().split(" "):
        mask |= _token_word_mask(tok)
    for i, (_word, mult) in enumerate(SCALE_WORDS):
        if mask & (1 << i):
            return mult
    return None


@F.pandas_udf(T.DoubleType())
def _line_scale(lines: pd.Series) -> pd.Series:
    """Vectorized wrapper: score each DISTINCT line once per batch
    (plus the cross-batch lru caches above). Round 11: the uncached
    per-line difflib scan was 22.7 s of e1's silver at the 100× lake —
    the single most expensive silver stage — and is value-identical
    memoized (r10 #4 attribution; tools/e1_kernel_profile.py)."""
    mapping = {
        v: (_line_scale_py(v) if isinstance(v, str) else None)
        for v in pd.unique(lines)
    }
    return lines.map(mapping)


def detect_unit_scale(
    text: DataFrame,
    group_cols: list[str] = ("cik", "filing_date"),
    line_order_col: str = "line_idx",
) -> DataFrame:
    """Per-filing scale factor from the page-text table
    (group_cols..., line_idx, line_text) with per-CIK carry-forward.

    Plan shape: one scan + pandas-UDF projection, a groupBy on the
    filing key (min over matching lines = "first matching line"), then
    a carry-forward window per CIK — two narrow shuffles, no kernel.
    """
    group_cols = list(group_cols)
    cik_col, date_col = group_cols[0], group_cols[1]
    # NO explicit repartition here, by policy (kernel_part.py boundary):
    # the indel-ratio UDF is byte-proportional (cost ~ lines scanned),
    # so scan-split sizing is already correct at scale, and the groupBy
    # below partial-aggregates map-side — only ~1 row per filing ever
    # crosses the exchange. An explicit spread would shuffle the FULL
    # text corpus on the silver hot path at 100 TB to save ~1 s on a
    # byte-small bench corpus (round-6 self-review finding #2).
    per_line = text.withColumn("line_scale", _line_scale(F.col("line_text")))
    first_match = (
        per_line.withColumn(
            "match_line",
            F.when(F.col("line_scale").isNotNull(), F.col(line_order_col)),
        )
        .groupBy(*group_cols)
        .agg(
            F.min_by("line_scale", "match_line").alias("own_scale"),
        )
    )
    w = (
        Window.partitionBy(cik_col)
        .orderBy(F.col(date_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return first_match.select(
        *group_cols,
        F.coalesce(
            F.last("own_scale", ignorenulls=True).over(w), F.lit(1.0)
        ).alias("scale"),
    )
