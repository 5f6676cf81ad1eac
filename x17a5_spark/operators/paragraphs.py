"""Paragraph-level (sub-document) dedup with document reassembly.

The Dolma/RefinedWeb curation primitive doc-level dedup cannot express:
boilerplate, license blocks and quoted spans repeat ACROSS documents
that are not duplicates of each other, so the fix is delete-the-span,
not drop-the-document. This module holds the reusable core; the
registry query (queries/dedup.py::d15_paragraph_dedup) wraps it with
the demo fixture and the DuckDB oracle twin.

Semantics (engine-identical to the oracle):
- split each doc into paragraphs: fixed ``para_tokens``-token chunks by
  default, or — ``delimiter`` mode (round 8) — on a structural regex
  (blank lines, newlines) first, fixed-width chunking only the
  oversized spans;
- keep the FIRST occurrence (min (doc_id, pos)) of every paragraph
  corpus-wide;
- always keep paragraphs shorter than ``min_tokens`` (a ragged 1-4
  token tail is noise, not boilerplate);
- reassemble each doc from its surviving paragraphs in order; docs
  deduplicated to nothing stay in the output with n_kept=0 and empty
  text so the curation funnel can be audited.

Scale decisions (each measured / plan-pinned, see SCALE.md round 7):
- keep-first is ``groupBy(fingerprint).min(packed-long)`` — NOT a
  row_number window: a hot boilerplate paragraph at 100 TB has
  billions of occurrences and a window partitioned on the fingerprint
  serializes them onto one task, while partial aggregation collapses
  the hot key map-side. The winner rows ARE the kept set (no join
  back).
- the (doc_id, pos) winner packs into ONE long (doc_id·2^20 + pos,
  order-identical to the lexicographic struct for pos < 2^20 and
  doc_id < 2^43) because min over a LONG compiles to HashAggregate,
  while min over a STRUCT falls back to SortAggregate and drags a
  per-partition sort of every paragraph row into the plan. The packing
  bound fails LOUD (raise_error), never silently misattributes.
- the token split is STAGED into a real column (CollapseProject
  protection, SPARK-36718) — inlined, the regex split re-executes at
  every reference site including per-element inside the transform
  lambda's slice().
- the paragraph-array stage table persists once and serves both the
  explode/keep-first path and the totals branch (the d3 shingle-table
  discipline).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from x17a5_spark.functions.text import tokens

PARA_TOKENS = 12
MIN_TOKENS = 5
PACK = 1 << 20  # (doc_id, pos) packed order-preserving into one long
_PACK_SHIFT = PACK.bit_length() - 1  # unpack shift derived, never drifts
IDSPACE = (1 << 63) // PACK  # doc_id bound so doc_id*PACK+pos fits a long


_PARA_STRUCT = "array<struct<para:string,para_len:int>>"


def _chunk_structs(toks, para_tokens: int):
    """Token array → array of (para text, token count) fixed-width
    chunks. The lambda variable binds the token array ONCE per element,
    so nested references never re-execute an upstream split."""
    n = F.size(toks)
    nseg = F.floor((n + para_tokens - 1) / para_tokens).cast("int")
    return F.when(
        nseg >= 1,
        F.transform(
            F.sequence(F.lit(0), nseg - 1),
            lambda i: F.struct(
                F.concat_ws(
                    " ", F.slice(toks, i * para_tokens + 1, para_tokens)
                ).alias("para"),
                F.least(F.lit(para_tokens), n - i * para_tokens)
                .cast("int")
                .alias("para_len"),
            ),
        ),
    ).otherwise(F.array().cast(_PARA_STRUCT))


def dedup_paragraphs(
    docs: DataFrame,
    para_tokens: int = PARA_TOKENS,
    min_tokens: int = MIN_TOKENS,
    delimiter: str | None = None,
) -> DataFrame:
    """``(doc_id, text)`` → ``(doc_id, n_para, n_kept, text_dedup)``.

    ``docs`` must have unique ``doc_id`` (long) and string ``text``.

    ``delimiter`` (round-8, VERDICT #6): a regex — when set, paragraphs
    follow the document's REAL structure: split the text on the regex
    (e.g. ``\\n\\s*\\n`` for blank-line paragraphs), drop empty spans,
    then fixed-width chunk only the OVERSIZED spans (> ``para_tokens``
    tokens) so a single run-on span cannot become an unboundedly long
    dedup key. ``None`` keeps the fixed-width split over the whole
    token stream (the d15 oracle twin's mode). Positions stay one
    global in-order sequence either way, so the keep-first packing and
    reassembly logic downstream is mode-independent.
    """
    staged = docs.select("doc_id", "text")
    if delimiter is None:
        para_arr = _chunk_structs(F.col("_toks"), para_tokens)
        staged = staged.withColumn("_toks", tokens(F.col("text")))
    else:
        spans = F.filter(
            F.transform(F.split(F.col("text"), delimiter), tokens),
            lambda t: F.size(t) > 0,
        )
        para_arr = F.flatten(
            F.transform(
                F.col("_spans"), lambda t: _chunk_structs(t, para_tokens)
            )
        )
        staged = staged.withColumn("_spans", spans)
    from x17a5_spark.cache import stage_persist

    base = stage_persist(
        staged.select("doc_id", para_arr.alias("paras")),
        StorageLevel.MEMORY_AND_DISK,
    )
    paras = base.select(
        "doc_id",
        F.posexplode("paras").alias("pos", "p"),
    ).select("doc_id", "pos", F.col("p.para").alias("para"), F.col("p.para_len").alias("para_len"))
    packed = F.when(
        (F.col("pos") < PACK) & (F.col("doc_id") < IDSPACE),
        F.col("doc_id") * PACK + F.col("pos"),
    ).otherwise(
        # BOTH packing bounds fail LOUD (ADVICE r7 closed the doc_id
        # side): a doc_id past 2^43 would silently corrupt the packed
        # ordering, exactly like an overflowing pos
        F.raise_error(
            F.concat(
                F.lit(
                    "paragraph (doc_id, pos) exceeds the 2^43/2^20 "
                    "packing bounds in doc "
                ),
                F.col("doc_id").cast("string"),
            )
        )
    )
    salt = F.when(F.col("para_len") < min_tokens, packed)
    kept = (
        paras.withColumn("_salt", salt)
        .groupBy("para", "_salt")
        .agg(F.min(packed).alias("w"))
        .select(F.shiftright("w", _PACK_SHIFT).alias("doc_id"), "w", "para")
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("w", "para"))),
                lambda x: x["para"],
            ),
            " ",
        ).alias("text_dedup"),
    )
    totals = base.select("doc_id", F.size("paras").alias("n_para"))
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_para",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
    )
