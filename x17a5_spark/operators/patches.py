"""F14 — the idiosyncratic patch ledger (reference OCRClean.py:485-656
``idio_chg``: ~25 hand-curated filings with documented fixes), as a
*data-driven* operator instead of hard-coded Python branches.

Ledger schema (FIXTURES.md A8): ``basefile`` (``{cik}-{filing_date}``),
``op`` ∈ {replace_value, drop_row, rescale, prepend_rows}, op-specific
payload columns. Every op is a broadcast join against the tiny ledger —
patches scale to any corpus size with zero driver-side branching:

  * replace_value: (basefile, lineitem, old_value) -> new_value
  * drop_row:      (basefile, lineitem) removed
  * rescale:       whole filing's values × factor
  * prepend_rows:  new rows inserted ahead of the table (row_idx < 0,
                   then densified)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from x17a5_spark.functions.keys import filing_key


def apply_idio_patches(
    df: DataFrame,
    replacements: DataFrame | None = None,
    drops: DataFrame | None = None,
    rescales: DataFrame | None = None,
    prepends: DataFrame | None = None,
) -> DataFrame:
    """Apply the patch ledger to the long table
    (cik, filing_date, row_idx, lineitem, value).

    ``replacements``: basefile, lineitem, old_value, new_value
    ``drops``:        basefile, lineitem
    ``rescales``:     basefile, factor
    ``prepends``:     basefile, offset, lineitem, value   (offset >= 0)
    """
    out = df.withColumn("_bf", filing_key("cik", "filing_date"))

    if replacements is not None:
        rep = replacements.select(
            F.col("basefile").alias("_bf"),
            F.col("lineitem").alias("_rl"),
            "old_value",
            "new_value",
        )
        out = (
            out.join(
                F.broadcast(rep),
                (out["_bf"] == rep["_bf"])
                & (out["lineitem"] == rep["_rl"])
                & (out["value"] == rep["old_value"]),
                "left",
            )
            .drop(rep["_bf"])
            .withColumn("value", F.coalesce("new_value", "value"))
            .drop("_rl", "old_value", "new_value")
        )

    if drops is not None:
        dr = drops.select(F.col("basefile").alias("_bf"), "lineitem")
        out = out.join(F.broadcast(dr), ["_bf", "lineitem"], "left_anti")

    if rescales is not None:
        rs = rescales.select(F.col("basefile").alias("_bf"), "factor")
        out = (
            out.join(F.broadcast(rs), "_bf", "left")
            .withColumn("value", F.col("value") * F.coalesce("factor", F.lit(1.0)))
            .drop("factor")
        )

    if prepends is not None:
        pre = prepends.select(
            F.col("basefile").alias("_bf"),
            (F.col("offset") - F.lit(1_000_000)).alias("row_idx"),
            "lineitem",
            "value",
        ).join(
            out.select("_bf", "cik", "filing_date").dropDuplicates(["_bf"]),
            "_bf",
        )
        out = out.unionByName(pre.select(out.columns))

    w = Window.partitionBy("cik", "filing_date").orderBy("row_idx")
    return (
        out.withColumn("row_idx", F.row_number().over(w) - 1)
        .drop("_bf")
        .select("cik", "filing_date", "row_idx", "lineitem", "value")
    )
