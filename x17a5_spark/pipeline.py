"""E2 — the per-filing OCR-to-clean chain (reference
OCRClean.py:663-753 ``clean_wrapper`` + run_build_database stages),
composed from the engine's operators as one DataFrame flow:

    raw OCR cells (3 columns, dirty strings)
      → column purge (P2)
      → 3→2 column merge (W4 declarative)
      → conjoined-row split (F4 kernel, TEXT map)
      → accounting-number parse (F1)
      → unit scaling (F2/W6 carry-forward)
      → subtotal removal (W1 kernel)
      → asset/liability bisection (W3 kernel)
      → long silver table (cik, filing_date, side, row_idx, lineitem, value)

Every stage is a narrow transformation or a filing-key shuffle; nothing
re-orders across filings, so the whole chain scales linearly with the
corpus. The gold stage (label pivot + identity validation) lives in
operators/structured.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from x17a5_spark.functions.accounting import parse_accounting_number
from x17a5_spark.operators.merge import merge_three_columns
from x17a5_spark.operators.row_split import split_conjoined_rows
from x17a5_spark.operators.scaler import detect_unit_scale
from x17a5_spark.operators.splits import split_balance_sheet
from x17a5_spark.operators.totals_check import remove_subtotals


def clean_filings(raw: DataFrame, text: DataFrame) -> DataFrame:
    """Silver-stage cleaning: raw OCR cells + page-text table -> clean
    long balance-sheet rows.

    ``raw``:  cik, filing_date, row_idx, col0, col1, col2 (dirty strings)
    ``text``: cik, filing_date, line_idx, line_text
    """
    purged = raw.filter(
        F.col("col0").isNotNull() & (F.trim(F.col("col0")) != "")
    ).select(
        "cik",
        "filing_date",
        "row_idx",
        F.col("col0").alias("lineitem"),
        "col1",
        "col2",
    )
    merged = merge_three_columns(
        purged, group_cols=["cik", "filing_date"], col1="col1", col2="col2"
    )
    split = split_conjoined_rows(merged, text, group_cols=["cik", "filing_date"])
    parsed = split.withColumn(
        "value_unscaled", parse_accounting_number(F.col("raw_value"))
    ).filter(F.col("value_unscaled").isNotNull())
    scales = detect_unit_scale(text, group_cols=["cik", "filing_date"])
    scaled = parsed.join(scales, ["cik", "filing_date"], "left").withColumn(
        "value", F.col("value_unscaled") * F.coalesce(F.col("scale"), F.lit(1.0))
    )
    # re-number after the drop/expand stages so downstream kernels see a
    # dense per-filing order
    w = Window.partitionBy("cik", "filing_date").orderBy("row_idx")
    dense = scaled.withColumn("row_idx", F.row_number().over(w) - 1).select(
        "cik", "filing_date", "row_idx", "lineitem", "value"
    )
    sided = split_balance_sheet(dense, group_cols=["cik", "filing_date"])
    no_subtotals = remove_subtotals(
        sided, group_cols=["cik", "filing_date", "side"]
    )
    return no_subtotals.select(
        "cik", "filing_date", "side", "row_idx", "lineitem", "value",
        "total_flag", "total_amt",
    )
