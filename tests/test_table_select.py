"""Golden tests for the step-4 table accept/stitch operator
(OCRTextract.py get_balance_sheet/readTable semantics)."""

from __future__ import annotations

from x17a5_spark.operators.table_select import (
    select_balance_sheet,
    stitch_kernel,
)

SCHEMA = (
    "cik string, filing_date string, page int, table_idx int, row_idx int, "
    "col0 string, col1 string, col2 string"
)


def _table(cik, page, tbl, rows):
    return [("%s" % cik, "2020-06-30", page, tbl, i, *r) for i, r in enumerate(rows)]


BS_COMBINED = [
    ("Cash", "$ 100", None),
    ("Receivables", "200", None),
    ("Total assets", "$ 300", None),
    ("Total liabilities", "$ 120", None),
]
BS_ASSETS = [("Cash", "$ 100", None), ("Total assets", "$ 300", None)]
BS_LIABS = [("Payables", "$ 80", None), ("Total liabilities", "$ 120", None)]
TOC = [("Table of contents", None, None), ("Notes to statements", None, None)]
ASSET_BOTTOM = [
    ("Intro text one", "$ 1", None),
    ("Intro text two", "2", None),
    ("More filler", "3", None),
    ("Cash", "$ 100", None),
]


# --------------------------------------------------------------- kernel
def test_stitch_combined_table():
    # one table carrying both sides completes immediately
    assert stitch_kernel([(True, True, True)]) == [(0, 0)]


def test_stitch_asset_then_liability():
    flags = [(True, True, False), (True, False, True)]
    assert stitch_kernel(flags) == [(0, 0), (1, 1)]


def test_stitch_liability_then_asset_reversed():
    flags = [(True, False, True), (True, True, False)]
    # JPM case: liabilities read first -> output order reversed
    assert stitch_kernel(flags) == [(1, 0), (0, 1)]


def test_stitch_gap_breaks_pairing():
    # a rejected table between asset and liability tables breaks the
    # "immediately following" requirement -> no export
    flags = [(True, True, False), (False, False, False), (True, False, True)]
    assert stitch_kernel(flags) is None


def test_stitch_no_candidates():
    assert stitch_kernel([(False, False, False)] * 3) is None


# ------------------------------------------------------------- operator
def test_select_combined(spark):
    rows = _table(1, 0, 0, TOC) + _table(1, 1, 0, BS_COMBINED)
    out = select_balance_sheet(spark.createDataFrame(rows, SCHEMA)).toPandas()
    assert set(out.page) == {1}  # TOC rejected (no $)
    assert len(out) == len(BS_COMBINED)


def test_select_split_tables_ordered(spark):
    rows = _table(2, 0, 0, BS_ASSETS) + _table(2, 0, 1, BS_LIABS)
    out = (
        select_balance_sheet(spark.createDataFrame(rows, SCHEMA))
        .toPandas()
        .sort_values("global_row")
    )
    assert list(out.col0) == ["Cash", "Total assets", "Payables", "Total liabilities"]


def test_select_reversed_tables(spark):
    rows = _table(3, 0, 0, BS_LIABS) + _table(3, 0, 1, BS_ASSETS)
    out = (
        select_balance_sheet(spark.createDataFrame(rows, SCHEMA))
        .toPandas()
        .sort_values("global_row")
    )
    # reversed: assets come first in the stitched output
    assert list(out.col0) == ["Cash", "Total assets", "Payables", "Total liabilities"]


def test_select_rejects_bottom_half_asset(spark):
    rows = _table(4, 0, 0, ASSET_BOTTOM)
    out = select_balance_sheet(spark.createDataFrame(rows, SCHEMA)).toPandas()
    assert len(out) == 0  # first cash hit in bottom half -> not a balance sheet
