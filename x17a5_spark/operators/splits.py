"""Asset / liability bisection (``bsSplit``/``lineItems``,
reference DatabaseSplits.py:25-120).

Semantics: scan line items in page order, tracking the most recent
1-based positions of an ``assets`` match and a ``liability|liabilities``
match. Whenever both have been seen and the asset position precedes the
liability position, the split bounds update to the *current* pair —
so the final bounds come from the last prefix where assets still led
(this guards against the JP Morgan 2012/13 reversed-table OCR error).
If only assets matched, the lower bound still applies; if the very last
row matched neither term, the upper bound resets to the full length.
Rows [0, stop1) are assets; [stop1, stop2) are liabilities & equity;
filings missing either side are rejected (left out of both outputs).

The prefix-dependent bound update is a sequential fold, so it runs as a
tiny ``applyInPandas`` kernel per filing; the declarative last-match
form (max(when(rlike, pos))) is exercised by
queries/windows.py::w3_last_match_split.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame

ASSET_RE = re.compile("assets", re.I)
LIABLE_RE = re.compile("liability|liabilities", re.I)


def bs_split_kernel(items: list[str]) -> tuple[int, int] | None:
    """Pure kernel: (stop1, stop2) bounds, or None if a side is missing."""
    n = len(items)
    stop1, stop2 = 0, n
    asset_idx = liable_idx = 0
    m1 = m2 = None
    for i, item in enumerate(items):
        text = item if isinstance(item, str) else ""
        m1 = ASSET_RE.search(text)
        m2 = LIABLE_RE.search(text)
        if m1 is not None:
            asset_idx = i + 1
        if m2 is not None:
            liable_idx = i + 1
        if asset_idx and liable_idx and asset_idx < liable_idx:
            stop1, stop2 = asset_idx, liable_idx
    if asset_idx and not liable_idx:
        stop1 = asset_idx
    if m1 is None and m2 is None:  # last row matched neither term
        stop2 = n
    if stop1 == 0 or stop2 - stop1 <= 0:
        return None
    return stop1, stop2


def split_balance_sheet(
    df: DataFrame,
    group_cols: list[str] = ("cik", "filing_date"),
    order_col: str = "row_idx",
    item_col: str = "lineitem",
) -> DataFrame:
    """Tag every surviving row with ``side`` ∈ {asset, liability};
    filings rejected by the bisection emit no rows."""
    group_cols = list(group_cols)
    in_cols = [c for c, _ in df.dtypes]
    schema = ", ".join([f"{c} {t}" for c, t in df.dtypes] + ["side string"])

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        bounds = bs_split_kernel(pdf[item_col].tolist())
        if bounds is None:
            return pdf.iloc[0:0].assign(side=pd.Series(dtype="object"))[
                in_cols + ["side"]
            ]
        stop1, stop2 = bounds
        out = pdf.iloc[:stop2].copy()
        out["side"] = ["asset"] * stop1 + ["liability"] * (stop2 - stop1)
        return out[in_cols + ["side"]]

    from x17a5_spark.operators.kernel_part import grouped_kernel

    return grouped_kernel(df, group_cols, fn, schema)


def bisect_and_remove_subtotals(
    df: DataFrame,
    group_cols: list[str] = ("cik", "filing_date"),
    order_col: str = "row_idx",
    item_col: str = "lineitem",
    value_col: str = "value",
) -> DataFrame:
    """Fused silver tail: W3 bisection + W1 subtotal removal in ONE
    grouped kernel pass per filing.

    Semantically identical to ``split_balance_sheet`` followed by
    ``remove_subtotals`` (pinned equal by
    tests/test_splits_merge.py::test_fused_tail_equals_composition);
    the fusion exists because kernel-PASS overhead, not exchange
    bytes, dominates the silver chain (round-6 attribution: the two
    tail kernels cost 2.3 s + 4.1 s at sf0.1 on near-identical keys).
    One exchange on the filing key replaces two grouped shuffles —
    also the right shape at 100 TB, where the silver mass crosses the
    wire once instead of twice.
    """
    from x17a5_spark.operators.kernel_part import grouped_kernel
    from x17a5_spark.operators.totals_check import totals_check_kernel

    group_cols = list(group_cols)
    sel = df.select(*group_cols, order_col, item_col, value_col)
    out_cols = group_cols + [order_col, item_col, value_col, "side"]
    schema = ", ".join(
        [f"{c} {t}" for c, t in sel.dtypes]
        + ["side string", "total_flag int", "total_amt double"]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        bounds = bs_split_kernel(pdf[item_col].tolist())
        empty = pdf.iloc[0:0].assign(
            side=pd.Series(dtype="object"),
            total_flag=pd.Series(dtype="int64"),
            total_amt=pd.Series(dtype="float64"),
        )[out_cols[:-1] + ["side", "total_flag", "total_amt"]]
        if bounds is None:
            return empty
        stop1, stop2 = bounds
        sided = pdf.iloc[:stop2].copy()
        sided["side"] = ["asset"] * stop1 + ["liability"] * (stop2 - stop1)
        parts = []
        for side_df in (sided.iloc[:stop1], sided.iloc[stop1:]):
            if not len(side_df):
                continue
            keep, flag, amt = totals_check_kernel(
                side_df[item_col].tolist(), side_df[value_col].tolist()
            )
            out = side_df.iloc[keep].copy()
            out["total_flag"] = flag
            out["total_amt"] = amt
            parts.append(out)
        if not parts:
            return empty
        return pd.concat(parts)[
            out_cols[:-1] + ["side", "total_flag", "total_amt"]
        ]

    return grouped_kernel(sel, group_cols, fn, schema)
