"""F4 — conjoined-row splitting (``row_split``,
reference OCRClean.py:219-361).

A Textract table row sometimes fuses several physical rows:
``("Securities Held Total Assets", "$ 9,112,943 13,151,663")``. The fix
needs the filing's page-text line map (X17A5-TEXT.json): every text
line that appears as a substring of the fused line-item becomes a split
candidate; counts are aligned under the reference's rules —
  * equal counts -> one-to-one mapping;
  * more names than values -> drop the *leading* extra names;
  * exactly one extra value -> drop the leading value;
  * otherwise -> the fused row is dropped entirely.
The per-filing flag records whether any fused row was seen.

Sequential and map-dependent, so it runs as a per-filing
``applyInPandas`` kernel; the *detector* (multi-token value cell) is
the declarative F3 expression exercised by
queries/scalars.py::f3_conjoined_detect.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _is_conjoined(raw: str | None) -> bool:
    """Multi-token value cell, ignoring '$'/'S' OCR artifacts."""
    if not isinstance(raw, str):
        return False
    toks = [t for t in raw.split(" ") if t not in ("$", "S")]
    return len(toks) > 1


def _align(splits: list[str], values: list[str]) -> tuple[list[str], list[str]] | None:
    n = len(splits) - len(values)
    if n == 0:
        return splits, values
    if n > 0:
        return splits[n:], values
    if n == -1:
        return splits, values[1:]
    return None


def row_split_kernel(
    items: list[str], raws: list[str], text_lines: list[str]
) -> tuple[list[tuple[str, str]], int]:
    """Pure kernel over one filing. Returns ((item, raw_value) rows with
    fused rows expanded, flag=1 if any fused row was found)."""
    rows = list(zip(items, raws))
    fused_positions = [k for k, (_, raw) in enumerate(rows) if _is_conjoined(raw)]
    flag = 1 if fused_positions else 0
    # process in original order; expansion happens in place
    for pos in sorted(fused_positions, reverse=True):
        name, raw = rows[pos]
        values = [t for t in raw.split(" ") if t not in ("$", "S")]
        line = name if isinstance(name, str) else ""
        splits = [
            key
            for key in text_lines
            if isinstance(key, str) and len(key) > 1 and line.find(key) >= 0
        ]
        aligned = _align(splits, values)
        if aligned is None:
            rows[pos : pos + 1] = []
        else:
            names2, values2 = aligned
            rows[pos : pos + 1] = list(zip(names2, values2))
    return rows, flag


def split_conjoined_rows(
    df: DataFrame,
    text: DataFrame,
    group_cols: list[str] = ("cik", "filing_date"),
    order_col: str = "row_idx",
    item_col: str = "lineitem",
    raw_col: str = "raw_value",
) -> DataFrame:
    """Expand fused rows using the per-filing TEXT line map.

    ``text`` holds (group_cols..., line_text). The map rides into the
    kernel via a cogroup on the filing key — no driver-side dict, so the
    text corpus can be arbitrarily large.
    """
    from pyspark.sql import functions as F  # local: keep module header lean

    group_cols = list(group_cols)
    key_t = dict(df.dtypes)
    schema = ", ".join(
        [f"{c} {key_t[c]}" for c in group_cols]
        + ["row_idx int", f"{item_col} string", f"{raw_col} string", "split_flag int"]
    )
    # The TEXT map rides in as one ordered array column per filing (a
    # pre-aggregated left join) rather than a cogroup — one extra small
    # shuffle, but robust to shared-lineage inputs and keeps exactly one
    # grouped kernel.
    text_arrays = text.groupBy(*group_cols).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("line_idx"), F.col("line_text")))
        ).alias("_text_lines")
    )
    from x17a5_spark.operators.kernel_part import grouped_kernel

    # full-width kernel execution (AQE would serialize this CPU-bound
    # stage on a byte-small corpus; see kernel_part.py)
    joined = df.join(text_arrays, group_cols, "left")

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        first_lines = pdf["_text_lines"].iloc[0]
        text_lines = (
            [t["line_text"] for t in first_lines] if first_lines is not None else []
        )
        rows, flag = row_split_kernel(
            pdf[item_col].tolist(), pdf[raw_col].tolist(), text_lines
        )
        out = pd.DataFrame(rows, columns=[item_col, raw_col])
        for c, k in zip(group_cols, key):
            out[c] = k
        out["row_idx"] = range(len(out))
        out["split_flag"] = flag
        return out[group_cols + ["row_idx", item_col, raw_col, "split_flag"]]

    return grouped_kernel(joined, group_cols, fn, schema, with_key=True)
