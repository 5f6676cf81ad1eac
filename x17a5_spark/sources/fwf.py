"""S1 — fixed-width text source (EDGAR ``form.idx``,
reference ExtractBrokerDealers.py:143-149 via ``pd.read_fwf``).

Spark has no native FWF reader; the engine composes ``spark.read.text``
with per-column ``substring`` projections — pushdown-friendly (a single
line scan, column pruning drops unused substrings) and scales to any
index size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (name, start, width) — EDGAR form.idx layout (1-based starts)
EDGAR_FORM_IDX_LAYOUT = [
    ("form_type", 1, 12),
    ("company_name", 13, 62),
    ("cik", 75, 12),
    ("date_filed", 87, 12),
    ("file_url", 99, 60),
]


def read_fixed_width(
    spark: SparkSession,
    path: str,
    layout: list[tuple[str, int, int]] = EDGAR_FORM_IDX_LAYOUT,
    skip_rows: int = 0,
) -> DataFrame:
    """Parse a fixed-width file into trimmed string columns."""
    lines = spark.read.text(path)
    if skip_rows:
        # header skipping needs a stable line order: zipWithIndex-style
        # via a monotonically increasing id is only safe single-file;
        # EDGAR headers are instead delimited by a dashed line, which is
        # what we filter on (content-addressed, order-free).
        lines = lines.filter(~F.col("value").rlike(r"^-{5,}")).filter(
            F.length("value") > 0
        )
    cols = [
        F.trim(F.substring("value", start, width)).alias(name)
        for name, start, width in layout
    ]
    return lines.select(*cols)
