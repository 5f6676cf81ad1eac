"""End-to-end domain pipeline test (reference E2 chain): dirty OCR
cells through purge → merge → split → parse → scale → bisection →
subtotal removal, with hand-computed expected output — the engine's
equivalent of the reference's funnel + identity audits (SURVEY §5).

Fixture values are chosen so no lookback window accidentally triggers
the power-of-ten/substring heuristic (e.g. 500000.0 IS a substring of
1500000.0 one char shorter, which legitimately fires multiple_check —
a real reference quirk the engine reproduces)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from x17a5_spark.operators.structured import build_structured_assets
from x17a5_spark.pipeline import clean_filings


@pytest.fixture(scope="module")
def fixture_tables(spark):
    # filing 1: three-column table with dirt: blank header row, paren
    # negative, I->1 OCR error, a conjoined row, and reported totals on
    # both sides explained by their lookback sums; page text declares
    # thousands scaling.
    raw_rows = [
        # (cik, filing_date, row_idx, col0, col1, col2)
        ("1", "2020-06-30", 0, "ASSETS", None, None),
        ("1", "2020-06-30", 1, "Cash", "$ 2,34I", None),           # 2341
        ("1", "2020-06-30", 2, "", "999", None),                    # purged
        ("1", "2020-06-30", 3, "Receivables", None, "(1)"),         # -1
        ("1", "2020-06-30", 4, "Securities Held Other assets", "512 301", None),
        ("1", "2020-06-30", 5, "Total assets", "3,153", None),      # = sum
        ("1", "2020-06-30", 6, "Payables", "700", None),
        ("1", "2020-06-30", 7, "Equity", "800", None),
        ("1", "2020-06-30", 8, "Total liabilities and equity", "1,500", None),
    ]
    text_rows = [
        ("1", "2020-06-30", 0, "Dollars in Thousands"),
        ("1", "2020-06-30", 1, "Securities Held"),
        ("1", "2020-06-30", 2, "Other assets"),
    ]
    raw = spark.createDataFrame(
        raw_rows,
        "cik string, filing_date string, row_idx int, col0 string, col1 string, col2 string",
    )
    text = spark.createDataFrame(
        text_rows, "cik string, filing_date string, line_idx int, line_text string"
    )
    return raw, text


def test_clean_filings_end_to_end(spark, fixture_tables):
    raw, text = fixture_tables
    out = clean_filings(raw, text).toPandas().sort_values(["side", "row_idx"])

    # Values scale by 1e3. 'Total assets' (3,153,000) = 2341000 - 1000
    # + 512000 + 301000 -> dropped as an explained subtotal;
    # 'Total liabilities and equity' (1,500,000) = 700000 + 800000 ->
    # dropped; ASSETS header dropped by the merge; blank col0 purged;
    # the conjoined row splits via the TEXT map.
    assets = out[out.side == "asset"]
    liabs = out[out.side == "liability"]
    assert list(assets.lineitem) == [
        "Cash",
        "Receivables",
        "Securities Held",
        "Other assets",
    ]
    assert list(assets.value) == [2341000.0, -1000.0, 512000.0, 301000.0]
    assert list(liabs.lineitem) == ["Payables", "Equity"]
    assert list(liabs.value) == [700000.0, 800000.0]
    # both sides found + explained their total rows
    assert (assets.total_flag == 1).all()
    assert assets.total_amt.iloc[0] == 3153000.0
    assert (liabs.total_flag == 1).all()
    assert liabs.total_amt.iloc[0] == 1500000.0


def test_clean_to_structured_gold(spark, fixture_tables):
    raw, text = fixture_tables
    silver = clean_filings(raw, text)
    long_df = (
        silver.filter(F.col("side") == "asset")
        .withColumn("name", F.lit("ACME"))
        .withColumn("fiscal_year", F.lit(2019))
        .select("cik", "name", "filing_date", "fiscal_year", "lineitem", "value")
    )
    # reported total rides back in from the totals_check capture
    totals = (
        silver.filter(F.col("side") == "asset")
        .select("cik", "filing_date", "total_amt")
        .dropDuplicates(["cik", "filing_date"])
        .select(
            "cik",
            F.lit("ACME").alias("name"),
            "filing_date",
            F.lit(2019).alias("fiscal_year"),
            F.lit("__reported_total__").alias("lineitem"),
            F.col("total_amt").alias("value"),
        )
    )
    label_map = spark.createDataFrame(
        [
            ("Cash", "Cash and cash equivalents"),
            ("Receivables", "Receivables"),
            ("Securities Held", "Other"),
            ("Other assets", "Other"),
            ("__reported_total__", "Total assets"),
        ],
        ["lineitem", "label"],
    )
    labels = ["Cash and cash equivalents", "Receivables", "Other", "Total assets"]
    gold = build_structured_assets(
        long_df.unionByName(totals), label_map, labels
    ).toPandas()
    assert len(gold) == 1
    row = gold.iloc[0]
    # 2341000 - 1000 + 512000 + 301000 == 3153000 reported -> PERFECT
    assert row["reconstructed_total_assets"] == pytest.approx(3153000.0)
    assert row["total_asset_check"] == "PERFECT MATCH"


def test_clean_filings_partition_invariant(spark, fixture_tables):
    """The silver chain's output must be identical under any input
    partitioning — the determinism claim the DECIMAL sums, per-filing
    kernels, and dense re-numbering exist to guarantee."""
    raw, text = fixture_tables

    def run(r, t):
        out = clean_filings(r, t)
        cols = ["cik", "filing_date", "side", "row_idx", "lineitem",
                "value", "total_flag", "total_amt"]
        return sorted(tuple(row[c] for c in cols) for row in out.collect())

    base = run(raw, text)
    assert base == run(raw.repartition(7), text.repartition(3))
    assert base == run(raw.coalesce(1), text.coalesce(1))
    assert len(base) > 0
