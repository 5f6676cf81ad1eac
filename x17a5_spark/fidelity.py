"""FIDELITY — the domain quality benchmark under OCR-like noise.

BASELINE.md's domain bar is the reference's accounting-identity match
rates on REAL noisy OCR output: asset 74.9% PERFECT+BOUNDED, liability
75.7% (``Structured_assets_liabilities.ipynb`` cells 20-28, computed by
``DatabaseStructured.py:230-264``). The driver's oracle fixtures are
clean deterministic plants, so they prove semantics but not robustness.
This module generates a synthetic FOCUS corpus, injects the noise
classes the reference's cleaning chain exists to repair
(``OCRClean.py`` + ``DatabaseUnstructured.py:108-184``), runs the REAL
engine chain (pipeline.clean_filings -> operators/structured.py), and
reports the identity-match distribution per noise class.

Noise classes (deterministic md5-keyed assignment, one per filing):

  clean     no corruption — the control group
  glyph     '1' -> 'I' OCR glyphs in value cells (repaired by F1 parse)
  conjoin   two physical rows fused into one Textract row (repaired by
            F4 row-split against the page-text line map)
  subtotal  a spurious inserted subtotal row (repaired by the W1
            mutating totals scan)
  scaleerr  the unit marker text is OCR-mangled ('Thousnds'/'Millons';
            repaired by the F2 fuzzy scaler, ratio >= 90)
  digit     one-digit value error, last digit +1 (F11's epsilon class —
            unrepairable but BOUNDED: relative error ~1e-5 < 1%)
  droprow   a line-item row lost entirely (unrepairable -> GROSS)
  bigdigit  leading-digit error (unrepairable -> GROSS)

All generation is columnar and hash-derived (no driver-side RNG, no
collect): the corpus scales to any size with one narrow stage, and the
same cik always gets the same sheet and the same corruption.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from x17a5_spark.operators.structured import (
    build_structured_assets,
    build_structured_liabilities,
)
from x17a5_spark.pipeline import clean_filings

FILING_DATE = "2021-06-30"
FISCAL_YEAR = 2020

ASSET_LABELS = ["Cash", "Receivables", "Securities", "Other", "Total assets"]
LIAB_LABELS = [
    "Payables",
    "Debt",
    "Total liabilities",
    "Total shareholder's equity",
    "Total liabilities and shareholder's equity",
]

ASSET_LABEL_MAP = [
    ("Cash and cash equivalents", "Cash"),
    ("Receivables from customers", "Receivables"),
    ("Securities owned", "Securities"),
    ("Other assets", "Other"),
    # a missed spurious subtotal must INFLATE the reconstruction (the
    # reference's classifier would label it a real line item too)
    ("Subtotal", "Other"),
    ("Total assets", "Total assets"),
    ("Total assets reported", "Total assets"),
]

LIAB_LABEL_MAP = [
    ("Payables to customers", "Payables"),
    ("Subordinated borrowings", "Debt"),
    ("Accrued expenses and other liabilities", "Debt"),
    ("Subtotal", "Debt"),
    ("Total liabilities", "Total liabilities"),
    ("Total shareholder's equity", "Total shareholder's equity"),
    (
        "Total liabilities and shareholder's equity",
        "Total liabilities and shareholder's equity",
    ),
    ("TLE reported", "Total liabilities and shareholder's equity"),
]

NOISE_CLASSES = [
    "clean",
    "glyph",
    "conjoin",
    "subtotal",
    "scaleerr",
    "digit",
    "droprow",
    "bigdigit",
]


def _h(key, salt: str, mod: int):
    """Deterministic uniform long in [0, mod) from md5 — engine-neutral,
    reshuffle-stable."""
    return (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", key, F.lit(salt))), 1, 12), 16, 10
        ).cast("long")
        % mod
    )


def _filings(spark: SparkSession, n_filings: int) -> DataFrame:
    """Per-filing frame: true values, scale, noise class + target side."""
    f = spark.range(n_filings).select(F.col("id").cast("string").alias("cik"))
    cik = F.col("cik")
    # asset items 6-digit, liability items mid-5-digit: T_A >= 8e5 >
    # T_L <= 4.5e5, so equity is always positive and droprow/bigdigit
    # errors always exceed the 1% BOUNDED threshold (see class notes).
    for name in ("v0", "v1", "v2", "v3"):
        f = f.withColumn(name, F.lit(200000) + _h(cik, name, 800000))
    for name in ("v5", "v6", "v7"):
        f = f.withColumn(name, F.lit(50000) + _h(cik, name, 100000))
    f = (
        f.withColumn("ta", F.col("v0") + F.col("v1") + F.col("v2") + F.col("v3"))
        .withColumn("tl", F.col("v5") + F.col("v6") + F.col("v7"))
        .withColumn("te", F.col("ta") - F.col("tl"))
        .withColumn("tle", F.col("ta"))
    )
    bucket = _h(cik, "noise", 100)
    nz = (
        F.when(bucket < 55, "clean")
        .when(bucket < 65, "glyph")
        .when(bucket < 73, "conjoin")
        .when(bucket < 80, "subtotal")
        .when(bucket < 86, "scaleerr")
        .when(bucket < 92, "digit")
        .when(bucket < 96, "droprow")
        .otherwise("bigdigit")
    )
    marker_kind = _h(cik, "marker", 3)  # 0 none, 1 thousands, 2 millions
    # a scale-marker error needs a marker to corrupt
    nz = F.when((nz == "scaleerr") & (marker_kind == 0), "clean").otherwise(nz)
    tgt = F.when(_h(cik, "side", 2) == 0, "asset").otherwise("liability")
    scale = (
        F.when(marker_kind == 1, 1e3).when(marker_kind == 2, 1e6).otherwise(1.0)
    )
    return (
        f.withColumn("noise_class", nz)
        .withColumn("noise_side", tgt)
        .withColumn("marker_kind", marker_kind)
        .withColumn("scale", scale)
    )


def _perturb_last_digit(v):
    """F11's one-digit epsilon error: last digit +1 (mod 10)."""
    return v - v % 10 + (v % 10 + 1) % 10


def make_corpus(
    spark: SparkSession, n_filings: int = 20000
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Returns (raw_cells, page_text, truth).

    ``raw_cells``: cik, filing_date, row_idx, col0, col1, col2 — the
    Textract-shaped dirty table, post noise injection.
    ``page_text``: cik, filing_date, line_idx, line_text — the page-text
    channel (unit marker + one line per physical row label).
    ``truth``: per-filing true values, scale, noise class/side.
    """
    f = _filings(spark, n_filings)
    nz, tgt = F.col("noise_class"), F.col("noise_side")
    fmt = lambda c: F.format_number(c, 0)  # noqa: E731
    glyph = lambda c: F.translate(c, "1", "I")  # noqa: E731

    # --- corrupted copies of the two noise-target values -------------
    v2n = (
        F.when((nz == "digit") & (tgt == "asset"), _perturb_last_digit(F.col("v2")))
        .when((nz == "bigdigit") & (tgt == "asset"), F.col("v2") + 300000)
        .otherwise(F.col("v2"))
    )
    v6n = (
        F.when(
            (nz == "digit") & (tgt == "liability"),
            _perturb_last_digit(F.col("v6")),
        )
        .when((nz == "bigdigit") & (tgt == "liability"), F.col("v6") + 200000)
        .otherwise(F.col("v6"))
    )
    conj_a = (nz == "conjoin") & (tgt == "asset")
    conj_l = (nz == "conjoin") & (tgt == "liability")
    drop_a = (nz == "droprow") & (tgt == "asset")
    drop_l = (nz == "droprow") & (tgt == "liability")
    sub_a = (nz == "subtotal") & (tgt == "asset")
    sub_l = (nz == "subtotal") & (tgt == "liability")
    is_glyph = nz == "glyph"

    def row(idx: int, label, raw, skip=None):
        return F.struct(
            F.lit(idx).alias("row_idx"),
            (label if not isinstance(label, str) else F.lit(label)).alias("col0"),
            raw.cast("string").alias("col1"),
            (skip if skip is not None else F.lit(False)).alias("skip"),
        )

    rows = F.array(
        row(
            0,
            "Cash and cash equivalents",
            F.concat(
                F.lit("$ "),
                F.when(is_glyph, glyph(fmt("v0"))).otherwise(fmt("v0")),
            ),
        ),
        row(
            1,
            F.when(
                conj_a, F.lit("Receivables from customers Securities owned")
            ).otherwise(F.lit("Receivables from customers")),
            F.when(
                conj_a, F.concat(fmt("v1"), F.lit(" "), fmt(v2n))
            ).otherwise(fmt("v1")),
        ),
        row(2, "Securities owned", fmt(v2n), skip=conj_a),
        row(3, "Other assets", fmt("v3"), skip=drop_a),
        # value = the two surviving rows directly above (the scan's
        # contiguous-lookback window), so a working W1 kernel drops it
        row(4, "Subtotal", fmt(F.col("v2") + F.col("v3")), skip=~sub_a),
        row(5, "Total assets", F.concat(F.lit("$ "), fmt("ta"))),
        row(
            6,
            F.when(
                conj_l,
                F.lit("Payables to customers Subordinated borrowings"),
            ).otherwise(F.lit("Payables to customers")),
            F.when(
                conj_l,
                F.concat(
                    F.when(is_glyph, glyph(fmt("v5"))).otherwise(fmt("v5")),
                    F.lit(" "),
                    fmt(v6n),
                ),
            ).otherwise(
                F.when(is_glyph, glyph(fmt("v5"))).otherwise(fmt("v5"))
            ),
        ),
        row(7, "Subordinated borrowings", fmt(v6n), skip=conj_l),
        row(
            8,
            "Accrued expenses and other liabilities",
            fmt("v7"),
            skip=drop_l,
        ),
        row(9, "Subtotal", fmt(F.col("v6") + F.col("v7")), skip=~sub_l),
        row(10, "Total liabilities", fmt("tl")),
        row(11, "Total shareholder's equity", fmt("te")),
        row(
            12,
            "Total liabilities and shareholder's equity",
            F.concat(F.lit("$ "), fmt("tle")),
        ),
        row(
            13,
            "See accompanying notes to financial statements",
            F.lit(None).cast("string"),
        ),
    )
    raw_cells = (
        f.select(
            "cik",
            F.lit(FILING_DATE).alias("filing_date"),
            F.explode(F.filter(rows, lambda r: ~r["skip"])).alias("r"),
        )
        .select(
            "cik",
            "filing_date",
            F.col("r.row_idx").alias("row_idx"),
            F.col("r.col0").alias("col0"),
            F.col("r.col1").alias("col1"),
            F.lit(None).cast("string").alias("col2"),
        )
    )

    marker = (
        F.when(
            F.col("marker_kind") == 1,
            F.when(nz == "scaleerr", "Dollars in Thousnds").otherwise(
                F.lit("Dollars in Thousands")
            ),
        )
        .when(
            F.col("marker_kind") == 2,
            F.when(nz == "scaleerr", "Expressed in Millons").otherwise(
                F.lit("Expressed in Millions")
            ),
        )
        .otherwise(F.lit("Statement of Financial Condition"))
    )
    labels = [
        "Cash and cash equivalents",
        "Receivables from customers",
        "Securities owned",
        "Other assets",
        "Total assets",
        "Payables to customers",
        "Subordinated borrowings",
        "Accrued expenses and other liabilities",
        "Total liabilities",
        "Total shareholder's equity",
        "Total liabilities and shareholder's equity",
    ]
    text_lines = F.array(
        marker.alias("l0"), *[F.lit(s) for s in labels]
    )
    page_text = f.select(
        "cik",
        F.lit(FILING_DATE).alias("filing_date"),
        F.posexplode(text_lines).alias("line_idx", "line_text"),
    )
    truth = f.select(
        "cik",
        "noise_class",
        "noise_side",
        "scale",
        *[
            (F.col(c) * F.col("scale")).alias(f"true_{c}")
            for c in ("v0", "v1", "v2", "v3", "ta", "v5", "v6", "v7", "tl", "te", "tle")
        ],
    )
    return raw_cells, page_text, truth


def _reinject_totals(silver: DataFrame, side: str, lineitem: str) -> DataFrame:
    """Resurrect the explained (dropped) reported total as a labeled row
    — the reference keeps it as the structured DB's reported column via
    the same totals_check bookkeeping (DatabaseUnstructured.py:128)."""
    return (
        silver.filter((F.col("side") == side) & (F.col("total_flag") == 1))
        .select("cik", "filing_date", "total_amt")
        .distinct()
        .select(
            "cik",
            "filing_date",
            F.lit(-1).alias("row_idx"),
            F.lit(lineitem).alias("lineitem"),
            F.col("total_amt").alias("value"),
        )
    )


def _gold_input(silver: DataFrame, side: str, reinject_as: str) -> DataFrame:
    base = silver.filter(F.col("side") == side).select(
        "cik", "filing_date", "row_idx", "lineitem", "value"
    )
    return (
        base.unionByName(_reinject_totals(silver, side, reinject_as))
        .withColumn("name", F.concat(F.lit("N"), F.col("cik")))
        .withColumn("fiscal_year", F.lit(FISCAL_YEAR))
        .select("cik", "name", "filing_date", "fiscal_year", "lineitem", "value")
    )


def run_fidelity(
    spark: SparkSession, n_filings: int = 20000
) -> dict[str, DataFrame]:
    """Generate, corrupt, clean, build, classify. Returns the gold
    tables joined to truth plus per-class aggregates."""
    raw, text, truth = make_corpus(spark, n_filings)
    silver = clean_filings(raw, text).persist()

    amap = spark.createDataFrame(ASSET_LABEL_MAP, ["lineitem", "label"])
    lmap = spark.createDataFrame(LIAB_LABEL_MAP, ["lineitem", "label"])
    gold_a = build_structured_assets(
        _gold_input(silver, "asset", "Total assets reported"), amap, ASSET_LABELS
    )
    gold_l = build_structured_liabilities(
        _gold_input(silver, "liability", "TLE reported"), lmap, LIAB_LABELS
    )

    ja = gold_a.join(truth, "cik")
    jl = gold_l.join(truth, "cik")

    def _dist(j: DataFrame, check_col: str) -> DataFrame:
        return (
            j.groupBy("noise_class", "noise_side")
            .pivot(
                check_col,
                ["PERFECT MATCH", "BOUNDED MATCH", "GROSS MISMATCH", "NOT FOUND"],
            )
            .count()
            .fillna(0)
        )

    # value fidelity: every surviving asset cell equals truth exactly
    # (catches scale-repair and glyph-repair failures that the identity
    # check alone cannot see — both sides of the identity scale together)
    vfid = ja.select(
        "cik",
        "noise_class",
        "noise_side",
        (
            (F.col("Cash") == F.col("true_v0"))
            & (F.col("Receivables") == F.col("true_v1"))
            & (F.col("Other").isNull() | (F.col("Other") == F.col("true_v3")))
            & (F.col("`Total assets`") == F.col("true_ta"))
        ).alias("asset_cells_exact"),
    )
    return {
        "gold_assets": ja,
        "gold_liabilities": jl,
        "asset_dist": _dist(ja, "total_asset_check"),
        "liab_dist": _dist(jl, "total_le_check"),
        "value_fidelity": vfid.groupBy("noise_class").agg(
            F.count("*").alias("n"),
            F.sum(F.col("asset_cells_exact").cast("int")).alias("n_exact"),
        ),
    }
