"""E3 — the structured-database build (reference
DatabaseStructured.py:161-267), re-expressed in long form.

Reference flow: predict a canonical label per distinct line item (X5),
overwrite with manual classifications where available (J5,
manual_cl_merge :15-48), pivot-sum per filing × label (A3,
structured_data :50-89), dedup amended filings per (CIK, fiscal year)
keep-first (W5, :225,241), reconstruct totals and stamp the
accounting-identity match class (A4/F12, :230-264).

Long form makes the whole thing zero-UDF Catalyst: label attach is a
broadcast join, the pivot is over the bounded label taxonomy (≤25
columns — never the open line-item vocabulary, SURVEY §4), and the
reconstructions are column arithmetic.

Shuffle plan: ONE wide exchange. ``pivot_by_label`` hash-partitions the
labeled long table by (cik, fiscal_year) right after the broadcast
label attach (so the exchange carries the bounded label, not the open
lineitem string, and unlabeled rows are already dropped — r13);
HashPartitioning on a key subset
satisfies the pivot-agg's clustering on the full filing key AND the
dedup window's clustering on (cik, fiscal_year), so Catalyst plans both
downstream of the same exchange (measured: 5 -> 3 exchanges, ~2x at
sf0.1). cik cardinality is the broker-dealer population (thousands), so
the partitioning is skew-safe at 100 TB; AQE coalescing still governs
the fanout because the repartition carries no fixed partition count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from x17a5_spark.functions.accounting import relative_error_class

KEY_COLS = ["cik", "name", "filing_date", "fiscal_year"]

TOTAL_ASSETS = "Total assets"
TOTAL_LE = "Total liabilities and shareholder's equity"
TOTAL_L = "Total liabilities"
TOTAL_E = "Total shareholder's equity"


def apply_manual_overrides(predicted: DataFrame, training: DataFrame) -> DataFrame:
    """J5 — coalesce manual labels over model predictions.

    ``predicted``: (lineitem, label); ``training``: (lineitem, label).
    Single broadcast left join replaces the reference's semi/anti split
    + concat (manual_cl_merge).
    """
    manual = training.select(
        "lineitem", F.col("label").alias("manual_label")
    ).dropDuplicates(["lineitem"])
    return predicted.join(F.broadcast(manual), "lineitem", "left").select(
        "lineitem",
        F.coalesce("manual_label", "label").alias("label"),
    )


def pivot_by_label(
    long_df: DataFrame, label_map: DataFrame, labels: list[str]
) -> DataFrame:
    """A3 — per-filing pivot-sum over the bounded label space.

    Null preservation matches pandas ``sum`` over an all-null selection:
    Spark's sum is already null when a (filing, label) group has no
    non-null values, and absent groups surface as null pivot cells.

    The broadcast label attach runs BEFORE the builders' filing-key
    repartition (the exchange sits between this join and the pivot
    agg): the inner join drops unlabeled line items and the projection
    swaps the open lineitem string for the bounded label, so the one
    wide exchange carries fewer, narrower rows (guide §2.3 — project
    and filter before the exchange). Join-then-repartition commutes
    with repartition-then-join, so the pivot is value-identical.
    """
    labeled = long_df.join(F.broadcast(label_map), "lineitem", "inner").select(
        *KEY_COLS, "label", "value"
    )
    # r14: dropping this explicit repartition (to let the pivot partial-
    # aggregate map-side and shuffle combined rows instead of raw long
    # rows, guide §2.3) was A/B'd and REJECTED — e3 1.79 -> 2.83 s,
    # e3l 1.97 -> 2.97 s (median-of-9 interleaved, oracle-green before
    # reverting). With only ~2-4 line items per filing the partial
    # hash-aggregate (wide string keys x 25 decimal accumulators, twice)
    # costs more per row than the narrow labeled exchange it saves, and
    # the keep-first window loses its shared partitioning and adds an
    # exchange of the pivoted table. The one wide exchange stays.
    return (
        labeled.repartition("cik", "fiscal_year")
        .groupBy(*KEY_COLS)
        .pivot("label", labels)
        .agg(F.sum(F.col("value").cast("decimal(27,6)")).cast("double"))
    )


def _row_sum_except(labels: list[str], exclude: list[str]):
    cols = [F.coalesce(F.col(f"`{c}`"), F.lit(0.0)) for c in labels if c not in exclude]
    total = None
    for c in cols:
        total = c if total is None else total + c
    return total if total is not None else F.lit(0.0)


def _dedup_keep_first(df: DataFrame) -> DataFrame:
    """W5 — drop amended filings: keep the earliest filing per
    (cik, fiscal_year), explicit order replacing concat order."""
    w = Window.partitionBy("cik", "fiscal_year").orderBy(
        F.col("filing_date").asc(), F.col("name").asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _relative_error(recon, reported):
    """abs error ratio with the reference's edge behavior: reported null
    -> null (NOT FOUND); reported 0 with nonzero recon -> +inf (GROSS)."""
    err = F.abs(recon - reported) / reported
    return (
        F.when(reported.isNull(), F.lit(None).cast("double"))
        .when((reported == 0) & (recon != 0), F.lit(float("inf")))
        .when((reported == 0) & (recon == 0), F.lit(None).cast("double"))
        .otherwise(err)
    )


def build_structured_assets(
    long_df: DataFrame, label_map: DataFrame, labels: list[str]
) -> DataFrame:
    """Asset-side structured table with identity validation
    (DatabaseStructured.py:222-235)."""
    piv = _dedup_keep_first(pivot_by_label(long_df, label_map, labels))
    recon = _row_sum_except(labels, [TOTAL_ASSETS]).alias("reconstructed_total_assets")
    out = piv.withColumn("reconstructed_total_assets", recon)
    err = _relative_error(
        F.col("reconstructed_total_assets"), F.col(f"`{TOTAL_ASSETS}`")
    )
    return out.withColumn("relative_error", err).withColumn(
        "total_asset_check", relative_error_class(F.col("relative_error"))
    )


def build_structured_liabilities(
    long_df: DataFrame, label_map: DataFrame, labels: list[str]
) -> DataFrame:
    """Liability-side structured table: four reconstruction variants
    (base, less total liabilities, less total equity, less both), best
    (minimum) relative error decides the match class
    (DatabaseStructured.py:241-264)."""
    piv = _dedup_keep_first(pivot_by_label(long_df, label_map, labels))
    base = _row_sum_except(labels, [TOTAL_LE])
    tl = F.coalesce(F.col(f"`{TOTAL_L}`"), F.lit(0.0)) if TOTAL_L in labels else F.lit(0.0)
    te = F.coalesce(F.col(f"`{TOTAL_E}`"), F.lit(0.0)) if TOTAL_E in labels else F.lit(0.0)
    out = (
        piv.withColumn("recon_total_le", base)
        .withColumn("recon_total_le_less_liab", base - tl)
        .withColumn("recon_total_le_less_equity", base - te)
        .withColumn("recon_total_le_less_both", base - tl - te)
    )
    reported = F.col(f"`{TOTAL_LE}`")
    for i, c in enumerate(
        [
            "recon_total_le",
            "recon_total_le_less_liab",
            "recon_total_le_less_equity",
            "recon_total_le_less_both",
        ],
        start=1,
    ):
        out = out.withColumn(f"relative_error{i}", _relative_error(F.col(c), reported))
    best = F.least(
        *[F.col(f"relative_error{i}") for i in range(1, 5)]
    )
    return out.withColumn("relative_error", best).withColumn(
        "total_le_check", relative_error_class(F.col("relative_error"))
    )
