"""T28 — moments quantile sketch: estimation accuracy against the true
quantile, and the mergeability property that makes it 100-TB-safe
(sketch(A ∪ B) = sketch(A) + sketch(B), plain addition)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_t28_p90_estimate_close_to_true_quantile(spark):
    from x17a5_spark.queries.textops import t28_moments_sketch
    from x17a5_spark.tables import load_table

    rows = {r["source"]: r for r in t28_moments_sketch(spark, SF).collect()}
    assert rows
    docs = load_table(spark, SF, "documents").select(
        "source",
        F.size(
            F.filter(F.split(F.trim(F.lower("text")), r"\s+"), lambda t: t != "")
        ).alias("x"),
    )
    for src, grp in (
        docs.groupBy("source")
        .agg(F.expr("percentile(x, 0.9)").alias("p90"), F.stddev_pop("x").alias("sd"))
        .toPandas()
        .set_index("source")
        .iterrows()
    ):
        est = rows[src]["est_p90"]
        # normal approximation: within one population stddev of truth
        assert abs(est - grp["p90"]) <= max(grp["sd"], 1.0), (src, est, grp["p90"])


def test_t28_sketch_is_mergeable_by_addition(spark):
    """Power sums over a split corpus add to the full-corpus sums —
    the property that lets 1000 executors each sketch locally and merge
    with a 7-number reduce."""
    from x17a5_spark.tables import load_table

    docs = load_table(spark, SF, "documents").select(
        "doc_id",
        F.size(
            F.filter(F.split(F.trim(F.lower("text")), r"\s+"), lambda t: t != "")
        ).cast("decimal(9,0)").alias("x"),
    )

    def sums(df):
        r = df.agg(
            F.count("*").alias("n"),
            F.sum("x").cast("decimal(38,0)").alias("s1"),
            F.sum((F.col("x") * F.col("x")).cast("decimal(19,0)"))
            .cast("decimal(38,0)")
            .alias("s2"),
        ).collect()[0]
        return int(r["n"]), int(r["s1"]), int(r["s2"])

    full = sums(docs)
    a = sums(docs.filter(F.col("doc_id") % 2 == 0))
    b = sums(docs.filter(F.col("doc_id") % 2 == 1))
    assert tuple(x + y for x, y in zip(a, b)) == full
    assert a[0] > 0 and b[0] > 0


def test_t28_std_matches_exact(spark):
    from x17a5_spark.queries.textops import t28_moments_sketch
    from x17a5_spark.tables import load_table

    rows = {r["source"]: r for r in t28_moments_sketch(spark, SF).collect()}
    docs = load_table(spark, SF, "documents").select(
        "source",
        F.size(
            F.filter(F.split(F.trim(F.lower("text")), r"\s+"), lambda t: t != "")
        ).alias("x"),
    )
    exact = (
        docs.groupBy("source")
        .agg(F.stddev_pop("x").alias("sd"), F.avg("x").alias("mean"))
        .collect()
    )
    for r in exact:
        got = rows[r["source"]]
        assert math.isclose(got["est_mean"], r["mean"], rel_tol=1e-6)
        assert math.isclose(got["est_std"], r["sd"], rel_tol=1e-6, abs_tol=1e-6)
