"""Semantic invariants for the KMV sketch (t12) and the rollup cascade
(st5): the scale-path shortcuts must change nothing about the answer."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from x17a5_spark.queries.streaming import st5_rollup_cascade
from x17a5_spark.queries.textops import KMV_K, t12_kmv_distinct
from x17a5_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_rollup_cascade_equals_direct_aggregation(spark):
    """The hourly->daily cascade must equal aggregating raw events
    directly (exact-decimal totals make re-aggregation lossless)."""
    cascade = {
        (r["day_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in st5_rollup_cascade(spark, SF).collect()
    }
    direct = {
        (r["day_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in (
            load_table(spark, SF, "events")
            .groupBy(
                F.date_trunc("day", "ts").alias("day_start"), "event_type"
            )
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.col("value").cast("decimal(27,6)"))
                .cast("double")
                .alias("total_value"),
            )
            .collect()
        )
    }
    assert cascade == direct


def test_kmv_prefilter_does_not_change_the_estimate(spark, tmp_path):
    """With n >> 4k the u <= 4k/n pre-filter drops most hashes; the
    k-th smallest — and therefore the estimate — must be unchanged,
    and the estimate must land near the truth."""
    n = 2000
    rows = [(i, f"unique document text number {i}", "en", "s0", 0) for i in range(n)]
    out_dir = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(out_dir + "/documents.parquet")

    got = t12_kmv_distinct(spark, out_dir).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_exact"] == n

    # unfiltered reference: rank ALL normalized-fingerprint hashes
    us = sorted(
        int(
            hashlib.md5(
                " ".join(f"unique document text number {i}".split()).lower().encode()
            ).hexdigest()[:15],
            16,
        )
        / float(1 << 60)
        for i in range(n)
    )
    expected = round((KMV_K - 1) / us[KMV_K - 1], 4)
    assert r["kmv_estimate"] == expected
    # sketch quality: within ~3/sqrt(k) relative error of the truth
    assert abs(r["kmv_estimate"] - n) / n < 0.75
