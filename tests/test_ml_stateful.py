"""Tests for X8 clustering (TF-IDF KMeans, LDA, IVF assignment) and the
applyInPandasWithState streaming dedup operator."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from x17a5_spark.ml.clustering import cluster_lineitems, ivf_assign, topic_model_lineitems
from x17a5_spark.streaming.stateful import streaming_dedup_first
from x17a5_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_cluster_lineitems(spark):
    texts = spark.createDataFrame(
        [(t,) for t in [
            "Cash and cash equivalents", "Cash on deposit", "Cash balances",
            "Receivables from brokers", "Receivables from customers",
            "Receivable from clearing organizations",
        ] * 4],
        ["lineitem"],
    )
    out = cluster_lineitems(texts, k=2).toPandas()
    # identical strings always co-cluster; the tiny corpus makes the
    # cash/receivables boundary seed-dependent, so assert structure
    # (both clusters used, duplicates assigned consistently) rather
    # than a specific split
    assert out.cluster.nunique() == 2
    consistency = out.groupby("lineitem").cluster.nunique()
    assert (consistency == 1).all()


def test_lda_topics(spark):
    texts = spark.createDataFrame(
        [("cash equivalents deposits",), ("receivables brokers dealers",)] * 10,
        ["lineitem"],
    )
    model, transformed = topic_model_lineitems(texts, k=2)
    assert transformed.select("topicDistribution").count() == 20


def test_ivf_assignment_partitions_space(spark):
    emb = load_table(spark, SF, "embeddings")
    out = ivf_assign(emb, k=4)
    cells = out.groupBy("ivf_cell").count().toPandas()
    assert set(cells.ivf_cell) <= {0, 1, 2, 3}
    assert len(cells) >= 2  # space actually partitioned
    assert cells["count"].sum() == emb.count()


def test_streaming_dedup_first(spark, tmp_path):
    src = os.path.join(tmp_path, "events_src")
    events = load_table(spark, SF, "events").select(
        (F.col("event_id") % 50).cast("string").alias("dedup_key"), "ts"
    )
    events.write.parquet(src)

    stream = spark.readStream.schema("dedup_key string, ts timestamp").parquet(src)
    out = streaming_dedup_first(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM dedup_out").toPandas()
    # one row per distinct key, first_ts = true minimum ts for that key
    assert len(got) == 50
    expected = (
        events.groupBy("dedup_key")
        .agg(F.min("ts").alias("first_ts"), (F.count("*") - 1).alias("n_dup"))
        .toPandas()
        .set_index("dedup_key")
    )
    for _, row in got.iterrows():
        assert row["first_ts"] == expected.loc[row["dedup_key"], "first_ts"]
