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


def test_streaming_ttl_dedup_matches_batch_twin(spark, tmp_path):
    """The applyInPandasWithState TTL dedup must emit exactly the kept
    set of its declarative batch twin (st8) when micro-batches arrive
    in event-time order — state carries the chain across batches."""
    import os

    from x17a5_spark.queries.streaming import ST8_TTL_US, st8_ttl_dedup
    from x17a5_spark.streaming.stateful import streaming_ttl_dedup

    src = os.path.join(tmp_path, "ttl_src")
    ev = load_table(spark, SF, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    # three time-ordered chunks -> three micro-batches, so the TTL
    # chain must survive state hand-off, not just within-batch sorting
    lo, hi = ev.agg(F.min("us"), F.max("us")).first()
    step = (hi - lo) // 3 + 1
    for i in range(3):
        ev.filter(
            (F.col("us") >= lo + i * step) & (F.col("us") < lo + (i + 1) * step)
        ).coalesce(1).write.parquet(os.path.join(src, f"chunk={i}"))

    stream = (
        spark.readStream.schema(
            "user_id long, event_type string, event_id long, us long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/chunk=*")
    )
    q = (
        streaming_ttl_dedup(stream, ST8_TTL_US)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ttl_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.event_type, r.kept_event_id, r.kept_us)
        for r in spark.sql("SELECT * FROM ttl_out").collect()
    }
    want = {
        (r.user_id, r.event_type, r.kept_event_id, r.kept_us)
        for r in st8_ttl_dedup(spark, SF).collect()
    }
    assert got == want
