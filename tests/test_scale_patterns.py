"""Scale-pattern tests: bucketed co-located joins (no shuffle in the
plan), foreachBatch dual-write (good rows + error ledger in one epoch),
and broadcast-join plan assertions — the physical-layout story behind
SURVEY §4."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from x17a5_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """bucketBy(8, key) on both sides -> sort-merge join with no
    Exchange: the 100 TB co-location strategy for repeated filing-key
    joins."""
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
           .mode("overwrite").saveAsTable("b_orders"))
    (li.withColumnRenamed("l_orderkey", "o_orderkey")
       .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .mode("overwrite").saveAsTable("b_lineitem"))
    joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
    # disable broadcast so the join strategy decision is about bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # buckets already co-located
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
    _ = warehouse, os


def test_foreachbatch_dual_write(spark, tmp_path):
    """S10 streaming form: one epoch writes good rows and the error
    ledger to separate sinks exactly once."""
    src = os.path.join(tmp_path, "src")
    good_dir = os.path.join(tmp_path, "good")
    err_dir = os.path.join(tmp_path, "errors")
    df = spark.createDataFrame(
        [("1", "ok-row", None), ("2", None, "OCR failed"), ("3", "ok-too", None)],
        "cik string, payload string, error string",
    )
    df.write.parquet(src)

    def dual_write(batch_df, epoch_id):
        batch_df.filter(F.col("error").isNull()).drop("error").write.mode(
            "append"
        ).parquet(good_dir)
        batch_df.filter(F.col("error").isNotNull()).select("cik", "error").write.mode(
            "append"
        ).parquet(err_dir)

    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        stream.writeStream.foreachBatch(dual_write)
        .option("checkpointLocation", os.path.join(tmp_path, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    good = spark.read.parquet(good_dir)
    errors = spark.read.parquet(err_dir)
    assert {r["cik"] for r in good.collect()} == {"1", "3"}
    assert errors.count() == 1 and errors.first()["error"] == "OCR failed"


def test_broadcast_hint_respected(spark):
    nation = load_table(spark, SF, "nation")
    cust = load_table(spark, SF, "customer")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """A fact table partitioned on the join key must get a runtime
    dynamicpruning subquery at its scan when joined to a filtered dim —
    the partition-pruning half of the 100 TB story (the other half,
    static PartitionFilters, is asserted above)."""
    fact_dir = os.path.join(tmp_path, "fact_part")
    orders = load_table(spark, SF, "orders")
    orders.write.partitionBy("o_orderpriority").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    dim = spark.createDataFrame(
        [("1-URGENT", "keep")], ["o_orderpriority", "tag"]
    ).filter(F.col("tag") == "keep")
    joined = fact.join(dim, "o_orderpriority").groupBy("tag").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # and the result only reads the one partition
    assert joined.first()["count"] == orders.filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).count()
