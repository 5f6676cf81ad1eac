"""Streaming incremental view maintenance — the `foreachBatch` twin of
the batch a19 merge (queries/lakehouse.py): a maintained aggregate view
is updated per micro-batch by merging the batch's delta aggregate into
the stored view, never recomputing from scratch.

Correctness discipline:

* **Associativity** — partial sums live in DECIMAL(27,6) end-to-end
  (functions/compat.py), so view ⊕ delta is bit-identical to a direct
  aggregation over everything ever streamed, regardless of how the
  input was split into micro-batches.
* **Idempotent replay** — `foreachBatch` gives at-least-once epoch
  delivery: after a crash between the sink write and the checkpoint
  commit, the same epoch re-runs. The view stores the last applied
  `epoch` and the merge SKIPS any epoch already applied, upgrading
  at-least-once to exactly-once (the standard idempotent-foreachBatch
  pattern; the reference's analogue is the skip-if-exists re-run ladder,
  run_main.py:66-74).
* **Safe overwrite** — parquet can't be overwritten while a plan still
  lazily reads it, so the merged view is materialized with
  `localCheckpoint` before the overwrite.

At 100 TB the view is aggregate-sized (tiny next to the stream), so the
merge join is broadcast-able and each epoch costs one pass over the
delta plus a view-sized merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter

from x17a5_spark.functions.compat import to_dec

_DEC = "decimal(27,6)"


def read_view(spark, view_path: str) -> DataFrame:
    """The maintained view with the exact decimal cast back to double."""
    v = spark.read.parquet(view_path)
    return v.select(
        *[c for c in v.columns if c not in ("total_dec", "epoch")],
        v["total_dec"].cast("double").alias("total"),
    )


def maintain_sum_view(
    stream_df: DataFrame,
    view_path: str,
    checkpoint: str,
    key_col: str,
    value_col: str,
) -> DataStreamWriter:
    """writeStream writer that maintains (key, n, total) at view_path."""

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = batch_df.groupBy(key_col).agg(
            F.count("*").alias("n"),
            F.sum(to_dec(value_col)).cast(_DEC).alias("total_dec"),
        )
        try:
            base = spark.read.parquet(view_path)
        except Exception:  # first epoch: no view yet
            base = None
        if base is not None:
            if base.agg(F.max("epoch")).first()[0] >= epoch_id:
                return  # replayed epoch: already applied, skip (idempotent)
            b, d = base.alias("b"), delta.alias("d")
            zero = F.lit(0).cast(_DEC)
            merged = b.join(
                d, F.col(f"b.{key_col}") == F.col(f"d.{key_col}"), "full_outer"
            ).select(
                F.coalesce(f"b.{key_col}", f"d.{key_col}").alias(key_col),
                (F.coalesce("b.n", F.lit(0)) + F.coalesce("d.n", F.lit(0))).alias(
                    "n"
                ),
                (F.coalesce("b.total_dec", zero) + F.coalesce("d.total_dec", zero))
                .cast(_DEC)
                .alias("total_dec"),
            )
        else:
            merged = delta
        merged = merged.withColumn("epoch", F.lit(epoch_id))
        # materialize BEFORE overwriting the path the plan reads from
        merged = merged.localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(view_path)

    return (
        stream_df.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
