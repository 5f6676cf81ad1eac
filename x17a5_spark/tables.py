"""Parquet table loading for the driver's TPC-H-ish testdata lake.

Tables: region nation customer supplier part orders lineitem events
documents embeddings (see TESTDATA.md). On a production lake these would
be partitioned bronze tables; here each is a single parquet file. The
loader is schema-on-read (parquet carries the schema) so Catalyst gets
full pushdown/pruning through every query in ``__spark_entry__``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at any scale factor the
# engine targets (region/nation are bounded by geography; supplier only
# at test SFs — at 100 TB supplier is NOT broadcast, and queries below
# rely on AQE's size-based choice rather than forcing a hint).
BROADCAST_SAFE = {"region", "nation"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def _load_events(spark: SparkSession, path: str):
    """events.parquet stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects. Read nanos as long
    (``nanosAsLong``) and truncate to microsecond timestamps — the same
    floor-truncation DuckDB applies when it hands TIMESTAMP_NS values to
    a microsecond consumer, so oracle comparisons agree.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
