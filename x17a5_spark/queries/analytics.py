"""Beyond-reference analytics surface: exact percentiles, GROUPING
SETS, unpivot (wide→long, the inverse of A2 and the engine's canonical
direction), the full ranking-function family, and an as-of join.

The as-of join is the canonical "operator Spark lacks" case: rather
than a quadratic range join, the engine sorts once per key and carries
the last left-side row forward with an ignore-nulls window — O(n log n)
per key, one shuffle, no range explosion. The oracle is DuckDB's native
ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from x17a5_spark.functions.compat import dec_sql, dsum
from x17a5_spark.tables import load_table


# A14 — exact interpolated percentiles (Spark `percentile` == DuckDB
# `quantile_cont`).
def a14_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.max("o_totalprice"), 4).alias("p100"),
    )


A14_SQL = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       round(max(o_totalprice), 4) AS p100
FROM orders GROUP BY o_orderpriority
"""


# A15 — GROUPING SETS with grouping_id disambiguation (free in Catalyst;
# SQL API surface).
def a15_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_li_gs")
    return spark.sql(
        f"""
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               grouping(l_returnflag) + 2 * grouping(l_linestatus) AS gid,
               {dec_sql('l_quantity')} AS sum_qty
        FROM _li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                (l_returnflag, l_linestatus))
        """
    )


A15_SQL = f"""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       grouping(l_returnflag) + 2 * grouping(l_linestatus) AS gid,
       {dec_sql('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                        (l_returnflag, l_linestatus))
"""


# A16 — unpivot wide→long: the inverse of A2 and the engine's canonical
# normalization step (SURVEY §1.3: long form is the model at rest).
def a16_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "measure",
        "measure_value",
    )


A16_SQL = """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS measure_value FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
"""


# W7 — the full ranking family over one deterministic order.
def w7_ranking_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return cust.select(
        "c_mktsegment",
        "c_custkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


W7_SQL = """
SELECT c_mktsegment, c_custkey,
       row_number() OVER w AS rn,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       ntile(4) OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
"""


# J8 — as-of join: for each purchase event, the user's most recent
# click at or before the purchase time. Engine form: union-tag + sort
# once per user + ignore-nulls carry-forward — no range join.
def j8_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    ev = events.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        # at equal ts the click sorts first, so '>=' semantics hold
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("_kind"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("_kind").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    carried = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.last(click_ts, ignorenulls=True).over(w).alias("last_click_ts"),
        F.last(click_id, ignorenulls=True).over(w).alias("last_click_id"),
    )
    return carried.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "last_click_ts",
        "last_click_id",
    )


J8_SQL = """
SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
       c.ts AS last_click_ts, c.event_id AS last_click_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


# A18 — equi-width histogram (the profiling/EDA shape behind every
# data-quality dashboard). Bucket assignment is a pure codegen
# expression evaluated at the scan — floor((x - lo) / step) clamped to
# [0, nb) — so the only exchange is the 24-row final aggregation; at
# 100 TB the map-side partial aggregation reduces each partition to at
# most nb rows before the shuffle. Totals go through exact DECIMAL
# (functions/compat.py) so the hash is partition-order-independent.

A18_LO, A18_STEP, A18_NB = 0.0, 25_000.0, 24


def a18_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.lit(A18_NB - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col("o_totalprice") - A18_LO) / A18_STEP).cast("int"),
        ),
    )
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("n"), dsum("o_totalprice", "total"))
        .select(
            "bucket",
            (F.lit(A18_LO) + F.col("bucket") * A18_STEP).alias("bucket_lo"),
            "n",
            "total",
        )
    )


A18_SQL = f"""
SELECT bucket,
       {A18_LO} + bucket * {A18_STEP} AS bucket_lo,
       count(*) AS n,
       {dec_sql("o_totalprice")} AS total
FROM (
  SELECT o_totalprice,
         least({A18_NB - 1},
               greatest(0, CAST(floor((o_totalprice - {A18_LO}) / {A18_STEP})
                               AS INT))) AS bucket
  FROM orders
)
GROUP BY bucket
"""


QUERIES = {
    "a14_percentiles": a14_percentiles,
    "a15_grouping_sets": a15_grouping_sets,
    "a16_unpivot": a16_unpivot,
    "a18_histogram": a18_histogram,
    "w7_ranking_family": w7_ranking_family,
    "j8_asof_join": j8_asof_join,
}

ORACLES = {
    "a14_percentiles": A14_SQL,
    "a15_grouping_sets": A15_SQL,
    "a16_unpivot": A16_SQL,
    "a18_histogram": A18_SQL,
    "w7_ranking_family": W7_SQL,
    "j8_asof_join": J8_SQL,
}
