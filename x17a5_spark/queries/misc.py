"""Remaining inventory operators (SURVEY §2.6 O1, §2.7 U5, §2.8
F13/F14/F15, §2.4 A5): sorts surfaced as ranks, ordered-sequence
reversal, scaling arithmetic, patch-ledger value remap, and the
regression-trend aggregate."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from x17a5_spark.functions.compat import dec_sql, dsum
from x17a5_spark.tables import load_table


# A5 + F16 — yearly aggregate (databaseNetwork.ipynb cell 11:
# groupby('Filing Year').sum()).
def a5_yearly_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(dsum("o_totalprice", "total_revenue"), F.count("*").alias("n_orders"))
    )


A5_SQL = f"""
SELECT year(o_orderdate) AS order_year,
       {dec_sql('o_totalprice')} AS total_revenue,
       count(*) AS n_orders
FROM orders GROUP BY 1
"""


# F15 — linear-regression trend (scipy.linregress at
# databaseNetwork.ipynb cells 5-6) as covariance/variance aggregates
# over the yearly series — no ML library needed for a 1-D trend.
def f15_linreg_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slope/intercept from the closed-form normal equations over exact
    decimal sums — engine-independent, unlike covar_samp's streaming
    co-moments which drift in the last ulps between engines."""
    yearly = a5_yearly_aggregate(spark, sf_dir)
    x = F.col("order_year").cast("double")
    y = F.col("total_revenue")
    agg = yearly.agg(
        F.count("*").cast("double").alias("n"),
        dsum(x, "sx"),
        dsum(y, "sy"),
        dsum(x * y, "sxy"),
        dsum(x * x, "sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return agg.select(
        F.round(slope, 4).alias("slope"),
        F.round(F.col("sy") / F.col("n") - slope * (F.col("sx") / F.col("n")), 4).alias(
            "intercept"
        ),
    )


F15_SQL = f"""
WITH yearly AS (
  SELECT year(o_orderdate) AS order_year,
         {dec_sql('o_totalprice')} AS total_revenue
  FROM orders GROUP BY 1
),
s AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         {dec_sql('CAST(order_year AS DOUBLE)')} AS sx,
         {dec_sql('total_revenue')} AS sy,
         {dec_sql('CAST(order_year AS DOUBLE) * total_revenue')} AS sxy,
         {dec_sql('CAST(order_year AS DOUBLE) * CAST(order_year AS DOUBLE)')} AS sxx
  FROM yearly
)
SELECT round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
       round(sy / n - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * (sx / n), 4)
           AS intercept
FROM s
"""


# F13 + J4 — unit-scale arithmetic through a lookup join (OCRClean.py:
# 738: value * scale; the scale attaches via a broadcast map).
def f13_scaled_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    scales = spark.createDataFrame(
        [("O", 1e3), ("F", 1e6), ("P", 1.0)], ["status", "scale"]
    )
    return (
        orders.join(F.broadcast(scales), F.col("o_orderstatus") == F.col("status"))
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * F.col("scale"), 2).alias("scaled_value"),
            (F.col("o_totalprice") * 0.5).alias("half_weight"),
        )
    )


F13_SQL = """
SELECT o_orderkey,
       round(o_totalprice * CASE o_orderstatus WHEN 'O' THEN 1000.0
                                               WHEN 'F' THEN 1000000.0
                                               ELSE 1.0 END, 2) AS scaled_value,
       o_totalprice * 0.5 AS half_weight
FROM orders
"""


# F14 — idiosyncratic value patches as a patch-table join (OCRClean.py:
# 485-656 idio_chg ledger -> when/coalesce remap, A8-style).
def f14_patch_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    patches = orders.filter(F.col("o_orderkey") % 1000 == 7).select(
        F.col("o_orderkey").alias("patch_key"),
        (F.col("o_totalprice") * 1000).alias("patched_value"),
    )
    return (
        orders.join(F.broadcast(patches), F.col("o_orderkey") == F.col("patch_key"), "left")
        .select(
            "o_orderkey",
            F.coalesce("patched_value", "o_totalprice").alias("final_value"),
            F.col("patched_value").isNotNull().alias("was_patched"),
        )
    )


F14_SQL = """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 1000 = 7 THEN o_totalprice * 1000
            ELSE o_totalprice END AS final_value,
       o_orderkey % 1000 = 7 AS was_patched
FROM orders
"""


# O1 — explicit multi-column sort surfaced as a global rank over a
# *pre-aggregated* (bounded) table: global row_number on raw data is an
# anti-pattern at 100 TB, so the engine ranks after reduction.
def o1_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    by_nation = cust.groupBy("c_nationkey").agg(dsum("c_acctbal", "total_bal"))
    w = Window.orderBy(F.col("total_bal").desc(), F.col("c_nationkey").asc())
    return by_nation.withColumn("rank", F.row_number().over(w))


O1_SQL = f"""
WITH by_nation AS (
  SELECT c_nationkey, {dec_sql('c_acctbal')} AS total_bal
  FROM customer GROUP BY c_nationkey
)
SELECT c_nationkey, total_bal,
       row_number() OVER (ORDER BY total_bal DESC, c_nationkey ASC) AS rank
FROM by_nation
"""


# U5 — ordered-sequence reversal behind a flag (OCRTextract.py:430-431:
# liabilities read before assets -> catDF.reverse()). The order model is
# explicit: collect the ordered sequence, conditionally reverse, emit a
# deterministic string form.
def u5_conditional_reverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    seq = F.array_sort(
        F.collect_list(F.struct(F.col("o_orderdate"), F.col("o_orderkey")))
    )
    keys = F.transform(F.col("seq"), lambda s: s["o_orderkey"].cast("string"))
    reverse_flag = F.col("o_custkey") % 2 == 0
    return (
        orders.groupBy("o_custkey")
        .agg(seq.alias("seq"))
        .select(
            "o_custkey",
            F.concat_ws(
                ",", F.when(reverse_flag, F.reverse(keys)).otherwise(keys)
            ).alias("ordered_keys"),
            F.size("seq").alias("n_orders"),
        )
    )


U5_SQL = """
SELECT o_custkey,
       array_to_string(CASE WHEN o_custkey % 2 = 0
                            THEN list_reverse(list(CAST(o_orderkey AS VARCHAR)
                                             ORDER BY o_orderdate, o_orderkey))
                            ELSE list(CAST(o_orderkey AS VARCHAR)
                                      ORDER BY o_orderdate, o_orderkey) END, ',')
           AS ordered_keys,
       count(*) AS n_orders
FROM orders GROUP BY o_custkey
"""



# U7 — snapshot diff (table reconciliation). Generalizes the
# reference's set-algebra audits (PRESERVE-FOCUS.ipynb cells 5-13,
# new_debugger.ipynb cells 3-11: intersect/except over stage outputs to
# find drops) into the full reconciliation operator: full-outer join
# two snapshots on the key, classify every key as added / removed /
# changed, emit only differences. One key-hash exchange; both sides
# would be bucketed by key in a real lakehouse. The "new" snapshot is
# derived deterministically (drops, balance updates, inserts) so the
# oracle can mirror it closed-form.


def u7_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    old = cust.select(
        F.col("c_custkey").alias("key"), F.col("c_acctbal").alias("bal")
    )
    new = (
        cust.filter(F.col("c_custkey") % 19 != 0)  # removed
        .select(
            F.col("c_custkey").alias("key"),
            F.when(F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 100.0)
            .otherwise(F.col("c_acctbal"))
            .alias("bal"),  # changed
        )
        .unionByName(
            cust.filter(F.col("c_custkey") % 23 == 0).select(
                (F.col("c_custkey") + 5_000_000).alias("key"),
                F.col("c_acctbal").alias("bal"),
            )  # added
        )
    )
    o, n = old.alias("o"), new.alias("n")
    joined = o.join(n, F.col("o.key") == F.col("n.key"), "full_outer")
    status = (
        F.when(F.col("o.key").isNull(), F.lit("added"))
        .when(F.col("n.key").isNull(), F.lit("removed"))
        .when(F.col("o.bal") != F.col("n.bal"), F.lit("changed"))
    )
    return joined.select(
        F.coalesce("o.key", "n.key").alias("key"),
        status.alias("status"),
        F.col("o.bal").alias("old_bal"),
        F.col("n.bal").alias("new_bal"),
    ).filter(F.col("status").isNotNull())


U7_SQL = """
WITH old AS (SELECT c_custkey AS key, c_acctbal AS bal FROM customer),
new AS (
  SELECT c_custkey AS key,
         CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0
              ELSE c_acctbal END AS bal
  FROM customer WHERE c_custkey % 19 <> 0
  UNION ALL
  SELECT c_custkey + 5000000, c_acctbal FROM customer WHERE c_custkey % 23 = 0
)
SELECT COALESCE(o.key, n.key) AS key,
       CASE WHEN o.key IS NULL THEN 'added'
            WHEN n.key IS NULL THEN 'removed'
            WHEN o.bal <> n.bal THEN 'changed' END AS status,
       o.bal AS old_bal, n.bal AS new_bal
FROM old o FULL JOIN new n ON o.key = n.key
WHERE CASE WHEN o.key IS NULL THEN 'added'
           WHEN n.key IS NULL THEN 'removed'
           WHEN o.bal <> n.bal THEN 'changed' END IS NOT NULL
"""


QUERIES = {
    "a5_yearly_aggregate": a5_yearly_aggregate,
    "f13_scaled_values": f13_scaled_values,
    "f14_patch_ledger": f14_patch_ledger,
    "f15_linreg_trend": f15_linreg_trend,
    "o1_global_rank": o1_global_rank,
    "u5_conditional_reverse": u5_conditional_reverse,
    "u7_snapshot_diff": u7_snapshot_diff,
}

ORACLES = {
    "a5_yearly_aggregate": A5_SQL,
    "f13_scaled_values": F13_SQL,
    "f14_patch_ledger": F14_SQL,
    "f15_linreg_trend": F15_SQL,
    "o1_global_rank": O1_SQL,
    "u5_conditional_reverse": U5_SQL,
    "u7_snapshot_diff": U7_SQL,
}
