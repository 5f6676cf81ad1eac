"""Window-function layer (SURVEY.md §2.5 W1-W6) phrased over the
driver tables: every query partitions by a key and orders by an explicit,
total order (date + key tiebreak) — the engine's ``row_idx`` discipline.

Scale note: all windows partition by a high-cardinality key (customer /
user), so state per partition stays tiny and the shuffle is a single
hash exchange on the partition key — no global sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from x17a5_spark.tables import load_table

# Total order within a customer's order history (ties broken by key so
# results are deterministic — SURVEY §7 hard part 1). Built lazily:
# Column objects need an active SparkContext.
def _ord() -> list:
    return [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()]


_ORD_SQL = "o_orderdate ASC, o_orderkey ASC"


# W1 (declared engine form) — running sum over an ordered frame; the
# reference's lookback-sum scan (DatabaseUnstructured.py:108-184) uses
# frames like rowsBetween(-j,-1); both frames exercised here.
def w1_running_and_lookback(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(*_ord())
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lookback = w.rowsBetween(-3, -1)
    price_dec = F.col("o_totalprice").cast("decimal(27,6)")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(price_dec).over(running).cast("double").alias("running_total"),
        F.sum(price_dec).over(lookback).cast("double").alias("lookback3_sum"),
    )


W1_SQL = f"""
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(27,6)))
            OVER (PARTITION BY o_custkey ORDER BY {_ORD_SQL}
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_total,
       CAST(sum(CAST(o_totalprice AS DECIMAL(27,6)))
            OVER (PARTITION BY o_custkey ORDER BY {_ORD_SQL}
                  ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS DOUBLE)
           AS lookback3_sum
FROM orders
"""


# W2 — first-match position vs group size (OCRTextract.py:344:
# np.argmax of a predicate, accepted only if in the top half).
def w2_first_match_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    with_pos = events.withColumn("pos", F.row_number().over(w))
    return (
        with_pos.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "purchase", F.col("pos"))).alias(
                "first_purchase_pos"
            ),
            F.count("*").alias("n_events"),
        )
        .withColumn(
            "in_top_half",
            F.when(
                F.col("first_purchase_pos").isNotNull(),
                F.col("first_purchase_pos") <= F.col("n_events") / 2,
            ),
        )
    )


W2_SQL = """
WITH pos AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS pos
  FROM events
)
SELECT user_id,
       min(CASE WHEN event_type = 'purchase' THEN pos END) AS first_purchase_pos,
       count(*) AS n_events,
       CASE WHEN min(CASE WHEN event_type = 'purchase' THEN pos END) IS NOT NULL
            THEN min(CASE WHEN event_type = 'purchase' THEN pos END) <= count(*) / 2
       END AS in_top_half
FROM pos GROUP BY user_id
"""


# W3 — split-point detection: last index matching a predicate per group
# (DatabaseSplits.py:53-80: last 'assets' / 'liabilit' match bounds).
def w3_last_match_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    with_pos = events.withColumn("pos", F.row_number().over(w))
    return with_pos.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "click", F.col("pos"))).alias(
            "last_click_pos"
        ),
        F.max(F.when(F.col("event_type") == "error", F.col("pos"))).alias(
            "last_error_pos"
        ),
    )


W3_SQL = """
WITH pos AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS pos
  FROM events
)
SELECT user_id,
       max(CASE WHEN event_type = 'click' THEN pos END) AS last_click_pos,
       max(CASE WHEN event_type = 'error' THEN pos END) AS last_error_pos
FROM pos GROUP BY user_id
"""


# W4 — previous-row reference (OCRClean.py:177-193: borrow the prior
# row's value when the current one is missing).
def w4_lag_previous(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(*_ord())
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        (F.col("o_totalprice") - F.lag("o_totalprice", 1).over(w)).alias("price_delta"),
    )


W4_SQL = f"""
SELECT o_custkey, o_orderkey, o_totalprice,
       lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY {_ORD_SQL}) AS prev_price,
       o_totalprice - lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY {_ORD_SQL})
           AS price_delta
FROM orders
"""


# W5 — dedup keep-first under an explicit order (DatabaseStructured.py:
# 225,241: drop_duplicates(['CIK','Filing Year'], keep='first')).
def w5_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    fiscal = F.year("o_orderdate").alias("order_year")
    w = Window.partitionBy("o_custkey", F.year("o_orderdate")).orderBy(*_ord())
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", fiscal, "o_orderkey", "o_totalprice")
    )


W5_SQL = f"""
SELECT o_custkey, year(o_orderdate) AS order_year, o_orderkey, o_totalprice
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey, year(o_orderdate)
                               ORDER BY {_ORD_SQL}) AS rn
  FROM orders
) WHERE rn = 1
"""


# W6 — carry-forward last non-null per key (OCRClean.py:410-411 +
# run_ocr.py:96-99: prior filing's unit scale reused for the same CIK).
def w6_carry_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gated = F.when(F.col("value") >= 50.0, F.col("value"))
    return events.select(
        "user_id",
        "event_id",
        gated.alias("gated_value"),
        F.last(gated, ignorenulls=True).over(w).alias("carried_value"),
    )


W6_SQL = """
SELECT user_id, event_id,
       CASE WHEN value >= 50.0 THEN value END AS gated_value,
       last_value(CASE WHEN value >= 50.0 THEN value END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_value
FROM events
"""


# --------------------------------------------------------------------------
# Window-budget composites (driver hash-checks the first 50 registry
# entries): each folds two §2 window ops that share the same partition
# key + order into ONE window pass — also strictly better engineering
# (one exchange + one sort instead of two queries' worth).


# C3 — W2 (first-match position) + W3 (last-match split point) over the
# same per-user position CTE.
def c3_match_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    with_pos = events.withColumn("pos", F.row_number().over(w))
    first_purchase = F.min(
        F.when(F.col("event_type") == "purchase", F.col("pos"))
    ).alias("first_purchase_pos")
    return (
        with_pos.groupBy("user_id")
        .agg(
            first_purchase,
            F.count("*").alias("n_events"),
            F.max(F.when(F.col("event_type") == "click", F.col("pos"))).alias(
                "last_click_pos"
            ),
            F.max(F.when(F.col("event_type") == "error", F.col("pos"))).alias(
                "last_error_pos"
            ),
        )
        .withColumn(
            "in_top_half",
            F.when(
                F.col("first_purchase_pos").isNotNull(),
                F.col("first_purchase_pos") <= F.col("n_events") / 2,
            ),
        )
    )


C3_SQL = """
WITH pos AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS pos
  FROM events
)
SELECT user_id,
       min(CASE WHEN event_type = 'purchase' THEN pos END) AS first_purchase_pos,
       count(*) AS n_events,
       max(CASE WHEN event_type = 'click' THEN pos END) AS last_click_pos,
       max(CASE WHEN event_type = 'error' THEN pos END) AS last_error_pos,
       CASE WHEN min(CASE WHEN event_type = 'purchase' THEN pos END) IS NOT NULL
            THEN min(CASE WHEN event_type = 'purchase' THEN pos END) <= count(*) / 2
       END AS in_top_half
FROM pos GROUP BY user_id
"""


# C4 — W1 (running + lookback frames) + W4 (lag previous-row) over the
# same per-customer order window.
def c4_sequence_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(*_ord())
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lookback = w.rowsBetween(-3, -1)
    price_dec = F.col("o_totalprice").cast("decimal(27,6)")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.sum(price_dec).over(running).cast("double").alias("running_total"),
        F.sum(price_dec).over(lookback).cast("double").alias("lookback3_sum"),
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        (F.col("o_totalprice") - F.lag("o_totalprice", 1).over(w)).alias("price_delta"),
    )


C4_SQL = f"""
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(sum(CAST(o_totalprice AS DECIMAL(27,6)))
            OVER (PARTITION BY o_custkey ORDER BY {_ORD_SQL}
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_total,
       CAST(sum(CAST(o_totalprice AS DECIMAL(27,6)))
            OVER (PARTITION BY o_custkey ORDER BY {_ORD_SQL}
                  ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS DOUBLE)
           AS lookback3_sum,
       lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY {_ORD_SQL}) AS prev_price,
       o_totalprice - lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY {_ORD_SQL})
           AS price_delta
FROM orders
"""



# W8 — TIME-range rolling aggregate (rangeBetween, not rowsBetween):
# per user, the trailing-24h event count and value sum at every event.
# The range frame is over unix SECONDS (integer on both engines — no
# sub-second tie ambiguity; Spark floors parquet ns to µs, both floor
# µs to s identically). Scale shape: user-keyed exchange + per-user
# ordered frame scan; the frame is bounded by time, so a burst of K
# events in 24h costs O(K) per row in the worst case but the partition
# never exceeds one user's history — the standard sessionized-rolling
# shape at 100 TB.

W8_WINDOW_SEC = 24 * 3600


def w8_rolling_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x17a5_spark.functions.compat import to_dec

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "value",
    )
    sec = (F.col("us") / 1_000_000).cast("long")
    base = ev.select("event_id", "user_id", sec.alias("sec"), "value")
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-(W8_WINDOW_SEC - 1), 0)
    )
    return base.select(
        "event_id",
        "user_id",
        "sec",
        F.count("*").over(w).alias("n_24h"),
        F.sum(to_dec("value")).over(w).cast("double").alias("value_24h"),
    )


W8_SQL = f"""
WITH base AS (
  SELECT event_id, user_id,
         CAST(floor(CAST(epoch_ns(ts) // 1000 AS BIGINT) / 1000000)
              AS BIGINT) AS sec,
         value
  FROM events
)
SELECT event_id, user_id, sec,
       count(*) OVER w AS n_24h,
       CAST(sum(CAST(value AS DECIMAL(27,6))) OVER w AS DOUBLE) AS value_24h
FROM base
WINDOW w AS (PARTITION BY user_id ORDER BY sec
             RANGE BETWEEN {W8_WINDOW_SEC - 1} PRECEDING AND CURRENT ROW)
"""



# W9 — rolling median (order-statistic window): per user, the median of
# the trailing 25 event values — robust stream smoothing that a rolling
# mean can't do (one outlier drags the mean; the median shrugs). Spark
# evaluates `percentile(v, 0.5)` as a window aggregate with the same
# linear interpolation as DuckDB's `quantile_cont`, so values match
# bit-for-bit after rounding. Per-user frames only — the order
# statistic runs inside each user's partition, never globally.


def w9_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-24, 0)
    )
    med = F.expr("percentile(value, 0.5)").over(w)
    return ev.select(
        "event_id",
        "user_id",
        F.round(med, 6).alias("rolling_median"),
        F.round(F.abs(F.col("value") - med), 6).alias("abs_dev"),
    )


W9_SQL = """
SELECT event_id, user_id,
       round(quantile_cont(value, 0.5) OVER w, 6) AS rolling_median,
       round(abs(value - quantile_cont(value, 0.5) OVER w), 6) AS abs_dev
FROM events
-- order by the us-floored timestamp: Spark's parquet reader floors
-- TIMESTAMP_NS to micros, so sub-us ties must resolve identically
WINDOW w AS (PARTITION BY user_id
             ORDER BY CAST(epoch_ns(ts) // 1000 AS BIGINT), event_id
             ROWS BETWEEN 24 PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# W10 — fixed-lag EWMA (exponentially weighted moving average): the
# signal-smoothing window every monitoring/trading pipeline runs. The
# textbook recursive EWMA is sequential; the 100 TB-safe spelling
# truncates the tail at L=24 lags (weight (1-a)^24 ~ 0.008 at a=0.2 —
# below any 6-decimal observable) and evaluates the weighted sum as 24
# lag() terms over one per-key window — pure codegen, no kernel, no
# recursion. The weights are PYTHON-COMPUTED literals rounded to 12
# decimals and embedded identically in both engines, so no pow() runs
# at query time in either.
# ---------------------------------------------------------------------------

W10_ALPHA = 0.2
W10_LAGS = 24
_W10_WEIGHTS = [
    round(W10_ALPHA * (1 - W10_ALPHA) ** j, 12) for j in range(W10_LAGS)
]


def w10_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "value",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    # sum of available weighted lags, renormalized by the weight mass
    # actually present (standard "adjusted" EWMA start-up)
    num = None
    den = None
    for j, wt in enumerate(_W10_WEIGHTS):
        term = F.lag("value", j).over(w) * F.lit(wt)
        mass = F.when(F.lag("value", j).over(w).isNotNull(), F.lit(wt)).otherwise(
            F.lit(0.0)
        )
        cterm = F.coalesce(term, F.lit(0.0))
        num = cterm if num is None else num + cterm
        den = mass if den is None else den + mass
    return ev.select(
        "event_id",
        "user_id",
        F.round(num / den, 6).alias("ewma"),
    )


def _w10_sql() -> str:
    num = " + ".join(
        f"coalesce(lag(value, {j}) OVER w * {wt!r}, 0.0)"
        for j, wt in enumerate(_W10_WEIGHTS)
    )
    den = " + ".join(
        f"CASE WHEN lag(value, {j}) OVER w IS NOT NULL THEN {wt!r} ELSE 0.0 END"
        for j, wt in enumerate(_W10_WEIGHTS)
    )
    return f"""
SELECT event_id, user_id,
       round(({num}) / ({den}), 6) AS ewma
FROM (SELECT event_id, user_id,
             CAST(epoch_ns(ts) // 1000 AS BIGINT) AS us, value
      FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
"""


W10_SQL = _w10_sql()


QUERIES = {
    "w1_running_and_lookback": w1_running_and_lookback,
    "w2_first_match_position": w2_first_match_position,
    "w3_last_match_split": w3_last_match_split,
    "w4_lag_previous": w4_lag_previous,
    "w5_dedup_keep_first": w5_dedup_keep_first,
    "w6_carry_forward": w6_carry_forward,
    "c3_match_positions": c3_match_positions,
    "c4_sequence_scan": c4_sequence_scan,
    "w8_rolling_time_window": w8_rolling_time_window,
    "w9_rolling_median": w9_rolling_median,
    "w10_ewma": w10_ewma,
}

ORACLES = {
    "c3_match_positions": C3_SQL,
    "c4_sequence_scan": C4_SQL,
    "w1_running_and_lookback": W1_SQL,
    "w2_first_match_position": W2_SQL,
    "w3_last_match_split": W3_SQL,
    "w4_lag_previous": W4_SQL,
    "w5_dedup_keep_first": W5_SQL,
    "w6_carry_forward": W6_SQL,
    "w8_rolling_time_window": W8_SQL,
    "w9_rolling_median": W9_SQL,
    "w10_ewma": W10_SQL,
}
