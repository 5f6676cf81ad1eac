"""Event-time windowing over the ``events`` table (SURVEY.md §2.9).

The same ``window()`` / ``session_window()`` expressions run identically
under batch and Structured Streaming; the batch forms are declared here
(oracle-checkable), and the streaming forms (readStream + watermark +
Trigger.AvailableNow) are exercised in x17a5_spark/streaming/ and its
tests. Tumbling/sliding windows shuffle once on (window, key); session
windows additionally merge per-key state — all built-in operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from x17a5_spark.functions.compat import dec_sql, dsum
from x17a5_spark.tables import load_table


# ST1 — tumbling event-time window (1 hour).
def st1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value", "total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


ST1_SQL = f"""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, {dec_sql('value')} AS total_value
FROM events GROUP BY 1, 2
"""


# ST2 — sliding window (1 hour length, 30 minute slide): every event
# belongs to exactly 2 windows; the oracle enumerates both bucket starts.
def st2_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), dsum("value", "total_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


ST2_SQL = f"""
WITH grid AS (
  SELECT value, unnest([
           make_timestamp(CAST((floor(epoch(ts) / 1800) * 1800 - 1800) AS BIGINT) * 1000000),
           make_timestamp(CAST((floor(epoch(ts) / 1800) * 1800) AS BIGINT) * 1000000)
         ]) AS window_start
  FROM events
)
SELECT window_start, count(*) AS n_events, {dec_sql('value')} AS total_value
FROM grid GROUP BY 1
"""


# ST3 — session window (10 minute gap) per user. Batch session_window
# has gaps-and-islands semantics: a new session starts when the gap to
# the previous event is >= the timeout; window end = last_ts + gap.
def st3_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), dsum("value", "total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


ST3_SQL = f"""
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL 10 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
sessions AS (
  SELECT user_id, ts, value,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM marked
)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL 10 MINUTE AS session_end,
       count(*) AS n_events, {dec_sql('value')} AS total_value
FROM sessions GROUP BY user_id, sess_id
"""


QUERIES = {
    "st1_tumbling_window": st1_tumbling_window,
    "st2_sliding_window": st2_sliding_window,
    "st3_session_window": st3_session_window,
}

ORACLES = {
    "st1_tumbling_window": ST1_SQL,
    "st2_sliding_window": ST2_SQL,
    "st3_session_window": ST3_SQL,
}
