"""F9 marker truncation + F19/F20 map functions (SURVEY §2.8)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from x17a5_spark.tables import load_table


# F9 — marker truncation (OCRClean.py:453-483 jpm_check: find the
# "following table" marker row, drop it and everything below): W2-style
# first-match position + positional filter (P8).
def f9_marker_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rows = li.select(
        F.col("l_orderkey").cast("string").alias("cik"),
        (F.col("l_linenumber") - 1).alias("row_idx"),
        F.when(
            F.col("l_linenumber") == 4, F.lit("(a) The following table explains")
        )
        .otherwise(F.concat(F.lit("Item "), F.col("l_linenumber")))
        .alias("lineitem"),
    )
    w = Window.partitionBy("cik")
    marker_pos = F.min(
        F.when(F.col("lineitem").rlike(r"\(a\) The following table"), F.col("row_idx"))
    ).over(w)
    return (
        rows.withColumn("_cut", marker_pos)
        .filter(F.col("_cut").isNull() | (F.col("row_idx") < F.col("_cut")))
        .select("cik", "row_idx", "lineitem")
    )


F9_SQL = """
WITH rows_t AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS cik, l_linenumber - 1 AS row_idx,
         CASE WHEN l_linenumber = 4 THEN '(a) The following table explains'
              ELSE 'Item ' || CAST(l_linenumber AS VARCHAR) END AS lineitem
  FROM lineitem
),
cuts AS (
  SELECT cik,
         min(CASE WHEN regexp_matches(lineitem, '\\(a\\) The following table')
                  THEN row_idx END) AS cut
  FROM rows_t GROUP BY cik
)
SELECT r.cik, r.row_idx, r.lineitem
FROM rows_t r JOIN cuts c ON r.cik = c.cik
WHERE c.cut IS NULL OR r.row_idx < c.cut
"""


# F19/F20/F21 — map type surface: parse the events props JSON into a
# typed map, then map_contains_key / element_at / map_keys
# (reference: run_ocr.py:138,170 dict lookups; OCRClean.py:269-276
# key iteration).
def f19_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    m = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    return events.select(
        "event_id",
        m.alias("m"),
    ).select(
        "event_id",
        F.map_contains_key("m", "k").alias("has_k"),
        F.element_at("m", "k").alias("k_value"),
        F.size(F.map_keys("m")).alias("n_keys"),
        F.concat_ws(",", F.array_sort(F.map_keys("m"))).alias("keys_joined"),
    )


F19_SQL = """
SELECT event_id,
       json_extract(props, '$.k') IS NOT NULL AS has_k,
       CAST(props->>'$.k' AS BIGINT) AS k_value,
       len(json_keys(props)) AS n_keys,
       array_to_string(list_sort(json_keys(props)), ',') AS keys_joined
FROM events
"""


QUERIES = {
    "f9_marker_truncation": f9_marker_truncation,
    "f19_map_functions": f19_map_functions,
}

ORACLES = {
    "f9_marker_truncation": F9_SQL,
    "f19_map_functions": F19_SQL,
}
