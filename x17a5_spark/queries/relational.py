"""Relational spine: scans, filters, joins, aggregations, set ops, top-k
(SURVEY.md §2.1-2.4, §2.6-2.7) phrased against the driver's TPC-H-ish
tables, each with a DuckDB oracle.

Scale notes baked into every query:
  * region/nation joins are explicit ``broadcast`` (bounded dimensions);
    customer/supplier/part joins rely on AQE's size-based broadcast so
    the same plan holds when those tables are 100 TB-large.
  * money sums go through exact DECIMAL (functions/compat.py) so results
    are partition-order independent — correctness at any parallelism.
  * aggregates are expressed groupBy-first so Catalyst plans partial
    (map-side) aggregation before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from x17a5_spark.functions.compat import avg_sql, davg, dec_sql, dsum
from x17a5_spark.tables import load_table


# --------------------------------------------------------------------------
# A1/A5/F13/O1 — flagship: TPC-H Q1-shaped pricing summary.
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by aggregation with 8 aggregates and map-side partials.

    Mirrors the reference's per-label pivot-sum core (DatabaseStructured.py
    :73-89 does groupby-sum over label classes); here over lineitem.
    """
    # fanout=True: pure scan->partial-agg shape, no downstream exchange
    # beyond the 6-group hash agg — measured 0.75x with the fan-out on.
    li = load_table(spark, sf_dir, "lineitem", fanout=True)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {dec_sql('l_quantity')} AS sum_qty,
       {dec_sql('l_extendedprice')} AS sum_base_price,
       {dec_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {dec_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {avg_sql('l_quantity')} AS avg_qty,
       {avg_sql('l_extendedprice')} AS avg_price,
       {avg_sql('l_discount')} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# J2/A1 — multi-key pipeline join: revenue per qualifying order.
def q3_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


Q3_SQL = f"""
SELECT o_orderkey, o_orderdate, o_orderpriority,
       {dec_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
"""


# J1/J2 — star join through broadcast dimensions (region->nation) plus
# fact-fact joins; the reference's dimension-lookup join J1
# (DatabaseUnstructured.py:297) writ large.
def q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


Q5_SQL = f"""
SELECT r_name, n_name,
       {dec_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
GROUP BY r_name, n_name
"""


# P1 — case-insensitive anchored regex filter (reference
# ExtractBrokerDealers.py:153-156: keep rows matching ^x-17a).
def p1_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_type").rlike("(?i)^econ"))
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"), davg("p_retailprice", "avg_price"))
    )


P1_SQL = f"""
SELECT p_brand, count(*) AS n, {avg_sql('p_retailprice')} AS avg_price
FROM part WHERE regexp_matches(p_type, '(?i)^econ')
GROUP BY p_brand
"""


# P2 — null/blank purge (reference OCRClean.py:90-111 column_purge).
def p2_null_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("text").isNotNull() & (F.trim(F.col("text")) != ""))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


# NB: DuckDB types integer sum() as HUGEINT (int128), which the driver's
# hasher renders differently from Spark's BIGINT — cast explicitly.
P2_SQL = """
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
WHERE text IS NOT NULL AND trim(text) <> ''
GROUP BY lang
"""


# P3 — membership predicate as left-semi join (DatabaseStructured.py:42).
def p3_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


P3_SQL = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


# P4 — negated membership as left-anti join (DatabaseStructured.py:43).
def p4_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_nationkey")
    )


P4_SQL = """
SELECT c_custkey, c_name, c_nationkey
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# P6/X3 — any-column predicate via higher-order EXISTS over array(cols)
# (reference OCRTextract.py:261-289 check_dollar_sign scans every cell).
def p6_any_column_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    cells = F.array("p_name", "p_brand", "p_type")
    return (
        part.filter(F.exists(cells, lambda c: c.rlike("STEEL")))
        .groupBy("p_type")
        .agg(F.count("*").alias("n"))
    )


P6_SQL = """
SELECT p_type, count(*) AS n
FROM part
WHERE len(list_filter([p_name, p_brand, p_type],
                      c -> regexp_matches(c, 'STEEL'))) > 0
GROUP BY p_type
"""


# P7+P9 — threshold filter (run_build_database.py:344: score >= 0.85)
# combined with key-list membership (FocusReportSlicing.py:22-40).
def p7_threshold_keylist(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    picked = ["GERMANY", "FRANCE", "CHINA", "BRAZIL"]
    return (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .filter((F.col("c_acctbal") >= 5000.0) & F.col("n_name").isin(picked))
        .select("c_custkey", "c_name", "n_name", "c_acctbal")
    )


P7_SQL = """
SELECT c_custkey, c_name, n_name, c_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal >= 5000.0
  AND n_name IN ('GERMANY', 'FRANCE', 'CHINA', 'BRAZIL')
"""


# J3 — heterogeneous-key equi-join (network.ipynb cells 16,18:
# left_on/right_on with different column names).
def j3_hetero_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        cust.join(supp, cust.c_nationkey == supp.s_nationkey)
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_pairs"),
            dsum(F.col("c_acctbal") + F.col("s_acctbal"), "combined_bal"),
        )
    )


J3_SQL = f"""
SELECT c_nationkey, count(*) AS n_pairs,
       {dec_sql('c_acctbal + s_acctbal')} AS combined_bal
FROM customer JOIN supplier ON c_nationkey = s_nationkey
GROUP BY c_nationkey
"""


# J4 — replace-by-map lookup join (DatabaseStructured.py:39-46:
# Series.replace -> broadcast left join + coalesce).
def j4_replace_by_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    remap = spark.createDataFrame(
        [("AMERICA", "AMERICAS"), ("MIDDLE EAST", "MENA")],
        ["old_name", "new_name"],
    )
    return (
        nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(remap), F.col("r_name") == F.col("old_name"), "left")
        .select(
            "n_name",
            F.coalesce(F.col("new_name"), F.col("r_name")).alias("region_name"),
        )
    )


J4_SQL = """
SELECT n_name,
       CASE r_name WHEN 'AMERICA' THEN 'AMERICAS'
                   WHEN 'MIDDLE EAST' THEN 'MENA'
                   ELSE r_name END AS region_name
FROM nation JOIN region ON n_regionkey = r_regionkey
"""


# J6/S7 — incremental anti-join against the sink: re-derive the "todo"
# set exactly like the reference's skip-if-exists re-run
# (run_ocr.py:136-141; run_file_extraction.py:123,186).
def j6_incremental_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    done = orders.filter(F.col("o_orderkey") % 10 < 3).select("o_orderkey")
    return (
        orders.join(done, "o_orderkey", "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_todo"))
    )


J6_SQL = """
WITH done AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 10 < 3)
SELECT o_orderstatus, count(*) AS n_todo
FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM done)
GROUP BY o_orderstatus
"""


# A2 — pivot long->wide with a pinned column set (the engine's rule from
# SURVEY §4: pivot only bounded label spaces, never the open lineitem
# vocabulary — here the 5 market segments).
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def a2_pivot_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    piv = (
        cust.groupBy("c_nationkey")
        .pivot("c_mktsegment", SEGMENTS)
        .agg(dsum("c_acctbal"))
    )
    return piv.select(
        "c_nationkey", *[F.col(s).alias(s.lower()) for s in SEGMENTS]
    )


A2_SQL = f"""
SELECT c_nationkey,
       {', '.join(
            dec_sql(f"CASE WHEN c_mktsegment = '{s}' THEN c_acctbal END")
            + f' AS {s.lower()}'
            for s in SEGMENTS)}
FROM customer GROUP BY c_nationkey
"""


# A6 — exact distinct counting (funnel stats, Full_process_failings.ipynb).
def a6_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_rows"),
    )


A6_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_orderkey) AS n_orders,
       count(DISTINCT l_partkey) AS n_parts,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


# A7 — weighted composite aggregate (databaseNetwork.ipynb cell 8:
# sum(group A) + 0.5 * sum(group B)).
def a7_weighted_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    in_a = F.when(F.col("c_mktsegment") == "BUILDING", F.col("c_acctbal"))
    in_b = F.when(F.col("c_mktsegment") == "AUTOMOBILE", F.col("c_acctbal"))
    return cust.groupBy("c_nationkey").agg(
        (dsum(in_a) + 0.5 * dsum(in_b)).alias("network_exposure")
    )


A7_SQL = f"""
SELECT c_nationkey,
       {dec_sql("CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal END")}
       + 0.5 * {dec_sql("CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN c_acctbal END")}
       AS network_exposure
FROM customer GROUP BY c_nationkey
"""


# A9/A10 — row-wise max/min across columns (DatabaseStructured.py:121,
# :150-159: prediction-score max, min of 4 relative errors).
def a9_row_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


A9_SQL = """
SELECT l_orderkey, l_linenumber,
       greatest(l_discount, l_tax) AS max_rate,
       least(l_discount, l_tax) AS min_rate
FROM lineitem
"""


# A11 — rollup grouping sets (beyond-reference Spark surface; free in
# Catalyst, exercised so the oracle pins the NULL-marker semantics).
def a11_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity", "sum_qty"), F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


A11_SQL = f"""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       {dec_sql('l_quantity')} AS sum_qty,
       count(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# U1 — schema-aligning union with provenance tag (pd.concat at
# run_build_database.py:255,398 -> unionByName).
def u1_union_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    c = cust.select(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("side"),
    )
    s = supp.select(
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("side"),
    )
    return (
        c.unionByName(s)
        .groupBy("nationkey", "side")
        .agg(F.count("*").alias("n"), dsum("acctbal", "total_bal"))
    )


U1_SQL = f"""
WITH u AS (
  SELECT c_nationkey AS nationkey, c_acctbal AS acctbal, 'customer' AS side FROM customer
  UNION ALL
  SELECT s_nationkey, s_acctbal, 'supplier' FROM supplier
)
SELECT nationkey, side, count(*) AS n, {dec_sql('acctbal')} AS total_bal
FROM u GROUP BY nationkey, side
"""


# U2 — intersection (PRESERVE-FOCUS.ipynb cell 7: np.intersect1d).
def u2_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.select(F.col("c_custkey").alias("key")).intersect(
        orders.select(F.col("o_custkey").alias("key"))
    )


U2_SQL = """
SELECT c_custkey AS key FROM customer
INTERSECT
SELECT o_custkey FROM orders
"""


# U3 — difference (new_debugger.ipynb cell 11; ~np.isin).
def u3_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.select(F.col("c_custkey").alias("key")).exceptAll(
        orders.select(F.col("o_custkey").alias("key")).distinct()
    )


U3_SQL = """
SELECT c_custkey AS key FROM customer
EXCEPT
SELECT o_custkey FROM orders
"""


# U4 — distinct (DatabaseUnstructured.py:257 drop_duplicates).
def u4_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


U4_SQL = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


# O1/O4 — multi-column sort surfaced as rank + top-k per group
# (run_build_database.py:399 sort; OCRClean.py:404-407 argmax).
def o4_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        cust.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("c_nationkey", "rank", "c_custkey", "c_acctbal")
    )


O4_SQL = """
SELECT c_nationkey, rank, c_custkey, c_acctbal
FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rank
  FROM customer
) WHERE rank <= 3
"""


# --------------------------------------------------------------------------
# Window-budget composites: the driver hash-checks only the first 50
# registry entries, so these carry several §2 ops in one oracle-checked
# query each. The per-op queries stay registered (and locally gated)
# after the window.


# C1 — P3 (left-semi) + P4 (left-anti) in one tagged result: orders
# with vs without lineitems, counted by status. Both branches are
# non-empty at every SF (the testdata has line-less orders).
def c1_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    on = orders.o_orderkey == F.col("l_orderkey")
    semi = orders.join(li, on, "left_semi")
    anti = orders.join(li, on, "left_anti")
    return (
        semi.groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .withColumn("membership", F.lit("has_lines"))
        .unionByName(
            anti.groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
            .withColumn("membership", F.lit("no_lines"))
        )
    )


C1_SQL = """
SELECT o_orderstatus, count(*) AS n, 'has_lines' AS membership
FROM orders WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
GROUP BY o_orderstatus
UNION ALL
SELECT o_orderstatus, count(*), 'no_lines'
FROM orders WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
GROUP BY o_orderstatus
"""


# C2 — U1 (union) + U2 (intersect) + U3 (except) + U4 (distinct) in one
# tagged result over two part-key sets chosen so all three classes are
# deterministically non-empty (the testdata is dense: every part ships,
# so natural predicates degenerate; the modulus split cannot).
def c2_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    a = part.filter(F.col("p_size") <= 25).select(F.col("p_partkey").alias("key"))
    b = (
        li.filter(F.col("l_partkey") % 3 == 0)
        .select(F.col("l_partkey").alias("key"))
        .distinct()
    )
    both = a.intersect(b).withColumn("op", F.lit("both"))
    a_only = a.exceptAll(b).withColumn("op", F.lit("a_only"))
    b_only = b.exceptAll(a).withColumn("op", F.lit("b_only"))
    return both.unionByName(a_only).unionByName(b_only)


C2_SQL = """
WITH a AS (SELECT p_partkey AS key FROM part WHERE p_size <= 25),
     b AS (SELECT DISTINCT l_partkey AS key FROM lineitem WHERE l_partkey % 3 = 0)
SELECT key, 'both' AS op FROM (SELECT key FROM a INTERSECT SELECT key FROM b)
UNION ALL
SELECT key, 'a_only' FROM (SELECT key FROM a EXCEPT SELECT key FROM b)
UNION ALL
SELECT key, 'b_only' FROM (SELECT key FROM b EXCEPT SELECT key FROM a)
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_order_revenue": q3_order_revenue,
    "q5_region_volume": q5_region_volume,
    "p1_regex_filter": p1_regex_filter,
    "p2_null_purge": p2_null_purge,
    "p3_semi_join": p3_semi_join,
    "p4_anti_join": p4_anti_join,
    "p6_any_column_match": p6_any_column_match,
    "p7_threshold_keylist": p7_threshold_keylist,
    "j3_hetero_key_join": j3_hetero_key_join,
    "j4_replace_by_map": j4_replace_by_map,
    "j6_incremental_anti": j6_incremental_anti,
    "a2_pivot_segment": a2_pivot_segment,
    "a6_count_distinct": a6_count_distinct,
    "a7_weighted_composite": a7_weighted_composite,
    "a9_row_minmax": a9_row_minmax,
    "a11_rollup": a11_rollup,
    "u1_union_tagged": u1_union_tagged,
    "u2_intersect": u2_intersect,
    "u3_except": u3_except,
    "u4_distinct": u4_distinct,
    "o4_topk_per_group": o4_topk_per_group,
    "c1_semi_anti": c1_semi_anti,
    "c2_setops": c2_setops,
}

ORACLES = {
    "c1_semi_anti": C1_SQL,
    "c2_setops": C2_SQL,
    "q1_pricing_summary": Q1_SQL,
    "q3_order_revenue": Q3_SQL,
    "q5_region_volume": Q5_SQL,
    "p1_regex_filter": P1_SQL,
    "p2_null_purge": P2_SQL,
    "p3_semi_join": P3_SQL,
    "p4_anti_join": P4_SQL,
    "p6_any_column_match": P6_SQL,
    "p7_threshold_keylist": P7_SQL,
    "j3_hetero_key_join": J3_SQL,
    "j4_replace_by_map": J4_SQL,
    "j6_incremental_anti": J6_SQL,
    "a2_pivot_segment": A2_SQL,
    "a6_count_distinct": A6_SQL,
    "a7_weighted_composite": A7_SQL,
    "a9_row_minmax": A9_SQL,
    "a11_rollup": A11_SQL,
    "u1_union_tagged": U1_SQL,
    "u2_intersect": U2_SQL,
    "u3_except": U3_SQL,
    "u4_distinct": U4_SQL,
    "o4_topk_per_group": O4_SQL,
}
