"""Tests for the graph / table-maintenance layer (queries/graph.py) and
the video frame-sampling op (m4): algorithmic invariants the DuckDB
oracle's value hash can't express — rank-mass conservation for the
power iteration, MERGE status semantics, and the UDTF fan-out contract.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from x17a5_spark.queries.graph import (
    J13_INSERT_OFFSET,
    g1_pagerank,
    j13_upsert_merge,
)
from x17a5_spark.queries.multimodal import m4_frame_sample
from x17a5_spark.tables import load_table

SF = "/root/testdata/sf0.001"


# --- g1: PageRank invariants ---------------------------------------------


def test_pagerank_rank_mass_conserved(spark):
    """With teleport 0.15 and rank0 = 1, total rank mass stays ~N on a
    strongly-connected (mirrored) graph: sum r_{i+1} = 0.15 N + 0.85 sum r_i,
    whose fixed point is N. Catches a dropped-node or dangling-mass bug —
    either leaks mass every iteration."""
    ranks = g1_pagerank(spark, SF).collect()
    n = len(ranks)
    assert n > 0
    total = sum(r["rank"] for r in ranks)
    assert abs(total - n) / n < 1e-6
    assert all(r["rank"] >= 0.15 for r in ranks)


def test_pagerank_node_set_complete(spark):
    """Every customer with an order and every supplier with a lineitem
    appears — mirrored edges mean nobody dangles out of the rank vector."""
    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    n_sup = li.select("l_suppkey").distinct().count()
    n_cust = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert g1_pagerank(spark, SF).count() == n_sup + n_cust


# --- j13: MERGE semantics ------------------------------------------------


def test_upsert_statuses_and_deletes(spark):
    out = j13_upsert_merge(spark, SF)
    rows = out.collect()
    by_status = {}
    for r in rows:
        by_status.setdefault(r["status"], []).append(r)

    # inserted keys are exactly the out-of-snapshot namespace
    assert all(r["key"] >= J13_INSERT_OFFSET for r in by_status.get("inserted", []))
    assert all(r["name"].startswith("NEW#") for r in by_status.get("inserted", []))
    # updated/unchanged keys are real customers
    snap_keys = {
        r["c_custkey"]
        for r in load_table(spark, SF, "customer").select("c_custkey").collect()
    }
    for st in ("updated", "unchanged"):
        assert all(r["key"] in snap_keys for r in by_status.get(st, []))

    # a key whose LATEST changelog op is D must be absent from the output
    chg = load_table(spark, SF, "orders").select(
        F.when(
            F.col("o_orderkey") % 23 == 0, F.col("o_custkey") + J13_INSERT_OFFSET
        )
        .otherwise(F.col("o_custkey"))
        .alias("key"),
        F.when(F.col("o_orderkey") % 17 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "o_orderdate",
        "o_orderkey",
    )
    latest = (
        chg.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("key").orderBy(
                    F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
                )
            ),
        )
        .filter("rk = 1 AND op = 'D'")
        .select("key")
        .collect()
    )
    deleted = {r["key"] for r in latest}
    assert deleted, "fixture should exercise the delete path"
    out_keys = {r["key"] for r in rows}
    assert not (deleted & out_keys)
    # output keys: snapshot minus deletes, plus live inserts
    assert out_keys == (snap_keys - deleted) | {
        r["key"] for r in by_status.get("inserted", [])
    }


# --- m4: frame-sampling fan-out ------------------------------------------


def test_frame_sample_fanout_and_errors(spark):
    out = m4_frame_sample(spark, SF)
    pdf = out.toPandas()
    bad = pdf[pdf["failed"]]
    good = pdf[~pdf["failed"]]
    # every 13th media yields exactly ONE error row, frame_idx null
    assert (bad["media_id"] % 13 == 0).all()
    assert bad["media_id"].is_unique
    assert bad["frame_idx"].isna().all()
    # a good media fans out to floor(dur/stride)+1 frames at stride 2.0
    counts = good.groupby("media_id").size()
    for mid, n in counts.items():
        dur = (mid % 120) + 5
        assert n == dur // 2 + 1
    # timestamps are the exact stride grid
    one = good[good["media_id"] == counts.index[0]].sort_values("frame_idx")
    assert list(one["t_sec"]) == [i * 2.0 for i in range(len(one))]


def test_triangle_count_matches_bruteforce(spark):
    """The degree-oriented wedge count must equal a direct Python
    triangle enumeration over the same co-purchase edge set."""
    from itertools import combinations

    from x17a5_spark.queries.graph import G2_MIN_W, g2_triangle_count

    row = g2_triangle_count(spark, SF).first()

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey").collect()
    orders = {}
    for r in li:
        # keep multiplicity: the same part can appear on several lines of
        # one order, and the edge weight counts ROW pairs (as the oracle does)
        orders.setdefault(r["l_orderkey"], []).append(r["l_partkey"])
    from collections import Counter

    pair_w = Counter()
    for parts in orders.values():
        for u, v in combinations(sorted(parts), 2):
            if u != v:
                pair_w[(u, v)] += 1
    edges = {p for p, w in pair_w.items() if w >= G2_MIN_W}
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    n_tri = sum(
        1
        for (u, v) in edges
        for w in adj.get(v, ())
        if w in adj.get(u, ())
    )
    assert (row["n_edges"], row["n_triangles"]) == (len(edges), n_tri)
