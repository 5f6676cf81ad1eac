"""Connected-components dedup resolution (operators/components.py):
multi-round propagation on chains, star merges, singleton handling."""

from __future__ import annotations

from pyspark.sql import functions as F

from x17a5_spark.operators.components import (
    canonicalize_duplicates,
    connected_components,
)


def _comp_map(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {
        r.id: r.comp for r in connected_components(df, "src", "dst").collect()
    }


def test_long_chain_needs_many_rounds(spark):
    # 0-1-2-...-9: min label must travel 9 hops
    comp = _comp_map(spark, [(i, i + 1) for i in range(9)])
    assert comp == {i: 0 for i in range(10)}


def test_two_stars_merged_by_bridge(spark):
    edges = [(1, 0), (2, 0), (3, 0), (11, 10), (12, 10), (13, 10), (3, 11)]
    comp = _comp_map(spark, edges)
    assert set(comp.values()) == {0}
    assert len(comp) == 8


def test_disjoint_components_stay_disjoint(spark):
    comp = _comp_map(spark, [(5, 6), (6, 7), (100, 101)])
    assert comp == {5: 5, 6: 5, 7: 5, 100: 100, 101: 100}


def test_duplicate_and_reversed_edges_are_idempotent(spark):
    comp = _comp_map(spark, [(1, 2), (2, 1), (1, 2), (2, 3)])
    assert comp == {1: 1, 2: 1, 3: 1}


def test_canonicalize_covers_singletons(spark):
    corpus = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    edges = spark.createDataFrame([(4, 2), (2, 0)], ["src", "dst"])
    out = canonicalize_duplicates(
        corpus, connected_components(edges, "src", "dst")
    ).orderBy("doc_id")
    rows = {(r.doc_id, r.cluster_id, r.is_canonical) for r in out.collect()}
    assert rows == {
        (0, 0, True),
        (1, 1, True),
        (2, 0, False),
        (3, 3, True),
        (4, 0, False),
        (5, 5, True),
    }


def test_round_cap_raises_instead_of_silent_partial_result(spark):
    import pytest

    # a 4-hop chain cannot converge in one round (= 2 batched steps):
    # the cap must surface as a clear error, never a half-resolved map
    df = spark.createDataFrame([(i, i + 1) for i in range(4)], ["src", "dst"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_rounds=1)
    full = {r.id: r.comp for r in connected_components(df).collect()}
    assert full == {i: 0 for i in range(5)}


def test_diameter_beyond_default_budget_raises(spark):
    import pytest

    # chain of 60 nodes: diameter 59 > 2 * max_rounds(25) = 50 hops
    df = spark.createDataFrame([(i, i + 1) for i in range(59)], ["src", "dst"])
    with pytest.raises(RuntimeError, match="alternating-star"):
        connected_components(df, max_rounds=4)  # small cap: fail fast
    # and a budget sized to the diameter resolves it fully
    full = {r.id: r.comp for r in connected_components(df, max_rounds=30).collect()}
    assert full == {i: 0 for i in range(60)}
