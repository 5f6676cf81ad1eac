"""Connected components over a pair graph — the dedup-resolution step.

A near-duplicate pipeline (MinHash/SimHash/embedding LSH, queries
d2/d3/d5) emits PAIRS; turning pairs into dedup decisions needs the
transitive closure: every document joined to the canonical (minimum)
id of its duplicate cluster. The reference repo never needs this (its
dedup is keyed drop_duplicates, DatabaseStructured.py:225), but at
100 TB it is the load-bearing step between candidate generation and
"keep one copy per cluster".

Algorithm: iterative min-label propagation.

    comp(v) <- min(comp(v), min_{u in N(v)} comp(u))   until fixpoint

Each round is one shuffle join (edges x labels) plus one min
aggregation — no ``collect_list`` of neighbor sets, so a hub node
never materializes a giant row and the shuffle stays balanced.
Convergence takes graph-diameter rounds: near-dup clusters from
banded LSH are dense and shallow (a transitive chain of misses longer
than a few hops is, by construction of the band threshold, vanishingly
rare), so 2-4 rounds settle real corpora. The round cap bounds
pathological inputs; for adversarially long chains (diameter >>
log n) swap this loop for the alternating large-star/small-star
scheme (Kiveris et al., SoCC'14) which contracts such chains in
O(log^2 n) rounds at the cost of two extra shuffles per round.

Each round truncates plan lineage with ``localCheckpoint`` so the
iterative plan doesn't grow unboundedly; on a cluster, swap for
``checkpoint`` to a reliable store (same API, fault-tolerant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame, src: str, dst: str) -> DataFrame:
    a = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    return (
        a.unionByName(a.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _propagate(sym: DataFrame, labels: DataFrame) -> DataFrame:
    """One min-label step: comp(v) <- min(comp(v), min over neighbors).
    ``_changed`` marks rows the step improved."""
    neighbor_min = (
        sym.join(labels, sym["v"] == labels["id"])
        .groupBy("u")
        .agg(F.min("comp").alias("nmin"))
    )
    return labels.join(neighbor_min, labels["id"] == neighbor_min["u"], "left").select(
        "id",
        F.least(F.col("comp"), F.coalesce("nmin", F.col("comp"))).alias("comp"),
        (F.col("nmin") < F.col("comp")).alias("_changed"),
    )


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_rounds: int = 25
) -> DataFrame:
    """Resolve the pair graph to ``(id, comp)`` with ``comp`` = minimum
    id reachable in the component. Output covers every node incident to
    an edge; left-join back to the corpus and ``coalesce(comp, id)``
    for singletons (see :func:`canonicalize_duplicates`).

    Each driver round-trip batches TWO propagation steps (one
    checkpoint + one convergence action per pair), so ``max_rounds``
    rounds admit ``2 * max_rounds`` hops of label travel. A graph whose
    diameter exceeds that budget raises rather than returning silently
    unresolved clusters — the escape hatch for such (adversarial)
    inputs is the alternating large-star/small-star scheme cited in the
    module docstring, or simply a larger ``max_rounds``.
    """
    sym = _symmetrize(edges, src, dst).localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        first = _propagate(sym, labels).drop("_changed")
        updated = _propagate(sym, first).localCheckpoint(eager=True)
        changed = not updated.filter(F.col("_changed")).isEmpty()
        labels = updated.drop("_changed")
        if not changed:
            return labels
    raise RuntimeError(
        f"connected_components did not converge within {max_rounds} rounds "
        f"({2 * max_rounds} propagation steps); the pair graph's diameter "
        "exceeds the budget. Raise max_rounds, or switch to the "
        "alternating-star contraction for long-chain graphs."
    )


def canonicalize_duplicates(
    corpus: DataFrame, components: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Join cluster ids back to the corpus: singletons become their own
    canonical; ``is_canonical`` marks the one row per cluster to keep."""
    joined = (
        corpus.join(
            components.select(
                F.col("id").alias(id_col), F.col("comp")
            ),
            id_col,
            "left",
        )
        .withColumn("cluster_id", F.coalesce("comp", F.col(id_col)))
        .drop("comp")
    )
    return joined.withColumn(
        "is_canonical", F.col(id_col) == F.col("cluster_id")
    )
