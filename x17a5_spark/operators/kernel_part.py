"""Partitioning policy for grouped Python-kernel stages.

AQE coalesces post-shuffle partitions by BYTES
(``spark.sql.adaptive.advisoryPartitionSizeInBytes``, 64 MB default).
That is the right policy for JVM operators, but a grouped
``applyInPandas`` stage is CPU-bound per GROUP (Arrow slice + pandas
frame + Python fn ≈ 2-4 ms each), not byte-bound: a corpus of thousands
of small filings is only a few MB, so AQE folds the exchange to ONE
partition and the kernels run serially — measured round 6 at sf0.1,
the e1 silver chain's three kernels spent 24 s + 17 s + 40 s on single
tasks (silver_clean 90 s) and dropped to ~1/30th of that once spread.

``kernel_partitions`` therefore repartitions a kernel input explicitly
on the group key: an explicit width is exempt from AQE coalescing, and
the width tracks the cluster (``defaultParallelism`` = total cores) so
the policy is scale-correct — at 100 TB the byte-based and CPU-based
choices converge, while on a small corpus every core still gets groups.
The cost is at most relabeling the exchange the grouped kernel needs
anyway; when the upstream already clusters on the same key (e.g. a
window over the filing key feeding a kernel) it adds one cheap exchange
of kernel-input rows in return for full-width execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def kernel_width(df: DataFrame) -> int:
    """Partition count for a CPU-bound grouped-kernel stage: at least
    2× every core in the cluster (a few group-batches per core evens
    out group-size variance), or the session's shuffle width if larger.

    The returned width is deliberately NEVER equal to
    ``spark.sql.shuffle.partitions``: Spark elides an explicit
    repartition whose hash partitioning exactly matches the child's
    (same keys, same width) at planning time — measured round 6, the
    silver kernels silently lost their spread and ran serially on the
    AQE-coalesced upstream window exchange. A width off by one keeps
    the exchange in the plan with shuffleOrigin REPARTITION_BY_NUM,
    which AQE is contractually not allowed to coalesce."""
    spark = df.sparkSession
    try:
        # platforms may set this to a non-numeric value (e.g. "auto");
        # degrade to core-based sizing instead of failing plan build
        shuffle: int | None = int(
            spark.conf.get("spark.sql.shuffle.partitions", "200")
        )
    except (TypeError, ValueError):
        shuffle = None
    w = 2 * spark.sparkContext.defaultParallelism
    if shuffle is None:
        # session width unknowable — offset unconditionally so the
        # explicit repartition can never silently pattern-match the
        # effective shuffle width and lose its REPARTITION_BY_NUM origin
        return w + 1
    w = max(w, shuffle)
    return w + 1 if w == shuffle else w


def kernel_partitions(df: DataFrame, group_cols: list[str]) -> DataFrame:
    """Spread a grouped-kernel input across the cluster on its group
    key, immune to AQE's byte-based coalescing (see module docstring)."""
    return df.repartition(kernel_width(df), *group_cols)
