"""Z-order data layout for multi-dimensional file skipping.

At 100 TB, scan cost is dominated by how much data min/max statistics
let the reader SKIP. A table sorted by one column skips well on that
column and not at all on any other; Morton (z-order) interleaving of
two columns' bits yields files whose bounding boxes are small in BOTH
dimensions, so predicates on either column (or both) prune most files
— the layout strategy behind Delta/Iceberg ``OPTIMIZE ZORDER BY``.

The write path is Spark-native: normalize each column to a 2^bits grid
(min/max from one bounded aggregate), interleave bits into a Morton key
with pure codegen bit-ops, ``repartitionByRange`` on the key (sampled
range boundaries — the distributed sort shape, no global sort barrier),
sort within partitions, write. tests/test_lakehouse.py measures the
per-file bounding-box mass against a round-robin layout of the same
file count — the direct proxy for row-group/file skipping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Z_BITS = 8  # 256 x 256 grid: plenty for file-level statistics


def _morton_expr(bx: str, by: str, bits: int = Z_BITS) -> str:
    """SQL expr interleaving two ``bits``-wide ints: x even bits, y odd."""
    terms = []
    for b in range(bits):
        terms.append(f"shiftleft((shiftright({bx}, {b}) & 1), {2 * b})")
        terms.append(f"shiftleft((shiftright({by}, {b}) & 1), {2 * b + 1})")
    return " + ".join(terms)


def zorder_key(df: DataFrame, col_x: str, col_y: str) -> DataFrame:
    """Attach a Morton key ``z`` over two numeric columns.

    The min/max normalization constants come from one map-side-combined
    aggregate (a single tiny row — the same bounded-sketch collect the
    runtime-filter pattern uses)."""
    stats = df.agg(
        F.min(col_x).alias("x_lo"),
        F.max(col_x).alias("x_hi"),
        F.min(col_y).alias("y_lo"),
        F.max(col_y).alias("y_hi"),
    ).collect()[0]
    grid = (1 << Z_BITS) - 1

    def bucket(col: str, lo: float, hi: float):
        if hi == lo:
            return F.lit(0)
        return F.least(
            F.lit(grid),
            ((F.col(col) - F.lit(lo)) / F.lit(float(hi - lo)) * grid).cast("int"),
        )

    return (
        df.withColumn("_bx", bucket(col_x, stats["x_lo"], stats["x_hi"]))
        .withColumn("_by", bucket(col_y, stats["y_lo"], stats["y_hi"]))
        .withColumn("z", F.expr(_morton_expr("_bx", "_by")))
        .drop("_bx", "_by")
    )


def zorder_write(
    df: DataFrame, col_x: str, col_y: str, path: str, n_files: int
) -> None:
    """Write ``df`` as ``n_files`` z-clustered parquet files."""
    keyed = zorder_key(df, col_x, col_y)
    (
        keyed.repartitionByRange(n_files, "z")
        .sortWithinPartitions("z")
        .drop("z")
        .write.mode("overwrite")
        .parquet(path)
    )
