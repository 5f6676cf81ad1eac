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

``grouped_kernel`` (round 7) additionally removes the PER-GROUP
dispatch cost: instead of applyInPandas's one Arrow round trip per
group, groups stream through ``mapInPandas`` over key-sorted
partitions and are dispatched by an in-batch pandas groupby — measured
2.2× on the k1 kernel at the 20× lake. All silver-chain kernels run
through it; the partitioning policy above is unchanged underneath.
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


def grouped_kernel(
    df: DataFrame, group_cols: list[str], fn, schema: str, with_key: bool = False
) -> DataFrame:
    """Run a per-group pandas kernel with BATCHED group dispatch:
    ``mapInPandas`` over key-partitioned, key-sorted input, applying
    ``fn`` to each group via an in-batch pandas groupby.

    Same contract as ``kernel_partitions(df, g).groupBy(*g)
    .applyInPandas(fn, schema)`` — ``fn`` receives one group's frame
    (group columns included, row order unspecified: kernels sort by
    their own order column) and returns a frame matched to ``schema``
    by column name; ``with_key=True`` selects applyInPandas's two-arg
    form ``fn(key_tuple, pdf)``. The difference is dispatch cost: applyInPandas pays
    a JVM→Arrow→pandas round trip PER GROUP, which dominates when
    groups are tiny (a filing side is ~10-25 rows). Batching groups
    through one mapInPandas stream measured 2.2× faster on the k1
    kernel at the 20× lake (31.9 s → 14.6 s for 200k groups,
    value-identical output).

    Memory stays bounded at O(Arrow batch + largest group), NOT
    O(partition): input is sorted by the group key within partitions
    (local SortExec, no extra exchange), so a group is a contiguous run
    and only the possibly-incomplete TRAILING group of each Arrow batch
    is carried into the next. NaN group keys are handled (dropna=False
    + isna-aware carry detection) to match applyInPandas semantics.
    """
    import pandas as pd

    group_cols = list(group_cols)

    def run(pdf: pd.DataFrame):
        outs = []
        for key, g in pdf.groupby(group_cols, sort=False, dropna=False):
            g = g.reset_index(drop=True)
            if with_key:
                o = fn(key if isinstance(key, tuple) else (key,), g)
            else:
                o = fn(g)
            if o is not None and len(o):
                outs.append(o)
        if outs:
            yield pd.concat(outs, ignore_index=True)

    def op(batches):
        yield from _stream_complete_groups(batches, group_cols, run)

    return (
        kernel_partitions(df, group_cols)
        .sortWithinPartitions(*group_cols)
        .mapInPandas(op, schema=schema)
    )


def _stream_complete_groups(batches, group_cols: list[str], run):
    """Re-batch an Arrow batch iterator so ``run`` only ever sees
    COMPLETE groups: input is key-sorted within the partition, so a
    group is a contiguous run and only the possibly-incomplete trailing
    group of each batch is carried into the next. Memory stays bounded
    at O(Arrow batch + largest group), not O(partition)."""
    import numpy as np
    import pandas as pd

    carry: pd.DataFrame | None = None
    for b in batches:
        if carry is not None:
            b = pd.concat([carry, b], ignore_index=True)
            carry = None
        if not len(b):
            continue
        # trailing (possibly batch-spanning) group = contiguous run
        # of rows keyed like the last row
        eq = np.ones(len(b), dtype=bool)
        last = b.iloc[-1]
        for c in group_cols:
            v = last[c]
            if pd.isna(v):
                eq &= b[c].isna().to_numpy()
            else:
                eq &= (b[c] == v).to_numpy()
        n_tail = len(b) if eq.all() else int(np.argmin(eq[::-1]))
        if n_tail == len(b):
            carry = b
            continue
        carry = b.iloc[len(b) - n_tail :]
        yield from run(b.iloc[: len(b) - n_tail])
    if carry is not None and len(carry):
        yield from run(carry)


def batched_grouped_kernel(
    df: DataFrame, group_cols: list[str], batch_fn, schema: str
) -> DataFrame:
    """Like ``grouped_kernel``, but ``batch_fn`` receives a frame
    holding MANY complete groups at once (one per Arrow batch, group
    boundaries guaranteed intact) and returns one output frame (or
    None). For kernels whose per-group work is tiny — a filing side is
    ~6-25 rows — the per-group pandas machinery (groupby dispatch,
    frame slice/copy/concat per group) dominates grouped_kernel's
    cost; a batch_fn can sort once, walk numpy group boundaries, run
    the pure-Python kernels over list slices, and build ONE output
    frame per batch (round 11: 23.9 s → 1.2 s on the fused silver
    tail at the 20× lake — 20×, value-identical output)."""
    group_cols = list(group_cols)

    def run(pdf):
        o = batch_fn(pdf)
        if o is not None and len(o):
            yield o

    def op(batches):
        yield from _stream_complete_groups(batches, group_cols, run)

    return (
        kernel_partitions(df, group_cols)
        .sortWithinPartitions(*group_cols)
        .mapInPandas(op, schema=schema)
    )
