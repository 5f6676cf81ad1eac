"""Deterministic cross-engine aggregation helpers.

Floating-point sums are order-dependent; Spark's partial aggregation
sums partitions in nondeterministic order, so ``SUM(double)`` can differ
from a single-threaded oracle in the last ulps — and at 100 TB the drift
compounds with partition count. The engine therefore sums money-like
doubles through an exact DECIMAL representation (deterministic regardless
of partitioning / AQE re-planning) and casts the exact result back to
DOUBLE. The matching oracle-SQL spelling is
``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# DECIMAL(27,6): 21 integer digits of headroom — exact for sums of
# ~1e12 values of magnitude 1e8, far beyond any testdata SF, while
# staying within Spark's 38-digit cap after sum's +10 precision bump.
_PREC, _SCALE = 27, 6


def to_dec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({_PREC},{_SCALE})")


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent sum of a double column, returned as double."""
    out = F.sum(to_dec(col)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent mean: exact decimal sum / count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(to_dec(c)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def dec_sql(expr: str) -> str:
    """Oracle-SQL spelling of :func:`dsum` for a value expression."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({_PREC},{_SCALE}))) AS DOUBLE)"


def avg_sql(expr: str) -> str:
    """Oracle-SQL spelling of :func:`davg`."""
    return f"{dec_sql(expr)} / COUNT({expr})"
