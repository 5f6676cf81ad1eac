"""Query registry: every operator from SURVEY.md §2 as a runnable query.

Each submodule exposes ``QUERIES`` (name -> fn(spark, sf_dir) -> DataFrame)
and ``ORACLES`` (name -> DuckDB SQL string) dicts; this package merges
them for ``__spark_entry__``. Queries without an oracle entry are the
genuinely non-SQL-expressible kernels (driver records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def registry() -> tuple[dict[str, QueryFn], dict[str, str]]:
    from x17a5_spark.queries import (
        analytics,
        dedup,
        domain,
        maps,
        misc,
        multimodal,
        relational,
        scalars,
        similarity,
        streaming,
        textops,
        windows,
    )

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod in (
        relational,
        windows,
        scalars,
        textops,
        dedup,
        similarity,
        streaming,
        domain,
        misc,
        maps,
        analytics,
        multimodal,
    ):
        for name, fn in mod.QUERIES.items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r}")
            queries[name] = fn
        oracles.update(mod.ORACLES)
    missing = set(oracles) - set(queries)
    if missing:
        raise ValueError(f"oracles without queries: {sorted(missing)}")
    return queries, oracles
