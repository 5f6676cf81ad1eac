"""Synthesize a larger scale factor from the driver's sf0.1 testdata by
unioning K key-shifted copies of every table (disjoint key ranges, FK
consistency preserved), written as properly split parquet (multiple
files per table) so scan parallelism behaves like a real lake instead
of the driver's single-row-group files.

Usage: python tools/make_scaled_sf.py [K] [out_dir]
Default: K=5 -> ~sf0.5 at .scaled/sf0.5 (gitignored).
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from x17a5_spark.session import get_spark  # noqa: E402
from x17a5_spark.tables import TABLE_NAMES, load_table  # noqa: E402

# key columns shifted per copy; tables absent here are replicated as-is
# only once (bounded dims)
SHIFT_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SINGLE_COPY = {"region", "nation"}


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    base = os.environ.get("SPARK_GRAFT_BASE_SF", "/root/testdata/sf0.1")
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scaled", f"sf0.{k}")
    )
    spark = get_spark("make_scaled_sf")
    for name in TABLE_NAMES:
        df = load_table(spark, base, name)
        if name not in SINGLE_COPY:
            keys = [c for c in SHIFT_KEYS.get(name, []) if c in df.columns]
            offsets = {c: df.agg(F.max(c)).first()[0] + 1 for c in keys}
            copies = [df]
            for i in range(1, k):
                c = df
                for col, off in offsets.items():
                    c = c.withColumn(col, F.col(col) + F.lit(i * off))
                copies.append(c)
            for c in copies[1:]:
                df = df.unionByName(c)
        (
            df.repartition(8)
            .write.mode("overwrite")
            .parquet(os.path.join(out, f"{name}.parquet"))
        )
        print(f"{name}: written")
    print(f"scaled x{k} -> {out}")


if __name__ == "__main__":
    main()
