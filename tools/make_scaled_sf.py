"""Synthesize a larger scale factor from the driver's sf0.1 testdata by
unioning K key-shifted copies of every table (disjoint key ranges, FK
consistency preserved), written as properly split parquet (multiple
files per table) so scan parallelism behaves like a real lake instead
of the driver's single-row-group files.

Usage: python tools/make_scaled_sf.py [K] [out_dir] [--unique-text]
Default: K=5 -> ~sf0.5 at .scaled/sf0.5 (gitignored).

``--unique-text`` de-duplicates the copies' CONTENT: documents get a
per-copy token suffix (no shared shingles across copies) and embedding
vectors are rotated by the copy index (rotation preserves the norm but
decorrelates cosine). Key-shifted copies with identical text multiply
every near-dup cluster by K — useful for stress-testing the quadratic
confirm path, but it conflates "more data" with "more duplication".
Unique-text mode holds the duplication RATE constant while volume
scales, isolating the dedup family's true per-byte exponent.
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


def _uniquify(name: str, c, i: int):
    """Make copy i's content distinct from copy 0's (unique-text mode)."""
    if i == 0:
        return c
    if name == "documents":
        # suffix every token: copy i shares no word shingle with copy 0,
        # so cross-copy near-dup pairs vanish; organic within-copy
        # duplicates survive in every copy (constant duplication rate)
        return c.withColumn(
            "text", F.regexp_replace("text", "(\\S+)", f"$1_{i}")
        )
    if name == "embeddings":
        # rotate the vector by i positions: norm-preserving, and for
        # near-random vectors the rotated copy decorrelates (cosine ~ 0
        # to the original), so cross-copy cosine dups vanish
        dim = F.size("embedding")
        rot = F.lit(1) + ((F.lit(i) % dim + dim) % dim)
        return c.withColumn(
            "embedding",
            F.when(rot == 1, F.col("embedding")).otherwise(
                F.concat(
                    F.slice("embedding", rot, dim),
                    F.slice("embedding", 1, rot - 1),
                )
            ),
        )
    return c


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    unique_text = "--unique-text" in sys.argv
    k = int(args[0]) if args else 5
    base = os.environ.get("SPARK_GRAFT_BASE_SF", "/root/testdata/sf0.1")
    suffix = f"sf0.{k}u" if unique_text else f"sf0.{k}"
    out = (
        args[1]
        if len(args) > 1
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scaled", suffix)
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
                if unique_text:
                    c = _uniquify(name, c, i)
                copies.append(c)
            df = copies[0]
            for c in copies[1:]:
                df = df.unionByName(c)
        (
            df.repartition(8)
            .write.mode("overwrite")
            .parquet(os.path.join(out, f"{name}.parquet"))
        )
        print(f"{name}: written")
    print(f"scaled x{k}{' unique-text' if unique_text else ''} -> {out}")


if __name__ == "__main__":
    main()
