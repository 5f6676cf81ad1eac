"""Synthesize a larger scale factor from the driver's sf0.1 testdata by
unioning K key-shifted copies of every table (disjoint key ranges, FK
consistency preserved), written as properly split parquet (multiple
files per table) so scan parallelism behaves like a real lake instead
of the driver's single-row-group files.

Usage: python tools/make_scaled_sf.py [K] [out_dir] [--unique-text] [--skew]
Default: K=5 -> ~sf0.5 at .scaled/sf0.5 (gitignored).

``--unique-text`` de-duplicates the copies' CONTENT: documents get a
per-copy token suffix (no shared shingles across copies) and embedding
vectors are rotated by the copy index (rotation preserves the norm but
decorrelates cosine). Key-shifted copies with identical text multiply
every near-dup cluster by K — useful for stress-testing the quadratic
confirm path, but it conflates "more data" with "more duplication".
Unique-text mode holds the duplication RATE constant while volume
scales, isolating the dedup family's true per-byte exponent.

``--skew`` (round 10, VERDICT r9 #4) stresses the hot-key claims the
uniform lakes cannot: documents get a zipf source distribution (the
rank-1 source carries ~37% of docs), a 24-token boilerplate paragraph
prepended to ~30% of docs (one hot paragraph key for d15/d16), and a
~1% giant near-identical cluster (one hub text, five 60-token variants
— the pathological component for d17/cc_star/e11); events route ~30%
of rows to ONE hub user plus 3 warm users at ~5% each (st8's hot
window partition); lineitem routes ~70% of rows to one l_returnflag
(j10's salted-join hot key). All transforms are deterministic modulo
arithmetic on the shifted keys — the same ROW counts as the uniform
lake and near-identical bytes (the boilerplate adds a few % of text),
so skewed vs uniform medians isolate the skew cost; SCALE.md records
the measured byte ratio next to the table."""

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


# ~30% of docs carry this up-front paragraph: exactly 24 tokens = two
# d15 fixed-width chunks, so the organic text behind it stays
# chunk-aligned, and a blank-line break makes it a real d16 span
# exactly 24 tokens = two 12-token d15 chunks (asserted below — the
# first cut was 27 tokens and silently broke the chunk-alignment
# premise the docstring promises; code-review r10)
SKEW_BOILERPLATE = (
    "standard forward looking statement disclaimer the information "
    "contained herein is provided without warranty of any kind and "
    "past performance does not guarantee future results"
)
assert len(SKEW_BOILERPLATE.split()) == 24, len(SKEW_BOILERPLATE.split())
# the giant near-identical cluster: one 60-token body, 5 tail variants
SKEW_HUB_TEXT = " ".join(f"hubword{i}" for i in range(60))


def _skewify(name: str, df):
    """Deterministic hot-key injections (--skew); see module docstring."""
    if name == "documents":
        # zipf-ish sources: rank-r source gets ~1/r of a 0..99 wheel
        # (thresholds 37/56/68/77/85/91/96/100 for 8 ranks)
        srcs = sorted(r[0] for r in df.select("source").distinct().collect())
        weights = [1.0 / (r + 1) for r in range(len(srcs))]
        total = sum(weights)
        wheel = F.pmod(F.xxhash64("doc_id"), F.lit(100))
        # CASE chain: rank r claims the wheel band [lo, hi)
        src_expr = None
        acc = 0.0
        for s, w in zip(srcs, weights):
            lo = int(round(acc))
            acc += 100.0 * w / total
            hi = int(round(acc))
            cond = (wheel >= F.lit(lo)) & (wheel < F.lit(hi))
            src_expr = (
                F.when(cond, F.lit(s))
                if src_expr is None
                else src_expr.when(cond, F.lit(s))
            )
        df = df.withColumn("source", src_expr.otherwise(F.col(("source"))))
        df = df.withColumn(
            "text",
            F.when(
                F.pmod(F.col("doc_id"), F.lit(10)) < 3,
                F.concat(F.lit(SKEW_BOILERPLATE + "\n\n"), F.col("text")),
            ).otherwise(F.col("text")),
        )
        df = df.withColumn(
            "text",
            F.when(
                F.pmod(F.col("doc_id"), F.lit(97)) == 13,
                F.concat(
                    F.lit(SKEW_HUB_TEXT + " tailvariant"),
                    (F.pmod(F.col("doc_id"), F.lit(5))).cast("string"),
                ),
            ).otherwise(F.col("text")),
        )
        return df.withColumn("n_chars", F.length("text"))
    if name == "events":
        wheel = F.pmod(F.xxhash64("event_id"), F.lit(100))
        return df.withColumn(
            "user_id",
            F.when(wheel < 30, F.lit(1))
            .when(wheel < 45, F.lit(2) + F.pmod(F.col("event_id"), F.lit(3)))
            .otherwise(F.col("user_id")),
        )
    if name == "lineitem":
        return df.withColumn(
            "l_returnflag",
            F.when(
                F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(10)) < 7,
                F.lit("N"),
            ).otherwise(F.col("l_returnflag")),
        )
    return df


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    unique_text = "--unique-text" in sys.argv
    skew = "--skew" in sys.argv
    k = int(args[0]) if args else 5
    base = os.environ.get("SPARK_GRAFT_BASE_SF", "/root/testdata/sf0.1")
    suffix = f"sf0.{k}u" if unique_text else f"sf0.{k}"
    if skew:
        suffix += "s"
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
        if skew:
            df = _skewify(name, df)
        (
            df.repartition(8)
            .write.mode("overwrite")
            .parquet(os.path.join(out, f"{name}.parquet"))
        )
        print(f"{name}: written")
    print(
        f"scaled x{k}"
        f"{' unique-text' if unique_text else ''}"
        f"{' skew' if skew else ''} -> {out}"
    )


if __name__ == "__main__":
    main()
