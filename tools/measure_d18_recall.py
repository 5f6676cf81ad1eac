"""d18 paragraph-grain NEAR-dedup recall at a scaled lake (VERDICT r12
#6): the ≤8-keeper confirm bound trades recall against full LSH pair
generation, and until round 13 the drift-boilerplate recall was pinned
at sf0.001 only. This measures it on a real lake (default: the 20x
skew lake, whose hot boilerplate paragraph is the worst case for
paragraph-grain banding).

The d18 fixture plants a drifted boilerplate paragraph (5 drift
values, one per doc_id%50/10 class) on every 10th document. A perfect
near-dedup keeps exactly ONE boilerplate span corpus-wide (the
earliest packed (doc_id, pos)); the exact machinery (d15/d16)
structurally keeps one PER DRIFT VALUE (5). Recall here = fraction of
planted boilerplate paragraphs removed, excluding the one legitimate
keeper; the exact-machinery row is printed next to it for the
d15/d16-vs-d18 comparison SCALE.md publishes.

Usage: python tools/measure_d18_recall.py [lake_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from x17a5_spark.session import get_spark  # noqa: E402


def main() -> None:
    lake = sys.argv[1] if len(sys.argv) > 1 else ".scaled/sf2us"
    from x17a5_spark.operators.paragraphs import dedup_paragraphs
    from x17a5_spark.queries.dedup import (
        AUG_TWIN_OFFSET,
        D16_DELIM,
        D18_BOILER_PRE,
        d18_paragraph_near_dedup,
        guarded_twin_id,
    )
    from x17a5_spark.tables import load_table

    spark = get_spark("d18_recall")
    near = (
        d18_paragraph_near_dedup(spark, lake)
        .filter(F.col("doc_id") >= 6 * AUG_TWIN_OFFSET)
        .select(
            F.count("*").alias("planted"),
            F.sum(
                F.col("text_dedup").contains(D18_BOILER_PRE).cast("long")
            ).alias("kept_boiler"),
        )
        .first()
    )
    planted, near_kept = near["planted"], near["kept_boiler"]
    # the exact machinery over the IDENTICAL fixture (what d15/d16
    # would do): one keeper per distinct drift value survives
    docs = load_table(spark, lake, "documents").select(
        "doc_id", F.regexp_replace("text", "table", "\n\n").alias("text")
    )
    boiler = F.concat_ws(
        " ",
        F.lit(D18_BOILER_PRE),
        (F.col("doc_id") % 50 / 10).cast("long").cast("string"),
        F.lit("terms of use subject herein"),
    )
    copies = docs.filter(F.col("doc_id") % 10 == 0).select(
        guarded_twin_id(F.col("doc_id"), 6, "d18r").alias("doc_id"),
        F.concat_ws("\n\n", boiler, F.col("text")).alias("text"),
    )
    exact = (
        dedup_paragraphs(docs.unionByName(copies), delimiter=D16_DELIM)
        .filter(F.col("doc_id") >= 6 * AUG_TWIN_OFFSET)
        .select(
            F.sum(
                F.col("text_dedup").contains(D18_BOILER_PRE).cast("long")
            ).alias("kept_boiler")
        )
        .first()["kept_boiler"]
    )

    def recall(kept: int) -> float:
        return (planted - kept) / (planted - 1)

    print(
        f"lake={lake} planted={planted} "
        f"near_kept={near_kept} near_recall={recall(near_kept):.6f} "
        f"exact_kept={exact} exact_recall={recall(exact):.6f}"
    )


if __name__ == "__main__":
    main()
