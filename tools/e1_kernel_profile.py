"""Per-kernel attribution of e1's silver stage (VERDICT r10 #4).

At 100× the silver stage is 97% of e1's end-to-end wall clock, so
"silver is slow" attributes nothing. This tool times each stage of the
SHIPPED silver composition (``pipeline.silver_stages`` — the same list
``clean_filings`` composes) in ISOLATION: every stage reads its input
from a persisted parquet snapshot of the previous stage's output and
materializes through the noop sink, so a stage's number is its own
exchange + compute cost, not a recompute of its ancestors.

Usage: python tools/e1_kernel_profile.py [sf_dir] [repeats]
Prints one JSON line: {"sf_dir": ..., "rows_in": N, "stages":
{name: {"sec": median, "bracket": [min, max], "rows_out": N}}}.

Protocol notes: inputs are e1's own corpus shape (orders % 25 docs,
the E1_DOC stub filing, the e1 text channel); bronze is built once via
the stub OCR backend exactly as run_pipeline does. Use the same env
knobs as the scaled-lake runs (SPARK_GRAFT_DRIVER_MEM=64g at 100×).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from x17a5_spark.queries.domain import E1_DOC  # noqa: E402
from x17a5_spark.session import get_spark  # noqa: E402
from x17a5_spark.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    spark = get_spark("e1_kernel_profile")
    from x17a5_spark.operators.kernel_part import kernel_width
    from x17a5_spark.pipeline import silver_stages
    from x17a5_spark.sources.ocr import OcrSource, StubOcrBackend, quarantine

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 25 == 0
    )
    docs = orders.select(
        F.col("o_orderkey").cast("string").alias("cik"),
        F.lit("2021-06-30").alias("filing_date"),
        F.encode(F.lit(E1_DOC), "UTF-8").alias("content"),
    )
    text = orders.select(
        F.col("o_orderkey").cast("string").alias("cik"),
        F.lit("2021-06-30").alias("filing_date"),
        F.lit(0).alias("line_idx"),
        F.when(F.col("o_orderkey") % 2 == 0, F.lit("(in Millions)"))
        .otherwise(F.lit("Statement of Financial Condition"))
        .alias("line_text"),
    )

    work = tempfile.mkdtemp(prefix="x17a5_kprof_")
    try:
        # bronze once, exactly as run_pipeline's ocr_stage shapes it
        cells, _errors = quarantine(
            OcrSource(backend_factory=StubOcrBackend).run(
                docs.repartition(kernel_width(docs))
            )
        )
        bronze_path = os.path.join(work, "stage_in_bronze")
        cells.select(
            "cik", "filing_date", "row_idx", "col0", "col1", "col2"
        ).write.parquet(bronze_path)
        cur = spark.read.parquet(bronze_path)
        rows_in = cur.count()

        out: dict[str, dict] = {}
        for i, (name, fn) in enumerate(silver_stages(text)):
            staged = fn(cur)
            # warmup (codegen/JIT) + timed repeats through the noop sink
            staged.write.mode("overwrite").format("noop").save()
            samples = []
            for _ in range(repeats):
                t0 = time.time()
                staged.write.mode("overwrite").format("noop").save()
                samples.append(time.time() - t0)
            samples.sort()
            snap = os.path.join(work, f"stage_{i}_{name}")
            staged.write.parquet(snap)
            nxt = spark.read.parquet(snap)
            out[name] = {
                "sec": round(samples[len(samples) // 2], 3),
                "bracket": [round(samples[0], 3), round(samples[-1], 3)],
                "rows_out": nxt.count(),
            }
            cur = nxt

        print(
            json.dumps(
                {"sf_dir": sf_dir, "rows_in": rows_in, "stages": out},
                sort_keys=True,
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
