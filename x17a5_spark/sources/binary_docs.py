"""S5 — binary document corpus scan (PDFs keyed ``{CIK}-{date}.pdf``,
reference run_file_extraction.py:118-204).

``binaryFile`` format + key columns derived from the path; page slicing
and any decode run inside ``mapInPandas`` so bytes never leave the
executors. ``pathGlobFilter`` / ``recursiveFileLookup`` give partition
pruning over a path-partitioned lake.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_document_corpus(
    spark: SparkSession, path: str, glob: str = "*.pdf"
) -> DataFrame:
    """Binary scan with (cik, filing_date) parsed from the file name."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
    )
    base = F.regexp_extract(F.col("path"), r"([^/]+)\.[a-z]+$", 1)
    return df.select(
        F.col("path"),
        F.regexp_extract(base, r"^(\d+)-", 1).alias("cik"),
        F.regexp_extract(base, r"-(\d{4}-\d{2}-\d{2})$", 1).alias("filing_date"),
        F.col("length").alias("n_bytes"),
        F.col("content"),
    )


def slice_pages(df: DataFrame, max_pages: int = 20) -> DataFrame:
    """First-N-pages subset (reference FocusReportSlicing.py:78-109).

    Engine ladder inside each Arrow batch: pypdf when importable (full
    PDF spec), else the vendored pure-Python slicer
    (sources/pdf_mini.py — handles content streams opaquely, FlateDecode
    object streams, nested page trees; declines encrypted or broken
    files), else pass-through — so the operator does real work with
    zero optional dependencies and never fails a batch on an
    unparseable document (quarantine-style leniency: a bad PDF flows on
    unsliced rather than killing the job).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from x17a5_spark.sources.pdf_mini import slice_pdf_first_pages

        try:
            import io

            from pypdf import PdfReader, PdfWriter  # type: ignore

            def subset(content: bytes) -> bytes:
                try:
                    reader = PdfReader(io.BytesIO(content))
                    writer = PdfWriter()
                    for page in reader.pages[:max_pages]:
                        writer.add_page(page)
                    buf = io.BytesIO()
                    writer.write(buf)
                    return buf.getvalue()
                except Exception:  # noqa: BLE001 — lenient per-doc
                    return content

        except ImportError:

            def subset(content: bytes) -> bytes:
                sliced = slice_pdf_first_pages(bytes(content), max_pages)
                return content if sliced is None else sliced

        for pdf in batches:
            pdf["content"] = pdf["content"].map(subset)
            yield pdf

    return df.mapInPandas(op, schema=df.schema)
