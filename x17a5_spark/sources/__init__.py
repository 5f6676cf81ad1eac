"""Source connectors (SURVEY.md §2.1 S1-S10)."""

from x17a5_spark.sources.fwf import read_fixed_width
from x17a5_spark.sources.binary_docs import read_document_corpus
from x17a5_spark.sources.ocr import OcrSource, StubOcrBackend

__all__ = [
    "OcrSource",
    "StubOcrBackend",
    "read_document_corpus",
    "read_fixed_width",
]
