"""Property-based cross-check: the engine's column-expression
``parse_accounting_number`` (JVM regex pipeline) against an independent
pure-Python implementation of the reference's num_strip semantics
(OCRClean.py:30-88), over hypothesis-generated dirty strings.

This is the engine's strongest F1 artifact: two implementations written
against the same spec in different languages/engines must agree on
arbitrary inputs, not just the curated corpus.
"""

from __future__ import annotations

import math
import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from x17a5_spark.functions.accounting import parse_accounting_number


def py_num_strip(number: str) -> float | None:
    """Independent reference implementation (spec: OCRClean.py:30-88)."""
    if not isinstance(number, str) or len(number) == 0:
        return None
    if number[0] == "(":
        number = "-" + number
    number = number.replace("I", "1").replace("l", "1")
    c1 = re.sub(r"[^0-9|.\-]", "", number)
    c2 = re.sub(r"(?<!^)-", "", c1)
    c3 = re.sub(r"\.(?=[^.]*\.)", "", c2)
    dot = c3.find(".")
    if dot != -1 and len(c3) - dot - 1 > 2:
        c3 = c3.replace(".", "")
    if c3 in ("-", "."):
        return 0.0
    try:
        return float(c3)
    except ValueError:
        return None


DIRT = st.text(
    alphabet="0123456789.,-$()Il |abcXYZ\t",
    min_size=0,
    max_size=24,
)


def test_parser_matches_python_reference(spark):
    # generate one large deterministic sample via hypothesis' example
    # machinery, then evaluate in a single Spark job (per-example Spark
    # jobs would take minutes)
    samples: list[str] = []
    DIRT_SAMPLER = given(st.lists(DIRT, min_size=400, max_size=400))

    @settings(max_examples=5, deadline=None, derandomize=True)
    @DIRT_SAMPLER
    def grab(batch):
        samples.extend(batch)

    grab()
    # make sure structured edge shapes are always present
    samples += ["(", ")", "-", ".", "..", "1.2.3.4", "(1,2I4)", "$-", "||", "-."]

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "id int, raw string"
    )
    got = {
        r["id"]: r["v"]
        for r in df.select(
            "id", parse_accounting_number(F.col("raw")).alias("v")
        ).collect()
    }
    for i, s in enumerate(samples):
        expected = py_num_strip(s)
        actual = got[i]
        if expected is None:
            assert actual is None, f"num_strip({s!r}): spark={actual}, py=None"
        elif math.isnan(expected):
            assert actual is None or math.isnan(actual), f"num_strip({s!r})"
        else:
            assert actual == expected, f"num_strip({s!r}): spark={actual}, py={expected}"


def test_staged_parser_matches_column_form(spark):
    """The staged-projection F1 (wide-hot-path form, round-6 codegen
    fix) must agree with the Column form on arbitrary dirty strings —
    including null, which the hot path sees after the borrow merge."""
    from x17a5_spark.functions.accounting import stage_parse_accounting_number

    samples: list[str] = []
    DIRT_SAMPLER = given(st.lists(DIRT, min_size=400, max_size=400))

    @settings(max_examples=5, deadline=None, derandomize=True)
    @DIRT_SAMPLER
    def grab(batch):
        samples.extend(batch)

    grab()
    samples += ["(", ")", "-", ".", "..", "1.2.3.4", "(1,2I4)", "$-", "||", "-.", None]

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "id int, raw string"
    )
    both = stage_parse_accounting_number(df, "raw", "staged").select(
        "id", "staged", parse_accounting_number(F.col("raw")).alias("expr")
    )
    for r in both.collect():
        assert r["staged"] == r["expr"], f"id={r['id']}: {r['staged']} != {r['expr']}"
