from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from x17a5_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("x17a5_tests", shuffle_partitions=8)
    yield spark
