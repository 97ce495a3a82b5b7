from __future__ import annotations

import pandas as pd
import pytest

from gnarly_spark.fixtures import CHANGELOG_DDL
from gnarly_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="gnarly_spark_tests", cpus=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def to_spark(spark):
    """pandas changelog -> Spark DataFrame with the canonical schema."""

    def _f(pdf: pd.DataFrame, schema: str = CHANGELOG_DDL):
        return spark.createDataFrame(pdf, schema=schema)

    return _f


def assert_pdf_equal(a: pd.DataFrame, b: pd.DataFrame, sort_by=None):
    """Order-insensitive DataFrame equality with exact values."""
    if sort_by:
        a = a.sort_values(sort_by).reset_index(drop=True)
        b = b.sort_values(sort_by).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True), check_dtype=False
    )
