from __future__ import annotations

import importlib.util
import os
import shutil
import sys
import tempfile

import pandas as pd
import pytest

from gnarly_spark.fixtures import CHANGELOG_DDL
from gnarly_spark.session import get_spark


def _ensure_protobuf_for_workers() -> None:
    """transformWithStateInPandas needs `google.protobuf` in every Spark
    Python worker (the state client speaks protobuf to the JVM). This
    sandbox has no pip-installed protobuf, but the google-cloud-sdk ships a
    vendored copy; stage a patched copy (its version constant is one minor
    behind pyspark's gencode — compatible in practice for the stable
    StateMessage schema) on PYTHONPATH **before the JVM starts**, so
    JVM-spawned workers inherit it. No-op when a real protobuf is
    installed or the vendored copy is absent; the TWS tests importorskip.
    Test plumbing only — production clusters install protobuf normally."""
    if importlib.util.find_spec("google") is not None and importlib.util.find_spec(
        "google.protobuf"
    ):
        return
    vend = "/usr/lib/google-cloud-sdk/platform/google_appengine/google/protobuf"
    if not os.path.isdir(vend):
        return
    shim = os.path.join(tempfile.mkdtemp(prefix="pbshim-"), "pkg")
    os.makedirs(os.path.join(shim, "google"))
    open(os.path.join(shim, "google", "__init__.py"), "w").close()
    shutil.copytree(vend, os.path.join(shim, "google", "protobuf"))
    rv = os.path.join(shim, "google", "protobuf", "runtime_version.py")
    with open(rv) as f:
        src = f.read()
    with open(rv, "w") as f:
        f.write(
            src.replace("OSS_MINOR = 32", "OSS_MINOR = 33").replace(
                "OSS_SUFFIX = '-dev'", "OSS_SUFFIX = ''"
            )
        )
    os.environ["PYTHONPATH"] = (
        shim + os.pathsep + os.environ.get("PYTHONPATH", "")
    ).rstrip(os.pathsep)
    sys.path.insert(0, shim)


_ensure_protobuf_for_workers()


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
