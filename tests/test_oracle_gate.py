"""Self-tests for tools/check_oracle.py — the local twin of the driver's
correctness gate.

Round-2 lesson (VERDICT r02 "What's wrong" #2): DuckDB windows SUM(int) as
HUGEINT which lands in pandas as float64 while Spark returns bigint. The
gate's value renderer collapsed integral floats to int strings, so the gate
printed PASS while the driver's dtype-sensitive hash failed. These tests pin
the fix: dtype drift between the Spark and DuckDB result frames must fail
the gate BEFORE value comparison, so that class of oracle-typing defect can
never again pass locally and fail the driver."""

from __future__ import annotations

import importlib.util
import pathlib

import numpy as np
import pandas as pd

_TOOLS = pathlib.Path(__file__).resolve().parent.parent / "tools"


def _load_gate():
    spec = importlib.util.spec_from_file_location(
        "check_oracle", _TOOLS / "check_oracle.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


gate = _load_gate()


def test_hugeint_float_vs_int_is_flagged():
    # Spark side: bigint. DuckDB side: HUGEINT -> float64 (integral values).
    spark_df = pd.DataFrame({"session_idx": pd.array([0, 1, 2], dtype="int64")})
    duck_df = pd.DataFrame({"session_idx": np.array([0.0, 1.0, 2.0])})
    drift = gate.dtype_drift(spark_df, duck_df)
    assert drift and "session_idx" in drift[0], drift


def test_matching_dtypes_pass():
    a = pd.DataFrame({"n": pd.array([1, 2], dtype="int64"), "s": ["x", "y"]})
    b = pd.DataFrame({"n": pd.array([1, 2], dtype="int32"), "s": ["x", "y"]})
    assert gate.dtype_drift(a, b) == []  # width differences are fine


def test_decimal_object_vs_float_is_flagged():
    import decimal

    a = pd.DataFrame({"v": np.array([1.5, 2.5])})
    b = pd.DataFrame({"v": [decimal.Decimal("1.5"), decimal.Decimal("2.5")]})
    assert gate.dtype_drift(a, b), "DECIMAL-as-object vs float must be flagged"


def test_all_null_columns_are_not_flagged():
    # a fully-NULL column degrades to object/float regardless of logical
    # type — flagging it would be noise, the driver hashes NULLs equal
    a = pd.DataFrame({"v": pd.array([None, None], dtype="Int64")})
    b = pd.DataFrame({"v": np.array([np.nan, np.nan])})
    assert gate.dtype_drift(a, b) == []
