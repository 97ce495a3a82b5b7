"""Local stand-in for the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB over the
same sf dir, compares row count, column names, and order-insensitive values
(sorted columns, sorted rows, exact string rendering). Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _render(v):
    if isinstance(v, float):
        if v.is_integer() and abs(v) < 2**53:
            return repr(int(v))
        return f"{v:.9g}"
    return repr(v)


def _dtype_class(dt) -> str:
    """Collapse a pandas dtype into the class the driver's value hash
    distinguishes: an integer column and a float column hash differently
    even when every float is integral (the w_sessionize HUGEINT lesson —
    DuckDB windows SUM(int) as HUGEINT which lands in pandas as float64,
    while Spark returns bigint; _render masked it, the driver did not)."""
    k = getattr(dt, "kind", "O")
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k in "mM":
        return "datetime"
    return "object"


def dtype_drift(got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    """Columns whose dtype class differs between Spark and DuckDB results.

    int-vs-float drift is always a real driver-hash hazard. object-vs-numeric
    is too (e.g. DuckDB DECIMAL → object of Decimal vs Spark float64)."""
    bad = []
    for c in sorted(got.columns):
        a, b = _dtype_class(got[c].dtype), _dtype_class(want[c].dtype)
        if a != b:
            # an all-NaN/None column degrades to object/float regardless of
            # logical type — only flag when both sides have real values
            if got[c].notna().any() and want[c].notna().any():
                bad.append(f"{c}: spark={got[c].dtype}({a}) duckdb={want[c].dtype}({b})")
    return bad


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(_render)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from gnarly_spark.session import get_spark

    spark = get_spark(app_name="oracle_check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(got)} rows (no oracle)")
            n_rowsonly += 1
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        dt = time.monotonic() - t0
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL  {name}: columns {sorted(got.columns)} != {sorted(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL  {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        drift = dtype_drift(got, want)
        if drift:
            print(f"FAIL  {name}: dtype drift (driver hash would differ): {drift}")
            n_fail += 1
            continue
        a, b = normalize(got), normalize(want)
        if len(a) == 0:
            print(f"PASS  {name}: 0 rows (schema match)  ({dt:.1f}s)")
            n_pass += 1
            continue
        if not a.equals(b):
            diff = (a != b).any(axis=1)
            print(f"FAIL  {name}: values differ in {int(diff.sum())}/{len(a)} rows")
            bad = diff[diff].index[:3]
            for i in bad:
                print(f"      spark : {a.loc[i].to_dict()}")
                print(f"      duckdb: {b.loc[i].to_dict()}")
            n_fail += 1
            continue
        print(f"PASS  {name}: {len(got)} rows  ({dt:.1f}s)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
