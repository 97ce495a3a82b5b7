"""Data-quality expectations: one-pass checks + a write-audit-publish gate.

The lakehouse expectations pattern (Delta Live Tables / Great Expectations
shape): declare row-level predicates and table-level invariants, evaluate
them in ONE aggregation pass over the audited relation, and gate a staged
lake commit on the result. Replaces the reference's implicit trust in its
store writes (packages/gnarly-core/src/typeStore/Sequelize.ts:28-191 applies
every operation unconditionally) with an explicit audit step between "merge
computed" and "readers see it" (ParquetLakeTable.merge_staged /
publish_staged).

Scale shape: evaluation is a single `groupBy().agg(...)` over the relation —
every check is a conditional SUM riding the same scan, so N checks cost one
pass regardless of N; uniqueness checks add exact `count_distinct` columns
to the SAME aggregate (partial-agg friendly). The report is reshaped to rows
with `stack(...)` inside the plan — nothing but the final ≤N-row report ever
reaches the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """A row-level expectation: rows where ``predicate`` (a SQL boolean
    expression over the relation's columns) is FALSE **or NULL** count as
    violations. ``mode="fail"`` blocks a gated publish when the violation
    fraction exceeds ``max_violation_fraction``; ``mode="warn"`` only
    reports."""

    name: str
    predicate: str
    mode: str = "fail"
    max_violation_fraction: float = 0.0

    def __post_init__(self):
        if self.mode not in ("fail", "warn"):
            raise ValueError(f"mode must be 'fail' or 'warn', got {self.mode!r}")


@dataclass(frozen=True)
class UniqueKey:
    """Table-level uniqueness invariant on a column: violations =
    count(col) - count(distinct col) (NULLs are not counted — pair with a
    not-null Expectation if NULL keys are also illegal)."""

    name: str
    column: str
    mode: str = "fail"
    max_violation_fraction: float = 0.0

    def __post_init__(self):
        # same guard as Expectation: a typo'd mode ('Fail') would silently
        # degrade a blocking invariant to warn-only in gate_and_publish
        if self.mode not in ("fail", "warn"):
            raise ValueError(f"mode must be 'fail' or 'warn', got {self.mode!r}")


def evaluate_expectations(
    df: DataFrame, checks: list[Expectation | UniqueKey]
) -> DataFrame:
    """One-pass evaluation: returns a report DataFrame with one row per
    check — (check_name, violations, total, passed) — computed as a single
    aggregate over ``df`` (all conditional sums + exact distinct counts ride
    one scan) and reshaped to rows in-plan with ``stack``; only the report
    itself reaches the driver."""
    if not checks:
        raise ValueError("evaluate_expectations: no checks given")
    seen: set[str] = set()
    for c in checks:
        if c.name in seen:
            raise ValueError(f"duplicate check name {c.name!r}")
        seen.add(c.name)

    aggs = [F.count(F.lit(1)).alias("_total")]
    for i, c in enumerate(checks):
        if isinstance(c, Expectation):
            # violation when the predicate is FALSE or NULL (a predicate
            # that can't be evaluated is not a pass)
            aggs.append(
                F.sum(F.when(F.expr(c.predicate), 0).otherwise(1)).alias(f"_v{i}")
            )
        elif isinstance(c, UniqueKey):
            aggs.append(
                (F.count(F.col(c.column)) - F.count_distinct(F.col(c.column))).alias(
                    f"_v{i}"
                )
            )
        else:
            raise TypeError(f"unsupported check type: {type(c).__name__}")

    one = df.agg(*aggs)
    # stack(n, name1, v1, allowed1, name2, v2, allowed2, ...) -> rows
    parts = []
    for i, c in enumerate(checks):
        # Spark SQL string literals treat backslash as an escape — a name
        # like r'col\time' would come back with a TAB (breaking the
        # by-name report lookup) or fail to parse; escape it first
        nm = c.name.replace("\\", "\\\\").replace("'", "''")
        parts.append(
            f"'{nm}', CAST(coalesce(_v{i}, 0) AS BIGINT), "
            f"CAST({c.max_violation_fraction!r} AS DOUBLE)"
        )
    stacked = one.select(
        F.col("_total").cast("long").alias("total"),
        F.expr(
            f"stack({len(checks)}, {', '.join(parts)}) "
            "AS (check_name, violations, max_fraction)"
        ),
    )
    return stacked.select(
        "check_name",
        "violations",
        "total",
        (
            F.col("violations")
            <= F.col("max_fraction") * F.greatest(F.col("total"), F.lit(1))
        ).alias("passed"),
    )


class QualityGateError(RuntimeError):
    """A fail-mode expectation exceeded its violation budget during a gated
    publish. Carries the full report for forensics."""

    def __init__(self, failed: list[dict], report: list[dict]):
        self.failed = failed
        self.report = report
        names = ", ".join(f["check_name"] for f in failed)
        super().__init__(f"quality gate failed: {names}")


def gate_and_publish(
    table,
    token: str,
    checks: list[Expectation | UniqueKey],
    abandon_on_fail: bool = False,
) -> list[dict]:
    """Audit a staged lake commit and publish it iff every fail-mode check
    passes (write-audit-publish: ParquetLakeTable.merge_staged produced
    ``token``; readers see nothing until the publish here).

    On failure raises QualityGateError; by default the stage stays PARKED on
    disk (read_staged(token) reproduces the exact audited state for
    forensics, publish_staged(token) ships it after a manual override,
    abandon_staged(token) frees the batch for redelivery). Pass
    ``abandon_on_fail=True`` to drop the stage immediately.

    Returns the report as a list of dicts (check_name, violations, total,
    passed, mode) — warn-mode failures are reported, never blocking."""
    by_name = {c.name: c for c in checks}
    rows = evaluate_expectations(table.read_staged(token), checks).collect()
    report = [
        {**r.asDict(), "mode": by_name[r["check_name"]].mode} for r in rows
    ]
    failed = [r for r in report if not r["passed"] and r["mode"] == "fail"]
    if failed:
        if abandon_on_fail:
            table.abandon_staged(token)
        raise QualityGateError(failed, report)
    table.publish_staged(token)
    return report
