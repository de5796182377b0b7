"""Data-quality expectations — declarative checks, one pass, long report.

The reference's only quality machinery is operational: before/after
row-count audits (``common/loader.py:17,30``), duplicate counting
(``pipelines/etl_zmmidr_bun.py:63-67``), and max-length profiling
(``pipelines/etl_zrssale.py:66-69``).  This operator generalizes those
into the expectations pattern (dbt tests / Deequ constraints): a config
of named checks evaluated in a SINGLE aggregate pass over the table —
at 100 TB the difference between one scan and one scan *per check*.

Checks are plain ``Column`` aggregate expressions returning a violation
count, so arbitrary constraints compose (row predicates via
:func:`violation`, uniqueness via :func:`duplicate_count`) and
everything stays in whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def violation(cond: Column) -> Column:
    """Aggregate counting rows where ``cond`` (the VIOLATION predicate,
    null-safe: null counts as a violation for not-null style checks only
    if the caller writes it so) is true."""
    return F.sum(F.when(cond, 1).otherwise(0)).cast("long")


def duplicate_count(cols: Sequence[str]) -> Column:
    """Aggregate counting surplus rows beyond one per distinct key —
    the uniqueness expectation.  Rows with a NULL key column are not
    counted by ``countDistinct``; pair with a not-null check on the
    same columns."""
    return (
        F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols])
    ).cast("long")


def quality_report(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Evaluate every check in one aggregate pass; return the long-format
    report ``(check_name, n_violations)``.

    One scan, one (partial-aggregated) reduction to a single row, then a
    driver-free unpivot — the report is check-count-sized regardless of
    table size.
    """
    wide = df.agg(*[expr.alias(name) for name, expr in checks.items()])
    return wide.unpivot([], list(checks), "check_name", "n_violations")
