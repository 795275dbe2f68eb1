"""Data-quality constraint checking (Deequ/dbt-test-shaped, Spark-native).

The reference trusts its sources blindly — a nightly load that receives
duplicated keys or dangling foreign keys writes them into the fact and
nobody knows (SURVEY §2.14's crash sites are exactly this class). These
checks make the contract explicit: each constraint computes a metric and
a pass/fail over the full table, all scalar aggregations fused into ONE
pass over the data (Catalyst collapses the unioned single-row aggregates
over a shared scan), with referential integrity as a broadcast-or-
shuffle anti-join. The output is a tiny metrics table — the thing a
pipeline gate reads before publishing a load.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCHEMA = ["check", "metric", "passed"]


def _metric_row(df: DataFrame, name: str, metric: F.Column, passed: F.Column) -> DataFrame:
    return df.agg(
        F.lit(name).alias("check"),
        metric.cast("double").alias("metric"),
        passed.alias("passed"),
    )


def completeness(df: DataFrame, col: str, min_ratio: float = 1.0) -> DataFrame:
    """Non-null ratio of a column; passes at >= min_ratio."""
    ratio = F.count(col) / F.count(F.lit(1))
    return _metric_row(df, f"completeness({col})", ratio, ratio >= min_ratio)


def uniqueness(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Duplicate-key count over the given column set; passes at 0.
    count(distinct struct(...)) keeps it a single two-phase aggregate —
    no self-join."""
    dupes = F.count(F.lit(1)) - F.count_distinct(F.struct(*[F.col(c) for c in cols]))
    return _metric_row(df, f"uniqueness({','.join(cols)})", dupes, dupes == 0)


def in_range(df: DataFrame, col: str, lo: float, hi: float) -> DataFrame:
    """Out-of-range row count; passes at 0. NULLs don't count as
    violations (completeness is its own check)."""
    viol = F.count(F.when((F.col(col) < lo) | (F.col(col) > hi), 1))
    return _metric_row(df, f"in_range({col},{lo},{hi})", viol, viol == 0)


def referential_integrity(
    child: DataFrame, parent: DataFrame, fk: str, pk: str
) -> DataFrame:
    """Dangling-foreign-key count (child rows whose fk matches no parent
    pk); passes at 0. A left-anti join — broadcast when the parent is
    dimension-sized, shuffle otherwise; NULL fks are not dangling (SQL
    FK semantics), so they are filtered before the probe."""
    dangling = (
        child.filter(F.col(fk).isNotNull())
        .join(parent.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti")
    )
    return _metric_row(
        dangling, f"referential_integrity({fk})", F.count(F.lit(1)),
        F.count(F.lit(1)) == 0,
    )


def run_checks(checks: Sequence[DataFrame]) -> DataFrame:
    """Union the metric rows into one report. Each check is a single-row
    aggregate; Spark runs them as parallel jobs over shared cached scans
    and the result is |checks| rows — the gate a load reads before
    publish (`passed = every(passed)`)."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
