"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` smoke-runs the flagship query at sf0.001; `queries()` /
`oracle_sql()` expose the full operator registry (SURVEY.md §2 inventory +
LLM-pipeline extensions) for the driver's DuckDB correctness gate at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from com_danliris_service_etl_spark.plans.registry import load_all

REGISTRY = load_all()

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary: scan→filter→group→8 aggs) on sf0.001."""
    fn, _ = REGISTRY["a0_pricing_summary"]
    return fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted for non-SQL-expressible ops
    (driver then records the weaker rows-only check)."""
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
