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


# Queries the round-1 harness never recorded (it stopped after 50 entries in
# iteration order) plus the round-1 failures come FIRST, so whatever budget
# the harness applies, the least-proven queries get checked before the ones
# already green in CORRECTNESS_r01.
_PRIORITY = [
    "d7_year_repair",
    "t1_t5_string_scalars",
    "m1_m2_m9_math_scalars",
    "m4_m8_buckets_status",
    "m6_m7_categories",
    "x1_json_extract",
    "st1_tumbling_window",
    "st2_sliding_window",
    "st3_sessionize",
    "dd2_minhash_lsh",
    "mm2_decode_features",
    "mm3_frame_sample",
    "j7_asof_join",
    "a1_latest_per_key",
    "a2_max_per_key",
    "p5_not_null",
    "p8_falsy_zero",
    "d2_m3_durations",
    "d5_d8_timestamp_reconstruct",
]


def _ordered_names() -> list[str]:
    rest = [n for n in REGISTRY if n not in _PRIORITY]
    return [n for n in _PRIORITY if n in REGISTRY] + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return {name: REGISTRY[name][0] for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted for non-SQL-expressible ops
    (driver then records the weaker rows-only check)."""
    return {
        name: REGISTRY[name][1]
        for name in _ordered_names()
        if REGISTRY[name][1] is not None
    }
