"""Query registry shared by all query-family modules.

Each entry pairs a Spark query function (spark, sf_dir) -> DataFrame with a
DuckDB oracle SQL string (or None for non-SQL-expressible ops, which get the
driver's weaker rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


# Table-handle cache: one schema/footer resolution per (session, dir,
# table) — what a metastore gives a real deployment. DataFrames are
# immutable plans, so reuse is safe; keyed on a stable session identity
# (applicationId + startTime) so a fresh session (tests) never sees stale
# handles and a recycled CPython object id can never collide.
_TABLE_CACHE: dict[tuple[str, int, str, str], DataFrame] = {}


def _session_key(spark: SparkSession) -> tuple[str, int]:
    sc = spark.sparkContext
    return (sc.applicationId, sc.startTime)


def _t(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    app_id, start = _session_key(spark)
    key = (app_id, start, sf_dir, table)
    df = _TABLE_CACHE.get(key)
    if df is None:
        # Evict dead sessions' handles so the cache is bounded by the
        # LIVE session's (dir, table) working set, not process history.
        for k in [k for k in _TABLE_CACHE if k[:2] != (app_id, start)]:
            del _TABLE_CACHE[k]
        if table == "events":
            # Footer-driven dispatch (sources/events_meta.py): only a
            # legacy TIMESTAMP(NANOS) fixture needs the nanosAsLong conf;
            # the common micros path leaves the caller's session untouched.
            from com_danliris_service_etl_spark.sources.events_meta import (
                configure_session_for_events,
            )

            configure_session_for_events(spark, sf_dir)
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        _TABLE_CACHE[key] = df
    return df


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with `ts` replaced by `ts_us` (epoch MICROS long) and `ts_utc`
    (micros TimestampType) — epoch-micros is the representation Spark and
    DuckDB agree on exactly (oracle side: ``epoch_us(ts)``), whatever the
    parquet generation's physical type. The per-generation dispatch lives
    in sources/events_meta.py, shared with the streaming read path."""
    from com_danliris_service_etl_spark.sources.events_meta import (
        events_ts_kind,
        events_ts_us_expr,
    )

    ev = _t(spark, sf_dir, "events")
    ts_us = events_ts_us_expr(events_ts_kind(sf_dir))
    return (
        ev.withColumn("ts_us", ts_us)
        .withColumn("ts_utc", F.timestamp_micros(F.col("ts_us")))
        .drop("ts")
    )


def load_all() -> dict[str, tuple[QueryFn, str | None]]:
    """Import every query-family module (side effect: registration)."""
    from com_danliris_service_etl_spark.plans import (  # noqa: F401
        queries,
        queries_gaps,
        queries_llm,
        queries_olap,
        queries_pipeline,
        queries_round3,
        queries_round4,
        queries_round6,
        queries_round7,
        queries_round7b,
        queries_round7c,
        queries_round7d,
        queries_round7e,
        queries_round8,
        queries_round9,
        queries_round9b,
        queries_round10,
        queries_round11,
        queries_scalars,
        queries_streaming,
    )

    return REGISTRY
