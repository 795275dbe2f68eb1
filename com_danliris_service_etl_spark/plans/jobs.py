"""Declarative job runner: the reference's 5-stage pipeline shape
(`Pembelian/run.js:10-13` — watermark → extract → join → transform → load,
bracketed by migration-log bookkeeping `run.js:41-63`) as a reusable spec.

Each of the reference's 22 jobs becomes a JobSpec: a `build` function that
declares the extract+join+transform plan (given the session, a Catalog of
sources, and the watermark), plus merge keys and a target. The runner owns
the control-plane protocol: read watermark → run plan → MERGE → advance
watermark only on success (exactly-once at the job level, idempotent
re-runs — replacing the reference's staging-table + `DL_UPSERT_FACT_*`
stored-proc transaction `Pembelian/run.js:303-360`).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from com_danliris_service_etl_spark.sources.catalog import Catalog
from com_danliris_service_etl_spark.sources.sinks import merge_upsert
from com_danliris_service_etl_spark.sources.watermark import WatermarkStore

BuildFn = Callable[[SparkSession, Catalog, dt.datetime], DataFrame]


@dataclass
class JobSpec:
    name: str
    build: BuildFn
    merge_keys: Sequence[str]
    target: str
    order_col: str | None = None  # winner-picking column for duplicate keys in a batch
    grain: str = "row"
    """``row``: merge_keys uniquely identify a fact row (dedupe + upsert).
    ``group``: the fact is 1:N per key (e.g. intern-note details) — the load
    replaces every fact row of each batch key with ALL the batch's rows for
    it, so the detail grain survives (see sinks.merge_upsert replace_group).
    """
    extra_targets: dict[str, tuple[BuildFn, Sequence[str]]] = field(default_factory=dict)
    """S9 dual-target loads (`DailyOperation/run.js:249,273`): extra
    (target -> (build, merge_keys)) pairs committed in the same run."""


@dataclass
class JobResult:
    job: str
    rows: int
    status: str
    started: dt.datetime
    finished: dt.datetime


def run_job(
    spark: SparkSession,
    spec: JobSpec,
    catalog: Catalog,
    store: WatermarkStore,
    now: Callable[[], dt.datetime] = dt.datetime.utcnow,
) -> JobResult:
    """Execute one pipeline run. Failures are recorded in the run log and
    re-raised; the watermark does not advance, so the next run re-extracts
    the same window and the MERGE keeps the fact consistent."""
    started = now()
    try:
        wm = store.read_watermark(spec.name)
        # Persist the increment across the telemetry count and the MERGE:
        # without it the whole extract+join+transform plan re-executes for
        # each action (the count, then the merge's reads). The increment
        # is watermark-bounded — one night's delta, not the fact — so
        # MEMORY_AND_DISK is safe at any corpus size.
        df = spec.build(spark, catalog, wm).persist()
        # unpersist in finally: if the MERGE raises, the exception handler
        # below re-raises — without the finally the MEMORY_AND_DISK cache
        # would leak for the rest of the session, and a scheduler that
        # continues with later layers accumulates leaked caches.
        try:
            rows = df.count()
            merge_upsert(
                spark,
                spec.target,
                df,
                spec.merge_keys,
                order_col=spec.order_col,
                replace_group=(spec.grain == "group"),
            )
        finally:
            df.unpersist()
        for target, (build_fn, keys) in spec.extra_targets.items():
            extra = build_fn(spark, catalog, wm)
            merge_upsert(spark, target, extra, keys)
        finished = now()
        store.commit_run(spec.name, started, finished, "Successful", rows)
        return JobResult(spec.name, rows, "Successful", started, finished)
    except Exception as exc:  # noqa: BLE001 — mirror of run.js error-to-log behavior
        finished = now()
        store.commit_run(spec.name, started, finished, f"Failed: {exc}"[:500], None)
        raise
