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
from com_danliris_service_etl_spark.sources.watermark import EPOCH, WatermarkStore

BuildFn = Callable[[SparkSession, Catalog, dt.datetime], DataFrame]


def _target_has_data(spark: SparkSession, target: str) -> bool:
    """Committed data present at the fact target (parquet files or a Delta
    log) — the probe behind the empty-fact ⇒ full-extract invariant."""
    from com_danliris_service_etl_spark.sources import fsutil

    target = target.rstrip("/")
    return fsutil.exists(spark, f"{target}/_delta_log") or fsutil.has_committed_parquet(
        spark, target
    )


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
    extra_targets: dict[str, tuple] = field(default_factory=dict)
    """S9 dual-target loads (`DailyOperation/run.js:249,273`): extra
    ``target -> (build, merge_keys)`` pairs committed in the same run. An
    optional third element — a dict of `merge_upsert` kwargs
    (``order_col``, ``replace_group``) — lets an extra load declare the
    same winner-picking / group-grain semantics the main target gets, so
    a duplicate-key extra batch is never silently resolved by an
    arbitrary ``dropDuplicates`` winner."""


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
        # Empty fact ⇒ full extract, whatever the log says: an advanced
        # watermark with NO committed target data means the fact was
        # redirected (run_nightly's target_dir against a shared store),
        # deleted, or lost — loading only the delta into an empty fact
        # would silently drop all history with a "Successful" status.
        # Falling back to EPOCH re-extracts everything; the MERGE makes
        # that idempotent. (One metadata probe per target per run.) The
        # probe covers EVERY target the job commits — an extra_targets
        # fact deleted/redirected while the main target still holds data
        # is the same silent-history-loss class, because all targets
        # share the one per-job watermark.
        if wm != EPOCH:
            all_targets = [spec.target, *spec.extra_targets]
            if any(not _target_has_data(spark, t) for t in all_targets):
                wm = EPOCH
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
        for target, extra_spec in spec.extra_targets.items():
            build_fn, keys, *rest = extra_spec
            opts = dict(rest[0]) if rest else {}
            # Same persist rationale as the main df: the parquet merge
            # references the batch at least twice (anti-join keys + the
            # union write) — without the cache the extra extract/join
            # re-executes per reference.
            extra = build_fn(spark, catalog, wm).persist()
            try:
                merge_upsert(spark, target, extra, keys, **opts)
            finally:
                extra.unpersist()
        finished = now()
        store.commit_run(spec.name, started, finished, "Successful", rows)
        return JobResult(spec.name, rows, "Successful", started, finished)
    except Exception as exc:  # noqa: BLE001 — mirror of run.js error-to-log behavior
        finished = now()
        store.commit_run(spec.name, started, finished, f"Failed: {exc}"[:500], None)
        raise
