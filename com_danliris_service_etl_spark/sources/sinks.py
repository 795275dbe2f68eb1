"""Sinks: MERGE-style upsert and batched writes (SURVEY.md §2.1 S5/S6/S7/S9).

The reference stages rows into `*_Temp` tables with chunked INSERTs inside a
transaction, then runs an opaque `DL_UPSERT_FACT_*` stored proc
(`Pembelian/run.js:299-360`). The engine's contract is the defensible
reading of that proc: key-based upsert (update-or-insert on the fact's
natural key). Delta Lake's `MERGE INTO` is the production target; this
module also provides a pure-parquet emulation (anti-join + union +
atomic-rename) because the test image has no Delta jars.
"""

from __future__ import annotations

import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from com_danliris_service_etl_spark.sources import fsutil


def _delta_available(spark: SparkSession) -> bool:
    # NB: plain `spark._jvm.io.delta.tables.DeltaTable` attribute access
    # NEVER raises — py4j silently returns a JavaPackage stub for any
    # missing class — so probe with an actual JVM class lookup. The
    # PYTHON package must be probed too: with jars but no pip
    # `delta-spark`, the fresh-fact branch would commit the fact to Delta
    # format and every later merge would die on the `from delta.tables`
    # import — with no parquet fallback able to read the fact.
    import importlib.util

    if importlib.util.find_spec("delta") is None:
        return False
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "io.delta.tables.DeltaTable"
        )
        return True
    except Exception:
        return False


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: Sequence[str],
    dedupe_updates: bool = True,
    order_col: str | None = None,
    replace_group: bool = False,
) -> None:
    """S6 — upsert ``updates`` into the fact at ``target_path`` on ``keys``.

    Idempotence: running the same batch twice leaves the fact unchanged
    (SURVEY.md §5.4). When the batch itself carries duplicate keys (the
    re-extracted + updated rows case), ``order_col`` picks the winner
    (latest), matching MERGE's requirement of a unique source per key.

    ``replace_group=True`` is the DETAIL-GRAIN mode: ``keys`` identify a
    replace group (e.g. an intern note whose fact rows are its N details),
    not a unique row. All fact rows for the batch's keys are deleted and
    ALL batch rows inserted — the reference's stage-then-
    ``DL_UPSERT_FACT_*`` shape for 1:N facts (`GarmentTotalHutang/
    run.js:257-283` stages every detail row of each re-extracted note).
    No dedupe runs, so the detail grain survives the load.

    On Delta: compiles to ``MERGE INTO`` (row grain) or MERGE-delete +
    append (group grain). On plain parquet (test image): target anti-join
    updates, union, write to temp dir, swap-with-backup. The swap is the
    only non-scalable piece — a full rewrite of the fact — and exists
    solely because the local image lacks Delta; on a real cluster the
    Delta branch runs and touches only matching files (data-skipping on
    merge keys).
    """
    key_list = list(keys)
    # Kept BEFORE the dedupe rewrite: the quiet-night emptiness probe
    # below is equivalent on the raw frame (dedupe maps empty to empty
    # and never empties a non-empty batch) and skips the dropDuplicates
    # exchange the deduped frame would pay just to answer limit-1 (r14).
    raw_updates = updates
    if replace_group:
        dedupe_updates = False
    if dedupe_updates:
        if order_col:
            updates = (
                updates.groupBy(*key_list)
                .agg(F.max_by(F.struct(*updates.columns), order_col).alias("__s"))
                .select("__s.*")
            )
        else:
            updates = updates.dropDuplicates(key_list)

    # Crash recovery first (fsutil.recover_interrupted_swap): restore a
    # `<target>.old` left by a kill between the swap's two renames — the
    # fresh-target branch would otherwise silently rebuild the fact from
    # this batch alone — and garbage-collect stale `.tmp-*` siblings from
    # crashed temp writes (each would otherwise hold a full copy of the
    # fact forever). merge_upsert is idempotent, so re-running the
    # interrupted batch after the restore is safe. All probes and the
    # swap route through the Hadoop FileSystem of the target's scheme
    # (fsutil) — driver-local os.path is always False on hdfs://s3a://
    # paths. The swap's crash-atomicity needs atomic rename
    # (local/HDFS/ABFS); on S3A use the Delta branch instead (fsutil
    # module docstring).
    target_path = target_path.rstrip("/")
    fsutil.recover_interrupted_swap(spark, target_path)

    # "Fresh" means NO COMMITTED DATA — not "directory absent": a kill
    # during the very first write leaves a `_temporary`-only directory
    # that a bare existence probe mistakes for a live fact, wedging every
    # retry on an unreadable target. Probe for committed parquet or a
    # Delta log instead, and clear the wreckage before the fresh write.
    has_delta_log = fsutil.exists(spark, f"{target_path}/_delta_log")
    if not has_delta_log and not fsutil.has_committed_parquet(spark, target_path):
        fsutil.delete(spark, target_path)
        # Fresh fact: create it in Delta format when Delta is available,
        # or every subsequent merge would miss the `_delta_log` check and
        # run the non-scalable full-rewrite parquet emulation forever.
        if _delta_available(spark):
            updates.write.format("delta").mode("overwrite").save(target_path)
        else:
            updates.write.mode("overwrite").parquet(target_path)
        return

    if has_delta_log and not _delta_available(spark):
        # HARD STOP, not a fallback: spark.read.parquet over a Delta dir
        # ignores the transaction log and reads every data file ever
        # written — logically-removed rows resurrect — and the parquet
        # swap would then delete `_delta_log`, irreversibly converting
        # the fact to parquet with corrupted contents. A missing pip
        # `delta-spark` (or missing jars) on a Delta fact is an
        # environment error, never a reason to rewrite the fact.
        raise RuntimeError(
            f"Delta fact at {target_path} (_delta_log present) but the "
            "delta-spark python package/jars are unavailable in this "
            "session; refusing the parquet fallback, which would read "
            "logically-removed files and destroy the transaction log. "
            "Install delta-spark + jars, or restore the environment."
        )

    # Quiet-night short-circuit (r13, measured in PIPELINE_BENCH.json):
    # an EMPTY batch into an EXISTING committed fact is a no-op by
    # definition — the anti-join keeps every row and the union adds none
    # — yet the parquet emulation would still pay a full fact
    # read→rewrite→swap (and Delta a merge transaction) for it. Skipping
    # is exact; it runs only past the fresh-target branch above, so a
    # first-night empty extract still CREATES the fact (otherwise the
    # empty-fact⇒full-extract fallback would re-extract every night).
    # The probe is one limit-1 job on the caller's already-persisted
    # increment (pre-dedupe — no exchange under the limit).
    if raw_updates.isEmpty():
        return

    if has_delta_log:
        from delta.tables import DeltaTable  # type: ignore

        tgt = DeltaTable.forPath(spark, target_path)
        cond = " AND ".join(f"t.{k} <=> s.{k}" for k in key_list)
        if replace_group:
            # Delete every fact row whose group key appears in the batch,
            # then append the batch: detail rows never collapse. NB this
            # is TWO Delta transactions — a crash (or a concurrent
            # reader) between them sees the batch's groups deleted but
            # not yet re-inserted. The watermark not advancing heals it
            # on the re-run, but unlike the parquet swap there is a
            # visible window; readers needing a consistent view should
            # read a pinned Delta version (time travel) or gate on the
            # migration log's Successful row.
            (
                tgt.alias("t")
                .merge(updates.select(*key_list).distinct().alias("s"), cond)
                .whenMatchedDelete()
                .execute()
            )
            updates.write.format("delta").mode("append").save(target_path)
            return
        (
            tgt.alias("t")
            .merge(updates.alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return

    target = spark.read.parquet(target_path)
    # Null-safe key equality (<=>): merge keys can legitimately be NULL
    # (e.g. a kanban with no steps), and a plain equi-anti-join would never
    # match those rows — re-runs would duplicate them. This mirrors the
    # Delta branch's `t.k <=> s.k` condition.
    upd_keys = updates.select(*key_list).distinct()
    for k in key_list:
        upd_keys = upd_keys.withColumnRenamed(k, f"__u_{k}")
    cond = None
    for k in key_list:
        eq = F.col(k).eqNullSafe(F.col(f"__u_{k}"))
        cond = eq if cond is None else (cond & eq)
    kept = target.join(upd_keys, cond, "left_anti")
    merged = kept.unionByName(updates.select(*target.columns))
    # Temp dir is a SIBLING of the target (same filesystem — rename must
    # not cross schemes), uniquified so concurrent merges to different
    # targets never collide.
    tmp = f"{target_path}.tmp-{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    # Swap with a recovery copy at every step (fsutil.swap_with_backup —
    # shared with compact_small_files and the streaming folds): a crash
    # at any point leaves either the old or the new fact intact on disk,
    # and recover_interrupted_swap above restores/GCs on the next run.
    fsutil.swap_with_backup(spark, tmp, target_path)


def write_fact(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] | None = None,
    mode: str = "overwrite",
    dynamic_overwrite: bool = False,
) -> None:
    """S5 — bulk load. The reference's 200/500/1000/4000-row INSERT chunking
    (`Pembelian/run.js:313`) is Spark partition-level parallel write here;
    ``partition_by`` (typically a date column) is the 100 TB layout knob —
    partition pruning replaces full scans for incremental readers.

    ``dynamic_overwrite``: with a partitioned target, a plain
    ``mode="overwrite")`` TRUNCATES THE WHOLE TABLE even when the batch
    holds one day — the incremental-nightly hazard. Dynamic mode (the
    per-write ``partitionOverwriteMode`` option, no session conf touched)
    replaces only the partitions present in ``df`` and leaves the rest of
    the 100 TB layout untouched."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
        if dynamic_overwrite and mode == "overwrite":
            writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.parquet(path)


def date_dimension(spark: SparkSession, facts: DataFrame, date_col: str) -> DataFrame:
    """S7 — derive the date dimension rows the `DL_INSERT_DIMTIME` proc
    maintains (`Pembelian/run.js:331`): distinct dates with calendar
    attributes, computed set-at-a-time."""
    d = F.col("date")
    return (
        facts.select(F.to_date(date_col).alias("date"))
        .where(d.isNotNull())
        .distinct()
        .select(
            d,
            F.year(d).alias("year"),
            F.quarter(d).alias("quarter"),
            F.month(d).alias("month"),
            F.dayofmonth(d).alias("day"),
            F.dayofweek(d).alias("day_of_week"),
            F.weekofyear(d).alias("week_of_year"),
            F.date_format(d, "MMMM").alias("month_name"),
            F.date_format(d, "EEEE").alias("day_name"),
        )
    )
