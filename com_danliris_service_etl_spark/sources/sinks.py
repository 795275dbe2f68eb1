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

import os
import shutil
import tempfile
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _delta_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.io.delta.tables.DeltaTable  # type: ignore[union-attr]
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
) -> None:
    """S6 — upsert ``updates`` into the fact at ``target_path`` on ``keys``.

    Idempotence: running the same batch twice leaves the fact unchanged
    (SURVEY.md §5.4). When the batch itself carries duplicate keys (the
    re-extracted + updated rows case), ``order_col`` picks the winner
    (latest), matching MERGE's requirement of a unique source per key.

    On Delta: compiles to ``MERGE INTO``. On plain parquet (test image):
    target anti-join updates, union, write to temp dir, atomic swap. The
    swap is the only non-scalable piece — a full rewrite of the fact — and
    exists solely because the local image lacks Delta; on a real cluster the
    Delta branch runs and touches only matching files (data-skipping on
    merge keys).
    """
    key_list = list(keys)
    if dedupe_updates:
        if order_col:
            updates = (
                updates.groupBy(*key_list)
                .agg(F.max_by(F.struct(*updates.columns), order_col).alias("__s"))
                .select("__s.*")
            )
        else:
            updates = updates.dropDuplicates(key_list)

    if _delta_available(spark) and os.path.exists(os.path.join(target_path, "_delta_log")):
        from delta.tables import DeltaTable  # type: ignore

        tgt = DeltaTable.forPath(spark, target_path)
        cond = " AND ".join(f"t.{k} <=> s.{k}" for k in key_list)
        (
            tgt.alias("t")
            .merge(updates.alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return

    if not os.path.exists(target_path):
        updates.write.mode("overwrite").parquet(target_path)
        return

    target = spark.read.parquet(target_path)
    # Null-safe key equality (<=>): merge keys can legitimately be NULL
    # (e.g. a kanban with no steps), and a plain equi-anti-join would never
    # match those rows — re-runs would duplicate them. This mirrors the
    # Delta branch's `t.k <=> s.k` condition.
    upd_keys = updates.select(*key_list)
    for k in key_list:
        upd_keys = upd_keys.withColumnRenamed(k, f"__u_{k}")
    cond = None
    for k in key_list:
        eq = F.col(k).eqNullSafe(F.col(f"__u_{k}"))
        cond = eq if cond is None else (cond & eq)
    kept = target.join(upd_keys, cond, "left_anti")
    merged = kept.unionByName(updates.select(*target.columns))
    tmp = tempfile.mkdtemp(prefix="merge_", dir=os.path.dirname(target_path) or ".")
    merged.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(target_path)
    os.replace(tmp, target_path)


def write_fact(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """S5 — bulk load. The reference's 200/500/1000/4000-row INSERT chunking
    (`Pembelian/run.js:313`) is Spark partition-level parallel write here;
    ``partition_by`` (typically a date column) is the 100 TB layout knob —
    partition pruning replaces full scans for incremental readers."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
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
