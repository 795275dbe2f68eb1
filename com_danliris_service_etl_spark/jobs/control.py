"""Control-plane job: migration-log sync (`MigrationLogFunc/index.js:12-143`).

The reference aggregates its MongoDB `migration-log` collection —
`$match(status ∈ {Successful, success}) → $project → $sort(finish desc) →
$group(by description, $first $$ROOT)` (A1: latest successful run per job)
— and batch-inserts the result into the DWH `[migration-log]` table.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from com_danliris_service_etl_spark.operators.joins import latest_per_key
from com_danliris_service_etl_spark.plans.jobs import JobSpec
from com_danliris_service_etl_spark.sources.catalog import Catalog


def build_migration_log_sync(
    spark: SparkSession, catalog: Catalog, wm: dt.datetime
) -> DataFrame:
    """A1 argmax — one row per job description, the latest successful run
    (`MigrationLogFunc/index.js:17-41`). The `$first` after `$sort` is the
    latest-per-key window; `finish` is the explicit tiebreak ordering."""
    log = catalog.read("migration_log").filter(
        F.col("status").isin("Successful", "success")
    )
    latest = latest_per_key(log, keys=["description"], max_of="finish")
    return latest.select(
        F.col("description"),
        F.col("start"),
        F.col("finish"),
        F.col("executionTime").alias("execution_time"),
        F.col("status"),
    )


SPECS = [
    JobSpec(
        name="Migration Log from MongoDB to Azure DWH",
        build=build_migration_log_sync,
        merge_keys=["description"],
        target="dl_migration_log",
    ),
]
