"""Inventory facts: Fact Inventory Summary and Fact Inventory Movement.

Reference pipelines: `InventorySummaries/run.js:63-101` (single scan →
8-col null-guarded projection → `DL_Fact_Inventory_Summary_Temp` +
`DL_UPSERT_FACT_INVENTORY_SUMMARY`) and `InventoryMovement/run.js:63-115`
(scan → 15-col projection with a Jakarta-shifted movement date →
`DL_Fact_Inventory_Movement_Temp`).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from com_danliris_service_etl_spark.jobs._helpers import bool_str, jkt_date, nz_str
from com_danliris_service_etl_spark.plans.jobs import JobSpec
from com_danliris_service_etl_spark.sources.catalog import Catalog


def build_inventory_summaries(
    spark: SparkSession, catalog: Catalog, wm: dt.datetime
) -> DataFrame:
    """`InventorySummaries/run.js:66-85` extract (watermark `>`), `:87-100`
    transform. Column aliases follow the staging table's bracketed names
    (`run.js:123`)."""
    src = catalog.read("inventorysummaries").filter(F.col("_lastmodifiedutc") > F.lit(wm))
    return src.select(
        nz_str("storageCode").alias("storage_code"),
        nz_str("storageName").alias("storage_name"),
        F.col("quantity").alias("quantity"),
        nz_str("productCode").alias("product_code"),
        nz_str("productName").alias("product_name"),
        nz_str("uomunit").alias("uom"),
        bool_str("_isdeleted").alias("deleted"),
        nz_str("no").alias("code"),
    )


def build_inventory_movement(
    spark: SparkSession, catalog: Catalog, wm: dt.datetime
) -> DataFrame:
    """`InventoryMovement/run.js:63-89` extract (watermark `>`), `:92-115`
    transform — the movement `date` is shifted +7h then day-formatted (D3/D4)
    and is NOT null-guarded in the reference (a null date renders the epoch);
    here it stays NULL, the evident intent."""
    src = catalog.read("inventorymovements").filter(F.col("_lastmodifiedutc") > F.lit(wm))
    return src.select(
        nz_str("storageCode").alias("storage_code"),
        nz_str("storageName").alias("storage_name"),
        jkt_date("date").alias("date"),
        F.col("quantity").alias("quantity"),
        nz_str("type", sanitize=False).alias("status"),
        nz_str("productCode").alias("product_code"),
        nz_str("productName").alias("product_name"),
        nz_str("uomunit").alias("uom"),
        bool_str("_isdeleted").alias("deleted"),
        nz_str("no").alias("code"),
        nz_str("referenceNo").alias("reference_no"),
        nz_str("referenceType").alias("reference_type"),
        F.col("before").alias("before"),
        F.col("after").alias("after"),
        nz_str("remark").alias("remark"),
    )


SPECS = [
    JobSpec(
        name="Fact Inventory Summary from MongoDB to Azure DWH",
        build=build_inventory_summaries,
        merge_keys=["code"],
        target="dl_fact_inventory_summary",
    ),
    JobSpec(
        name="Fact Inventory Movement From MongoDB to Azure DWH",
        build=build_inventory_movement,
        merge_keys=["code"],
        target="dl_fact_inventory_movement",
    ),
]
