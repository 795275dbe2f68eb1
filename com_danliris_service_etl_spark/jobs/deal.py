"""Deal-tracking facts: Board, Activity, Deal, Stage (+StageDeals map).

Reference pipelines: `DealTrackingBoard/run.js:64-133` (broadcast currency
probe J3), `DealTrackingActivity/run.js:63-113`,
`DealTrackingDeal/run.js:63-125` (left join Companies),
`DealTrackingStage/run.js:63-145` (S9 dual-target: stages + stage→deal map).

Reference bugs implemented as intended (SURVEY §2.14):
- `DealTrackingDeal/run.js:109` reads `item.contact.lastName` which was
  never selected (crash) — intent: contactName alone.
- `DealTrackingActivity/run.js:77,103` selects `taskTitle` but emits
  `item.title` (always null) — intent: the selected taskTitle.
- `DealTrackingStage/run.js:133-138` references `stageId`/`id` without
  `item.` (ReferenceError) — intent: the row's columns.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from com_danliris_service_etl_spark.jobs._helpers import (
    bool_str,
    jkt_date,
    jkt_datetime,
    nz_str,
)
from com_danliris_service_etl_spark.plans.jobs import JobSpec
from com_danliris_service_etl_spark.sources.catalog import Catalog


def build_deal_board(spark: SparkSession, catalog: Catalog, wm: dt.datetime) -> DataFrame:
    """`DealTrackingBoard/run.js:64-116`: boards (watermark `>`) + full
    currencies scan probed by code — J3 broadcast hash join."""
    b = catalog.read("dealtrackingboards").filter(F.col("lastmodifiedutc") > F.lit(wm))
    cur = catalog.read("currencies").select(
        F.col("code").alias("currencyCode"), F.col("rate").alias("currencyRate")
    )
    joined = b.join(F.broadcast(cur), "currencyCode", "left")
    return joined.select(
        bool_str("IsDeleted").alias("deleted"),
        F.col("id").cast("string").alias("id"),
        nz_str("code").alias("code"),
        jkt_date("createdutc").alias("created_date"),
        F.col("CreatedBy").cast("string").alias("created_by"),
        nz_str("title").alias("title"),
        nz_str("currencyCode").alias("currency_code"),
        nz_str(F.col("currencyRate").cast("string"), sanitize=False).alias("currency_rate"),
        nz_str("currencySymbol").alias("currency_symbol"),
    )


def build_deal_activity(
    spark: SparkSession, catalog: Catalog, wm: dt.datetime
) -> DataFrame:
    """`DealTrackingActivity/run.js:63-113` (watermark `>`); createdDate is
    the one datetime-formatted output (`:98`); title emits the selected
    taskTitle (intent, see module docstring)."""
    a = catalog.read("dealtrackingactivities").filter(F.col("lastmodifiedutc") > F.lit(wm))
    return a.select(
        bool_str("IsDeleted").alias("deleted"),
        F.col("id").cast("string").alias("id"),
        nz_str("code").alias("code"),
        jkt_datetime("createdutc").alias("created_date"),
        F.col("createdby").cast("string").alias("created_by"),
        nz_str(F.col("dealId").cast("string"), sanitize=False).alias("deal_id"),
        nz_str("type").alias("type"),
        nz_str("notes").alias("notes"),
        nz_str("taskTitle").alias("title"),
        jkt_date("dueDate").alias("due_date"),
        nz_str(F.col("status").cast("string"), sanitize=False).alias("status"),
        nz_str(F.col("stagefromid").cast("string")).alias("source_stage_id"),
        nz_str(F.col("stagetoid").cast("string")).alias("target_stage_id"),
        nz_str("assignedTo").alias("assigned_to"),
    )


def build_deal_deal(spark: SparkSession, catalog: Catalog, wm: dt.datetime) -> DataFrame:
    """`DealTrackingDeal/run.js:63-125`: deals LEFT JOIN Companies for the
    city (J1), watermark `>`; productCode/productName intentionally NULL
    (`run.js:115-117` commented out in the reference)."""
    d = catalog.read("dealtrackingdeals").filter(F.col("lastmodifiedutc") > F.lit(wm))
    c = catalog.read("companies").select(
        F.col("Id").alias("CompanyId"), F.col("City").alias("companyCity")
    )
    joined = d.join(F.broadcast(c), "CompanyId", "left")
    return joined.select(
        bool_str("IsDeleted").alias("deleted"),
        F.col("id").cast("string").alias("id"),
        nz_str("code").alias("code"),
        jkt_date("createdutc").alias("created_date"),
        F.col("CreatedBy").cast("string").alias("created_by"),
        nz_str("name").alias("name"),
        F.col("amount").cast("string").alias("amount"),
        nz_str("companyCode").alias("company_code"),
        nz_str("companyName").alias("company_name"),
        nz_str("companyCity").alias("company_city"),
        nz_str("contactCode").alias("contact_code"),
        nz_str("contactName").alias("contact_name"),
        jkt_date("closeDate").alias("close_date"),
        nz_str("description").alias("description"),
        nz_str("reason").alias("reason"),
        F.lit(None).cast("string").alias("product_code"),
        F.lit(None).cast("string").alias("product_name"),
        nz_str(F.col("quantity").cast("string"), sanitize=False).alias("quantity"),
        nz_str("uomUnit").alias("uom"),
    )


def build_deal_stage(spark: SparkSession, catalog: Catalog, wm: dt.datetime) -> DataFrame:
    """`DealTrackingStage/run.js:63-131`: stages scan (watermark `>`)."""
    s = catalog.read("dealtrackingstages").filter(F.col("lastmodifiedutc") > F.lit(wm))
    return s.select(
        bool_str("IsDeleted").alias("deleted"),
        F.col("id").cast("string").alias("id"),
        nz_str("code").alias("code"),
        jkt_date("createdutc").alias("created_date"),
        F.col("createdby").cast("string").alias("created_by"),
        F.col("boardId").cast("string").alias("board_id"),
        nz_str("name").alias("name"),
    )


def build_deal_stage_deals(
    spark: SparkSession, catalog: Catalog, wm: dt.datetime
) -> DataFrame:
    """`DealTrackingStage/run.js:85-103,132-138`: stage→deal map from the
    deals table (S9 second target; the reference's ReferenceError fixed to
    its evident intent)."""
    d = catalog.read("dealtrackingdeals").filter(F.col("lastmodifiedutc") > F.lit(wm))
    return d.select(
        F.col("stageId").cast("string").alias("stage_id"),
        F.col("id").cast("string").alias("deal_id"),
    )


SPECS = [
    JobSpec(
        name="Fact Deal Tracking Board from MongoDB to Azure DWH",
        build=build_deal_board,
        merge_keys=["id"],
        target="dl_fact_deal_tracking_board",
    ),
    JobSpec(
        name="Fact Deal Tracking Activity from MongoDB to Azure DWH",
        build=build_deal_activity,
        merge_keys=["id"],
        target="dl_fact_deal_tracking_activity",
    ),
    JobSpec(
        name="Fact Deal Tracking Deal from MongoDB to Azure DWH",
        build=build_deal_deal,
        merge_keys=["id"],
        target="dl_fact_deal_tracking_deal",
    ),
    JobSpec(
        name="Fact Deal Tracking Stage from MongoDB to Azure DWH",
        build=build_deal_stage,
        merge_keys=["id"],
        target="dl_fact_deal_tracking_stage",
        extra_targets={
            "dl_fact_deal_tracking_stage_deal": (build_deal_stage_deals, ["deal_id"])
        },
    ),
]
