"""Sales facts: Fact Production Order and the three sales-contract jobs
(Spinning / Weaving / FinishingPrinting) that UNION into one fact with a
`productionType` discriminator (U2).

Reference pipelines: `ProductionOrder/run.js:63-155` and
`SpinningSC/run.js:63-135` / `WeavingSC/run.js:63-140` /
`FinishingPrintingSC/run.js:63-142` — same transform, different source
tables and available material columns (Spinning lacks all four material
columns, Weaving lacks deliverySchedule/orderTypeName; absent fields fall
to NULL, `SpinningSC/run.js:108-111`).
"""

from __future__ import annotations

import datetime as dt
from functools import partial

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from com_danliris_service_etl_spark.functions.conditional import uom_to_meter
from com_danliris_service_etl_spark.functions.strings import (
    concat_ws_nullsafe,
    quote_sanitize,
)
from com_danliris_service_etl_spark.jobs._helpers import bool_str, jkt_date, nz_num, nz_str
from com_danliris_service_etl_spark.plans.jobs import JobSpec
from com_danliris_service_etl_spark.sources.catalog import Catalog


def _construction_string() -> F.Column:
    """T3 — `material + " " + construction + " " + yarnNo + " " + width`,
    NULL when any part is null (`SpinningSC/run.js:96-102`,
    `ProductionOrder/run.js:107-113`)."""
    return concat_ws_nullsafe(
        " ",
        quote_sanitize(F.col("materialName")),
        quote_sanitize(F.col("materialConstructionName")),
        quote_sanitize(F.col("yarnMaterialName")),
        quote_sanitize(F.col("materialWidth")),
    )


def build_production_order(
    spark: SparkSession, catalog: Catalog, wm: dt.datetime
) -> DataFrame:
    """`ProductionOrder/run.js:63-94` extract (watermark `>=`) + `:115-155`
    transform: M2 uom conversion into totalOrderConvertion, T3 construction
    string. The reference's unguarded `material.replace` crash on null
    material (`run.js:142`, SURVEY §2.14) is fixed by the null-safe concat."""
    src = catalog.read("productionorder").filter(F.col("lastmodifiedutc") >= F.lit(wm))
    return src.select(
        nz_str("salesContractNo").alias("sales_contract_no"),
        nz_str("OrderNo").alias("production_order_no"),
        nz_str("OrderTypeName").alias("order_type"),
        nz_str("ProcessTypeName").alias("process_type"),
        nz_str("MaterialName").alias("material"),
        nz_str("MaterialConstructionName").alias("material_construction"),
        nz_str("YarnMaterialName").alias("yarn_material_no"),
        nz_str("materialWidth").alias("material_width"),
        nz_num("orderQuantity").alias("order_quantity"),
        nz_str("UomUnit").alias("order_uom"),
        nz_str("BuyerName").alias("buyer"),
        nz_str("BuyerType").alias("buyer_type"),
        jkt_date("deliveryDate").alias("delivery_date"),
        jkt_date("CreatedUtc").alias("created_date"),
        F.when(
            nz_num("orderQuantity").isNotNull(),
            uom_to_meter(F.col("orderQuantity"), F.col("UomUnit")),
        ).alias("total_order_convertion"),
        _construction_string().alias("construction"),
        nz_str("BuyerCode").alias("buyer_code"),
        # placeholder columns the staging table carries (`run.js:143-144`)
        F.lit(None).cast("double").alias("cart_quantity"),
        F.lit(None).cast("string").alias("kanban_code"),
        bool_str("IsDeleted").alias("deleted"),
        nz_str("AccountUserName").alias("username"),
        bool_str("isClosed").alias("is_closed"),
    )


def _build_sales_contract(
    spark: SparkSession,
    catalog: Catalog,
    wm: dt.datetime,
    *,
    table: str,
    production_type: str,
) -> DataFrame:
    """Shared SC transform (U2): absent columns fall to NULL via schema
    harmonization before the common projection."""
    src = catalog.read(table).filter(F.col("lastmodifiedutc") > F.lit(wm))
    # Weaving names its material column `productname` (aliased in the
    # reference extract, `WeavingSC/run.js:76`).
    if "materialName" not in src.columns and "productname" in src.columns:
        src = src.withColumnRenamed("productname", "materialName")
    for optional in (
        "deliverySchedule",
        "orderTypeName",
        "materialName",
        "materialConstructionName",
        "yarnMaterialName",
        "materialWidth",
    ):
        if optional not in src.columns:
            src = src.withColumn(optional, F.lit(None).cast("string"))
    return src.select(
        nz_str("salesContractNo", sanitize=False).alias("sales_contract_no"),
        jkt_date("CreatedUtc").alias("sales_contract_date"),
        jkt_date("deliverySchedule").alias("delivery_schedule"),
        nz_str("buyerName").alias("buyer"),
        nz_str("buyerType").alias("buyer_type"),
        nz_str("orderTypeName", sanitize=False).alias("order_type"),
        nz_num("orderQuantity").alias("order_quantity"),
        nz_str("uomUnit").alias("order_uom"),
        F.when(
            nz_num("orderQuantity").isNotNull(),
            uom_to_meter(F.col("orderQuantity"), F.col("uomUnit")),
        ).alias("total_order_convertion"),
        nz_str("buyerCode", sanitize=False).alias("buyer_code"),
        F.lit(production_type).alias("production_type"),
        _construction_string().alias("construction"),
        nz_str("materialConstructionName").alias("material_construction"),
        nz_str("materialWidth").alias("material_width"),
        nz_str("materialName").alias("material"),
        bool_str("IsDeleted").alias("deleted"),
    )


build_spinning_sc = partial(
    _build_sales_contract, table="spinningsalescontract", production_type="Spinning"
)
build_weaving_sc = partial(
    _build_sales_contract, table="weavingsalescontract", production_type="Weaving"
)
build_finishing_printing_sc = partial(
    _build_sales_contract,
    table="finishingprintingsalescontracts",
    production_type="Finishing Printing",
)


SPECS = [
    JobSpec(
        name="Fact Production Order from MongoDB to Azure DWH",
        build=build_production_order,
        merge_keys=["production_order_no"],
        target="dl_fact_production_order",
    ),
    JobSpec(
        name="Fact Sales Contract Spinning from MongoDB to Azure DWH",
        build=build_spinning_sc,
        merge_keys=["sales_contract_no", "production_type"],
        target="dl_fact_sales_contract",
    ),
    JobSpec(
        name="Fact Sales Contract Weaving from MongoDB to Azure DWH",
        build=build_weaving_sc,
        merge_keys=["sales_contract_no", "production_type"],
        target="dl_fact_sales_contract",
    ),
    JobSpec(
        name="Fact Sales Contract Finishing Printing from MongoDB to Azure DWH",
        build=build_finishing_printing_sc,
        merge_keys=["sales_contract_no", "production_type"],
        target="dl_fact_sales_contract",
    ),
]
