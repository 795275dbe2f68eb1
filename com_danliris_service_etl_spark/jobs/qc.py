"""FinishingPrinting QC / status / shipment facts: FabricQC,
ProductionOrderStatus, PackingReceipt, ShipmentDocument.

Reference pipelines:
- `FabricQC/run.js:66-177` — QC scan (watermark `>=`; the offset-900/
  fetch-50 backfill pagination O4 is replaced by partitioned reads) with
  per-QC gradeTest and per-test criteria fetches (J5) flattened 3 levels
  deep with inner semantics (E3); A3 weighted scores.
- `ProductionOrderStatus/run.js:64-320` — FP sales contracts chained
  through four first-match lookups (J6: production order → kanban → daily
  operation → fabric QC), gradeTests exploded with left-outer semantics
  (E5 — contracts keep a row when no QC exists) and the W1 per-QC ordinal.
- `PackingReceipt/run.js:63-165` — receipts + full items scan group-joined
  (J4) and flattened with inner semantics (E4).
- `ShipmentDocument/run.js:63-200` — 4-level document (shipment → details
  → items → packingReceiptItems) flattened with inner semantics at every
  level (E4); deliveryDate is formatted WITHOUT the +7h shift
  (`run.js:176` — the one un-shifted date in the reference).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from com_danliris_service_etl_spark.functions.conditional import uom_to_meter
from com_danliris_service_etl_spark.functions.dates import fmt_date
from com_danliris_service_etl_spark.jobs._helpers import bool_str, jkt_date, nz_num, nz_str
from com_danliris_service_etl_spark.operators.joins import first_match_join
from com_danliris_service_etl_spark.plans.jobs import JobSpec
from com_danliris_service_etl_spark.sources.catalog import Catalog


def _nz_numstr(c: str) -> Column:
    """FabricQC's `x >= 0 && x !== '' && x != null` numeric guard
    (`FabricQC/run.js:126-166`): negatives and nulls → NULL."""
    col = F.col(c)
    return F.when(col.isNotNull() & (col >= 0), col)


def build_fabric_qc(spark: SparkSession, catalog: Catalog, wm: dt.datetime) -> DataFrame:
    """`FabricQC/run.js:66-114` extracts + `:116-177` 3-level flatten."""
    qc = catalog.read("fabricqualitycontrols").filter(F.col("lastmodifiedutc") >= F.lit(wm))
    fgt = catalog.read("fabricgradetests")
    cr = catalog.read("criterion")
    joined = (
        qc.alias("qc")
        .join(fgt.alias("gt"), F.col("gt.FabricQualityControlId") == F.col("qc.id"))
        .join(cr.alias("cr"), F.col("cr.fabricgradetestid") == F.col("gt.id"))
    )
    # NOT functions.weighted_score (A3's clean form): this build mirrors
    # the reference's per-term guards — each score participates only when
    # `>= 0` AND pointSystem==10, and JS `null + null == 0` makes the
    # total coalesce term-wise (`FabricQC/run.js:126-166`).
    ps10 = F.col("gt.pointSystem") == 10
    score_a = F.when((F.col("cr.scoreA") >= 0) & ps10, F.col("cr.scoreA") * 1)
    score_b = F.when((F.col("cr.scoreB") >= 0) & ps10, F.col("cr.scoreB") * 3)
    score_c = F.when((F.col("cr.scoreC") >= 0) & ps10, F.col("cr.scoreC") * 5)
    score_d = F.when((F.col("cr.scoreD") >= 0) & ps10, F.col("cr.scoreD") * 10)
    # JS `null + null == 0`: the total coalesces each term to 0 (A3).
    total = (
        F.coalesce(score_a, F.lit(0))
        + F.coalesce(score_b, F.lit(0))
        + F.coalesce(score_c, F.lit(0))
        + F.coalesce(score_d, F.lit(0))
    )
    return joined.select(
        nz_str("qc.code").alias("qc_code"),
        _nz_numstr("qc.pointSystem").cast("string").alias("qc_point_system"),
        jkt_date("qc.dateIm").alias("date_im"),
        nz_str("qc.shiftIm").alias("shift_im"),
        nz_str("qc.group").alias("group"),
        nz_str("qc.operatorIm").alias("operator_im"),
        nz_str("qc.MachineNoIm").alias("machine_no_im"),
        nz_str("qc.ProductionOrderNo").alias("production_order_no"),
        nz_str("qc.productionOrderType").alias("production_order_type"),
        nz_str("qc.kanbanCode").alias("kanban_code"),
        nz_str("qc.cartNo").alias("cart_no"),
        nz_str("qc.Buyer").alias("buyer"),
        nz_num("qc.orderQuantity").cast("string").alias("order_quantity"),
        nz_str("qc.color").alias("color"),
        nz_str("qc.construction").alias("construction"),
        nz_str("qc.packingInstruction").alias("packing_instruction"),
        nz_str("qc.uom").alias("uom"),
        nz_str("gt.type").alias("test_type"),
        nz_str("gt.pcsNo").alias("pcs_no"),
        nz_str("gt.grade").alias("grade"),
        _nz_numstr("gt.width").cast("string").alias("width"),
        _nz_numstr("gt.initLength").cast("string").alias("init_length"),
        _nz_numstr("gt.avalLength").cast("string").alias("aval_length"),
        _nz_numstr("gt.finalLength").cast("string").alias("final_length"),
        _nz_numstr("gt.sampleLength").cast("string").alias("sample_length"),
        _nz_numstr("gt.fabricGradeTest").cast("string").alias("fabric_grade_test"),
        _nz_numstr("gt.finalGradeTest").cast("string").alias("final_grade_test"),
        _nz_numstr("gt.score").cast("string").alias("score"),
        _nz_numstr("gt.finalScore").cast("string").alias("final_score"),
        _nz_numstr("gt.pointSystem").cast("string").alias("point_system"),
        nz_str("cr.code").alias("criteria_code"),
        nz_str("cr.Group").alias("criteria_group"),
        nz_str("cr.name").alias("criteria_name"),
        _nz_numstr("cr.scoreA").alias("criteria_a"),
        _nz_numstr("cr.scoreB").alias("criteria_b"),
        _nz_numstr("cr.scoreC").alias("criteria_c"),
        _nz_numstr("cr.scoreD").alias("criteria_d"),
        total.alias("total_score"),
        bool_str("qc.IsDeleted").alias("deleted"),
        bool_str("qc.IsUsed").alias("is_used"),
        _nz_numstr("gt.pointLimit").cast("string").alias("point_limit"),
    )


def build_production_order_status(
    spark: SparkSession, catalog: Catalog, wm: dt.datetime
) -> DataFrame:
    """`ProductionOrderStatus/run.js:64-320`: four chained first-match
    lookups (each `resultList[0]` — J6 with explicit id tiebreaks), then a
    left-outer gradeTest explode (E5) with the W1 ordinal index."""
    sc = catalog.read("finishingprintingsalescontracts").filter(
        F.col("lastmodifiedutc") >= F.lit(wm)
    )
    po = catalog.read("productionorder").filter(~F.col("isdeleted"))
    kb = catalog.read("kanbans").filter(~F.col("isdeleted"))
    dop = (
        catalog.read("dailyoperation")
        .filter(~F.col("isdeleted"))
        .filter(F.col("input").isNotNull())  # P5 (`run.js:175`)
    )
    qc = catalog.read("fabricqualitycontrols").filter(~F.col("isdeleted"))
    fgt = catalog.read("fabricgradetests")

    base = sc.select(
        F.col("createdUtc").alias("scCreatedUtc"),
        F.col("salesContractNo"),
        F.col("uomUnit").alias("scUom"),
        F.col("orderQuantity").alias("scQuantity"),
        F.col("orderTypeName").alias("orderType"),
        F.col("isDeleted").alias("scDeleted"),
        F.col("deliverySchedule"),
        # per-source-row id: the W1 ordinal must restart per CONTRACT ROW
        # (the reference maps each row independently) — partitioning by
        # salesContractNo alone would interleave duplicate contract numbers.
        F.monotonically_increasing_id().alias("__sc_rid"),
    )
    po_r = po.select(
        F.col("salesContractNo"),
        F.col("id").alias("poId"),
        F.col("createdUtc").alias("poCreatedUtc"),
        F.col("salesContractNo").alias("poSalesContractNo"),
        F.col("orderNo").alias("poOrderNo"),
        F.col("orderQuantity").alias("poQuantity"),
        F.col("uomUnit").alias("poUom"),
        F.col("deliveryDate").alias("poDeliveryDate"),
    )
    step1 = first_match_join(base, po_r, on="salesContractNo", order_by=F.col("poId"))

    kb_r = kb.select(
        F.col("productionOrderId").alias("poId"),
        F.col("id").alias("kanbanId"),
        F.col("createdUtc").alias("kanbanCreatedUtc"),
        F.col("code").alias("kanbanCode"),
        F.col("productionOrderSalesContractNo").alias("kanbanSalesContractNo"),
        F.col("cartQty").alias("kanbanCartQty"),
        F.col("cartCartNumber").alias("cartNumber"),
    )
    step2 = first_match_join(step1, kb_r, on="poId", order_by=F.col("kanbanId"))

    dop_r = dop.select(
        F.col("kanbanId"),
        F.col("createdUtc").alias("dopCreatedUtc"),
        F.col("code").alias("dopCode"),
        F.col("input").alias("dopInput"),
    )
    step3 = first_match_join(step2, dop_r, on="kanbanId", order_by=F.col("dopCode"))

    qc_r = qc.select(
        F.col("kanbanCode"),
        F.col("id").alias("qcId"),
        F.col("dateIm").alias("qcDateIm"),
        F.col("code").alias("qcCode"),
    )
    step4 = first_match_join(step3, qc_r, on="kanbanCode", order_by=F.col("qcId"))

    # E5: left-outer gradeTest explode — contracts with no QC keep one row.
    fgt_r = fgt.select(
        F.col("fabricQualityControlId").alias("qcId"),
        F.col("id").alias("fgtId"),
        F.col("initLength"),
    )
    exploded = step4.join(fgt_r, "qcId", "left")
    w = Window.partitionBy("__sc_rid").orderBy(F.col("fgtId").asc())
    exploded = exploded.withColumn(
        "test_index",
        F.when(F.col("qcCode").isNotNull() & F.col("fgtId").isNotNull(), F.row_number().over(w)),
    )

    has_kanban_uom = (
        F.col("kanbanCartQty").isNotNull()
        & (F.col("kanbanCartQty") != 0)
        & F.col("poUom").isNotNull()
    )
    return exploded.select(
        jkt_date("scCreatedUtc").alias("sales_contract_date"),
        nz_str("salesContractNo", sanitize=False).alias("sales_contract_no"),
        F.when(
            nz_num("scQuantity").isNotNull(), uom_to_meter(F.col("scQuantity"), F.col("scUom"))
        ).alias("sales_contract_quantity"),
        jkt_date("poCreatedUtc").alias("production_order_date"),
        nz_str("poSalesContractNo", sanitize=False).alias("production_sales_contract_no"),
        nz_str("poOrderNo", sanitize=False).alias("production_order_no"),
        F.when(
            nz_num("poQuantity").isNotNull(), uom_to_meter(F.col("poQuantity"), F.col("poUom"))
        ).alias("production_order_quantity"),
        jkt_date("kanbanCreatedUtc").alias("kanban_date"),
        nz_str("kanbanCode", sanitize=False).alias("kanban_code"),
        nz_str("kanbanSalesContractNo", sanitize=False).alias("kanban_sales_contract_no"),
        F.when(has_kanban_uom, uom_to_meter(F.col("kanbanCartQty"), F.col("poUom"))).alias(
            "kanban_quantity"
        ),
        F.col("dopInput").alias("daily_operation_quantity"),
        F.when(F.col("dopCode").isNotNull(), F.col("kanbanSalesContractNo")).alias(
            "daily_operation_sales_contract_no"
        ),
        nz_str("dopCode", sanitize=False).alias("daily_operation_code"),
        nz_str("cartNumber", sanitize=False).alias("cart_number"),
        jkt_date("qcDateIm").alias("fabric_quality_control_date"),
        nz_num("initLength").alias("fabric_quality_control_quantity"),
        nz_str("qcCode", sanitize=False).alias("fabric_quality_control_code"),
        nz_str("orderType", sanitize=False).alias("order_type"),
        bool_str("scDeleted").alias("deleted"),
        F.col("test_index").alias("fabric_quality_control_test_index"),
        jkt_date("dopCreatedUtc").alias("daily_operation_date"),
        jkt_date("deliverySchedule").alias("sales_contract_delivery_date"),
        jkt_date("poDeliveryDate").alias("production_order_delivery_date"),
    )


def build_packing_receipt(
    spark: SparkSession, catalog: Catalog, wm: dt.datetime
) -> DataFrame:
    """`PackingReceipt/run.js:63-165`: receipts (watermark `>`) inner-joined
    to their items (E4 — receipts without items are dropped)."""
    pr = catalog.read("packingreceipt").filter(F.col("lastmodifiedutc") > F.lit(wm))
    items = catalog.read("packingreceiptitem")
    joined = pr.alias("pr").join(
        items.alias("it"), F.col("it.packingReceiptId") == F.col("pr.id")
    )
    return joined.select(
        bool_str("pr._deleted").alias("deleted"),
        nz_str("pr.code", sanitize=False).alias("code"),
        jkt_date("pr.date").alias("date"),
        nz_str("pr.packingCode", sanitize=False).alias("packing_code"),
        bool_str("pr.accepted").alias("accepted"),
        bool_str("pr.declined").alias("declined"),
        nz_str("pr.referenceNo", sanitize=False).alias("reference_no"),
        nz_str("pr.referenceType", sanitize=False).alias("reference_type"),
        nz_str("pr.type").alias("type"),
        nz_str("pr.productionOrderNo", sanitize=False).alias("production_order_no"),
        nz_str("pr.buyer").alias("buyer"),
        nz_str("pr.colorName").alias("color_name"),
        nz_str("pr.construction").alias("construction"),
        nz_str("pr.packingUom").alias("packing_uom"),
        nz_str("pr.orderType").alias("order_type"),
        nz_str("pr.colorType").alias("color_type"),
        nz_str("pr.designCode", sanitize=False).alias("design_code"),
        nz_str("pr.designNumber").alias("design_number"),
        nz_str("it.product").alias("product"),
        nz_num("it.quantity").cast("string").alias("quantity"),
        nz_num("it.length").cast("string").alias("length"),
        nz_num("it.weight").cast("string").alias("weight"),
    )


def build_shipment_document(
    spark: SparkSession, catalog: Catalog, wm: dt.datetime
) -> DataFrame:
    """`ShipmentDocument/run.js:63-200`: shipment → details → items →
    packingReceiptItems, all inner (E4). deliveryDate deliberately not
    +7h-shifted (`run.js:176`)."""
    sd = catalog.read("shipmentdocuments").filter(F.col("lastmodifiedutc") > F.lit(wm))
    det = catalog.read("shipmentdocumentdetails")
    it = catalog.read("shipmentdocumentitems")
    pri = catalog.read("shipmentdocumentpackingreceiptitems")
    joined = (
        sd.alias("sd")
        .join(det.alias("dt"), F.col("dt.shipmentDocumentId") == F.col("sd.id"))
        .join(it.alias("it"), F.col("it.shipmentDocumentDetailId") == F.col("dt.id"))
        .join(pri.alias("pi"), F.col("pi.shipmentDocumentItemId") == F.col("it.id"))
    )
    return joined.select(
        nz_str("sd.buyerCode").alias("buyer_code"),
        nz_str("sd.buyerName").alias("buyer_name"),
        nz_str("sd.buyerType").alias("buyer_type"),
        nz_str("sd.code").alias("shipment_code"),
        F.when(F.col("sd.deliveryDate").isNotNull(), fmt_date(F.col("sd.deliveryDate"))).alias(
            "delivery_date"
        ),
        bool_str("sd.isVoid").alias("is_void"),
        nz_str("dt.ProductionOrderDesignCode").alias("design_code"),
        nz_str("dt.ProductionOrderDesignNumber").alias("design_number"),
        nz_str("dt.productionOrderNo").alias("production_order_no"),
        nz_str("dt.productionOrderType").alias("production_order_type"),
        nz_str("pi.colorType").alias("color_type"),
        F.col("pi.length").alias("length"),
        nz_str("pi.productCode").alias("product_code"),
        nz_str("pi.productName").alias("product_name"),
        F.col("pi.quantity").alias("quantity"),
        nz_str("pi.uomUnit").alias("uom_unit"),
        F.col("pi.weight").alias("weight"),
    )


SPECS = [
    JobSpec(
        name="Fact Fabric QC from MongoDB to Azure DWH",
        build=build_fabric_qc,
        merge_keys=["qc_code", "pcs_no", "criteria_code"],
        target="dl_fact_fabric_quality_control",
        grain="group",  # detail grain: QC x pcs x criteria (3-level flatten)
    ),
    JobSpec(
        name="Fact Production Order Status from MongoDB to Azure DWH",
        build=build_production_order_status,
        merge_keys=["sales_contract_no"],
        target="dl_fact_production_order_status",
        # group grain on the contract NUMBER: the reference processes per
        # salesContractNo (`run.js:113` — `where salesContractNo = ?`) and
        # restages every row for it; row-grain dedupe on (no, test_index)
        # would drop the rows the build's __sc_rid deliberately keeps
        # apart when duplicate contract numbers exist.
        grain="group",
    ),
    JobSpec(
        name="Fact Packing Receipt from MongoDB to Azure DWH",
        build=build_packing_receipt,
        merge_keys=["code", "product"],
        target="dl_fact_fp_packing_receipt",
        grain="group",  # detail grain: receipt items may repeat a product
    ),
    JobSpec(
        name="Fact Shipment Document from MongoDB to Azure DWH",
        build=build_shipment_document,
        merge_keys=["shipment_code", "production_order_no", "product_code"],
        target="dl_fact_shipment_document",
        grain="group",  # detail grain: 4-level inner flatten (run.js:162-198)
    ),
]
