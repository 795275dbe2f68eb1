"""FinishingPrinting production facts: Kanban, DailyOperation (dual-target),
MonitoringEvent, Packing.

Reference pipelines:
- `Kanban/run.js:63-111` — 4-way left join (kanbans→instructions→steps→
  machine, J1) pushed to one scan here, +7h date shifts.
- `DailyOperation/run.js:86-252` — 5-way left join + a second inner-join
  extract loaded to a child reasons table in the same run (S9 dual-target).
- `MonitoringEvent/run.js:68-217` — per-row correlated lookups (J5: machine,
  production order, buyer, division, machine event) re-expressed as
  set-at-a-time broadcast joins; D5 timestamp reconstruction + D2 duration.
- `Packing/run.js:75-160` — packings⨝packingdetails, falsy-zero numerics
  (P8: weight/length/quantity default 0).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from com_danliris_service_etl_spark.functions.dates import (
    minute_diff,
    reconstruct_timestamp,
)
from com_danliris_service_etl_spark.jobs._helpers import (
    bool_str,
    jkt_date,
    jkt_time,
    nz_num,
    nz_str,
)
from com_danliris_service_etl_spark.plans.jobs import JobSpec
from com_danliris_service_etl_spark.sources.catalog import Catalog


def build_kanban(spark: SparkSession, catalog: Catalog, wm: dt.datetime) -> DataFrame:
    """`Kanban/run.js:63-77` extract: kanbans LEFT JOIN kanbaninstructions
    LEFT JOIN kanbansteps LEFT JOIN machine (J1), watermark `>=`;
    `:79-111` transform (+7h day format on Deadline/createdutc)."""
    k = catalog.read("kanbans").filter(F.col("lastmodifiedutc") >= F.lit(wm))
    ki = catalog.read("kanbaninstructions")
    ks = catalog.read("kanbansteps")
    m = catalog.read("machine")
    joined = (
        k.alias("k")
        .join(ki.alias("ki"), F.col("k.id") == F.col("ki.kanbanid"), "left")
        .join(ks.alias("ks"), F.col("ki.id") == F.col("ks.instructionid"), "left")
        .join(F.broadcast(m.alias("m")), F.col("ks.machineid") == F.col("m.id"), "left")
    )
    return joined.select(
        bool_str("k.isdeleted").alias("deleted"),
        nz_str("k.code", sanitize=False).alias("code"),
        jkt_date("k.createdutc").alias("created_date"),
        nz_str("k.ProductionOrderOrderNo", sanitize=False).alias("production_order_no"),
        nz_str("k.grade", sanitize=False).alias("grade"),
        nz_str("k.cartcartnumber", sanitize=False).alias("cart_number"),
        F.col("k.CartQty").alias("cart_qty"),
        nz_str("ki.Id", sanitize=False).alias("instruction_id"),
        nz_str("ki.Code", sanitize=False).alias("instruction_code"),
        nz_str("ki.name", sanitize=False).alias("instruction_name"),
        nz_str("ks.id", sanitize=False).alias("step_id"),
        nz_str("ks.code", sanitize=False).alias("step_code"),
        nz_str("ks.process", sanitize=False).alias("step_name"),
        nz_str("m.Code", sanitize=False).alias("machine_code"),
        nz_str("m.Name", sanitize=False).alias("machine_name"),
        F.col("m.MonthlyCapacity").alias("machine_monthly_capacity"),
        jkt_date("ks.Deadline").alias("deadline"),
        F.col("k.CurrentStepIndex").alias("current_step_index"),
        nz_str("ks.ProcessArea", sanitize=False).alias("process_area"),
        bool_str("k.IsComplete").alias("is_complete"),
        F.lit(None).cast("long").alias("steps_length"),
        F.col("ks.stepindex").alias("step_index"),
        nz_str("k.ProductionOrderSalesContractNo", sanitize=False).alias("sales_contract_no"),
        nz_str("k.ProductionOrderProcessTypeName", sanitize=False).alias("process_type"),
        nz_str("k.ProductionOrderOrderTypeName", sanitize=False).alias("order_type"),
        bool_str("k.IsBadOutput").alias("is_bad_output"),
        bool_str("k.IsReprocess").alias("is_reprocess"),
        nz_str("k.OldKanbanId", sanitize=False).alias("old_kanban_id"),
        F.col("k.Id").cast("string").alias("id"),
    )


def build_daily_operation(
    spark: SparkSession, catalog: Catalog, wm: dt.datetime
) -> DataFrame:
    """`DailyOperation/run.js:69-107` main extract — the 5-way left join
    (dailyoperation → badoutputreasons → kanbans → kanbaninstructions →
    machine; the reasons join fans the fact out per reason, as the
    reference's SQL does) ordered by code/type (O1) — plus the `:155-201`
    transform with the varchar truncation caps (T2: 499/49/24/9/4/99/254)
    and the uom-guarded quantity "convertion" columns."""
    d = catalog.read("dailyoperation").filter(F.col("lastmodifiedutc") >= F.lit(wm))
    db = catalog.read("dailyoperationbadoutputreasons")
    k = catalog.read("kanbans")
    ki = catalog.read("kanbaninstructions")
    m = catalog.read("machine")
    joined = (
        d.alias("d")
        .join(db.alias("db"), F.col("d.Id") == F.col("db.DailyOperationId"), "left")
        .join(k.alias("k"), F.col("d.KanbanId") == F.col("k.Id"), "left")
        .join(ki.alias("ki"), F.col("k.Id") == F.col("ki.KanbanId"), "left")
        .join(F.broadcast(m.alias("m")), F.col("d.MachineId") == F.col("m.Id"), "left")
    )
    has_uom = F.col("k.selectedProductionOrderDetailUomUnit").isNotNull()
    return joined.select(
        bool_str("d._deleted").alias("deleted"),
        nz_num("d.badOutput").alias("bad_output"),
        # badOutputDescription comes from the REASONS join (`run.js:71`)
        nz_str("db.Description", 499).alias("bad_output_description"),
        nz_str("d.code", 49, sanitize=False).alias("code"),
        jkt_date("d.dateInput").alias("input_date"),
        jkt_date("d.dateOutput").alias("output_date"),
        nz_num("d.goodOutput").alias("good_output"),
        nz_num("d.input").alias("input"),
        nz_str("d.shift", 49, sanitize=False).alias("shift"),
        jkt_time("d.timeInput").alias("input_time"),
        jkt_time("d.timeOutput").alias("output_time"),
        # kanbanCode is the dailyoperation's own column (`run.js:80`)
        nz_str("d.kanbanCode", 49, sanitize=False).alias("kanban_code"),
        nz_str("k.Grade", 49, sanitize=False).alias("kanban_grade"),
        nz_str("k.CartCartNumber", 49, sanitize=False).alias("kanban_cart_number"),
        nz_str("k.CartCode", 49, sanitize=False).alias("kanban_cart_code"),
        nz_num("k.CartPcs", default=0).alias("kanban_cart_pcs"),
        nz_num("k.CartQty", default=0).alias("kanban_cart_qty"),
        nz_str("ki.Code", 49, sanitize=False).alias("kanban_instruction_code"),
        nz_str("ki.Name", 49, sanitize=False).alias("kanban_instruction_name"),
        nz_str("k.ProductionOrderOrderTypeName", 24, sanitize=False).alias("order_type"),
        F.lit(None).cast("string").alias("selected_production_order_detail_code"),
        nz_str("k.SelectedProductionOrderDetailColorRequest", 49).alias(
            "selected_color_request"
        ),
        nz_str("k.SelectedProductionOrderDetailColorTemplate", 499).alias(
            "selected_color_template"
        ),
        nz_str("m.Code", 49, sanitize=False).alias("machine_code"),
        nz_str("m.Condition", 49, sanitize=False).alias("machine_condition"),
        nz_str("m.Manufacture", 49, sanitize=False).alias("machine_manufacture"),
        nz_num("m.MonthlyCapacity").alias("machine_monthly_capacity"),
        nz_str("m.Name", 49, sanitize=False).alias("machine_name"),
        nz_str("m.Process", 49, sanitize=False).alias("machine_process"),
        nz_str(F.col("m.Year").cast("string"), 4, sanitize=False).alias("machine_year"),
        # uom-guarded quantity passthroughs (`run.js:190-193`)
        F.when(has_uom, nz_num("d.input")).alias("input_quantity_convertion"),
        F.when(has_uom, nz_num("d.goodOutput")).alias("good_output_quantity_convertion"),
        F.when(has_uom, nz_num("d.badOutput")).alias("bad_output_quantity_convertion"),
        F.when(has_uom, nz_num("d.failedOutput")).alias("failed_output_quantity_convertion"),
        F.lit(None).cast("double").alias("output_quantity"),
        F.lit(None).cast("double").alias("input_output_diff"),
        F.lit(None).cast("string").alias("status"),
        nz_str("d.type", 9, sanitize=False).alias("type"),
        nz_str("d.StepId", 49, sanitize=False).alias("step_process_id"),
        nz_str("d.StepProcess", 49, sanitize=False).alias("step_process"),
        F.lit(None).cast("string").alias("process_area"),
        nz_str("k.ProductionOrderOrderNo", 99, sanitize=False).alias("production_order_no"),
        nz_str("k.ProductionOrderSalesContractNo", 99, sanitize=False).alias("sales_contract_no"),
        nz_str("db.action", 254).alias("action"),
    )


def build_daily_operation_reasons(
    spark: SparkSession, catalog: Catalog, wm: dt.datetime
) -> DataFrame:
    """`DailyOperation/run.js:114-134` second extract: badoutputreasons
    INNER JOIN dailyoperation (J2), loaded as the S9 dual-target child
    (`run.js:273`); falsy-zero length → 0 (P8)."""
    db = catalog.read("dailyoperationbadoutputreasons")
    d = catalog.read("dailyoperation").filter(F.col("lastmodifiedutc") >= F.lit(wm))
    joined = db.alias("db").join(d.alias("d"), F.col("d.Id") == F.col("db.DailyOperationId"))
    return joined.select(
        F.col("d.code").cast("string").alias("daily_operation_code"),
        nz_str("db.badOutputCode", sanitize=False).alias("bad_output_reason_code"),
        nz_str("db.badOutputReason").alias("reason"),
        nz_num("db.length", default=0).alias("length"),
        nz_str("db.description").alias("description"),
        nz_str("db.action").alias("action"),
        F.col("db.id").cast("string").alias("id"),
    )


def build_monitoring_event(
    spark: SparkSession, catalog: Catalog, wm: dt.datetime
) -> DataFrame:
    """`MonitoringEvent/run.js:69-94` extract (watermark `>=`, P4 exclusion)
    + per-row correlated lookups `:96-217` (machine→division, production
    order→buyer, machine event) — here four broadcast left joins (J5→J3).
    D5: start/end timestamps rebuilt from (date, epoch-millis time-of-day);
    D2/M3: eventRange = minutes/60 (the reference's name/unit mismatch
    `run.js:65-67` — SURVEY §2.14 — is implemented as intended: hours)."""
    me = (
        catalog.read("monitoringevent")
        .filter(F.col("lastmodifiedutc") >= F.lit(wm))
        .filter(~F.col("createdBy").isin("dev", "unit-test"))
    )
    machine = catalog.read("machine")
    division = catalog.read("divisions")
    po = catalog.read("productionorder")
    buyer = catalog.read("buyers")
    mev = catalog.read("machineevents")

    start = reconstruct_timestamp(F.col("me.dateStart"), F.col("me.timeInMilisStart"))
    end = reconstruct_timestamp(F.col("me.dateEnd"), F.col("me.timeInMilisEnd"))
    range_minutes = minute_diff(end, start)

    joined = (
        me.alias("me")
        .join(F.broadcast(machine.alias("m")), F.col("me.machineId") == F.col("m.id"), "left")
        .join(
            F.broadcast(division.alias("dv")),
            F.col("m.unitDivisionId") == F.col("dv.id"),
            "left",
        )
        .join(F.broadcast(po.alias("po")), F.col("me.productionOrderId") == F.col("po.id"), "left")
        .join(F.broadcast(buyer.alias("b")), F.col("po.buyerId") == F.col("b.id"), "left")
        .join(
            F.broadcast(mev.alias("ev")),
            F.col("me.machineEventId") == F.col("ev.id"),
            "left",
        )
    )
    return joined.select(
        nz_str("me.cartNumber", sanitize=False).alias("cart_number"),
        nz_str("me.code", sanitize=False).alias("monitoring_event_code"),
        jkt_date("me.dateStart").alias("event_start_date"),
        jkt_time(F.timestamp_millis(F.col("me.timeInMilisStart"))).alias("event_start_time"),
        jkt_time(F.timestamp_millis(F.col("me.timeInMilisEnd"))).alias("event_end_time"),
        jkt_date("me.dateEnd").alias("event_end_date"),
        nz_str("m.code", sanitize=False).alias("machine_code"),
        nz_str("m.condition", sanitize=False).alias("machine_condition"),
        nz_str("m.name").alias("machine_name"),
        nz_str("m.process").alias("machine_process"),
        nz_str("m.unitCode", sanitize=False).alias("unit_code"),
        nz_str("dv.code", sanitize=False).alias("division_code"),
        nz_str("dv.name", sanitize=False).alias("division_name"),
        nz_str("m.unitName", sanitize=False).alias("unit_name"),
        F.col("m.year").alias("machine_year"),
        F.lit(None).cast("string").alias("machine_step_process"),
        nz_str("b.address", sanitize=False).alias("buyer_address"),
        nz_str("b.code", sanitize=False).alias("buyer_code"),
        nz_str("b.contact", sanitize=False).alias("buyer_contact"),
        nz_str("b.country", sanitize=False).alias("buyer_country"),
        nz_str("b.name").alias("buyer_name"),
        nz_str("b.tempo", sanitize=False).alias("buyer_tempo"),
        # construction/design/greige/rollLength/spelling are referenced by
        # the transform but never selected (`run.js:239-263`) — always NULL.
        F.lit(None).cast("string").alias("po_construction"),
        jkt_date("po.deliveryDate").alias("po_delivery_date"),
        F.lit(None).cast("string").alias("po_design"),
        nz_str(F.col("po.finishWidth").cast("string"), sanitize=False).alias("po_finish_width"),
        nz_str("po.handlingStandard", sanitize=False).alias("po_handling_standard"),
        nz_str("po.materialName", sanitize=False).alias("po_material"),
        nz_str("po.orderNo", sanitize=False).alias("po_order_no"),
        F.col("po.orderQuantity").alias("po_order_quantity"),
        nz_str("po.orderTypeName", sanitize=False).alias("po_order_type"),
        F.lit(None).cast("string").alias("po_origin_greige_fabric"),
        nz_str("po.processTypeName", sanitize=False).alias("po_process_type"),
        nz_str("po.remark", sanitize=False).alias("po_remark"),
        F.lit(None).cast("string").alias("po_roll_length"),
        nz_str("po.RUN", sanitize=False).alias("po_run"),
        nz_str("po.salesContractNo", sanitize=False).alias("po_sales_contract_no"),
        nz_str("po.sample", sanitize=False).alias("po_sample"),
        nz_str("po.shrinkageStandard", sanitize=False).alias("po_shrinkage_standard"),
        F.lit(None).cast("double").alias("po_spelling"),
        nz_str("po.uomUnit", sanitize=False).alias("po_uom"),
        nz_str("me.remark").alias("event_remark"),
        F.lit(None).cast("string").alias("selected_detail_code"),
        F.lit(None).cast("string").alias("selected_detail_color_request"),
        F.lit(None).cast("string").alias("selected_detail_color_template"),
        F.lit(None).cast("string").alias("selected_detail_color_type_code"),
        F.lit(None).cast("string").alias("selected_detail_color_type_name"),
        F.lit(None).cast("string").alias("selected_detail_color_type_remark"),
        F.lit(None).cast("double").alias("selected_detail_quantity"),
        F.lit(None).cast("string").alias("selected_detail_uom"),
        nz_str("ev.name").alias("machine_event_name"),
        F.when(F.col("me.dateEnd").isNotNull(), range_minutes / 60.0).alias("event_range"),
        nz_str("ev.no", sanitize=False).alias("machine_event_no"),
        nz_str("me.createdBy", sanitize=False).alias("created_by"),
        bool_str("me.isDeleted").alias("deleted"),
        nz_str("ev.category", sanitize=False).alias("event_category"),
    )


def build_packing(spark: SparkSession, catalog: Catalog, wm: dt.datetime) -> DataFrame:
    """`Packing/run.js:75-113` extract (packings LEFT JOIN packingdetails,
    watermark `>=`) + `:117-160` transform. weight/length/quantity carry the
    JS falsy-zero default 0 (P8)."""
    p = catalog.read("packings").filter(F.col("lastmodifiedutc") >= F.lit(wm))
    pd = catalog.read("packingdetails")
    joined = p.alias("p").join(pd.alias("pd"), F.col("p.Id") == F.col("pd.PackingId"), "left")
    return joined.select(
        bool_str("p._deleted").alias("deleted"),
        nz_str("p._createdBy", sanitize=False).alias("created_by"),
        jkt_date("p._createdDate").alias("created_date"),
        nz_str("p.code", sanitize=False).alias("code"),
        nz_str("p.productionOrderNo", sanitize=False).alias("production_order_no"),
        nz_str("p.orderType", sanitize=False).alias("order_type"),
        nz_str("p.salesContractNo", sanitize=False).alias("sales_contract_no"),
        nz_str("p.designCode").alias("design_code"),
        nz_str("p.designNumber").alias("design_number"),
        nz_str("p.buyerCode", sanitize=False).alias("buyer_code"),
        nz_str("p.buyerName").alias("buyer_name"),
        nz_str("p.buyerAddress").alias("buyer_address"),
        nz_str("p.buyerType", sanitize=False).alias("buyer_type"),
        jkt_date("p.date").alias("date"),
        nz_str("p.packingUom", sanitize=False).alias("packing_uom"),
        nz_str("p.colorCode").alias("color_code"),
        nz_str("p.colorName").alias("color_name"),
        nz_str("p.colorType").alias("color_type"),
        nz_str("p.construction").alias("construction"),
        nz_str("p.deliveryType").alias("delivery_type"),
        nz_str("p.finishedProductType").alias("finished_product_type"),
        nz_str("p.motif").alias("motif"),
        nz_str("pd.lot").alias("lot"),
        nz_str("pd.grade").alias("grade"),
        nz_num("pd.weight", default=0).alias("weight"),
        nz_num("pd.length", default=0).alias("length"),
        nz_num("pd.quantity", default=0).alias("quantity"),
        nz_str("pd.remark").alias("remark"),
        nz_str("p.status").alias("status"),
        bool_str("p.accepted").alias("accepted"),
        bool_str("p.declined").alias("declined"),
    )


SPECS = [
    JobSpec(
        name="Fact Kanban from MongoDB to Azure DWH",
        build=build_kanban,
        merge_keys=["id"],
        target="dl_fact_kanban",
        # group grain: a kanban fans out per instruction × step, and
        # steps can be absent (step_id NULL) — row-grain dedupe on
        # (id, step_id) would collapse distinct instruction rows. The
        # staged DL_UPSERT_FACT_KANBAN shape replaces the kanban's rows
        # wholesale.
        grain="group",
    ),
    JobSpec(
        name="Fact Daily Operation from MongoDB to Azure DWH",
        build=build_daily_operation,
        merge_keys=["code", "type"],
        target="dl_fact_daily_operation",
        # group grain: the build fans out per bad-output reason and per
        # kanban instruction (pinned by test_golden_daily_operation) —
        # row-grain dedupe on (code, type) would silently keep one
        # arbitrary fan-out row per operation.
        grain="group",
        extra_targets={
            "dl_fact_daily_operation_reasons": (
                build_daily_operation_reasons,
                ["id"],
            )
        },
    ),
    JobSpec(
        name="Fact Monitoring Event from MongoDB to Azure DWH",
        build=build_monitoring_event,
        merge_keys=["monitoring_event_code"],
        target="dl_fact_monitoring_event",
        # group grain: the reference fact carries no surrogate id and
        # monitoringEventCode is nullable — row-grain dedupe would
        # collapse every NULL-code event into one row. Group-replace
        # keeps all of a batch's rows per code; the NULL-code group
        # replacing wholesale across batches is the data model's own
        # ambiguity (no key exists to do better), documented here.
        grain="group",
    ),
    JobSpec(
        name="Fact Packing from MongoDB to Azure DWH",
        build=build_packing,
        merge_keys=["code", "lot", "grade"],
        target="dl_fact_packing",
        grain="group",  # detail grain: packing items may repeat (code, lot, grade)
    ),
]
