"""Garment facts: Fact Garment Pembelian (the deepest pipeline in the
reference) and Fact Garment Total Hutang (as-of currency join).

Reference pipelines:
- `GarmentPembelian/run.js:67-884` — PR (watermark `>=`, P4) with division/
  category broadcast probes (J3); PO-internal per PR (left-outer,
  `:224-249`); PO items enriched with a first-match EPO item per PO
  (`:369`, J6); fulfillments (DO details→items→orders chain) per EPO item
  with first-match URN and intern-note probes (`:480-498`); the transform's
  three branches (`:600-841`) are the left-outer explodes E5: PO items ×
  fulfillments, PO-less PRs exploded over their PR items, fulfillment-less
  PO items kept with null DO columns; W2 lastDeliveredDate = last
  fulfillment; D6 clamp + Jakarta-shifted D1 day-diffs + M4/M5 buckets +
  M7 garment category + M8 status + M9 NaN guards.
- `GarmentTotalHutang/run.js:40-237` — intern notes (3-way chain,
  watermark `>=`); **as-of join** (J7) to garmentcurrencies (latest rate
  with date <= doDate per code, default 1, `:122-124,213`); PR enrichment
  by roNo (the reference's `x.rono == data.roNo` bug `:134` implemented as
  its evident intent `item.roNo`) with category/division broadcast probes;
  M7 category type; M1 money product.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from com_danliris_service_etl_spark.functions.conditional import (
    bucket_days_month,
    bucket_days_week,
    category_garment,
    on_time_status,
)
from com_danliris_service_etl_spark.functions.dates import clamp_min_date, day_diff, fmt_date, to_jakarta
from com_danliris_service_etl_spark.jobs._helpers import bool_str, nz_num, nz_str
from com_danliris_service_etl_spark.operators.joins import asof_join, first_match_join
from com_danliris_service_etl_spark.plans.jobs import JobSpec
from com_danliris_service_etl_spark.sources.catalog import Catalog


def _vjkt(c: str | Column) -> Column:
    """Garment date normalization: D6 clamp then +7h shift (the garment jobs
    shift BEFORE `startOf('day')`, `GarmentPembelian/run.js:613-620`)."""
    col = F.col(c) if isinstance(c, str) else c
    return to_jakarta(clamp_min_date(col))


def _vday(c: str | Column) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.when(col.isNotNull(), fmt_date(_vjkt(col)))


def build_garment_pembelian(
    spark: SparkSession, catalog: Catalog, wm: dt.datetime
) -> DataFrame:
    """See module docstring; `GarmentPembelian/run.js:67-841`."""
    div = catalog.read("units").select(
        F.col("id").alias("UnitId"),
        F.col("DivisionCode").alias("divisionCode"),
        F.col("DivisionName").alias("divisionName"),
    )
    cats = catalog.read("garmentcategories").select(
        F.col("Id").alias("CategoryId"), F.col("Code").alias("categoryCode")
    )
    cur = catalog.read("currencies").select(
        F.col("code").alias("CurrencyCode"), F.col("symbol").alias("currencySymbol")
    )

    pr = (
        catalog.read("garmentpurchaserequests")
        .filter(F.col("lastmodifiedutc") >= F.lit(wm))
        .filter(~F.col("CreatedBy").isin("dev", "unit-test"))
        .join(F.broadcast(div), "UnitId", "left")
        .select(
            F.col("Id").alias("prId"),
            F.col("CreatedUtc").alias("prCreatedUtc"),
            F.col("CreatedBy").alias("prCreatedBy"),
            F.col("IsDeleted").alias("prDeleted"),
            F.col("PRNo").alias("prNo"),
            F.col("ExpectedDeliveryDate").alias("prExpectedDeliveryDate"),
            F.col("UnitCode").alias("unitCode"),
            F.col("UnitName").alias("unitName"),
            F.col("divisionCode"),
            F.col("divisionName"),
        )
    )
    pr_items = (
        catalog.read("garmentpurchaserequestitems")
        .join(F.broadcast(cats), "CategoryId", "left")
        .select(
            F.col("GarmentPRId").alias("prId"),
            F.col("ProductCode").alias("prItemProductCode"),
            F.col("ProductName").alias("prItemProductName"),
            F.col("quantity").alias("prItemQuantity"),
            F.col("UomUnit").alias("prItemUom"),
            F.col("CategoryName").alias("prItemCategoryName"),
            F.col("categoryCode").alias("prItemCategoryCode"),
        )
    )
    po = (
        catalog.read("garmentinternalpurchaseorders")
        .filter(~F.col("CreatedBy").isin("dev", "unit-test"))
        .select(
            F.col("Id").alias("poId"),
            F.col("PRId").alias("prId"),
            F.col("PONo").alias("poNo"),
            F.col("CreatedUtc").alias("poCreatedUtc"),
            F.col("CreatedBy").alias("poCreatedBy"),
            F.col("IsDeleted").alias("poDeleted"),
        )
    )
    po_items = (
        catalog.read("garmentinternalpurchaseorderitems")
        .join(F.broadcast(cats), "CategoryId", "left")
        .select(
            F.col("GPOId").alias("poId"),
            F.col("Id").alias("poItemId"),
            F.col("ProductCode").alias("productCode"),
            F.col("ProductName").alias("productName"),
            F.col("CategoryName").alias("categoryName"),
            F.col("categoryCode"),
        )
    )
    # First-match EPO item per PO (`run.js:369`: .find(x => x.POId == GPOId)).
    epo_items = (
        catalog.read("garmentexternalpurchaseorderitems")
        .alias("ei")
        .filter(~F.col("ei.CreatedBy").isin("dev", "unit-test"))
        .join(
            catalog.read("garmentexternalpurchaseorders").alias("e"),
            F.col("ei.GarmentEPOId") == F.col("e.Id"),
            "left",
        )
        .select(
            F.col("ei.POId").alias("poId"),
            F.col("ei.Id").alias("epoItemId"),
            F.col("e.EPONo").alias("epoNo"),
            F.col("e.CreatedUtc").alias("epoCreatedUtc"),
            F.col("e.DeliveryDate").alias("epoDeliveryDate"),
            F.col("e.SupplierCode").alias("supplierCode"),
            F.col("e.SupplierName").alias("supplierName"),
            F.col("e.CurrencyCode").alias("CurrencyCode"),
            F.col("e.CurrencyRate").alias("currencyRate"),
            F.col("e.PaymentMethod").alias("paymentMethod"),
            F.col("ei.DefaultQuantity").alias("defaultQuantity"),
            F.col("ei.DefaultUomUnit").alias("defaultUom"),
            F.col("ei.DealQuantity").alias("dealQuantity"),
            F.col("ei.PricePerDealUnit").alias("pricePerDealUnit"),
        )
        .join(F.broadcast(cur), "CurrencyCode", "left")
        .withColumnRenamed("CurrencyCode", "currencyCode")
    )
    po_items_epo = first_match_join(
        po_items, epo_items, on="poId", order_by=F.col("epoItemId")
    )

    # Fulfillments: DO details chain (`run.js:458-477`), each with
    # first-match URN (`:487`) and intern note (`:494`).
    ful = (
        catalog.read("garmentdeliveryorderdetails")
        .alias("gd")
        .join(
            catalog.read("garmentdeliveryorderitems").alias("gi"),
            F.col("gd.GarmentDOItemId") == F.col("gi.Id"),
            "left",
        )
        .join(
            catalog.read("garmentdeliveryorders").alias("g"),
            F.col("gi.GarmentDOId") == F.col("g.Id"),
            "left",
        )
        .select(
            F.col("gd.EPOItemId").alias("epoItemId"),
            F.col("gd.Id").alias("doDetailId"),
            F.col("g.Id").alias("doId"),
            F.col("g.DONo").alias("deliveryOrderNo"),
            F.col("g.DODate").alias("deliveryOrderDate"),
        )
    )
    urn = (
        catalog.read("garmentunitreceiptnoteitems")
        .alias("gi")
        .join(
            catalog.read("garmentunitreceiptnotes").alias("g"),
            F.col("gi.URNId") == F.col("g.Id"),
            "left",
        )
        .select(
            F.col("gi.DODetailId").alias("doDetailId"),
            F.col("g.URNNo").alias("urnNo"),
            F.col("g.ReceiptDate").alias("urnDate"),
            F.col("gi.OrderQuantity").alias("urnQuantity"),
        )
    )
    inote = (
        catalog.read("garmentinternnotedetails")
        .alias("gd")
        .join(
            catalog.read("garmentinternnoteitems").alias("gi"),
            F.col("gd.GarmentItemINId") == F.col("gi.Id"),
            "left",
        )
        .join(
            catalog.read("garmentinternnotes").alias("g"),
            F.col("gi.GarmentINId") == F.col("g.Id"),
            "left",
        )
        .select(
            F.col("gd.DOId").alias("doId"),
            F.col("g.INNo").alias("inNo"),
            F.col("g.INDate").alias("inDate"),
            F.col("gd.PriceTotal").alias("inPrice"),
            F.col("gd.Quantity").alias("inQuantity"),
            F.col("gd.PaymentDueDate").alias("inDueDate"),
        )
    )
    ful = first_match_join(ful, urn, on="doDetailId", order_by=F.col("urnNo"))
    ful = first_match_join(ful, inote, on="doId", order_by=F.col("inNo"))
    # W2 — lastDeliveredDate: the last fulfillment's DO date per EPO item
    # (`run.js:620`); deterministic "last" = max ordinal (doDetailId).
    last_do = ful.groupBy("epoItemId").agg(
        F.max_by("deliveryOrderDate", "doDetailId").alias("lastDeliveredDate")
    )
    ful = ful.join(last_do, "epoItemId", "left")

    # Branch A/B: PR ⨝ PO ⨝ PO items, left-outer over fulfillments (E5).
    with_po = (
        pr.join(po, "prId")
        .join(po_items_epo, "poId")
        .join(ful, "epoItemId", "left")
    )
    pr_po_ext_days = day_diff(_vjkt("epoCreatedUtc"), _vjkt("prCreatedUtc"))
    po_ext_days = day_diff(_vjkt("epoCreatedUtc"), _vjkt("poCreatedUtc"))
    po_int_days = day_diff(_vjkt("poCreatedUtc"), _vjkt("prCreatedUtc"))
    do_days = day_diff(_vjkt("deliveryOrderDate"), _vjkt("epoCreatedUtc"))
    urn_days = day_diff(_vjkt("urnDate"), _vjkt("deliveryOrderDate"))
    upo_days = day_diff(_vjkt("inDate"), _vjkt("urnDate"))
    po_days = day_diff(_vjkt("inDate"), _vjkt("poCreatedUtc"))
    has_epo = F.col("epoCreatedUtc").isNotNull()
    has_ful = F.col("doDetailId").isNotNull()  # branch split `run.js:611,689`
    has_do = F.col("deliveryOrderDate").isNotNull()
    has_urn = F.col("urnDate").isNotNull()
    has_in = F.col("inDate").isNotNull()

    branch_a = with_po.select(
        nz_str("prNo").alias("purchase_request_no"),
        _vday("prCreatedUtc").alias("purchase_request_date"),
        _vday("prExpectedDeliveryDate").alias("expected_pr_delivery_date"),
        nz_str("unitCode").alias("unit_code"),
        nz_str("unitName").alias("unit_name"),
        nz_str("divisionCode").alias("division_code"),
        nz_str("divisionName").alias("division_name"),
        nz_str("categoryCode").alias("category_code"),
        nz_str("categoryName").alias("category_name"),
        F.when(F.col("categoryCode").isNotNull(), category_garment(F.col("categoryCode"))).alias(
            "category_type"
        ),
        nz_str("productCode").alias("product_code"),
        nz_str("productName").alias("product_name"),
        F.coalesce(po_int_days, F.lit(0)).alias("purchase_request_days"),  # M9
        F.when(po_int_days.isNotNull(), bucket_days_week(po_int_days, empty_else=True)).alias("purchase_request_days_range"),  # NULL days -> NULL (run.js guards), not ''
        F.coalesce(pr_po_ext_days, F.lit(0)).alias("pr_po_external_days"),
        F.when(pr_po_ext_days.isNotNull(), bucket_days_week(pr_po_ext_days, empty_else=True)).alias("pr_po_external_days_range"),  # NULL days -> NULL (run.js guards), not ''
        bool_str("prDeleted").alias("deleted_pr"),
        nz_str("poNo").alias("purchase_order_no"),
        _vday("poCreatedUtc").alias("purchase_order_date"),
        F.coalesce(po_ext_days, F.lit(0)).alias("po_external_days"),
        F.when(po_ext_days.isNotNull(), bucket_days_week(po_ext_days, empty_else=True)).alias("po_external_days_range"),  # NULL days -> NULL (run.js guards), not ''
        nz_str("poCreatedBy").alias("purchasing_staff_name"),
        nz_str("prNo").alias("pr_no_at_po"),
        bool_str("poDeleted").alias("deleted_po"),
        nz_str("epoNo").alias("po_external_no"),
        _vday("epoCreatedUtc").alias("po_external_date"),
        F.when(has_ful, F.when(has_do, F.coalesce(do_days, F.lit(0))).otherwise(F.lit(0))).alias(
            "delivery_order_days"
        ),
        F.when(has_do, bucket_days_month(do_days)).alias("delivery_order_days_range"),
        F.when(has_epo, nz_str("supplierCode")).alias("supplier_code"),
        F.when(has_epo, nz_str("supplierName")).alias("supplier_name"),
        F.when(has_epo, nz_str("currencyCode")).alias("currency_code"),
        F.when(has_epo, nz_str("currencySymbol")).alias("currency_symbol"),
        F.when(has_epo, nz_str("paymentMethod")).alias("payment_method"),
        F.when(has_epo, nz_num("currencyRate")).alias("currency_rate"),
        nz_num("defaultQuantity").alias("purchase_quantity"),
        nz_str("defaultUom").alias("uom"),
        F.when(F.col("epoNo").isNotNull(), F.col("pricePerDealUnit")).alias("price_per_unit"),
        F.when(
            nz_num("currencyRate").isNotNull()
            & nz_num("pricePerDealUnit").isNotNull()
            & nz_num("dealQuantity").isNotNull(),
            F.col("dealQuantity") * F.col("pricePerDealUnit") * F.col("currencyRate"),
        ).alias("total_price"),
        _vday("epoDeliveryDate").alias("expected_delivery_date"),
        nz_str("prNo").alias("pr_no_at_po_ext"),
        nz_str("deliveryOrderNo").alias("delivery_order_no"),
        _vday("deliveryOrderDate").alias("delivery_order_date"),
        F.when(has_ful, F.when(has_urn, F.coalesce(urn_days, F.lit(0))).otherwise(F.lit(0))).alias(
            "unit_receipt_note_days"
        ),
        F.when(has_urn, bucket_days_week(urn_days)).alias("unit_receipt_note_days_range"),
        F.when(has_do, on_time_status(F.col("lastDeliveredDate"), F.col("epoDeliveryDate"))).alias(
            "status"
        ),
        F.when(has_ful, F.col("prNo")).alias("pr_no_at_do"),
        nz_str("urnNo").alias("unit_receipt_note_no"),
        _vday("urnDate").alias("unit_receipt_note_date"),
        F.when(has_ful, F.when(has_in, F.coalesce(upo_days, F.lit(0))).otherwise(F.lit(0))).alias(
            "unit_payment_order_days"
        ),
        F.when(has_in, bucket_days_week(upo_days)).alias("unit_payment_order_days_range"),
        nz_str("inNo").alias("unit_payment_order_no"),
        _vday("inDate").alias("unit_payment_order_date"),
        F.when(has_ful, F.when(has_in, F.coalesce(po_days, F.lit(0))).otherwise(F.lit(0))).alias(
            "purchase_order_days"
        ),
        F.when(has_in, bucket_days_month(po_days)).alias("purchase_order_days_range"),
        nz_num("inPrice").cast("string").alias("invoice_price"),
        nz_num("inPrice").cast("string").alias("unit_payment_order_price"),
        nz_num("inQuantity").cast("string").alias("unit_payment_order_quantity"),
        _vday("inDueDate").alias("unit_payment_order_due_date"),
        F.col("urnQuantity").cast("string").alias("unit_receipt_note_delivered_quantity"),
    )

    # Branch C: PRs with no PO at all → one row per PR item (`run.js:767-838`).
    pr_no_po = pr.join(po.select("prId"), "prId", "left_anti").join(pr_items, "prId", "left")
    branch_c = pr_no_po.select(
        nz_str("prNo").alias("purchase_request_no"),
        _vday("prCreatedUtc").alias("purchase_request_date"),
        _vday("prExpectedDeliveryDate").alias("expected_pr_delivery_date"),
        nz_str("unitCode").alias("unit_code"),
        nz_str("unitName").alias("unit_name"),
        nz_str("divisionCode").alias("division_code"),
        nz_str("divisionName").alias("division_name"),
        nz_str("prItemCategoryCode").alias("category_code"),
        nz_str("prItemCategoryName").alias("category_name"),
        F.when(
            F.col("prItemCategoryCode").isNotNull(),
            category_garment(F.col("prItemCategoryCode")),
        ).alias("category_type"),
        nz_str("prItemProductCode").alias("product_code"),
        nz_str("prItemProductName").alias("product_name"),
        F.lit(None).cast("int").alias("purchase_request_days"),
        F.lit(None).cast("string").alias("purchase_request_days_range"),
        F.lit(None).cast("int").alias("pr_po_external_days"),
        F.lit(None).cast("string").alias("pr_po_external_days_range"),
        bool_str("prDeleted").alias("deleted_pr"),
        nz_str("prCreatedBy").alias("purchasing_staff_name"),
        nz_num("prItemQuantity").alias("purchase_quantity"),
        nz_str("prItemUom").alias("uom"),
    )

    return branch_a.unionByName(branch_c, allowMissingColumns=True)


def build_garment_total_hutang(
    spark: SparkSession, catalog: Catalog, wm: dt.datetime
) -> DataFrame:
    """See module docstring; `GarmentTotalHutang/run.js:40-237`."""
    inote = (
        catalog.read("garmentinternnotes")
        .alias("g")
        .filter(F.col("g.lastmodifiedutc") >= F.lit(wm))
        .join(
            catalog.read("garmentinternnoteitems").alias("gi"),
            F.col("g.Id") == F.col("gi.GarmentINId"),
            "left",
        )
        .join(
            catalog.read("garmentinternnotedetails").alias("gid"),
            F.col("gi.Id") == F.col("gid.GarmentItemINId"),
            "left",
        )
        .select(
            F.col("g.isDeleted").alias("inDeleted"),
            F.col("g.inNo"),
            F.col("g.inDate"),
            F.col("g.supplierName"),
            F.col("g.currencyCode"),
            F.col("gid.doDate"),
            F.col("gid.roNo"),
            F.col("gid.pricePerDealUnit"),
            F.col("gid.quantity"),
        )
    )
    rates = (
        catalog.read("garmentcurrencies")
        .filter(~F.col("_IsDeleted"))
        .select(
            F.col("code").alias("currencyCode"),
            F.col("rate").alias("kurs"),
            F.col("date").alias("rateDate"),
        )
    )
    # J7 — as-of: latest rate with rateDate <= doDate per currency code.
    with_rate = asof_join(
        inote,
        rates,
        left_on="doDate",
        right_on="rateDate",
        by=[("currencyCode", "currencyCode")],
        direction="backward",
        tiebreak="kurs",
        # currency dimension is tiny: per-key sorted array, broadcast,
        # zero extra shuffle on the fact side.
        strategy="broadcast",
    )
    kurs = F.coalesce(F.col("kurs"), F.lit(1.0))  # default rate (`run.js:213`)

    prs = (
        catalog.read("garmentpurchaserequests")
        .alias("g")
        .filter(~F.col("g.IsDeleted"))
        .join(
            catalog.read("garmentpurchaserequestitems").alias("gi"),
            F.col("g.Id") == F.col("gi.GarmentPRId"),
            "left",
        )
        .select(
            F.col("g.rono").alias("roNo"),
            F.col("gi.CategoryId").alias("CategoryId"),
            F.col("gi.CategoryName").alias("prCategoryName"),
            F.col("g.UnitId").alias("UnitId"),
            F.col("g.UnitName").alias("prUnitName"),
        )
        .join(
            F.broadcast(
                catalog.read("garmentcategories").select(
                    F.col("id").alias("CategoryId"), F.col("code").alias("prCategoryCode")
                )
            ),
            "CategoryId",
            "left",
        )
        .join(
            F.broadcast(
                catalog.read("units").select(
                    F.col("id").alias("UnitId"),
                    F.col("divisionName").alias("prDivisionName"),
                )
            ),
            "UnitId",
            "left",
        )
    )
    enriched = first_match_join(
        with_rate, prs, on="roNo", order_by=F.col("prCategoryCode").asc_nulls_last()
    )

    has_cat = F.col("prCategoryName").isNotNull() & F.col("prCategoryCode").isNotNull()
    return enriched.select(
        bool_str("inDeleted").alias("deleted"),
        nz_str("inNo", sanitize=False).alias("intern_note_no"),
        F.when(F.col("inDate").isNotNull(), fmt_date(to_jakarta(F.col("inDate")))).alias("date"),
        nz_str("supplierName").alias("supplier_name"),
        F.when(has_cat, category_garment(F.col("prCategoryCode"))).alias("category_type"),
        nz_num("pricePerDealUnit").alias("invoice_price"),
        nz_num("quantity").alias("delivered_quantity"),
        kurs.alias("deal_rate"),
        F.when(
            nz_num("quantity").isNotNull() & nz_num("pricePerDealUnit").isNotNull(),
            kurs * F.col("quantity") * F.col("pricePerDealUnit"),
        ).alias("total_price"),
        F.lit(None).cast("double").alias("total_payment"),
        nz_str("prCategoryName", sanitize=False).alias("category_name"),
        nz_str("prDivisionName", sanitize=False).alias("division_name"),
        nz_str("prUnitName", sanitize=False).alias("unit_name"),
    )


SPECS = [
    JobSpec(
        name="Fact Garment Pembelian from MongoDB to Azure DWH",
        build=build_garment_pembelian,
        merge_keys=[
            "purchase_request_no",
            "purchase_order_no",
            "product_code",
            "delivery_order_no",
            "unit_receipt_note_no",
        ],
        target="dl_fact_garment_pembelian",
        # Detail grain: 3-branch explode (`GarmentPembelian/run.js`) can emit
        # multiple rows per 5-part key.
        grain="group",
    ),
    JobSpec(
        name="Fact Total Hutang Garment from MongoDB to Azure DWH",
        build=build_garment_total_hutang,
        merge_keys=["intern_note_no"],
        target="dl_fact_garment_total_hutang",
        # Fact grain is intern-note DETAIL (1:N:N via GarmentInternNoteDetails,
        # `GarmentTotalHutang/run.js:257-283` stages every detail row): the
        # load must replace a note's detail set wholesale, never dedupe to
        # one row per note.
        grain="group",
    ),
]
