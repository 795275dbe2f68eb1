"""Golden test for GarmentPembelian — the reference's deepest pipeline
(SURVEY §5.2): three-branch left-outer assembly (PO items × fulfillments /
fulfillment-less PO items / PO-less PRs), first-match EPO/URN/intern-note
probes, W2 last-delivered-date, Jakarta-shifted clamped day-diffs with
empty-else buckets, M7 garment categories and M9 zero-defaults — compared
exactly against a DuckDB oracle over randomized data.
"""

from __future__ import annotations

import datetime as dt
import random

import duckdb
import pandas as pd
import pytest

from com_danliris_service_etl_spark.jobs import ALL_SPECS
from com_danliris_service_etl_spark.sources.catalog import Catalog

WM = dt.datetime(1970, 1, 1)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


@pytest.fixture(scope="module")
def garment(spark, tmp_path_factory):
    rng = random.Random(111)
    base = tmp_path_factory.mktemp("golden_garment_pembelian")

    def maybe(v, p=0.12):
        return None if rng.random() < p else v

    def ts(lo=dt.datetime(2023, 9, 1), days=250):
        return lo + dt.timedelta(days=rng.randrange(days), hours=rng.randrange(24))

    def old_or_ts():
        if rng.random() < 0.06:
            return dt.datetime(1700, 1 + rng.randrange(12), 1 + rng.randrange(28))
        return ts()

    prs = [
        (
            i, old_or_ts(), rng.choice(["gar1", "gar2", "dev"]), rng.random() < 0.15,
            maybe(f"GPR-{i}"), maybe(ts()), maybe(f"K{i % 4}"), maybe("Konveksi's"),
            rng.choice([700, 701, 999]),  # 999 dangles
            ts(),
        )
        for i in range(90)
    ]
    pr_df = spark.createDataFrame(
        prs,
        "Id long, CreatedUtc timestamp, CreatedBy string, IsDeleted boolean,"
        " PRNo string, ExpectedDeliveryDate timestamp, UnitCode string,"
        " UnitName string, UnitId long, lastmodifiedutc timestamp",
    )
    pr_items = [
        (
            100 + j, rng.randrange(110), maybe(f"GP-{j}"), maybe("Fab'ric A"),
            float(rng.choice([0, 100, 500])), maybe("MTR"),
            rng.choice([800, 801, 802, 998]), maybe(rng.choice(["FABRIC", "BUTTON"])),
        )
        for j in range(120)
    ]
    pri_df = spark.createDataFrame(
        pr_items,
        "Id long, GarmentPRId long, ProductCode string, ProductName string,"
        " quantity double, UomUnit string, CategoryId long, CategoryName string",
    )
    units_df = spark.createDataFrame(
        [(700, "GMT", "Garm'ent"), (701, "WVG", "Weaving")],
        "id long, DivisionCode string, DivisionName string",
    )
    cats_df = spark.createDataFrame(
        [(800, "FAB"), (801, "ACC"), (802, "EMB")], "Id long, Code string"
    )
    cur_df = spark.createDataFrame(
        [("USD", "$"), ("IDR", "Rp")], "code string, symbol string"
    )
    pos = [
        (
            200 + j, rng.randrange(110), maybe(f"GPO-{j}"), old_or_ts(),
            rng.choice(["staff", "dev"]), rng.random() < 0.15,
        )
        for j in range(80)
    ]
    po_df = spark.createDataFrame(
        pos,
        "Id long, PRId long, PONo string, CreatedUtc timestamp,"
        " CreatedBy string, IsDeleted boolean",
    )
    po_items = [
        (
            300 + j, 200 + rng.randrange(95), maybe(f"GP-{j % 40}"),
            maybe("Fab'ric A"), rng.choice([800, 801, 802, 998]), maybe("FABRIC"),
        )
        for j in range(110)
    ]
    poi_df = spark.createDataFrame(
        po_items,
        "Id long, GPOId long, ProductCode string, ProductName string,"
        " CategoryId long, CategoryName string",
    )
    epo_items = [
        (
            400 + j, 300 + rng.randrange(130), 500 + rng.randrange(30),
            rng.choice(["staff", "dev"]),
            float(rng.choice([0, 100])), maybe("MTR"), float(rng.choice([0, 100])),
            float(rng.choice([0.0, 1.4])),
        )
        for j in range(100)
    ]
    epoi_df = spark.createDataFrame(
        epo_items,
        "Id long, POId long, GarmentEPOId long, CreatedBy string,"
        " DefaultQuantity double, DefaultUomUnit string, DealQuantity double,"
        " PricePerDealUnit double",
    )
    epos = [
        (
            500 + j, maybe(f"GEPO-{j}"), old_or_ts(), maybe(ts()), maybe("S'1"),
            maybe("Supplier d'Un"), maybe(rng.choice(["USD", "IDR", "XXX"])),
            float(rng.choice([0.0, 15500.0])), maybe("T/T"),
        )
        for j in range(30)
    ]
    epo_df = spark.createDataFrame(
        epos,
        "Id long, EPONo string, CreatedUtc timestamp, DeliveryDate timestamp,"
        " SupplierCode string, SupplierName string, CurrencyCode string,"
        " CurrencyRate double, PaymentMethod string",
    )
    dod = [
        (600 + j, 400 + rng.randrange(120), 650 + rng.randrange(40))
        for j in range(80)
    ]
    dod_df = spark.createDataFrame(dod, "Id long, EPOItemId long, GarmentDOItemId long")
    doi = [(650 + j, 680 + rng.randrange(25)) for j in range(40)]
    doi_df = spark.createDataFrame(doi, "Id long, GarmentDOId long")
    dos = [(680 + j, maybe(f"GDO-{j}"), maybe(old_or_ts())) for j in range(25)]
    do_df = spark.createDataFrame(dos, "Id long, DONo string, DODate timestamp")
    urni = [
        (710 + rng.randrange(20), 600 + rng.randrange(90),
         float(rng.choice([0, 60])), maybe("MTR"))
        for _ in range(50)
    ]
    urni_df = spark.createDataFrame(
        urni, "URNId long, DODetailId long, OrderQuantity double, UomUnit string"
    )
    urn_df = spark.createDataFrame(
        [(710 + j, maybe(f"GURN-{j}"), maybe(ts())) for j in range(20)],
        "Id long, URNNo string, ReceiptDate timestamp",
    )
    ind = [
        (730 + rng.randrange(15), 680 + rng.randrange(28),
         float(rng.choice([0, 140])), float(rng.choice([0, 100])), maybe(ts()))
        for _ in range(30)
    ]
    ind_df = spark.createDataFrame(
        ind,
        "GarmentItemINId long, DOId long, PriceTotal double, Quantity double,"
        " PaymentDueDate timestamp",
    )
    ini_df = spark.createDataFrame(
        [(730 + j, 745 + rng.randrange(10)) for j in range(15)],
        "Id long, GarmentINId long",
    )
    in_df = spark.createDataFrame(
        [(745 + j, maybe(f"GIN-{j}"), maybe(ts())) for j in range(10)],
        "Id long, INNo string, INDate timestamp",
    )

    frames = {
        "garmentpurchaserequests": pr_df,
        "garmentpurchaserequestitems": pri_df,
        "units": units_df,
        "garmentcategories": cats_df,
        "currencies": cur_df,
        "garmentinternalpurchaseorders": po_df,
        "garmentinternalpurchaseorderitems": poi_df,
        "garmentexternalpurchaseorderitems": epoi_df,
        "garmentexternalpurchaseorders": epo_df,
        "garmentdeliveryorderdetails": dod_df,
        "garmentdeliveryorderitems": doi_df,
        "garmentdeliveryorders": do_df,
        "garmentunitreceiptnoteitems": urni_df,
        "garmentunitreceiptnotes": urn_df,
        "garmentinternnotedetails": ind_df,
        "garmentinternnoteitems": ini_df,
        "garmentinternnotes": in_df,
    }
    cat = Catalog(spark=spark)
    con = duckdb.connect()
    for name, df in frames.items():
        path = str(base / f"{name}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(path)
        cat.tables[name] = path
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}/*.parquet'")
    return cat, con


def _clamp(c: str) -> str:
    return (
        f"CASE WHEN {c} < TIMESTAMP '1753-01-01'"
        # setFullYear semantics: keep time-of-day, overflow Feb 29 -> Mar 1
        f" THEN make_date(year(current_date), month({c}), 1)::TIMESTAMP"
        f" + (day({c}) - 1) * INTERVAL 1 DAY + ({c} - date_trunc('day', {c}))"
        f" ELSE {c} END"
    )


def _vday(c: str) -> str:
    return (
        f"CASE WHEN {c} IS NOT NULL"
        f" THEN strftime({_clamp(c)} + INTERVAL 7 HOUR, '%Y-%m-%d') END"
    )


def _ddiff(b: str, a: str) -> str:
    return (
        f"date_diff('day', ({_clamp(a)} + INTERVAL 7 HOUR)::DATE,"
        f" ({_clamp(b)} + INTERVAL 7 HOUR)::DATE)"
    )


def _week_empty(d: str) -> str:
    return (
        f"CASE WHEN {d} IS NULL THEN NULL"
        f" WHEN {d} <= 7 THEN '0-7 hari'"
        f" WHEN {d} BETWEEN 8 AND 14 THEN '8-14 hari'"
        f" WHEN {d} BETWEEN 15 AND 30 THEN '15-30 hari'"
        f" WHEN {d} > 30 THEN '>30 hari' ELSE '' END"
    )


def _week(d: str) -> str:
    return (
        f"CASE WHEN {d} <= 7 THEN '0-7 hari'"
        f" WHEN {d} BETWEEN 8 AND 14 THEN '8-14 hari'"
        f" WHEN {d} BETWEEN 15 AND 30 THEN '15-30 hari'"
        f" WHEN {d} > 30 THEN '>30 hari' END"
    )


def _month(d: str) -> str:
    return (
        f"CASE WHEN {d} <= 30 THEN '0-30 hari'"
        f" WHEN {d} BETWEEN 31 AND 60 THEN '31-60 hari'"
        f" WHEN {d} BETWEEN 61 AND 90 THEN '61-90 hari'"
        f" WHEN {d} > 90 THEN '>90 hari' END"
    )


def _nz(col: str, alias: str) -> str:
    return (
        f"CASE WHEN {col} IS NOT NULL AND {col} <> ''"
        f" THEN replace({col}, '''', '\"') END AS {alias}"
    )


def _cat(code: str) -> str:
    return (
        f"CASE WHEN lower({code}) = 'fab' THEN 'Bahan Baku'"
        f" WHEN lower({code}) IN ('emb','wsh','pls','prn','tes','qlt') THEN 'Jasa'"
        f" ELSE 'Accessories' END"
    )


def test_golden_garment_pembelian(spark, garment):
    cat, con = garment
    df = ALL_SPECS["Fact Garment Pembelian from MongoDB to Azure DWH"].build(
        spark, cat, WM
    )
    po_int = _ddiff("poCreatedUtc", "prCreatedUtc")
    pr_po_ext = _ddiff("epoCreatedUtc", "prCreatedUtc")
    po_ext = _ddiff("epoCreatedUtc", "poCreatedUtc")
    do_days = _ddiff("deliveryOrderDate", "epoCreatedUtc")
    urn_days = _ddiff("urnDate", "deliveryOrderDate")
    upo_days = _ddiff("inDate", "urnDate")
    po_days = _ddiff("inDate", "poCreatedUtc")

    sql = f"""
    WITH pr AS (
      SELECT g.Id AS prId, g.CreatedUtc AS prCreatedUtc, g.CreatedBy AS prCreatedBy,
             g.IsDeleted AS prDeleted, g.PRNo AS prNo,
             g.ExpectedDeliveryDate AS prExpectedDeliveryDate,
             g.UnitCode AS unitCode, g.UnitName AS unitName,
             u.DivisionCode AS divisionCode, u.DivisionName AS divisionName
      FROM garmentpurchaserequests g LEFT JOIN units u ON g.UnitId = u.id
      WHERE g.lastmodifiedutc >= TIMESTAMP '1970-01-01'
        AND g.CreatedBy NOT IN ('dev','unit-test')),
    po AS (
      SELECT Id AS poId, PRId AS prId, PONo AS poNo, CreatedUtc AS poCreatedUtc,
             CreatedBy AS poCreatedBy, IsDeleted AS poDeleted
      FROM garmentinternalpurchaseorders WHERE CreatedBy NOT IN ('dev','unit-test')),
    po_items AS (
      SELECT i.GPOId AS poId, i.Id AS poItemId, i.ProductCode AS productCode,
             i.ProductName AS productName, i.CategoryName AS categoryName,
             c.Code AS categoryCode
      FROM garmentinternalpurchaseorderitems i
      LEFT JOIN garmentcategories c ON i.CategoryId = c.Id),
    epo_first AS (
      SELECT * FROM (
        SELECT ei.POId AS poId, ei.Id AS epoItemId, e.EPONo AS epoNo,
               e.CreatedUtc AS epoCreatedUtc, e.DeliveryDate AS epoDeliveryDate,
               e.SupplierCode AS supplierCode, e.SupplierName AS supplierName,
               e.CurrencyCode AS currencyCode, e.CurrencyRate AS currencyRate,
               e.PaymentMethod AS paymentMethod, ei.DefaultQuantity AS defaultQuantity,
               ei.DefaultUomUnit AS defaultUom, ei.DealQuantity AS dealQuantity,
               ei.PricePerDealUnit AS pricePerDealUnit, cu.symbol AS currencySymbol,
               row_number() OVER (PARTITION BY ei.POId ORDER BY ei.Id) AS rn
        FROM garmentexternalpurchaseorderitems ei
        LEFT JOIN garmentexternalpurchaseorders e ON ei.GarmentEPOId = e.Id
        LEFT JOIN currencies cu ON e.CurrencyCode = cu.code
        WHERE ei.CreatedBy NOT IN ('dev','unit-test')) WHERE rn = 1),
    ful0 AS (
      SELECT gd.EPOItemId AS epoItemId, gd.Id AS doDetailId, g.Id AS doId,
             g.DONo AS deliveryOrderNo, g.DODate AS deliveryOrderDate
      FROM garmentdeliveryorderdetails gd
      LEFT JOIN garmentdeliveryorderitems gi ON gd.GarmentDOItemId = gi.Id
      LEFT JOIN garmentdeliveryorders g ON gi.GarmentDOId = g.Id),
    urn1 AS (
      SELECT * FROM (
        SELECT gi.DODetailId AS doDetailId, g.URNNo AS urnNo,
               g.ReceiptDate AS urnDate, gi.OrderQuantity AS urnQuantity,
               row_number() OVER (PARTITION BY gi.DODetailId
                                  ORDER BY g.URNNo) AS rn
        FROM garmentunitreceiptnoteitems gi
        LEFT JOIN garmentunitreceiptnotes g ON gi.URNId = g.Id) WHERE rn = 1),
    in1 AS (
      SELECT * FROM (
        SELECT gd.DOId AS doId, g.INNo AS inNo, g.INDate AS inDate,
               gd.PriceTotal AS inPrice, gd.Quantity AS inQuantity,
               gd.PaymentDueDate AS inDueDate,
               row_number() OVER (PARTITION BY gd.DOId ORDER BY g.INNo) AS rn
        FROM garmentinternnotedetails gd
        LEFT JOIN garmentinternnoteitems gi ON gd.GarmentItemINId = gi.Id
        LEFT JOIN garmentinternnotes g ON gi.GarmentINId = g.Id) WHERE rn = 1),
    ful AS (
      SELECT f.*, u.urnNo, u.urnDate, u.urnQuantity,
             i.inNo, i.inDate, i.inPrice, i.inQuantity, i.inDueDate,
             max_by(f.deliveryOrderDate, f.doDetailId)
               OVER (PARTITION BY f.epoItemId) AS lastDeliveredDate
      FROM ful0 f
      LEFT JOIN urn1 u USING (doDetailId)
      LEFT JOIN in1 i USING (doId)),
    branch_a AS (
      SELECT pr.*, po.* EXCLUDE (prId), pi.* EXCLUDE (poId),
             e.* EXCLUDE (poId), f.* EXCLUDE (epoItemId)
      FROM pr
      JOIN po USING (prId)
      JOIN po_items pi USING (poId)
      LEFT JOIN epo_first e USING (poId)
      LEFT JOIN ful f USING (epoItemId))
    SELECT {_nz("prNo", "purchase_request_no")},
           {_vday("prCreatedUtc")} AS purchase_request_date,
           {_vday("prExpectedDeliveryDate")} AS expected_pr_delivery_date,
           {_nz("unitCode", "unit_code")},
           {_nz("unitName", "unit_name")},
           {_nz("divisionCode", "division_code")},
           {_nz("divisionName", "division_name")},
           {_nz("categoryCode", "category_code")},
           {_nz("categoryName", "category_name")},
           CASE WHEN categoryCode IS NOT NULL THEN {_cat("categoryCode")} END
             AS category_type,
           {_nz("productCode", "product_code")},
           {_nz("productName", "product_name")},
           coalesce({po_int}, 0) AS purchase_request_days,
           {_week_empty(po_int)} AS purchase_request_days_range,
           coalesce({pr_po_ext}, 0) AS pr_po_external_days,
           {_week_empty(pr_po_ext)} AS pr_po_external_days_range,
           CASE WHEN prDeleted THEN 'true' ELSE 'false' END AS deleted_pr,
           {_nz("poNo", "purchase_order_no")},
           {_vday("poCreatedUtc")} AS purchase_order_date,
           coalesce({po_ext}, 0) AS po_external_days,
           {_week_empty(po_ext)} AS po_external_days_range,
           {_nz("poCreatedBy", "purchasing_staff_name")},
           {_nz("prNo", "pr_no_at_po")},
           CASE WHEN poDeleted THEN 'true' ELSE 'false' END AS deleted_po,
           {_nz("epoNo", "po_external_no")},
           {_vday("epoCreatedUtc")} AS po_external_date,
           CASE WHEN doDetailId IS NOT NULL THEN
             CASE WHEN deliveryOrderDate IS NOT NULL
                  THEN coalesce({do_days}, 0) ELSE 0 END
           END AS delivery_order_days,
           CASE WHEN doDetailId IS NOT NULL AND deliveryOrderDate IS NOT NULL
                THEN {_month(do_days)} END AS delivery_order_days_range,
           CASE WHEN epoCreatedUtc IS NOT NULL THEN
             CASE WHEN supplierCode IS NOT NULL AND supplierCode <> ''
                  THEN replace(supplierCode, '''', '"') END
           END AS supplier_code,
           CASE WHEN epoCreatedUtc IS NOT NULL THEN
             CASE WHEN supplierName IS NOT NULL AND supplierName <> ''
                  THEN replace(supplierName, '''', '"') END
           END AS supplier_name,
           CASE WHEN epoCreatedUtc IS NOT NULL THEN
             CASE WHEN currencyCode IS NOT NULL AND currencyCode <> ''
                  THEN currencyCode END
           END AS currency_code,
           CASE WHEN epoCreatedUtc IS NOT NULL THEN
             CASE WHEN currencySymbol IS NOT NULL AND currencySymbol <> ''
                  THEN currencySymbol END
           END AS currency_symbol,
           CASE WHEN epoCreatedUtc IS NOT NULL THEN
             CASE WHEN paymentMethod IS NOT NULL AND paymentMethod <> ''
                  THEN paymentMethod END
           END AS payment_method,
           CASE WHEN epoCreatedUtc IS NOT NULL THEN
             CASE WHEN currencyRate IS NOT NULL AND currencyRate <> 0
                  THEN currencyRate END
           END AS currency_rate,
           CASE WHEN defaultQuantity IS NOT NULL AND defaultQuantity <> 0
                THEN defaultQuantity END AS purchase_quantity,
           {_nz("defaultUom", "uom")},
           CASE WHEN epoNo IS NOT NULL THEN pricePerDealUnit END AS price_per_unit,
           CASE WHEN currencyRate IS NOT NULL AND currencyRate <> 0
                     AND pricePerDealUnit IS NOT NULL AND pricePerDealUnit <> 0
                     AND dealQuantity IS NOT NULL AND dealQuantity <> 0
                THEN dealQuantity * pricePerDealUnit * currencyRate END AS total_price,
           {_vday("epoDeliveryDate")} AS expected_delivery_date,
           {_nz("prNo", "pr_no_at_po_ext")},
           {_nz("deliveryOrderNo", "delivery_order_no")},
           {_vday("deliveryOrderDate")} AS delivery_order_date,
           CASE WHEN doDetailId IS NOT NULL THEN
             CASE WHEN urnDate IS NOT NULL THEN coalesce({urn_days}, 0) ELSE 0 END
           END AS unit_receipt_note_days,
           CASE WHEN doDetailId IS NOT NULL AND urnDate IS NOT NULL
                THEN {_week(urn_days)} END AS unit_receipt_note_days_range,
           CASE WHEN deliveryOrderDate IS NOT NULL THEN
             CASE WHEN date_diff('day', epoDeliveryDate::DATE,
                                 lastDeliveredDate::DATE) <= 0
                  THEN 'Tepat Waktu' ELSE 'Tidak Tepat Waktu' END
           END AS status,
           CASE WHEN doDetailId IS NOT NULL THEN prNo END AS pr_no_at_do,
           {_nz("urnNo", "unit_receipt_note_no")},
           {_vday("urnDate")} AS unit_receipt_note_date,
           CASE WHEN doDetailId IS NOT NULL THEN
             CASE WHEN inDate IS NOT NULL THEN coalesce({upo_days}, 0) ELSE 0 END
           END AS unit_payment_order_days,
           CASE WHEN doDetailId IS NOT NULL AND inDate IS NOT NULL
                THEN {_week(upo_days)} END AS unit_payment_order_days_range,
           {_nz("inNo", "unit_payment_order_no")},
           {_vday("inDate")} AS unit_payment_order_date,
           CASE WHEN doDetailId IS NOT NULL THEN
             CASE WHEN inDate IS NOT NULL THEN coalesce({po_days}, 0) ELSE 0 END
           END AS purchase_order_days,
           CASE WHEN doDetailId IS NOT NULL AND inDate IS NOT NULL
                THEN {_month(po_days)} END AS purchase_order_days_range,
           CASE WHEN inPrice IS NOT NULL AND inPrice <> 0
                THEN CAST(inPrice AS VARCHAR) END AS invoice_price,
           CASE WHEN inPrice IS NOT NULL AND inPrice <> 0
                THEN CAST(inPrice AS VARCHAR) END AS unit_payment_order_price,
           CASE WHEN inQuantity IS NOT NULL AND inQuantity <> 0
                THEN CAST(inQuantity AS VARCHAR) END AS unit_payment_order_quantity,
           {_vday("inDueDate")} AS unit_payment_order_due_date,
           CAST(urnQuantity AS VARCHAR) AS unit_receipt_note_delivered_quantity
    FROM branch_a
    UNION ALL BY NAME
    SELECT {_nz("prNo", "purchase_request_no")},
           {_vday("prCreatedUtc")} AS purchase_request_date,
           {_vday("prExpectedDeliveryDate")} AS expected_pr_delivery_date,
           {_nz("unitCode", "unit_code")},
           {_nz("unitName", "unit_name")},
           {_nz("divisionCode", "division_code")},
           {_nz("divisionName", "division_name")},
           {_nz("prItemCategoryCode", "category_code")},
           {_nz("prItemCategoryName", "category_name")},
           CASE WHEN prItemCategoryCode IS NOT NULL
                THEN {_cat("prItemCategoryCode")} END AS category_type,
           {_nz("prItemProductCode", "product_code")},
           {_nz("prItemProductName", "product_name")},
           CAST(NULL AS INT) AS purchase_request_days,
           CAST(NULL AS VARCHAR) AS purchase_request_days_range,
           CAST(NULL AS INT) AS pr_po_external_days,
           CAST(NULL AS VARCHAR) AS pr_po_external_days_range,
           CASE WHEN prDeleted THEN 'true' ELSE 'false' END AS deleted_pr,
           {_nz("prCreatedBy", "purchasing_staff_name")},
           CASE WHEN prItemQuantity IS NOT NULL AND prItemQuantity <> 0
                THEN prItemQuantity END AS purchase_quantity,
           {_nz("prItemUom", "uom")}
    FROM (
      SELECT pr.*, i.ProductCode AS prItemProductCode,
             i.ProductName AS prItemProductName, i.quantity AS prItemQuantity,
             i.UomUnit AS prItemUom, i.CategoryName AS prItemCategoryName,
             c.Code AS prItemCategoryCode
      FROM pr
      LEFT JOIN garmentpurchaserequestitems i ON pr.prId = i.GarmentPRId
      LEFT JOIN garmentcategories c ON i.CategoryId = c.Id
      WHERE pr.prId NOT IN (SELECT prId FROM po))
    """
    a = _canon(df.toPandas())
    b = _canon(con.execute(sql).df())
    assert list(a.columns) == list(b.columns), (set(a.columns) ^ set(b.columns))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
