"""Golden test for the flagship Pembelian pipeline (SURVEY §5.2): the
10-table purchasing chain with D6 date clamping, D1 day-diffs, M4/M5
buckets, M6 category, M8 on-time status and the J3 currency probe, run on
seeded randomized fixtures and compared exactly against a DuckDB oracle.
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
def purchasing(spark, tmp_path_factory):
    rng = random.Random(99)
    base = tmp_path_factory.mktemp("golden_pembelian")

    def maybe(v, p=0.12):
        return None if rng.random() < p else v

    def ts(lo=dt.datetime(2023, 6, 1), days=300):
        return lo + dt.timedelta(days=rng.randrange(days), hours=rng.randrange(24))

    def old_or_ts():
        # ~8% of dates fall below the SQL Server floor (D6 clamp path);
        # avoid Feb 29 so year-substitution stays a valid date.
        if rng.random() < 0.08:
            return dt.datetime(1700, 1 + rng.randrange(12), 1 + rng.randrange(28))
        return ts()

    prs = [
        (
            i,
            f"PR-{i}",
            old_or_ts(),
            maybe(ts()),
            maybe("B1"),
            maybe("Budget's"),
            maybe(f"U{rng.randrange(4)}"),
            maybe("Unit"),
            maybe("DV1"),
            maybe("Div"),
            maybe(f"C{rng.randrange(6)}"),
            rng.choice(["BAHAN BAKU", "Bahan Baku", "ACC", None]),
            rng.random() < 0.15,
            rng.choice(["alice", "bob", "dev", "unit-test"]),
            ts(),
        )
        for i in range(120)
    ]
    pr_df = spark.createDataFrame(
        prs,
        "Id long, no string, createdUtc timestamp, expectedDeliveryDate timestamp,"
        " budgetCode string, budgetName string, unitCode string, unitName string,"
        " divisionCode string, divisionName string, categoryCode string,"
        " categoryName string, isDeleted boolean, createdby string,"
        " lastmodifiedutc timestamp",
    )
    ipos = [
        (
            200 + j,
            rng.randrange(140),
            f"IPO-{j}",
            maybe(f"PR-{rng.randrange(120)}"),
            rng.choice(["staff", "staff2", "dev"]),
            old_or_ts(),
            maybe(ts()),
            rng.random() < 0.15,
        )
        for j in range(150)
    ]
    ipo_df = spark.createDataFrame(
        ipos,
        "Id long, PRId long, PONo string, prNo string, createdBy string,"
        " CreatedUtc timestamp, expectedDeliveryDate timestamp, IsDeleted boolean",
    )
    eis = [
        (400 + j, 200 + rng.randrange(170), 600 + rng.randrange(60), rng.random() < 0.1)
        for j in range(160)
    ]
    ei_df = spark.createDataFrame(eis, "Id long, poId long, EPOId long, IsDeleted boolean")
    eds = [
        (
            800 + j,
            400 + rng.randrange(180),
            maybe(f"P{rng.randrange(60)}"),
            maybe(rng.choice(["Cotton 40's", "Ray'on", ""])),
            float(rng.choice([0, 10, 100, 250])),
            maybe("MTR"),
            float(rng.choice([0.0, 2.5, 19.99])),
        )
        for j in range(220)
    ]
    ed_df = spark.createDataFrame(
        eds,
        "Id long, EPOItemId long, productCode string, productName string,"
        " dealQuantity double, dealUomUnit string, pricePerDealUnit double",
    )
    epos = [
        (
            600 + j,
            f"EPO-{j}",
            old_or_ts(),
            maybe("S1"),
            maybe(rng.choice(["Supplier d'Un", "PT Maju"])),
            rng.randrange(4),
            maybe(rng.choice(["USD", "IDR"])),
            float(rng.choice([0.0, 1.0, 155.5, 15500.0])),
            maybe("T/T"),
        )
        for j in range(60)
    ]
    epo_df = spark.createDataFrame(
        epos,
        "Id long, epoNo string, createdUtc timestamp, supplierCode string,"
        " supplierName string, currencyId long, currencyCode string,"
        " currencyRate double, paymentMethod string",
    )
    dois = [(600 + rng.randrange(70), 1000 + rng.randrange(50)) for _ in range(80)]
    doi_df = spark.createDataFrame(dois, "EPOId long, DOId long")
    dos = [(1000 + j, f"DO-{j}", old_or_ts()) for j in range(50)]
    do_df = spark.createDataFrame(dos, "Id long, DONo string, DODate timestamp")
    urns = [
        (1200 + j, f"URN-{j}", maybe("Unit"), ts(), 1000 + rng.randrange(60), ts(),
         rng.random() < 0.1, "alice")
        for j in range(60)
    ]
    urn_df = spark.createDataFrame(
        urns,
        "id long, urnNo string, unitName string, receiptDate timestamp, doId long,"
        " lastmodifiedutc timestamp, isdeleted boolean, createdby string",
    )
    upois = [(1400 + rng.randrange(40), 1200 + rng.randrange(70)) for _ in range(70)]
    upoi_df = spark.createDataFrame(upois, "UPOId long, URNId long")
    upos = [(1400 + j, f"UPO-{j}", ts(), ts(), ts()) for j in range(40)]
    upo_df = spark.createDataFrame(
        upos, "Id long, upoNo string, createdUtc timestamp, date timestamp, dueDate timestamp"
    )
    curs = [(c, f"Currency {c}'s desc") for c in range(3)]  # id 3 dangles
    cur_df = spark.createDataFrame(curs, "id long, description string")

    frames = {
        "purchaserequests": pr_df,
        "internalpurchaseorders": ipo_df,
        "externalpurchaseorderitems": ei_df,
        "externalpurchaseorderdetails": ed_df,
        "externalpurchaseorders": epo_df,
        "deliveryorderitems": doi_df,
        "deliveryorders": do_df,
        "unitreceiptnotes": urn_df,
        "unitpaymentorderitems": upoi_df,
        "unitpaymentorders": upo_df,
        "currencies": cur_df,
    }
    cat = Catalog(spark=spark)
    con = duckdb.connect()
    for name, df in frames.items():
        path = str(base / f"{name}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(path)
        cat.tables[name] = path
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}/*.parquet'")
    return cat, con


# -- SQL mirrors of the engine's scalar helpers ------------------------------

def _clamp(c: str) -> str:
    """D6 clamp: year → current year for dates below 1753-01-01."""
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
    return f"date_diff('day', ({_clamp(a)})::DATE, ({_clamp(b)})::DATE)"


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


def _nz(col: str, alias: str, sanitize: bool = True) -> str:
    body = f"replace({col}, '''', '\"')" if sanitize else col
    return f"CASE WHEN {col} IS NOT NULL AND {col} <> '' THEN {body} END AS {alias}"


def _nznum(col: str, alias: str) -> str:
    return f"CASE WHEN {col} IS NOT NULL AND {col} <> 0 THEN {col} END AS {alias}"


def test_golden_pembelian(spark, purchasing):
    cat, con = purchasing
    df = ALL_SPECS["Fact Pembelian from MongoDB to Azure DWH"].build(spark, cat, WM)

    po_int = _ddiff("ipoCreatedUtc", "prCreatedUtc")
    pr_po_ext = _ddiff("epoCreatedUtc", "prCreatedUtc")
    po_ext = _ddiff("epoCreatedUtc", "ipoCreatedUtc")
    do_days = _ddiff("DODate", "epoCreatedUtc")
    urn_days = _ddiff("receiptDate", "DODate")
    upo_days = _ddiff("interNoteDate", "receiptDate")
    po_days = _ddiff("interNoteDate", "ipoCreatedUtc")

    sql = f"""
    WITH joined AS (
      SELECT pr.no AS prNo, pr.createdUtc AS prCreatedUtc,
             pr.expectedDeliveryDate AS prExpectedDeliveryDate,
             pr.budgetCode, pr.budgetName, pr.unitCode, pr.unitName,
             pr.divisionCode, pr.divisionName, pr.categoryCode, pr.categoryName,
             pr.isDeleted AS prDeleted,
             ipo.createdBy AS ipoCreatedBy, ipo.CreatedUtc AS ipoCreatedUtc,
             ipo.PONo, ipo.IsDeleted AS ipoIsDeleted, ipo.prNo AS ipoPrNo,
             ipo.expectedDeliveryDate AS ipoExpectedDeliveryDate,
             e.createdUtc AS epoCreatedUtc, e.epoNo, e.supplierCode, e.supplierName,
             e.currencyId, e.currencyCode, e.paymentMethod, e.currencyRate,
             ed.productCode, ed.productName, ed.dealQuantity, ed.dealUomUnit,
             ed.pricePerDealUnit,
             d.DONo, d.DODate, urn.urnNo AS URNNo, urn.receiptDate,
             upo.upoNo AS interNoteNo, upo.date AS interNoteDate,
             cur.description AS currencyName
      FROM purchaserequests pr
      -- Reference WHERE applies ipo/ei predicates AFTER the LEFT JOINs
      -- (`Pembelian/run.js:166`), making pr->ipo->ei effectively INNER:
      -- the oracle mirrors that so PR rows without a qualifying IPO/EI
      -- are asserted absent, not silently allowed.
      JOIN (SELECT * FROM internalpurchaseorders
            WHERE NOT IsDeleted AND createdBy NOT IN ('dev','unit-test')) ipo
        ON pr.Id = ipo.PRId
      JOIN (SELECT * FROM externalpurchaseorderitems WHERE NOT IsDeleted) ei
        ON ipo.Id = ei.poId
      LEFT JOIN externalpurchaseorderdetails ed ON ei.Id = ed.EPOItemId
      LEFT JOIN externalpurchaseorders e ON ei.EPOId = e.Id
      LEFT JOIN deliveryorderitems doi ON e.Id = doi.EPOId
      LEFT JOIN deliveryorders d ON doi.DOId = d.Id
      LEFT JOIN unitreceiptnotes urn ON d.Id = urn.doId
      LEFT JOIN unitpaymentorderitems upoi ON urn.id = upoi.URNId
      LEFT JOIN unitpaymentorders upo ON upoi.UPOId = upo.Id
      LEFT JOIN currencies cur ON e.currencyId = cur.id
      WHERE pr.lastmodifiedutc > TIMESTAMP '1970-01-01'
        AND pr.createdby NOT IN ('dev','unit-test'))
    SELECT {_nz("prNo", "purchase_request_no", sanitize=False)},
           {_vday("prCreatedUtc")} AS purchase_request_date,
           {_vday("prExpectedDeliveryDate")} AS expected_pr_delivery_date,
           {_nz("budgetCode", "budget_code", sanitize=False)},
           {_nz("budgetName", "budget_name", sanitize=False)},
           {_nz("unitCode", "unit_code", sanitize=False)},
           {_nz("unitName", "unit_name", sanitize=False)},
           {_nz("divisionCode", "division_code", sanitize=False)},
           {_nz("divisionName", "division_name", sanitize=False)},
           {_nz("categoryCode", "category_code", sanitize=False)},
           {_nz("categoryName", "category_name", sanitize=False)},
           CASE WHEN categoryName IS NOT NULL THEN
             CASE WHEN upper(categoryName) = 'BAHAN BAKU'
                  THEN 'BAHAN BAKU' ELSE 'NON BAHAN BAKU' END
           END AS category_type,
           {_nz("productCode", "product_code", sanitize=False)},
           {_nz("productName", "product_name")},
           CASE WHEN ipoCreatedUtc IS NOT NULL THEN {po_int} END AS purchase_request_days,
           CASE WHEN ipoCreatedUtc IS NOT NULL THEN {_week(po_int)} END AS purchase_request_days_range,
           CASE WHEN epoCreatedUtc IS NOT NULL THEN {pr_po_ext} END AS pr_po_external_days,
           CASE WHEN epoCreatedUtc IS NOT NULL THEN {_week(pr_po_ext)} END AS pr_po_external_days_range,
           {_nz("PONo", "purchase_order_no", sanitize=False)},
           {_vday("ipoCreatedUtc")} AS purchase_order_date,
           CASE WHEN epoCreatedUtc IS NOT NULL THEN {po_ext} END AS po_external_days,
           CASE WHEN epoCreatedUtc IS NOT NULL THEN {_week(po_ext)} END AS po_external_days_range,
           CASE WHEN ipoCreatedUtc IS NOT NULL THEN ipoCreatedBy END AS purchasing_staff_name,
           {_nz("ipoPrNo", "pr_no_at_po", sanitize=False)},
           {_nz("epoNo", "po_external_no", sanitize=False)},
           {_vday("epoCreatedUtc")} AS po_external_date,
           CASE WHEN epoCreatedUtc IS NOT NULL AND DODate IS NOT NULL
                THEN {do_days} END AS delivery_order_days,
           CASE WHEN epoCreatedUtc IS NOT NULL AND DODate IS NOT NULL
                THEN {_month(do_days)} END AS delivery_order_days_range,
           {_nz("supplierCode", "supplier_code", sanitize=False)},
           {_nz("supplierName", "supplier_name")},
           {_nz("currencyCode", "currency_code", sanitize=False)},
           {_nz("currencyName", "currency_name", sanitize=False)},
           {_nz("paymentMethod", "payment_method", sanitize=False)},
           {_nznum("currencyRate", "currency_rate")},
           {_nznum("dealQuantity", "purchase_quantity")},
           {_nz("dealUomUnit", "uom", sanitize=False)},
           {_nznum("pricePerDealUnit", "price_per_unit")},
           CASE WHEN pricePerDealUnit IS NOT NULL AND pricePerDealUnit <> 0
                     AND dealQuantity IS NOT NULL AND dealQuantity <> 0
                THEN dealQuantity * pricePerDealUnit * currencyRate END AS total_price,
           {_vday("ipoExpectedDeliveryDate")} AS expected_delivery_date,
           CASE WHEN epoNo IS NOT NULL THEN prNo END AS pr_no_at_po_ext,
           {_nz("DONo", "delivery_order_no", sanitize=False)},
           {_vday("DODate")} AS delivery_order_date,
           CASE WHEN receiptDate IS NOT NULL THEN {urn_days} END AS unit_receipt_note_days,
           CASE WHEN receiptDate IS NOT NULL THEN {_week(urn_days)} END AS unit_receipt_note_days_range,
           CASE WHEN DODate IS NOT NULL THEN
             CASE WHEN date_diff('day', ipoExpectedDeliveryDate::DATE, DODate::DATE) <= 0
                  THEN 'Tepat Waktu' ELSE 'Tidak Tepat Waktu' END
           END AS status,
           CASE WHEN DONo IS NOT NULL THEN prNo END AS pr_no_at_do,
           {_nz("URNNo", "unit_receipt_note_no", sanitize=False)},
           {_vday("receiptDate")} AS unit_receipt_note_date,
           CASE WHEN interNoteDate IS NOT NULL THEN {upo_days} END AS unit_payment_order_days,
           CASE WHEN interNoteDate IS NOT NULL THEN {_week(upo_days)} END AS unit_payment_order_days_range,
           {_nz("interNoteNo", "unit_payment_order_no", sanitize=False)},
           {_vday("interNoteDate")} AS unit_payment_order_date,
           CASE WHEN interNoteDate IS NOT NULL THEN {po_days} END AS purchase_order_days,
           CASE WHEN interNoteDate IS NOT NULL THEN {_month(po_days)} END AS purchase_order_days_range,
           CASE WHEN interNoteDate IS NOT NULL
                THEN CAST(pricePerDealUnit AS VARCHAR) END AS invoice_price,
           CASE WHEN prDeleted THEN 'true' ELSE 'false' END AS deleted_pr,
           CASE WHEN ipoIsDeleted IS NULL THEN NULL WHEN ipoIsDeleted THEN 'true' ELSE 'false' END AS deleted_po
    FROM joined
    """
    a = _canon(df.toPandas())
    b = _canon(con.execute(sql).df())
    assert list(a.columns) == list(b.columns), (set(a.columns) ^ set(b.columns))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
