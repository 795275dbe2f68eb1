"""Job-runner end-to-end test: a Pembelian-shaped pipeline (watermark →
multi-way left join + broadcast currency probe → scalar transforms → MERGE)
over FIXTURES.md-shaped inline data, run twice for idempotence and once
incrementally (SURVEY.md §5.4)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from com_danliris_service_etl_spark.functions import (
    bucket_days_week,
    day_diff,
    on_time_status,
    quote_sanitize,
)
from com_danliris_service_etl_spark.operators.joins import first_match_join
from com_danliris_service_etl_spark.plans.jobs import JobSpec, run_job
from com_danliris_service_etl_spark.sources.catalog import Catalog
from com_danliris_service_etl_spark.sources.watermark import WatermarkStore


@pytest.fixture()
def catalog(spark, tmp_path):
    """FIXTURES.md §1 purchasing-chain shaped sources."""
    pr = spark.createDataFrame(
        [
            (1, "PR-001", "BAHAN BAKU", "dev's unit", dt.datetime(2024, 1, 5),
             dt.datetime(2024, 1, 20), "alice", False),
            (2, "PR-002", "ACC", "weaving", dt.datetime(2024, 1, 6),
             dt.datetime(2024, 1, 10), "dev", False),  # excluded: test user (P4)
            (3, "PR-003", "ACC", "spin", dt.datetime(2024, 1, 7),
             dt.datetime(2024, 1, 25), "bob", True),  # excluded: soft-deleted (P3)
            (4, "PR-004", None, "print", dt.datetime(2024, 1, 8),
             dt.datetime(2024, 1, 9), "carol", False),
        ],
        "id long, no string, categoryName string, unitName string, "
        "lastModifiedUtc timestamp, expectedDeliveryDate timestamp, "
        "createdBy string, isDeleted boolean",
    )
    po = spark.createDataFrame(
        [
            (10, 1, "PO-1", "USD", dt.datetime(2024, 1, 18)),
            (11, 4, "PO-4", "IDR", dt.datetime(2024, 1, 12)),
        ],
        "id long, prId long, poNo string, currencyCode string, doDate timestamp",
    )
    currencies = spark.createDataFrame(
        [("USD", 15000.0, dt.datetime(2024, 1, 1)), ("USD", 15500.0, dt.datetime(2024, 1, 2))],
        "code string, rate double, date timestamp",
    )
    cat = Catalog(spark=spark)
    base = tmp_path / "src"
    for name, df in [("purchaserequests", pr), ("purchaseorders", po), ("currencies", currencies)]:
        p = str(base / name)
        df.write.parquet(p)
        cat.tables[name] = p
    return cat


def _build(spark, catalog, wm):
    pr = catalog.read("purchaserequests").filter(
        (F.col("lastModifiedUtc") > F.lit(wm))
        & (~F.col("isDeleted"))
        & (~F.col("createdBy").isin("dev", "unit-test"))
    )
    po = catalog.read("purchaseorders")
    cur = catalog.read("currencies").withColumnRenamed("code", "currencyCode")
    j = pr.join(po, pr.id == po.prId, "left").select(
        pr.id.alias("prId"), "no", "categoryName", "unitName",
        "expectedDeliveryDate", "poNo", "currencyCode", "doDate",
    )
    # J3 currency probe: first match = latest rate (broadcast dim)
    j = first_match_join(
        j, cur, on="currencyCode", order_by=F.col("date").desc(), broadcast_right=True
    )
    return j.select(
        "prId",
        quote_sanitize("unitName").alias("unitName"),
        F.coalesce("rate", F.lit(1.0)).alias("currencyRate"),
        day_diff("doDate", "expectedDeliveryDate").alias("delay_days"),
        bucket_days_week(day_diff("doDate", "expectedDeliveryDate")).alias("delay_bucket"),
        on_time_status("doDate", "expectedDeliveryDate").alias("ontime"),
    )


def test_pembelian_shaped_job(spark, catalog, tmp_path):
    store = WatermarkStore(spark, str(tmp_path / "log"))
    spec = JobSpec("Fact Pembelian Test", _build, ["prId"], str(tmp_path / "fact"))

    res = run_job(spark, spec, catalog, store)
    assert res.status == "Successful"
    fact = spark.read.parquet(spec.target)
    rows = {r.prId: r for r in fact.collect()}
    # dev-created + soft-deleted PRs excluded; alice & carol flow through
    assert set(rows) == {1, 4}
    assert rows[1].unitName == 'dev"s unit'  # T1 quote sanitization
    assert rows[1].currencyRate == 15500.0  # latest USD rate won (J3/J6 tiebreak)
    assert rows[1].ontime == "Tepat Waktu"  # doDate 01-18 <= expected 01-20
    assert rows[4].currencyRate == 1.0  # IDR: no rate → default 1
    assert rows[4].delay_bucket == "0-7 hari"

    # idempotent re-run: watermark advanced, zero new rows, fact unchanged
    res2 = run_job(spark, spec, catalog, store)
    assert res2.rows == 0
    assert spark.read.parquet(spec.target).count() == 2

    # incremental: touch PR 4 after the watermark → only it re-flows
    wm = store.read_watermark(spec.name)
    upd = spark.createDataFrame(
        [(4, "PR-004", None, "print2", wm + dt.timedelta(days=1),
          dt.datetime(2024, 1, 9), "carol", False)],
        "id long, no string, categoryName string, unitName string, "
        "lastModifiedUtc timestamp, expectedDeliveryDate timestamp, "
        "createdBy string, isDeleted boolean",
    )
    old = spark.read.parquet(catalog.tables["purchaserequests"])
    merged = old.filter(F.col("id") != 4).unionByName(upd)
    merged.write.mode("overwrite").parquet(str(tmp_path / "src2"))
    catalog.tables["purchaserequests"] = str(tmp_path / "src2")

    res3 = run_job(spark, spec, catalog, store)
    assert res3.rows == 1
    fact = {r.prId: r for r in spark.read.parquet(spec.target).collect()}
    assert set(fact) == {1, 4}
    assert fact[4].unitName == "print2"  # updated in place (MERGE)
    assert fact[1].unitName == 'dev"s unit'  # untouched row preserved


def test_group_grain_preserves_fanout_and_null_keys(spark, tmp_path):
    """The grain fix for the fan-out facts (Kanban / DailyOperation /
    MonitoringEvent / ProductionOrderStatus): a build that emits several
    rows per merge key — including NULL keys — must land ALL of them,
    and a re-run must replace the group, not duplicate or collapse it."""
    from com_danliris_service_etl_spark.sources.sinks import merge_upsert

    target = str(tmp_path / "fact_fanout")
    batch = spark.createDataFrame(
        [
            ("OP1", "r1"),
            ("OP1", "r2"),      # fan-out: two reasons for one operation
            (None, "x1"),
            (None, "x2"),       # two distinct NULL-key rows
        ],
        "code string, detail string",
    )
    merge_upsert(spark, target, batch, keys=["code"], replace_group=True)
    first = {(r.code, r.detail) for r in spark.read.parquet(target).collect()}
    assert first == {("OP1", "r1"), ("OP1", "r2"), (None, "x1"), (None, "x2")}

    # group replace: OP1 shrinks to one row; NULL group replaced wholesale
    batch2 = spark.createDataFrame(
        [("OP1", "r9"), (None, "x9")], "code string, detail string"
    )
    merge_upsert(spark, target, batch2, keys=["code"], replace_group=True)
    second = {(r.code, r.detail) for r in spark.read.parquet(target).collect()}
    assert second == {("OP1", "r9"), (None, "x9")}


def test_fanout_specs_declare_group_grain():
    """Pin the grain declarations the load-loss review fixed: every spec
    whose build fans out per child row must load with replace-group
    semantics, or merge_upsert's row-grain dedupe silently drops rows."""
    from com_danliris_service_etl_spark.jobs import ALL_SPECS

    for name in [
        "Fact Kanban from MongoDB to Azure DWH",
        "Fact Daily Operation from MongoDB to Azure DWH",
        "Fact Monitoring Event from MongoDB to Azure DWH",
        "Fact Production Order Status from MongoDB to Azure DWH",
        "Fact Packing from MongoDB to Azure DWH",
        "Fact Fabric QC from MongoDB to Azure DWH",
        "Fact Packing Receipt from MongoDB to Azure DWH",
        "Fact Shipment Document from MongoDB to Azure DWH",
    ]:
        assert ALL_SPECS[name].grain == "group", name


def test_run_job_empty_fact_triggers_full_reextract(spark, tmp_path):
    """Empty fact ⇒ full extract, whatever the log says: an advanced
    watermark with no committed target data (redirected target_dir,
    deleted fact) must re-load everything — loading only the delta into
    an empty fact would silently drop all history (review finding r6)."""
    import shutil

    from com_danliris_service_etl_spark.plans.jobs import JobSpec, run_job
    from com_danliris_service_etl_spark.sources.catalog import Catalog
    from com_danliris_service_etl_spark.sources.watermark import WatermarkStore

    cat = Catalog(spark=spark)
    src = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1)), (2, dt.datetime(2024, 1, 2))],
        "id long, lastmodifiedutc timestamp",
    )
    p = str(tmp_path / "src")
    src.write.parquet(p)
    cat.tables["src"] = p

    def build(sp, catalog, wm):
        return catalog.read("src").filter(F.col("lastmodifiedutc") > F.lit(wm))

    spec = JobSpec("Fact Reload", build, ["id"], str(tmp_path / "fact"))
    store = WatermarkStore(spark, str(tmp_path / "log"))
    r1 = run_job(spark, spec, cat, store)
    assert r1.rows == 2
    # watermark is now 2024-..; wipe the fact and re-run: full reload, not
    # the empty post-watermark delta
    shutil.rmtree(tmp_path / "fact")
    r2 = run_job(spark, spec, cat, store)
    assert r2.rows == 2
    assert spark.read.parquet(spec.target).count() == 2


def test_run_nightly_rejects_unknown_names_up_front(spark, tmp_path):
    from com_danliris_service_etl_spark.plans.schedule import run_nightly
    from com_danliris_service_etl_spark.sources.catalog import Catalog
    from com_danliris_service_etl_spark.sources.watermark import WatermarkStore

    store = WatermarkStore(spark, str(tmp_path / "log"))
    with pytest.raises(ValueError, match="unknown job name"):
        run_nightly(
            spark, Catalog(spark=spark), store,
            layers=[["Fact Pembelian from MongoDB to Azure DWH", "Fact Typo"]],
        )
    # nothing ran — the valid sibling was not half-executed
    assert store.read_watermark("Fact Pembelian from MongoDB to Azure DWH").year == 1970


def test_run_nightly_reports_failed_jobs_in_results(spark, tmp_path, monkeypatch):
    """A failed job must surface as a Failed JobResult in the returned
    list, not vanish (callers should not need to read the migration log
    to learn something broke)."""
    from com_danliris_service_etl_spark.jobs import ALL_SPECS
    from com_danliris_service_etl_spark.plans.jobs import JobSpec
    from com_danliris_service_etl_spark.plans.schedule import run_nightly
    from com_danliris_service_etl_spark.sources.catalog import Catalog
    from com_danliris_service_etl_spark.sources.watermark import WatermarkStore

    def boom(sp, catalog, wm):
        raise RuntimeError("extract exploded")

    name = "Fact Boom Nightly Test"
    monkeypatch.setitem(
        ALL_SPECS, name, JobSpec(name, boom, ["id"], str(tmp_path / "boom"))
    )
    store = WatermarkStore(spark, str(tmp_path / "log"))
    results = run_nightly(
        spark, Catalog(spark=spark), store, layers=[[name]], continue_on_error=True
    )
    assert len(results) == 1
    assert results[0].job == name and results[0].status.startswith("Failed")
    assert "extract exploded" in results[0].status


def test_nz_num_nan_is_falsy(spark):
    """JS falsy includes NaN: `x ? x : 0` maps NaN to 0, so a corrupted
    NaN field must take the default instead of poisoning downstream
    SUM/AVG (review finding r6). Integer columns stay valid (the isnan
    probe runs on a double cast)."""
    from com_danliris_service_etl_spark.jobs._helpers import nz_num

    df = spark.createDataFrame(
        [(1, float("nan")), (2, 5.0), (3, 0.0), (4, None)], "id long, x double"
    )
    got = {r.id: r.v for r in df.select("id", nz_num("x", 0.0).alias("v")).collect()}
    assert got == {1: 0.0, 2: 5.0, 3: 0.0, 4: 0.0}
    # strict ternary (no default): NaN → NULL like the other falsies
    got2 = {r.id: r.v for r in df.select("id", nz_num("x").alias("v")).collect()}
    assert got2 == {1: None, 2: 5.0, 3: None, 4: None}
    # integer input still analyzes and behaves
    di = spark.createDataFrame([(1, 7), (2, 0)], "id long, x long")
    goti = {r.id: r.v for r in di.select("id", nz_num("x", 0.0).alias("v")).collect()}
    assert goti == {1: 7.0, 2: 0.0}


def test_run_job_empty_extra_target_triggers_full_reextract(spark, tmp_path):
    """ADVICE r6: the empty-fact ⇒ EPOCH guard covers extra_targets too —
    a deleted/redirected EXTRA fact while the main target still holds data
    is the same silent-history-loss class (all targets share one per-job
    watermark)."""
    import shutil

    from com_danliris_service_etl_spark.plans.jobs import JobSpec, run_job
    from com_danliris_service_etl_spark.sources.catalog import Catalog
    from com_danliris_service_etl_spark.sources.watermark import WatermarkStore

    cat = Catalog(spark=spark)
    src = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1)), (2, dt.datetime(2024, 1, 2))],
        "id long, lastmodifiedutc timestamp",
    )
    p = str(tmp_path / "src")
    src.write.parquet(p)
    cat.tables["src"] = p

    def build(sp, catalog, wm):
        return catalog.read("src").filter(F.col("lastmodifiedutc") > F.lit(wm))

    extra_path = str(tmp_path / "fact_extra")
    spec = JobSpec(
        "Fact Dual Reload", build, ["id"], str(tmp_path / "fact_main"),
        extra_targets={extra_path: (build, ["id"])},
    )
    store = WatermarkStore(spark, str(tmp_path / "log"))
    r1 = run_job(spark, spec, cat, store)
    assert r1.rows == 2
    assert spark.read.parquet(extra_path).count() == 2
    # wipe ONLY the extra fact; the main target keeps its data
    shutil.rmtree(extra_path)
    run_job(spark, spec, cat, store)
    assert spark.read.parquet(extra_path).count() == 2
    assert spark.read.parquet(spec.target).count() == 2
