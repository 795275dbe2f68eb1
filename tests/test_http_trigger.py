"""S10 HTTP twin: the same run_job protocol the CLI and scheduler drive,
exposed over HTTP the way the reference's function host exposed run()
(`Pembelian/index.js:1-17`). Pins routing, the synchronous run contract,
watermark advancement across calls, and the 404/500 error paths."""

from __future__ import annotations

import datetime as dt
import json
import threading
import urllib.request

import pytest
from pyspark.sql import functions as F

from com_danliris_service_etl_spark.plans.http_trigger import make_server
from com_danliris_service_etl_spark.plans.jobs import JobSpec
from com_danliris_service_etl_spark.sources.catalog import Catalog
from com_danliris_service_etl_spark.sources.watermark import WatermarkStore


@pytest.fixture()
def served(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, "a", dt.datetime(2024, 1, 2)), (2, "b", dt.datetime(2024, 1, 3))],
        "id long, v string, lastmodifiedutc timestamp",
    )
    cat = Catalog(spark=spark)
    p = str(tmp_path / "src")
    src.write.parquet(p)
    cat.tables["src"] = p

    def build(sp, catalog, wm):
        return catalog.read("src").filter(F.col("lastmodifiedutc") > F.lit(wm))

    def build_boom(sp, catalog, wm):
        raise RuntimeError("extract exploded")

    specs = {
        "Fact Simple Test": JobSpec(
            "Fact Simple Test", build, ["id"], str(tmp_path / "fact")
        ),
        "Fact Boom": JobSpec("Fact Boom", build_boom, ["id"], str(tmp_path / "boom")),
    }
    store = WatermarkStore(spark, str(tmp_path / "log"))
    srv = make_server(spark, specs, cat, store)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        yield base, spark, specs, store
    finally:
        srv.shutdown()
        srv.server_close()


def _call(url, method="GET"):
    req = urllib.request.Request(url, method=method)
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_trigger_runs_job_and_advances_watermark(served):
    base, spark, specs, store = served
    code, body = _call(f"{base}/run/Fact%20Simple%20Test", method="POST")
    assert code == 200 and body["status"] == "Successful" and body["rows"] == 2
    fact = spark.read.parquet(specs["Fact Simple Test"].target)
    assert fact.count() == 2
    # second poke: watermark advanced → empty increment, fact unchanged
    code, body = _call(f"{base}/run/Fact%20Simple%20Test")  # GET works too
    assert code == 200 and body["rows"] == 0
    assert spark.read.parquet(specs["Fact Simple Test"].target).count() == 2


def test_http_trigger_lists_jobs_and_404s(served):
    base, _, _, _ = served
    code, body = _call(f"{base}/jobs")
    assert code == 200 and body["jobs"] == ["Fact Boom", "Fact Simple Test"]
    code, body = _call(f"{base}/run/Nope")
    assert code == 404 and "unknown job" in body["error"]
    code, body = _call(f"{base}/nothing")
    assert code == 404


def test_http_trigger_failure_is_500_and_logged(served):
    base, _, _, store = served
    code, body = _call(f"{base}/run/Fact%20Boom", method="POST")
    assert code == 500 and "extract exploded" in body["error"]
    # run_job's catch appended the Failed telemetry row (reference
    # behavior: the error lands in the migration log) and the watermark
    # did NOT advance
    log = store._log().filter(F.col("description") == "Fact Boom").collect()
    assert len(log) == 1 and log[0]["status"].startswith("Failed")
    from com_danliris_service_etl_spark.sources.watermark import EPOCH

    assert store.read_watermark("Fact Boom") == EPOCH
