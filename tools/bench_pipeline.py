"""Nightly-DAG control-plane wall-clock (VERDICT r13 task 8).

The 23 reference pipelines are golden-tested end-to-end on fixtures; this
tool turns the CONTROL PLANE into a number: the full `run_nightly` DAG —
watermark read → incremental build → MERGE upsert → migration-log
telemetry, per job, layer by layer — wall-clocked over PARQUET sources
(the fixture relations materialized to disk, so every read is a real
scan with footer/pushdown behavior, not a memory frame), twice:

  night 1 (bootstrap): empty warehouse — every job full-extracts,
    MERGEs into an empty fact, advances its watermark;
  night 2 (steady state): warm watermarks — every job extracts the
    empty post-watermark delta, verifies targets, and commits telemetry.
    This is the per-job floor a deployment pays even on a quiet night.

Data-plane scale for these jobs' OPERATORS (joins, explodes, as-of,
surrogate counters) is measured separately in BASELINE.md's operator
pairings; fixture-grain inputs here mean night totals are ~pure harness
cost (job scheduling, watermark reads, MERGE read→rewrite→swap on
parquet, log appends), which is exactly the number the control-plane
story was missing.

Artifacts: PIPELINE_BENCH.json (committed), paragraph in BASELINE.md.

Usage: python tools/bench_pipeline.py [> PIPELINE_BENCH.json]
"""

from __future__ import annotations

import importlib.util
import json
import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

WORK = os.path.join(ROOT, ".bench_pipeline")


def _fixture_frames(spark):
    """Reuse test_reference_jobs' catalog fixture (the 23 jobs' complete
    source-relation set) without duplicating it here."""
    spec = importlib.util.spec_from_file_location(
        "_ref_jobs_fixture", os.path.join(ROOT, "tests", "test_reference_jobs.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.catalog.__wrapped__(spark).frames


def main() -> int:
    from com_danliris_service_etl_spark.plans.schedule import run_nightly
    from com_danliris_service_etl_spark.session import get_session
    from com_danliris_service_etl_spark.sources.catalog import Catalog
    from com_danliris_service_etl_spark.sources.watermark import WatermarkStore

    spark = get_session(
        app_name="bench-pipeline",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE") or 8),
    )
    shutil.rmtree(WORK, ignore_errors=True)
    src_dir = os.path.join(WORK, "src")
    os.makedirs(src_dir, exist_ok=True)

    frames = _fixture_frames(spark)
    cat = Catalog(spark=spark)
    for name, df in frames.items():
        p = os.path.join(src_dir, f"{name}.parquet")
        df.write.mode("overwrite").parquet(p)
        cat.tables[name] = p

    store = WatermarkStore(spark, os.path.join(WORK, "log"))
    out: dict = {"n_jobs": None, "nights": {}}
    for night in ("bootstrap", "steady_state"):
        t0 = time.perf_counter()
        results = run_nightly(
            spark, cat, store,
            target_dir=os.path.join(WORK, "dwh"),
            continue_on_error=False,
        )
        wall = time.perf_counter() - t0
        assert all(r.status == "Successful" for r in results), [
            (r.job, r.status) for r in results if r.status != "Successful"
        ]
        per_job = {
            r.job: round((r.finished - r.started).total_seconds(), 3)
            for r in results
        }
        out["n_jobs"] = len(results)
        out["nights"][night] = {
            "wall_sec": round(wall, 2),
            "per_job_mean_sec": round(wall / len(results), 3),
            "rows": sum(r.rows for r in results),
            "slowest": sorted(
                per_job.items(), key=lambda kv: -kv[1]
            )[:5],
        }
        print(night, out["nights"][night], file=sys.stderr, flush=True)

    # ------------------------------------------------------------------
    # Crash + recovery nights (VERDICT r13 task 4): one job is killed
    # BETWEEN its staging write and the swap's install rename (the worst
    # point — target directory gone, `.old` holds the only copy, staged
    # tmp orphaned), with the rest of the DAG continuing; the next plain
    # night must recover the wreckage and converge. The victim's source
    # rows are re-stamped to NOW so its increment is non-empty (the
    # quiet-night short-circuit would otherwise skip the swap entirely).
    # ------------------------------------------------------------------
    import datetime as dt

    from pyspark.sql import functions as F

    from com_danliris_service_etl_spark.sources import fsutil

    victim = "Fact Inventory Summary from MongoDB to Azure DWH"
    victim_target = os.path.join(WORK, "dwh", "dl_fact_inventory_summary")
    # bump the victim's source mtimes so the crash night has a real batch
    vsrc = cat.tables["inventorysummaries"]
    bumped = os.path.join(src_dir, "inventorysummaries_bumped.parquet")
    spark.read.parquet(vsrc).withColumn(
        "_lastmodifiedutc",
        F.lit(dt.datetime.utcnow() + dt.timedelta(hours=1)),
    ).write.mode("overwrite").parquet(bumped)
    cat.tables["inventorysummaries"] = bumped
    pre_rows = spark.read.parquet(victim_target).count()

    real_swap = fsutil.swap_with_backup

    def killed_swap(sp, tmp, target):
        if target.rstrip("/") == victim_target:
            fsutil.delete(sp, target + ".old")
            fsutil.rename(sp, target, target + ".old")
            raise RuntimeError("injected kill: power loss mid-swap")
        return real_swap(sp, tmp, target)

    import com_danliris_service_etl_spark.sources.fsutil as fsmod

    fsmod.swap_with_backup = killed_swap
    try:
        t0 = time.perf_counter()
        crash_results = run_nightly(
            spark, cat, store,
            target_dir=os.path.join(WORK, "dwh"),
            continue_on_error=True,
        )
        crash_wall = time.perf_counter() - t0
    finally:
        fsmod.swap_with_backup = real_swap
    crash_by = {r.job: r for r in crash_results}
    assert crash_by[victim].status.startswith("Failed"), crash_by[victim]
    n_ok = sum(1 for r in crash_results if r.status == "Successful")
    assert not fsutil.exists(spark, victim_target)  # wreckage state
    assert fsutil.exists(spark, victim_target + ".old")
    out["nights"]["crash"] = {
        "wall_sec": round(crash_wall, 2),
        "victim": victim,
        "victim_status": crash_by[victim].status[:80],
        "siblings_successful": n_ok,
    }
    print("crash", out["nights"]["crash"], file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    rec_results = run_nightly(
        spark, cat, store,
        target_dir=os.path.join(WORK, "dwh"),
        continue_on_error=False,
    )
    rec_wall = time.perf_counter() - t0
    assert all(r.status == "Successful" for r in rec_results)
    post_rows = spark.read.parquet(victim_target).count()
    assert post_rows == pre_rows, (pre_rows, post_rows)  # converged
    assert not fsutil.exists(spark, victim_target + ".old")
    parent_ls = os.listdir(os.path.join(WORK, "dwh"))
    assert not any(
        n.startswith("dl_fact_inventory_summary.tmp") for n in parent_ls
    ), parent_ls
    out["nights"]["recovery"] = {
        "wall_sec": round(rec_wall, 2),
        "victim_rows_converged": post_rows,
        "wreckage_cleaned": True,
    }
    print("recovery", out["nights"]["recovery"], file=sys.stderr, flush=True)

    # ------------------------------------------------------------------
    # Heavy night (VERDICT r13 task 8): the worst-case window — the
    # WIDEST job (Pembelian: the 10-table purchasing chain) loses its
    # fact and must full-history re-extract while the rest of the night
    # runs steady-state. `run_job`'s empty-fact⇒full-extract fallback
    # fires (an advanced watermark over a missing fact re-loads
    # EVERYTHING, not the empty delta); the night's wall bounds the
    # deployment's recovery window against the reference's 9m59s
    # function timeout ceiling (host.json:3).
    # ------------------------------------------------------------------
    heavy_victim = "Fact Pembelian from MongoDB to Azure DWH"
    heavy_target = os.path.join(WORK, "dwh", "dl_fact_pembelian")
    fsutil.delete(spark, heavy_target)
    t0 = time.perf_counter()
    heavy_results = run_nightly(
        spark, cat, store,
        target_dir=os.path.join(WORK, "dwh"),
        continue_on_error=False,
    )
    heavy_wall = time.perf_counter() - t0
    assert all(r.status == "Successful" for r in heavy_results)
    hv = {r.job: r for r in heavy_results}[heavy_victim]
    assert hv.rows > 0, "full-history fallback must re-extract rows"
    out["nights"]["heavy_full_reextract"] = {
        "wall_sec": round(heavy_wall, 2),
        "victim": heavy_victim,
        "victim_job_sec": round(
            (hv.finished - hv.started).total_seconds(), 3
        ),
        "victim_rows": hv.rows,
    }
    print("heavy", out["nights"]["heavy_full_reextract"],
          file=sys.stderr, flush=True)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
