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
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
