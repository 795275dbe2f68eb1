"""Benchmark harness: runs the registry queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Timing protocol (BASELINE.md): per-query wall-clock, median of N warm runs
(default 3, override BENCH_RUNS). Results are materialized via count() on
the query plan — no driver-side collect of payload rows.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("BENCH_RUNS", "3"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from com_danliris_service_etl_spark.plans.registry import load_all
    from com_danliris_service_etl_spark.session import get_session

    spark = get_session(app_name="bench")
    registry = load_all()

    # Warm the session (JVM, parquet footers, codegen) outside timed runs.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    for name, (fn, _sql) in sorted(registry.items()):
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 4)

    out = {
        "metric": "median wall-clock per registry query (warm), local Spark",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
