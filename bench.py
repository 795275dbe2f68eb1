"""Benchmark harness: runs the registry queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ..., "n_queries": N,
"full": "BENCH_FULL.json"} — the printed queries dict holds the most
expensive queries that fit the driver's 2000-char stdout capture window;
the COMPLETE per-query record is written to BENCH_FULL.json alongside
this script.

Timing protocol (BASELINE.md): per-query wall-clock, MINIMUM of N warm runs
(default 3, override BENCH_RUNS) — the minimum estimates the true cost
robustly under transient co-tenant noise; the oracle side is measured with
the same estimator. Results are materialized via count() on
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

    # Shuffle partitions sized to the DATA, not the core count (SCALE.md):
    # sf0.1 is ~600k rows, so 8 post-shuffle partitions keep every reducer
    # busy without paying 32 tasks' scheduling latency per exchange. Map-side
    # parallelism is unaffected (input splits / defaultParallelism), and AQE
    # re-coalesces at runtime either way. At real scale this knob is raised
    # with the data volume (SPARK_GRAFT_SHUFFLE).
    spark = get_session(
        app_name="bench",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE") or 8),
    )
    registry = load_all()

    # Warm the session outside timed runs: JVM + parquet footers, one
    # shuffle (codegen for exchange paths), and one mapInPandas round so the
    # Python worker pool exists before any multimodal query is timed.
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.count()
    li.limit(1000).groupBy("l_returnflag").count().count()
    spark.createDataFrame([(1,)], "x long").mapInPandas(
        lambda it: it, schema="x long"
    ).count()

    timings: dict[str, float] = {}
    for name, (fn, _sql) in sorted(registry.items()):
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(min(samples), 3)

    # The driver records only the last 2000 chars of stdout and json-parses
    # the final line — rounds 2-3 exceeded that and lost their per-query
    # record to front-truncation. 93 query names alone are ~1600 chars, so a
    # complete {name: sec} line can NEVER fit; instead:
    #   1. ALL timings go to BENCH_FULL.json next to this script (committed
    #      repo evidence, not subject to the capture window);
    #   2. stdout's final line is a compact JSON kept UNDER the window:
    #      full aggregate + the most expensive queries' timings, filled
    #      greedily by descending cost until the char budget is reached
    #      (the cheap sub-0.1 s tail is the signal-free part to drop).
    full = {
        "metric": "min-of-3 warm wall-clock sec per registry query",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": float(sf),
        "queries": timings,
    }
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json")
    with open(full_path, "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)

    budget = 1900  # headroom under the 2000-char capture window
    shown: dict[str, float] = {}
    out = dict(full, queries=shown, n_queries=len(timings), full="BENCH_FULL.json")
    base_len = len(json.dumps(out, separators=(",", ":")))
    for name, sec in sorted(timings.items(), key=lambda kv: (-kv[1], kv[0])):
        entry_len = len(json.dumps({name: sec}, separators=(",", ":"))) - 1
        if base_len + entry_len > budget:
            break
        shown[name] = sec
        base_len += entry_len
    print(json.dumps(out, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    sys.exit(main())
