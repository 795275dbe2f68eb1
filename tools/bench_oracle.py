"""DuckDB-side timing for the BASELINE.md measured table.

Times every registry oracle SQL at $SPARK_GRAFT_SF_DIR (default sf0.1)
with the same estimator bench.py uses for the Spark side — MINIMUM of N
warm runs (default 3, override BENCH_RUNS) — and prints one JSON line
{"queries": {name: sec}, "sf": ...}. Queries without an oracle are
skipped (they are excluded from the aggregate comparison too).

Usage: python tools/bench_oracle.py [> oracle.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("BENCH_RUNS", "3"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from com_danliris_service_etl_spark.plans.registry import load_all

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    out: dict[str, float] = {}
    for name, (_fn, sql) in sorted(load_all().items()):
        if sql is None:
            continue
        con.execute(sql).fetchall()  # warm (parquet in page cache, plan built)
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            times.append(time.perf_counter() - t0)
        out[name] = round(min(times), 4)

    print(json.dumps({"queries": out, "sf": float(sf)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
