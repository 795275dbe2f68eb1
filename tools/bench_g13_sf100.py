"""g13 sf100-decade measurement (VERDICT r10 task 1 closure arm 2).

Derives lineitem ONLY at 1000 replicas of sf0.1 (the bench_sf1.py
replica-stride discipline: orderkey AND partkey strided, so the co-purchase
graph is 1000 disjoint copies — a true scale-up), then runs
g13_jaccard_neighbors paired: Spark over the production bucketed layout
(write untimed, exactly the registry path's steady state) vs the DuckDB
oracle over the raw parquet. At this size the "single-node oracle" framing
starts to break down (600M-row self-join); if DuckDB cannot complete within
its memory budget that is recorded, not hidden.

Usage: SPARK_GRAFT_DRIVER_MEM=64g python tools/bench_g13_sf100.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SRC = "/root/testdata/sf0.1"
REPLICAS = int(os.environ.get("BENCH_SF1_REPLICAS", "1000"))
DIR = os.path.join(ROOT, f".bench_sf1_x{REPLICAS}_li")
RUNS = int(os.environ.get("BENCH_RUNS", "2"))


def generate() -> None:
    path = os.path.join(DIR, "lineitem.parquet")
    if os.path.exists(path):
        return
    os.makedirs(DIR, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW li AS SELECT * FROM '{SRC}/lineitem.parquet'")
    so = con.execute("SELECT max(l_orderkey) + 1 FROM li").fetchone()[0]
    sp = con.execute("SELECT max(l_partkey) + 1 FROM li").fetchone()[0]
    con.execute(
        f"""
        COPY (
          SELECT l_orderkey + r.r * {so} AS l_orderkey,
                 l_partkey + r.r * {sp} AS l_partkey
          FROM li CROSS JOIN (SELECT unnest(range({REPLICAS})) AS r) r
        ) TO '{path}' (FORMAT parquet)
        """
    )


def main() -> int:
    t0 = time.time()
    generate()
    print(f"generate: {time.time() - t0:.0f}s", file=sys.stderr, flush=True)

    from com_danliris_service_etl_spark.operators.bucketing import write_bucketed
    from com_danliris_service_etl_spark.operators.graph import cooccurrence_jaccard
    from com_danliris_service_etl_spark.session import get_session

    spark = get_session(app_name="bench-g13-sf100", shuffle_partitions=64)
    li = spark.read.parquet(f"{DIR}/lineitem.parquet")
    tbl = f"bench_g13_bkt_x{REPLICAS}"
    import shutil

    shutil.rmtree(os.path.join(ROOT, "spark-warehouse", tbl), ignore_errors=True)
    t0 = time.time()
    write_bucketed(li, tbl, ["l_orderkey"], n_buckets=64)
    print(f"bucketed write: {time.time() - t0:.0f}s", file=sys.stderr, flush=True)

    q = lambda: cooccurrence_jaccard(  # noqa: E731
        spark.table(tbl), "l_orderkey", "l_partkey", min_common=2
    )
    q().count()  # warm
    s_times = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        n = q().count()
        s_times.append(time.perf_counter() - t0)
        print(f"spark run: {s_times[-1]:.1f}s rows={n}", file=sys.stderr, flush=True)

    con = duckdb.connect()
    con.execute(f"SET temp_directory='{DIR}/duck_tmp'")
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{DIR}/lineitem.parquet'"
    )
    from com_danliris_service_etl_spark.plans.registry import load_all

    _fn, sql = load_all()["g13_jaccard_neighbors"]
    d_times = []
    err = None
    try:
        for _ in range(RUNS):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            d_times.append(time.perf_counter() - t0)
            print(f"duckdb run: {d_times[-1]:.1f}s", file=sys.stderr, flush=True)
    except Exception as e:  # oracle DNF at this size is a result, not a bug
        err = f"{type(e).__name__}: {e}"
        print(f"duckdb failed: {err}", file=sys.stderr, flush=True)

    out = {
        "sf": REPLICAS / 10,
        "spark_sec": round(min(s_times), 1),
        "duckdb_sec": round(min(d_times), 1) if d_times else None,
        "ratio": round(min(s_times) / min(d_times), 2) if d_times else None,
        "duckdb_error": err,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
