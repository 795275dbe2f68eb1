"""txt18 sf100-decade measurement (VERDICT r10 task 2 closure).

txt18_source_divergence measured 3.33x (sf1) -> 2.64x (sf10) with the
explode+count fact pass adjudicated as the whole query and the trend
predicted to cross 2x "another decade out" — this script measures that
decade. documents ONLY, 1000 replicas of sf0.1 with doc_id strided and
every token replica-salted (the bench_sf1.py discipline: shingle/term
spaces stay disjoint, so the vocabulary scales with the corpus — unsalted
replication would collapse every replica onto one vocabulary, a different
workload).

Usage: SPARK_GRAFT_DRIVER_MEM=24g python tools/bench_txt18_sf100.py
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
DIR = os.path.join(ROOT, f".bench_sf1_x{REPLICAS}_docs")
RUNS = int(os.environ.get("BENCH_RUNS", "3"))
QUERY = os.environ.get("BENCH_QUERY", "txt18_source_divergence")


def generate() -> None:
    path = os.path.join(DIR, "documents.parquet")
    if os.path.exists(path):
        return
    os.makedirs(DIR, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW d AS SELECT * FROM '{SRC}/documents.parquet'")
    sd = con.execute("SELECT max(doc_id) + 1 FROM d").fetchone()[0]
    con.execute(
        f"""
        COPY (
          SELECT doc_id + r.r * {sd} AS doc_id,
                 array_to_string(
                   list_transform(string_split(text, ' '),
                                  x -> x || '_r' || r.r), ' ') AS text,
                 lang, source, n_chars
          FROM d CROSS JOIN (SELECT unnest(range({REPLICAS})) AS r) r
        ) TO '{path}' (FORMAT parquet)
        """
    )


def main() -> int:
    t0 = time.time()
    generate()
    print(f"generate: {time.time() - t0:.0f}s", file=sys.stderr, flush=True)

    from com_danliris_service_etl_spark.plans.registry import load_all
    from com_danliris_service_etl_spark.session import get_session

    fn, sql = load_all()[QUERY]
    spark = get_session(app_name="bench-txt18-sf100", shuffle_partitions=64)
    spark.read.parquet(f"{DIR}/documents.parquet").count()  # warm footers

    fn(spark, DIR).count()  # warm (codegen compile)
    s_times = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn(spark, DIR).count()
        s_times.append(time.perf_counter() - t0)
        print(f"spark run: {s_times[-1]:.1f}s", file=sys.stderr, flush=True)

    con = duckdb.connect()
    con.execute(f"SET temp_directory='{DIR}/duck_tmp'")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{DIR}/documents.parquet'")
    d_times = []
    err = None
    try:
        con.execute(sql).fetchall()  # warm
        for _ in range(RUNS):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            d_times.append(time.perf_counter() - t0)
            print(f"duckdb run: {d_times[-1]:.1f}s", file=sys.stderr, flush=True)
    except Exception as e:
        err = f"{type(e).__name__}: {e}"
        print(f"duckdb failed: {err}", file=sys.stderr, flush=True)

    out = {
        "query": QUERY,
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
