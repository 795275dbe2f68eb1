"""SemDeDup (llm19) sf1 pairing — measures the cell-scaling contract.

The derived-sf1 fixture in tools/bench_sf1.py cannot scale EMBEDDINGS by
replication (replicated vectors are exact twins of each other — every
vector gains 9 duplicates, a different workload, the same argument that
forces token salting for documents). This script instead derives a 10x
embedding set with DETERMINISTIC md5-seeded uniform vectors (same
dimension, same scale, disjoint ids) — a true corpus scale-up for the
pairwise-pruning workload — and pairs Spark vs DuckDB on the SemDeDup
prune with n_cells scaled 10x alongside the vectors (160 vs 16), which
is the algorithm's own contract (cells ~ n / expected-cell-size; fixed
cells would grow the within-cell quadratic 100x and measure a
mis-deployment, not the operator).

Usage: python tools/bench_llm19_sf1.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF1_DIR = os.path.join(ROOT, ".bench_sf1")
N_VECS = 20_000  # 10x the sf0.1 embeddings table
DIM = 64
N_CELLS = 160  # 10x the registry query's 16 — same expected cell size
TAU = 0.35
RUNS = int(os.environ.get("BENCH_RUNS", "3"))
EMB_PATH = os.path.join(SF1_DIR, "embeddings_sf1.parquet")


def generate() -> None:
    if os.path.exists(EMB_PATH):
        return
    os.makedirs(SF1_DIR, exist_ok=True)
    con = duckdb.connect()
    # md5-seeded uniforms in [-0.5, 0.5): deterministic, engine-agnostic
    # (both engines only READ the parquet; generation runs once here).
    con.execute(
        f"""
        COPY (
          SELECT v.vec_id,
                 list_transform(range(0, {DIM}),
                   i -> (CAST(('0x' || substring(md5(v.vec_id || '_' || i), 1, 8)) AS BIGINT)
                         % 1000000) / 1000000.0 - 0.5) AS embedding,
                 'sf1' AS label
          FROM (SELECT unnest(range({N_VECS})) AS vec_id) v
        ) TO '{EMB_PATH}' (FORMAT parquet)
        """
    )


def _llm19_sf1_sql() -> str:
    from com_danliris_service_etl_spark.plans.queries_round9b import _llm19_sql

    # same query text, parameterized cells/tau, over the sf1 view
    return _llm19_sql(n_cells=N_CELLS, tau=TAU)


def main() -> int:
    generate()

    from com_danliris_service_etl_spark.operators.similarity import semdedup_prune
    from com_danliris_service_etl_spark.session import get_session

    spark = get_session(
        app_name="bench-llm19-sf1",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE") or 32),
    )
    emb = spark.read.parquet(EMB_PATH)
    emb.count()  # warmup

    def spark_run() -> int:
        return semdedup_prune(
            spark.read.parquet(EMB_PATH), n_cells=N_CELLS, tau=TAU
        ).count()

    spark_run()  # codegen warm
    s_times = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        n = spark_run()
        s_times.append(time.perf_counter() - t0)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{EMB_PATH}'")
    sql = _llm19_sf1_sql()
    con.execute(sql).fetchall()
    d_times = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        rows = len(con.execute(sql).fetchall())
        d_times.append(time.perf_counter() - t0)

    out = {
        "n_vecs": N_VECS,
        "n_cells": N_CELLS,
        "rows_spark": n,
        "rows_duckdb": rows,
        "spark_sec": round(min(s_times), 3),
        "duckdb_sec": round(min(d_times), 3),
        "ratio": round(min(s_times) / min(d_times), 2),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
