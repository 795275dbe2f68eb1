"""a12 weighted-median pairing at ORGANIC value distinctness (r13).

The derived bench_sf1 fixtures replicate rows verbatim, so every
l_extendedprice appears REPLICAS times and the oracle's first
GROUP BY (returnflag, price) collapses its input 10-100x — an artifact
real growth does not produce (organic TPC-H prices are near-unique).
This tool derives an x10 lineitem whose prices are ALSO replica-strided
(distinctness stays organic: ~5.83M distinct over 6M rows) and pairs
the registry's twophase+zone-map-bounds plan against the a12 oracle on
it. r13 measured: Spark 1.19-1.20 s vs DuckDB 1.11-1.20 s = 1.0-1.07x
(vs 14x on the collapse-artifact fixture) — results value-identical.

Usage: python tools/bench_a12_organic.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("BENCH_A12_REPLICAS", "10"))
PATH = os.path.join(ROOT, ".bench_sf1", "lineitem_pricestride.parquet")
RUNS = int(os.environ.get("BENCH_RUNS", "3"))


def main() -> int:
    con = duckdb.connect()
    if not os.path.exists(PATH):
        os.makedirs(os.path.dirname(PATH), exist_ok=True)
        mx = con.execute(
            f"SELECT ceil(max(l_extendedprice)) + 1 FROM '{SRC}/lineitem.parquet'"
        ).fetchone()[0]
        con.execute(
            f"""
            COPY (SELECT l_returnflag, l_quantity,
                         l_extendedprice + r.r * {mx} AS l_extendedprice
                  FROM '{SRC}/lineitem.parquet'
                  CROSS JOIN (SELECT unnest(range({REPLICAS})) AS r) r)
            TO '{PATH}' (FORMAT parquet)
            """
        )
    n, d = con.execute(
        f"SELECT count(*), count(DISTINCT l_extendedprice) FROM '{PATH}'"
    ).fetchone()

    from com_danliris_service_etl_spark.operators.quality import (
        weighted_median_twophase,
    )
    from com_danliris_service_etl_spark.operators.sketches import (
        parquet_column_bounds,
    )
    from com_danliris_service_etl_spark.plans.queries_round7b import _A12_SQL
    from com_danliris_service_etl_spark.session import get_session

    spark = get_session(app_name="bench-a12-organic", shuffle_partitions=32)
    bounds = parquet_column_bounds(spark, PATH, "l_extendedprice")

    def sp():
        li = spark.read.parquet(PATH)
        weighted_median_twophase(
            li, ["l_returnflag"], "l_extendedprice", "l_quantity",
            bounds=bounds,
        ).count()

    oc = duckdb.connect()
    oc.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{PATH}'")

    def orc():
        oc.execute(_A12_SQL).fetchall()

    sp(); orc()
    out = {"rows": n, "distinct_prices": d}
    for label, f in (("spark", sp), ("duckdb", orc)):
        ts = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        out[f"{label}_sec"] = round(min(ts), 3)
    out["ratio"] = round(out["spark_sec"] / out["duckdb_sec"], 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
