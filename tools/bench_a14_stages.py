"""a14/a15 decade-residual stage breakdown (VERDICT r13 task 1).

The r13 trails left a14_shipping_priority at 10.3x and a15_region_revenue
at 12.1x vs their sub-second DuckDB oracles at sf10, with a one-line
attribution ("bulk selective-decode throughput") and no evidence. This
script produces the evidence the sim15 adjudication set as the bar: a
per-stage pairing at the decade fixture that isolates

  li_scan  — the query's own lineitem scan predicate + projection,
             folded to one row (sum of the revenue expression + key
             checksum, so column decode cannot be pruned; the `count()
             prunes projections` gotcha),
  ord_scan — the query's orders date-band scan, same treatment,
  full     — the registry query itself,

for BOTH engines with the bench estimator (warm once, min of RUNS
fresh-plan runs, engines interleaved per stage). If spark(li_scan) +
spark(ord_scan) accounts for the bulk of spark(full) while the same
stages carry the same ratio vs DuckDB, the residual is the engines'
relative bulk-decode constant (DuckDB's burst parquet decode vs Spark's
~24M rows/s columnar-to-row pipeline) and NOT a join/agg plan defect —
the star join and 5-row aggregate add almost nothing on either side.

Usage (24g decade protocol, BASELINE.md r13):
  SPARK_GRAFT_DRIVER_MEM=24g BENCH_SF1_REPLICAS=100 \
      python tools/bench_a14_stages.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

REPLICAS = int(os.environ.get("BENCH_SF1_REPLICAS", "100"))
FIX_DIR = os.path.join(
    ROOT, ".bench_sf1" if REPLICAS == 10 else f".bench_sf1_x{REPLICAS}"
)
RUNS = int(os.environ.get("BENCH_RUNS", "3"))

# Stage scans mirror the registry queries' own predicates/projections
# (plans/queries_round7e.py) and fold to ONE row so nothing prunes.
_STAGES = {
    "a14_shipping_priority": {
        "li_scan": """
            SELECT count(*)::BIGINT AS n,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev,
                   CAST(sum(l_orderkey) AS BIGINT) AS ck
            FROM lineitem WHERE l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        """,
        "ord_scan": """
            SELECT count(*)::BIGINT AS n,
                   CAST(sum(o_orderkey) AS BIGINT) AS ck,
                   CAST(sum(o_custkey) AS BIGINT) AS ck2
            FROM orders WHERE o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        """,
    },
    "a15_region_revenue": {
        "li_scan": """
            SELECT count(*)::BIGINT AS n,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev,
                   CAST(sum(l_orderkey) AS BIGINT) AS ck
            FROM lineitem
        """,
        "ord_scan": """
            SELECT count(*)::BIGINT AS n,
                   CAST(sum(o_orderkey) AS BIGINT) AS ck,
                   CAST(sum(o_custkey) AS BIGINT) AS ck2
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
        """,
    },
}


def _spark_stage(spark, name: str, stage: str):
    from pyspark.sql import functions as F

    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    li = spark.read.parquet(f"{FIX_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{FIX_DIR}/orders.parquet")
    if name == "a14_shipping_priority":
        if stage == "li_scan":
            return (
                li.filter(F.col("l_shipdate") > cutoff)
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.round(
                        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                    ).alias("rev"),
                    F.sum("l_orderkey").alias("ck"),
                )
            )
        return (
            o.filter(F.col("o_orderdate") < cutoff)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("o_orderkey").alias("ck"),
                F.sum("o_custkey").alias("ck2"),
            )
        )
    if stage == "li_scan":
        return li.agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("rev"),
            F.sum("l_orderkey").alias("ck"),
        )
    lo = F.lit("1994-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-01-01 00:00:00").cast("timestamp")
    return (
        o.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").alias("ck"),
            F.sum("o_custkey").alias("ck2"),
        )
    )


def main() -> int:
    if not os.path.exists(os.path.join(FIX_DIR, "lineitem.parquet")):
        print(f"fixture missing: {FIX_DIR} — run tools/bench_sf1.py first",
              file=sys.stderr)
        return 2
    if REPLICAS >= 100 and not os.environ.get("SPARK_GRAFT_DRIVER_MEM"):
        print("WARNING: decade run without SPARK_GRAFT_DRIVER_MEM=24g "
              "(BASELINE.md r13 protocol)", file=sys.stderr)

    from com_danliris_service_etl_spark.plans.registry import load_all
    from com_danliris_service_etl_spark.session import get_session

    registry = load_all()
    spark = get_session(
        app_name="bench-a14-stages",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE") or 32),
    )
    spark.read.parquet(f"{FIX_DIR}/lineitem.parquet").groupBy(
        "l_returnflag"
    ).count().collect()

    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation", "region"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{FIX_DIR}/{t}.parquet'")

    out: dict[str, dict] = {}
    for name, stages in _STAGES.items():
        fn, osql = registry[name]
        rec: dict[str, dict] = {}
        work = [(st, sql) for st, sql in stages.items()] + [("full", osql)]
        for st, sql in work:
            def spark_run():
                if st == "full":
                    return fn(spark, FIX_DIR).count()
                return _spark_stage(spark, name, st).collect()

            spark_run()  # warm (codegen)
            s_times = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                spark_run()
                s_times.append(time.perf_counter() - t0)
            s = min(s_times)
            con.execute(sql).fetchall()  # warm
            d_times = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                d_times.append(time.perf_counter() - t0)
            d = min(d_times)
            rec[st] = {
                "spark_sec": round(s, 3),
                "duckdb_sec": round(d, 3),
                "ratio": round(s / d, 2),
            }
            print(name, st, rec[st], file=sys.stderr, flush=True)
        scans_s = sum(rec[k]["spark_sec"] for k in stages)
        scans_d = sum(rec[k]["duckdb_sec"] for k in stages)
        rec["residual_beyond_scans"] = {
            "spark_sec": round(rec["full"]["spark_sec"] - scans_s, 3),
            "duckdb_sec": round(rec["full"]["duckdb_sec"] - scans_d, 3),
            "scan_share_of_spark_full": round(
                scans_s / rec["full"]["spark_sec"], 2
            ),
        }
        out[name] = rec
    print(json.dumps({"replicas": REPLICAS, "stages": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
