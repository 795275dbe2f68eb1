"""Time a SUBSET of registry queries with the bench.py estimator
(noop sink, fresh plan per run, min of N warm runs) — the per-change
A/B instrument for optimization rounds. Usage:

    python3 tools/bench_subset.py q1 q2 ...   # full registry names

Env: SPARK_GRAFT_SF_DIR (default sf0.1), BENCH_RUNS (default 3),
SPARK_GRAFT_SHUFFLE (default 8 — bench.py's sf0.1 setting).
Prints one line per query plus a JSON tail line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("BENCH_RUNS", "3"))
    names = sys.argv[1:]
    if not names:
        print("usage: bench_subset.py <query> [query ...]", file=sys.stderr)
        return 2

    from com_danliris_service_etl_spark.plans.registry import load_all
    from com_danliris_service_etl_spark.session import get_session

    spark = get_session(
        app_name="bench-subset",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE") or 8),
    )
    registry = load_all()
    missing = [n for n in names if n not in registry]
    if missing:
        print(f"unknown queries: {missing}", file=sys.stderr)
        return 2

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.count()
    li.limit(1000).groupBy("l_returnflag").count().count()
    spark.createDataFrame([(1,)], "x long").mapInPandas(
        lambda it: it, schema="x long"
    ).count()

    out: dict[str, float] = {}
    for name in names:
        fn, _sql = registry[name]
        spark.sparkContext.setJobDescription(f"bench-subset:{name}")
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        out[name] = round(min(samples), 3)
        print(f"{out[name]:7.3f}  {name}  {[round(s, 3) for s in samples]}",
              flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
