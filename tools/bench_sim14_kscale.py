"""sim14 greedy-tail k-scaling curve (VERDICT r13 task 5).

The unrolled MMR tail runs ~2 bounded jobs per greedy step; at the
registry shape (k=3, pool=10) the whole query is floor-dominated and
Spark beats the oracle (0.34-0.39x, BASELINE.md r12). The question is
trajectory: at k=20 (a realistic rerank depth) the unrolled tail is ~40
sequential job barriers on |Q|·pool-bounded rows — does it dominate, and
does the fused applyInPandas tail (one Python boundary for the whole
loop, equivalence-pinned in test_operators_unit.py) win there?

Measures both strategies at k in {3, 10, 20} (pool = 2k) over the sf0.1
organic embeddings, min of RUNS warm fresh-plan runs each, interleaved.

Usage: python tools/bench_sim14_kscale.py [> sim14_kscale.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("BENCH_RUNS", "3"))
SHAPES = [(3, 6), (3, 10), (10, 20), (20, 40)]


def main() -> int:
    from pyspark.sql import functions as F

    from com_danliris_service_etl_spark.operators.similarity import mmr_rerank
    from com_danliris_service_etl_spark.session import get_session

    spark = get_session(
        app_name="bench-sim14-kscale",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE") or 8),
    )
    emb_path = f"{SRC}/embeddings.parquet"
    spark.read.parquet(emb_path).groupBy("label").count().collect()  # warm

    out: dict[str, dict] = {"src": SRC}
    for k, pool in SHAPES:
        row: dict[str, float] = {}
        for strategy in ("unrolled", "fused"):
            def fresh():
                emb = spark.read.parquet(emb_path)
                return mmr_rerank(
                    emb, emb.filter(F.col("vec_id") < 10),
                    k=k, pool=pool, strategy=strategy,
                )

            fresh().count()  # warm (codegen, Arrow path init)
            times = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                fresh().count()
                times.append(time.perf_counter() - t0)
            row[strategy] = round(min(times), 3)
        row["fused_over_unrolled"] = round(row["fused"] / row["unrolled"], 2)
        out[f"k{k}_pool{pool}"] = row
        print(f"k={k} pool={pool}", row, file=sys.stderr, flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
