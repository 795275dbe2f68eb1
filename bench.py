"""Benchmark harness: runs the registry queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {code: sec, ...}, "sf": ..., "n_queries": N,
"full": "BENCH_FULL.json"} — the printed queries dict holds EVERY
registry query, keyed by the query's unique leading code token (e.g.
"d5" = d5_d8_timestamp_reconstruct) so the complete record fits the
driver's 2000-char stdout capture window; the full-name map is also
written to BENCH_FULL.json alongside this script.

Timing protocol (BASELINE.md): per-query wall-clock, MINIMUM of N warm runs
(default 3, override BENCH_RUNS) — the minimum estimates the true cost
robustly under transient co-tenant noise; the oracle side is measured with
the same estimator. Results are materialized via the NOOP SINK
(df.write.format("noop")) — every output row and column is evaluated
executor-side with no driver-side collect of payload rows (the r14
estimator fix; count() let Catalyst prune whole operator pipelines).
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
            # Materialize via the NOOP SINK, not count(): count() lets
            # Catalyst eliminate any operator whose output the count
            # doesn't need — an r14 audit found 36/220 queries losing
            # windows/joins/explodes under count() (a trailing left join
            # on aggregate keys, a window only feeding output columns),
            # i.e. their "timings" were partial scans while the DuckDB
            # oracle side always materialized fully via fetchall(). The
            # noop sink evaluates EVERY output row and column and
            # discards them executor-side — no driver collect, no
            # elimination, symmetric with the oracle's estimator.
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(min(samples), 3)

    # The driver records only the last 2000 chars of stdout and json-parses
    # the final line — rounds 2-4 emitted full names and lost part of the
    # per-query record (r4: 66/117 survived). 118 full names alone are
    # ~2600 chars, so a complete {full_name: sec} line can NEVER fit.
    # Instead the final line carries ALL timings keyed by each query's
    # UNIQUE leading code token ("d5_d8_timestamp_reconstruct" → "d5") —
    # ~1.4k chars for the whole registry, self-contained in the driver's
    # own artifact. BENCH_FULL.json keeps the full-name map as committed
    # repo evidence. Codes are checked for uniqueness; a future collision
    # falls back to the shortest disambiguating prefix of "_"-tokens.
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

    def _codes(names: list[str]) -> dict[str, str]:
        out: dict[str, str] = {}
        for n in names:
            toks = n.split("_")
            for i in range(1, len(toks) + 1):
                cand = "_".join(toks[:i])
                if sum(1 for m in names if m.split("_")[: i] == toks[:i]) == 1:
                    out[n] = cand
                    break
            else:
                out[n] = n
        return out

    code_of = _codes(sorted(timings))
    coded = {code_of[n]: sec for n, sec in timings.items()}
    out = dict(
        full,
        queries=coded,
        n_queries=len(timings),
        key="queries keys = unique leading code of registry query name",
        full="BENCH_FULL.json",
    )
    print(fit_capture_line(out))
    return 0


def fit_capture_line(out: dict, limit: int = 1900) -> str:
    """Render ``out`` as one JSON line that fits the driver's 2000-char
    stdout capture window (with headroom). Degradation ladder, re-checked
    at every rung (registry growth past ~150 queries defeated the old
    single-shot rounding): (1) full 3-dp precision, (2) 2-dp precision,
    (3) drop the CHEAPEST per-query entries one at a time — the expensive
    tail is the signal; the drop is announced in the line itself
    (``dropped_cheapest``) so truncation is loud, never silent, and the
    complete record stays in BENCH_FULL.json."""
    out = dict(out)
    line = json.dumps(out, separators=(",", ":"))
    if len(line) <= limit:
        return line
    coded = out["queries"]
    out["queries"] = {c: round(s, 2) for c, s in coded.items()}
    line = json.dumps(out, separators=(",", ":"))
    kept = sorted(out["queries"].items(), key=lambda kv: (kv[1], kv[0]))
    while len(line) > limit and kept:
        kept.pop(0)  # cheapest first
        out["queries"] = dict(sorted(kept))
        out["dropped_cheapest"] = len(coded) - len(kept)
        line = json.dumps(out, separators=(",", ":"))
    return line


if __name__ == "__main__":
    sys.exit(main())
