"""sim13 dense-label escape: recall + wall-time on a CLUSTERED fixture
(VERDICT r13 task 1).

r12 measured the in-label sign-bit escape's COST at the x1000 dense-label
regime (0.92 s vs exact's 4.26 s) but its recall came out 0.04 — on the
md5-UNIFORM x1000 fixture, where no LSH family can retrieve (uniform
random vectors have no cluster structure; the sim2 fixture-density
caveat). This tool derives a fixture with REAL cluster structure — the
sim7 precedent, scaled: every organic sf0.1 vector (2000 rows, 64 dims,
10 labels) is replicated REPLICAS times with small deterministic
md5-seeded perturbations (eps=0.03 per dim against a ~N(0, 0.125)
component scale, so within-cluster cosine ≈ 0.995 while cross-cluster
stays ~0±0.12), labels preserved — at x1000 that is 2M vectors over 10
labels, the exact dense-label regime of the r12 reversal, but one where
nearest neighbors are genuinely retrievable.

Measured, one interleaved Spark/DuckDB pairing (min of RUNS warm
fresh-plan runs per engine, the BASELINE.md estimator):
  - exact in-label retrieval (`filtered_topk`, sim13's plan) wall time;
  - the escape (`filtered_multiprobe_topk`, sim15's plan: in-label
    Hamming<=1 sign-bit buckets) wall time;
  - escape recall@5 against the exact result (`recall_at_k`).

The fixture lives in .bench_clustered_emb/ (gitignored), performance
only — correctness stays pinned to the driver's testdata.

Usage: python tools/bench_sim13_clustered.py [> sim13_clustered.json]
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
REPLICAS = int(os.environ.get("BENCH_CLUSTERED_REPLICAS", "1000"))
EPS = float(os.environ.get("BENCH_CLUSTERED_EPS", "0.03"))
RUNS = int(os.environ.get("BENCH_RUNS", "3"))
FIX_DIR = os.path.join(
    ROOT,
    ".bench_clustered_emb"
    if REPLICAS == 1000
    else f".bench_clustered_emb_x{REPLICAS}",
)


def generate() -> None:
    path = os.path.join(FIX_DIR, "embeddings.parquet")
    if os.path.exists(path):
        return
    os.makedirs(FIX_DIR, exist_ok=True)
    con = duckdb.connect()
    n_base, dim = con.execute(
        f"SELECT count(*), max(len(embedding)) FROM '{SRC}/embeddings.parquet'"
    ).fetchone()
    # replica 0 is the UNPERTURBED organic vector (the cluster center —
    # queries are drawn from it); replicas 1.. add md5-seeded uniform
    # noise in [-EPS/2, EPS/2] per dimension, deterministic in
    # (vec_id, replica, dim) so the fixture is reproducible bit-for-bit.
    con.execute(
        f"""
        COPY (
          SELECT e.vec_id + r.r * {n_base} AS vec_id,
                 CASE WHEN r.r = 0 THEN e.embedding
                      ELSE list_transform(range(1, {dim} + 1),
                        i -> CAST(e.embedding[i] + {EPS!r} *
                          ((CAST(('0x' || substring(md5(e.vec_id || '_' || r.r || '_' || i), 1, 8)) AS BIGINT)
                            % 1000000) / 1000000.0 - 0.5) AS FLOAT))
                 END AS embedding,
                 e.label
          FROM '{SRC}/embeddings.parquet' e
          CROSS JOIN (SELECT unnest(range({REPLICAS})) AS r) r
        ) TO '{path}' (FORMAT parquet)
        """
    )


def main() -> int:
    generate()

    from pyspark.sql import functions as F

    from com_danliris_service_etl_spark.operators import similarity as sim
    from com_danliris_service_etl_spark.plans.queries_llm import (
        _SIM13_SQL,
        _SIM15_SQL,
    )
    from com_danliris_service_etl_spark.session import get_session

    spark = get_session(
        app_name="bench-sim13-clustered",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE") or 32),
    )
    emb_path = os.path.join(FIX_DIR, "embeddings.parquet")
    # warmup outside timing (JVM, footers, one shuffle)
    spark.read.parquet(emb_path).groupBy("label").count().collect()

    def spark_exact():
        emb = spark.read.parquet(emb_path)
        return sim.filtered_topk(
            emb, emb.filter(F.col("vec_id") < 10), k=5, filter_col="label"
        )

    def spark_escape():
        emb = spark.read.parquet(emb_path)
        return sim.filtered_multiprobe_topk(
            emb, emb.filter(F.col("vec_id") < 10), k=5,
            filter_col="label", n_bits=8,
        )

    def spark_escape_ivf():
        # the IVF arm (sim16 shape): centroids = the 16 organic replica-0
        # vectors with vec_id < 16 — cluster centers by construction here,
        # the deterministic-codebook contract sim4/sim16 document
        emb = spark.read.parquet(emb_path)
        cent = emb.filter(F.col("vec_id") < 16)
        return sim.ivf_topk(
            emb, None, cent, k=5,
            query_filter=F.col("vec_id") < 10, filter_col="label",
        )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{emb_path}'"
    )

    out: dict[str, dict] = {
        "fixture": {
            "replicas": REPLICAS,
            "eps": EPS,
            "n_vectors": REPLICAS * 2000,
            "labels": 10,
            "src": SRC,
        }
    }
    # The IVF arm is measured for RECALL only: its O(n·C·d) assignment
    # pass is an INDEX BUILD amortized across query batches (ivf_topk
    # docstring) — a one-shot build+query wall-clock pairing would
    # charge the whole build to 10 queries and mismeasure the design.
    for name, fresh, sql in (
        ("exact_filtered_topk", spark_exact, _SIM13_SQL),
        ("escape_filtered_lsh", spark_escape, _SIM15_SQL),
    ):
        fresh().count()  # warm (codegen compile, page cache)
        s_times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fresh().count()
            s_times.append(time.perf_counter() - t0)
        con.execute(sql).fetchall()
        d_times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            d_times.append(time.perf_counter() - t0)
        out[name] = {
            "spark_sec": round(min(s_times), 3),
            "duckdb_sec": round(min(d_times), 3),
            "ratio": round(min(s_times) / min(d_times), 2),
        }
        print(name, out[name], file=sys.stderr, flush=True)

    exact = spark_exact().localCheckpoint()
    for label, approx in (
        ("escape_recall_at_5", spark_escape()),
        ("escape_ivf_recall_at_5", spark_escape_ivf()),
    ):
        rec = sim.recall_at_k(exact, approx, k=5).collect()
        recalls = sorted(float(r["recall"]) for r in rec)
        out[label] = {
            "mean": round(sum(recalls) / len(recalls), 4),
            "min": round(recalls[0], 4),
            "per_query": recalls,
        }
        print(label, out[label], file=sys.stderr, flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
