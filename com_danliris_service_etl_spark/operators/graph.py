"""Iterative graph operators (PageRank) as pure DataFrame programs.

The reference has no graph engine, but its dedup-cluster pass
(operators/dedup.py `dedup_clusters`) already established the pattern a
100 TB deployment needs for iterative graph work on Spark: joins +
map-side-combinable aggregations per superstep, `localCheckpoint` to cut
lineage between supersteps, and never a driver-side collect of row data.
PageRank completes that family — the standard data-curation centrality
pass (pick representative documents from a similarity graph, weight
sources by link authority) expressed without GraphX/GraphFrames, which
keeps the whole plan inside Catalyst/Tungsten.

Scale notes (100 TB):
- Each superstep is one equi-join of the rank vector onto the edge list
  (both partitioned by the join key) plus one groupBy(dst) with partial
  aggregation — the same shuffle keys every iteration, so AQE/bucketing
  can co-locate them; no all-pairs stage anywhere.
- The rank vector is |V| rows (node, double) — tiny relative to |E|;
  Spark broadcasts it automatically when it fits, degrading gracefully
  to a shuffle join when it does not.
- Hot destination nodes (celebrity pages) are safe: groupBy(dst) partial
  aggregation combines map-side, unlike a window-over-dst form.
- `localCheckpoint(eager=False)` per superstep stops the plan doubling
  per iteration (the dedup_clusters lesson); only the final action runs
  the chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank over an edge list; returns ``(node, rank)``.

    ``r_{t+1}(v) = (1-d)/N + d * Σ_u r_t(u) · w(u→v)`` with per-source
    weight normalization (``w(u→v) = weight / Σ weight over u's
    out-edges``). Every node that appears as a source or destination is a
    node; callers wanting no dangling mass loss should pass a bidirected
    edge list (every node then has out-degree ≥ 1), which is what the
    registry query does.
    """
    w_col = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst"), w_col.alias("__w")
    )
    # Normalize out-weights via groupBy+join, not a window over __src — a
    # hub node's window partition would buffer its whole out-edge set in
    # one task (the hot-key hazard pinned in the verify gotchas).
    out = e.groupBy("__src").agg(F.sum("__w").alias("__tot"))
    norm = (
        e.join(out, "__src")
        .select("__src", "__dst", (F.col("__w") / F.col("__tot")).alias("__nw"))
        .localCheckpoint(eager=False)  # reused every superstep
    )
    nodes = (
        e.select(F.col("__src").alias("node"))
        .unionByName(e.select(F.col("__dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)  # reused every superstep
    )
    # |V| as a 1-row frame cross-joined in (broadcast of a scalar), so the
    # driver never collects anything and the plan stays lazy end-to-end.
    n = nodes.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    ranks = nodes.join(F.broadcast(n)).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    reset = F.lit(1.0 - damping) / F.col("__n")
    for _ in range(iterations):
        contrib = (
            norm.join(ranks, norm["__src"] == ranks["node"])
            .groupBy("__dst")
            .agg(F.sum(F.col("__nw") * F.col("rank")).alias("__c"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["__dst"], "left")
            .join(F.broadcast(n))
            .select(
                "node",
                (reset + F.lit(damping) * F.coalesce(F.col("__c"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
