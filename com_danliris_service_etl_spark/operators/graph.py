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
  plus one groupBy(dst) with partial aggregation — the same shuffle keys
  every iteration, so bucketing the edge list on src (or AQE exchange
  reuse) amortizes the edge shuffle; no all-pairs stage anywhere.
- The rank vector is |V| rows — usually orders of magnitude smaller than
  |E|. ``broadcast_ranks=True`` hints it (and the out-degree table) into
  broadcast joins, making every superstep's join map-side; leave it
  False when |V| itself is beyond broadcast range and Spark's own size
  estimate decides.
- Hot destination nodes (celebrity pages) are safe: groupBy(dst) partial
  aggregation combines map-side, unlike a window-over-dst form.
- `localCheckpoint(eager=False)` per superstep stops the plan doubling
  per iteration (the dedup_clusters lesson); only the final action runs
  the chain. Measured on the registry graph (sf0.1): checkpoint-each +
  broadcast beats both no-checkpoint variants.
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
    sources_cover_nodes: bool = False,
    broadcast_ranks: bool = False,
    tol: float | None = None,
) -> DataFrame:
    """Weighted PageRank over an edge list; returns ``(node, rank)``.

    ``tol``: convergence-based early stop — ``iterations`` becomes the
    MAXIMUM, and the loop exits once ``max |r_{t+1} − r_t| < tol``. The
    probe is the dedup_clusters pattern: the driver touches a single
    1-row scalar per superstep (never row data), and it rides the
    superstep's own lazy checkpoint so each rank table materializes
    exactly once. Default ``None`` keeps the fixed-iteration plan with
    zero driver round-trips (the oracle-parity form).

    ``r_{t+1}(v) = (1-d)/N + d * Σ_u r_t(u) · w(u→v)`` with per-source
    weight normalization (``w(u→v) = weight / Σ weight over u's
    out-edges``). Every node that appears as a source or destination is a
    node; callers wanting no dangling mass loss should pass a bidirected
    edge list (every node then has out-degree ≥ 1), and may then also set
    ``sources_cover_nodes=True``: the node set is read off the out-degree
    aggregate for free instead of a distinct over the full edge list.

    ``broadcast_ranks=True`` additionally hints the |V|-row rank vector /
    out-degree / contribution tables into broadcast joins (every
    superstep join becomes map-side; one shuffle per superstep remains —
    the groupBy(dst)). Use it when |V| is dimension-scale.
    """
    maybe_b = F.broadcast if broadcast_ranks else (lambda df: df)
    w_col = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst"), w_col.alias("__w")
    )
    # Normalize out-weights via groupBy+join, not a window over __src — a
    # hub node's window partition would buffer its whole out-edge set in
    # one task (the hot-key hazard pinned in the verify gotchas).
    out = e.groupBy("__src").agg(F.sum("__w").alias("__tot"))
    if sources_cover_nodes:
        out = out.localCheckpoint(eager=False)  # reused: norm join + node set
        nodes = out.select(F.col("__src").alias("node"))
    else:
        nodes = (
            e.select(F.col("__src").alias("node"))
            .unionByName(e.select(F.col("__dst").alias("node")))
            .distinct()
            .localCheckpoint(eager=False)  # reused every superstep
        )
    norm = (
        e.join(maybe_b(out), "__src")
        .select("__src", "__dst", (F.col("__w") / F.col("__tot")).alias("__nw"))
        .localCheckpoint(eager=False)  # reused every superstep
    )
    # |V| as a 1-row frame cross-joined in (broadcast of a scalar), so the
    # driver never collects anything and the plan stays lazy end-to-end.
    n = nodes.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    ranks = nodes.join(F.broadcast(n)).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    reset = F.lit(1.0 - damping) / F.col("__n")
    for i in range(iterations):
        prev = ranks
        rk = maybe_b(ranks)
        contrib = (
            norm.join(rk, norm["__src"] == rk["node"])
            .groupBy("__dst")
            .agg(F.sum(F.col("__nw") * F.col("rank")).alias("__c"))
        )
        cb = maybe_b(contrib)
        ranks = (
            nodes.join(cb, nodes["node"] == cb["__dst"], "left")
            .join(F.broadcast(n))
            .select(
                "node",
                (reset + F.lit(damping) * F.coalesce(F.col("__c"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
        )
        if i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=False)
            if tol is not None:
                # The agg below materializes the checkpoint just taken, so
                # the probe costs no extra pass over the superstep.
                delta = (
                    ranks.join(
                        prev.select("node", F.col("rank").alias("__prev")), "node"
                    )
                    .agg(F.max(F.abs(F.col("rank") - F.col("__prev"))).alias("d"))
                    .collect()[0]["d"]
                )
                if delta is not None and delta < tol:
                    break
    return ranks
