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


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    broadcast_degrees: bool = False,
) -> DataFrame:
    """Per-node triangle participation counts over an undirected graph;
    returns ``(node, triangles)`` for every node in ≥ 1 triangle.

    Input edges may be directed/duplicated; they are canonicalized to the
    distinct undirected edge set first. The enumeration is the
    compact-forward / degree-orientation algorithm: orient every edge
    from its lower-(degree, id) endpoint to the higher one, generate
    two-paths u→v, u→w only from each node's ORIENTED out-edges, and close
    them against the oriented edge set. Every triangle is emitted exactly
    once (as its unique oriented u→v→w ordering), and the two-path fanout
    is Σ C(out-deg, 2) with out-degrees bounded by O(√m) under degree
    orientation — the property that keeps the join sized by the graph's
    arboricity instead of the hub nodes' full degrees at 100 TB. All
    stages are equi-joins + partial-aggregated groupBys; no node ever
    buffers its whole neighborhood in one task.

    ``broadcast_degrees``: hint the |V|-row degree table into the two
    orientation joins (map-side) when |V| is dimension-scale."""
    maybe_b = F.broadcast if broadcast_degrees else (lambda df: df)
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        # referenced by the degree aggregate AND both orientation joins —
        # checkpoint the fork or the upstream pipeline runs per reference
        .localCheckpoint(eager=False)
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=False)  # joined twice below
    )
    da = maybe_b(deg.select(F.col("node").alias("a"), F.col("deg").alias("da")))
    db = maybe_b(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")))
    # orient by the (deg, id) total order — struct comparison is
    # lexicographic, so ties in degree break on the node id
    lo_first = F.struct(F.col("da"), F.col("a")) < F.struct(F.col("db"), F.col("b"))
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
        .localCheckpoint(eager=False)  # referenced 3×: two-path sides + closure
    )
    o1 = oriented.select(F.col("u"), F.col("v").alias("w1"))
    o2 = oriented.select(F.col("u"), F.col("v").alias("w2"))
    # two-paths from each node's oriented out-edges; w1 < w2 emits each
    # unordered {v, w} pair once
    paths = o1.join(o2, "u").filter(F.col("w1") < F.col("w2"))
    closing = oriented.select(F.col("u").alias("w1"), F.col("v").alias("w2")).unionByName(
        oriented.select(F.col("u").alias("w2"), F.col("v").alias("w1"))
    )
    tris = paths.join(closing, ["w1", "w2"], "left_semi")
    return (
        tris.select(F.explode(F.array("u", "w1", "w2")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    max_hops: int = 3,
) -> DataFrame:
    """Multi-source BFS: minimum hop distance from any source node,
    explored to ``max_hops``; returns ``(node, hops)`` for every reached
    node (sources at 0). Edges are followed src→dst as given — pass a
    bidirected list for undirected reachability.

    FRONTIER form, not path enumeration: each level expands only the
    previous frontier (one equi-join onto the edge list), dedups it
    (groupBy — map-side combinable), and anti-joins the visited set; a
    recursive path-union (the naive SQL) enumerates every distinct PATH
    and explodes combinatorially on dense graphs. Per-level
    `localCheckpoint(eager=False)` cuts the lineage the same way
    `pagerank`'s supersteps do; the visited set is only ever joined on
    its key — never collected."""
    e = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
    visited = sources.select(F.col(node_col).alias("node")).distinct().select(
        "node", F.lit(0).alias("hops")
    ).localCheckpoint(eager=False)
    frontier = visited.select("node")
    for hop in range(1, max_hops + 1):
        nxt = (
            e.join(frontier.withColumnRenamed("node", "__s"), "__s")
            .select(F.col("__d").alias("node"))
            .distinct()
            .withColumn("hops", F.lit(hop))
            .join(visited.select("node"), "node", "left_anti")
            .localCheckpoint(eager=False)
        )
        visited = visited.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt.select("node")
    return visited


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
