"""Distributed k-means (Lloyd's iterations) over embedding columns.

Closes the loop `ivf_assign_cells` left open by design ("centroid
TRAINING happens offline" — operators/similarity.py): the training now
runs in-engine with the same assignment kernel the IVF search path uses,
so a deployment can train its coarse quantizer, build the inverted file,
and serve ANN queries without leaving Spark.

Scale notes (100 TB):
- Assignment reuses `ivf_assign_cells`: the centroid set collapses to
  ONE cid-sorted broadcast array and the argmax runs per row as a
  higher-order fold inside codegen — O(n·k·d) scan work, ZERO shuffle of
  the corpus per iteration.
- The update step is posexplode → groupBy(cell, dim) avg: k·d grouping
  keys regardless of corpus size, fully map-side-combinable (each task
  emits at most k·d partial sums), then a k-row array rebuild. No
  per-cell collect of member vectors anywhere.
- `localCheckpoint(eager=False)` per iteration caps lineage (the
  pagerank/dedup_clusters lesson).
- Deterministic by construction: seeds are the k lowest-id vectors, ties
  in assignment break to the lowest centroid id (the fold's strict `>`
  over the cid-sorted array), so reruns converge identically — the
  property the DuckDB oracle (sim6) checks exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans_fit(
    vectors: DataFrame,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means with cosine assignment; returns
    ``(cid, centroid: array<double>, n_members)``.

    Seeds are the ``k`` lowest-``id_col`` vectors (cid = seed id — the
    same deterministic quantizer init sim4's IVF uses); each iteration
    assigns every vector to its highest-cosine centroid (lowest cid on
    ties) and recomputes centroids as per-dimension arithmetic means
    (cosine is scale-invariant, so the means need no renormalization). A
    cell that loses every member drops out — mirrored exactly by the
    oracle's GROUP BY, and impossible for seeds drawn from the data
    unless another centroid dominates their whole neighborhood."""
    from com_danliris_service_etl_spark.operators.similarity import (
        build_centroid_array,
        ivf_assign_cells,
    )

    v = vectors.select(
        F.col(id_col).alias("__kid"),
        F.expr(f"transform({vec_col}, x -> cast(x AS DOUBLE))").alias("__kv"),
    ).localCheckpoint(eager=False)  # scanned every iteration

    # k lowest-id seeds; bounded TakeOrdered, cid = seed id
    cent = (
        v.orderBy("__kid")
        .limit(k)
        .select(
            F.col("__kid").alias("cid"),
            F.col("__kv").alias("centroid"),
            F.lit(1).cast("long").alias("n_members"),
        )
    )
    for i in range(iterations):
        arr = build_centroid_array(cent, "cid", "centroid")
        assigned = ivf_assign_cells(
            v, cent_arr=arr, id_col="__kid", vec_col="__kv", cell_col="__cell"
        )
        per_dim = (
            assigned.select("__cell", F.posexplode("__kv").alias("__dim", "__x"))
            .groupBy("__cell", "__dim")
            .agg(F.avg("__x").alias("__m"), F.count(F.lit(1)).alias("__n"))
        )
        cent = (
            per_dim.groupBy(F.col("__cell").alias("cid"))
            .agg(
                F.expr(
                    "transform(sort_array(collect_list(struct(__dim, __m))), s -> s.__m)"
                ).alias("centroid"),
                F.max("__n").alias("n_members"),
            )
        )
        if i + 1 < iterations:
            cent = cent.localCheckpoint(eager=False)
    return cent
