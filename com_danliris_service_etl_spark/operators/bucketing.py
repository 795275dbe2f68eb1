"""Bucketed-table helpers: co-located joins without shuffles.

SCALE.md's bucketing lever made concrete: writing both sides of a
repeatedly-joined pair bucketed (and sorted) by the join key lets Spark
plan a SortMergeJoin with NO Exchange on either side — the shuffle is paid
once at write time and amortized over every subsequent join (the
purchasing chain's id keys are the canonical use).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (+sorted) managed table. Sorting within
    buckets additionally removes the per-task Sort under SortMergeJoin."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed tables; with matching bucket specs Catalyst
    plans the join with zero Exchange operators."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
