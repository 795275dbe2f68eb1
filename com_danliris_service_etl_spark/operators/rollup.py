"""Hypertable-style continuous aggregates: time-bucketed rollups
maintained INCREMENTALLY.

A 100 TB event stream is queried through its rollups (events per hour per
type, revenue per day, …), and recomputing them from raw history every
night is the thing that doesn't scale — the nightly batch touches a
handful of recent buckets, so only those should be recomputed. This is
TimescaleDB's continuous-aggregate / materialized-view-maintenance idea
expressed as a pure Spark transform over MERGEABLE partial aggregates:
the stored state keeps (count, sum, min, max) per bucket, which combine
associatively, so "merge a new batch in" is a tiny aggregation of the
batch plus a full-outer combine on the bucket key — never a scan of raw
history. (avg is derived sum/count at read time; percentile-style
rollups would store a mergeable sketch the same way — see
sk1_sketch_accuracy.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_aggregate(
    events: DataFrame,
    ts_col: str,
    bucket_us: int,
    group_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """One rollup grain over a batch: (time bucket, group…) → mergeable
    partials. A single map-side-combinable shuffle on (bucket, groups)."""
    bucket = (F.floor(F.col(ts_col) / F.lit(bucket_us)) * bucket_us).alias(
        "bucket_us"
    )
    return events.groupBy(bucket, *group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(value_col).alias("sum_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def merge_rollup(existing: DataFrame, delta: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Combine two rollup states (both in `bucket_aggregate` shape) into
    one. Because every stored aggregate is mergeable, the combine is a
    null-safe full-outer join on the bucket/group key with element-wise
    (sum, sum, min, max) — cost O(|touched buckets|), independent of raw
    history size. With the state stored partitioned/bucketed on the key,
    the join co-locates and the nightly maintenance never shuffles the
    existing state. Identical input order or batch split produces an
    identical state (associative + commutative), pinned by
    `test_incremental_rollup_equals_full_recompute`."""
    key_list = list(keys)
    d = delta
    for c in [*key_list, "n", "sum_v", "min_v", "max_v"]:
        d = d.withColumnRenamed(c, f"__d_{c}")
    cond = None
    for k in key_list:
        eq = F.col(k).eqNullSafe(F.col(f"__d_{k}"))
        cond = eq if cond is None else (cond & eq)
    j = existing.join(d, cond, "full_outer")

    def pick_key(k: str) -> F.Column:
        return F.coalesce(F.col(k), F.col(f"__d_{k}")).alias(k)

    def merge_min(c: str) -> F.Column:
        return F.least(F.col(c), F.col(f"__d_{c}"))

    def merge_max(c: str) -> F.Column:
        return F.greatest(F.col(c), F.col(f"__d_{c}"))

    return j.select(
        *[pick_key(k) for k in key_list],
        (
            F.coalesce(F.col("n"), F.lit(0)) + F.coalesce(F.col("__d_n"), F.lit(0))
        ).alias("n"),
        (
            F.coalesce(F.col("sum_v"), F.lit(0.0))
            + F.coalesce(F.col("__d_sum_v"), F.lit(0.0))
        ).alias("sum_v"),
        # Spark's least/greatest SKIP nulls (return the non-null extreme),
        # which is exactly what a bucket present on only one side needs.
        merge_min("min_v").alias("min_v"),
        merge_max("max_v").alias("max_v"),
    )


def resample_gap_fill(
    events: DataFrame,
    group_col: str = "event_type",
    ts_us_col: str = "ts_us",
    value_col: str = "value",
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """Regular-grid resampling with gap fill — the step between raw
    events and any time-series consumer (charts, anomaly detection,
    forecasting features), which all assume a DENSE grid: per group,
    every bucket from the corpus min to max exists; empty buckets carry
    zero counts and a FORWARD-FILLED mean (last observation carried
    forward), flagged ``is_gap``.

    Scale shape: events are scanned and shuffled exactly ONCE — the
    map-side-combinable (group, bucket) aggregation, materialized
    (localCheckpoint, grid-sized) because everything downstream (the
    group list, the min/max bounds, the left join) derives from it; an
    earlier form derived groups and bounds from the raw events and paid
    three corpus scans. The dense grid is groups × buckets rows; the
    forward fill is one window per group ordered by bucket — grid-sized
    work throughout. The mean is rounded BEFORE the fill so the carried
    value is the same literal both engines computed."""
    from pyspark.sql import Window

    # floor division, NOT cast('long') (truncate-toward-zero): the two
    # disagree for negative (pre-1970) timestamps, and this grid must
    # bucket identically to bucket_aggregate's floor and the oracle's //.
    hb = F.floor(F.col(ts_us_col) / F.lit(bucket_us)).cast("long")
    hourly = (
        events.select(F.col(group_col), hb.alias("__hb"), F.col(value_col))
        .groupBy(group_col, "__hb")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.round(F.sum(value_col), 2).alias("__sum"),
            F.round(F.avg(value_col), 4).alias("__m"),
        )
        .localCheckpoint()
    )
    bounds = hourly.agg(
        F.min("__hb").alias("__lo"), F.max("__hb").alias("__hi")
    )
    grid = (
        hourly.select(group_col)
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            group_col,
            F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias("__hb"),
        )
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("__hb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(hourly, [group_col, "__hb"], "left")
        .withColumn("__ff", F.last("__m", ignorenulls=True).over(w))
        .select(
            group_col,
            (F.col("__hb") * bucket_us).alias("bucket_start_us"),
            F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("n"),
            F.coalesce(F.col("__sum"), F.lit(0.0)).alias("sum_value"),
            F.col("__ff").alias("ffill_mean"),
            F.col("__n").isNull().alias("is_gap"),
        )
    )
