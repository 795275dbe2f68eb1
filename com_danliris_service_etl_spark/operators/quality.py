"""Data-quality constraint checking (Deequ/dbt-test-shaped, Spark-native).

The reference trusts its sources blindly — a nightly load that receives
duplicated keys or dangling foreign keys writes them into the fact and
nobody knows (SURVEY §2.14's crash sites are exactly this class). These
checks make the contract explicit: each constraint computes a metric and
a pass/fail over the full table, all scalar aggregations fused into ONE
pass over the data (Catalyst collapses the unioned single-row aggregates
over a shared scan), with referential integrity as a broadcast-or-
shuffle anti-join. The output is a tiny metrics table — the thing a
pipeline gate reads before publishing a load.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def _metric_row(df: DataFrame, name: str, metric: F.Column, passed: F.Column) -> DataFrame:
    return df.agg(
        F.lit(name).alias("check"),
        metric.cast("double").alias("metric"),
        passed.alias("passed"),
    )


def completeness(df: DataFrame, col: str, min_ratio: float = 1.0) -> DataFrame:
    """Non-null ratio of a column; passes at >= min_ratio. An EMPTY input
    fails outright (0/0 is NULL, and a NULL verdict would slip through
    any boolean gate — an accidentally-empty load is exactly what this
    check exists to catch)."""
    # try_divide: an empty input is 0/0, which ANSI mode turns into an
    # ABORT instead of the NULL the failing verdict below absorbs.
    ratio = F.try_divide(F.count(col), F.count(F.lit(1)))
    return _metric_row(
        df,
        f"completeness({col})",
        ratio,
        F.coalesce(ratio >= min_ratio, F.lit(False)),
    )


def uniqueness(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Duplicate-key count over the given column set; passes at 0.
    count(distinct struct(...)) keeps it a single two-phase aggregate —
    no self-join."""
    dupes = F.count(F.lit(1)) - F.count_distinct(F.struct(*[F.col(c) for c in cols]))
    return _metric_row(df, f"uniqueness({','.join(cols)})", dupes, dupes == 0)


def in_range(df: DataFrame, col: str, lo: float, hi: float) -> DataFrame:
    """Out-of-range row count; passes at 0. NULLs don't count as
    violations (completeness is its own check)."""
    viol = F.count(F.when((F.col(col) < lo) | (F.col(col) > hi), 1))
    return _metric_row(df, f"in_range({col},{lo},{hi})", viol, viol == 0)


def referential_integrity(
    child: DataFrame, parent: DataFrame, fk: str, pk: str
) -> DataFrame:
    """Dangling-foreign-key count (child rows whose fk matches no parent
    pk); passes at 0. A left-anti join — broadcast when the parent is
    dimension-sized, shuffle otherwise; NULL fks are not dangling (SQL
    FK semantics), so they are filtered before the probe."""
    dangling = (
        child.filter(F.col(fk).isNotNull())
        .join(parent.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti")
    )
    return _metric_row(
        dangling, f"referential_integrity({fk})", F.count(F.lit(1)),
        F.count(F.lit(1)) == 0,
    )


def run_checks(checks: Sequence[DataFrame]) -> DataFrame:
    """Union the metric rows into one report. Each check is a single-row
    aggregate; Spark runs them as parallel jobs over shared cached scans
    and the result is |checks| rows — the gate a load reads before
    publish (`passed = every(passed)`)."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def snapshot_drift(
    old: DataFrame,
    new: DataFrame,
    group_col: str,
    value_col: str,
    max_growth: float = 0.5,
    max_value_drift: float = 0.1,
) -> DataFrame:
    """Cross-snapshot drift report: per ``group_col`` group, compare row
    counts and the mean of ``value_col`` between two corpus snapshots and
    flag groups whose growth or value distribution moved beyond the
    thresholds — the "did today's crawl silently change shape" monitor
    that runs BEFORE a new snapshot is allowed into training (a doubled
    source or a halved mean doc length is a scraper bug, not data).

    One map-side-combinable aggregation per side to group-grain partials
    (the only corpus-sized work), then a FULL OUTER join of two tiny
    grouped frames — groups present on one side only surface with
    missing_side set instead of dropping. Deltas divide exact integer
    counts, rounded before the threshold compare (deterministic
    cross-engine)."""
    def grain(df: DataFrame, n_name: str, m_name: str) -> DataFrame:
        return df.groupBy(group_col).agg(
            F.count(F.lit(1)).alias(n_name),
            F.round(F.avg(value_col), 6).alias(m_name),
        )

    o = grain(old, "n_old", "mean_old")
    n = grain(new, "n_new", "mean_new")
    growth = F.round((F.col("n_new") - F.col("n_old")) / F.col("n_old"), 6)
    # try_divide: mean_old CAN be 0 (relative drift undefined) and under
    # ANSI mode a bare division would ABORT the whole report instead of
    # yielding the NULL the drifted flag's fallback handles.
    value_drift = F.round(
        F.try_divide(
            F.abs(F.col("mean_new") - F.col("mean_old")), F.abs(F.col("mean_old"))
        ),
        6,
    )
    both = F.col("n_old").isNotNull() & F.col("n_new").isNotNull()
    return (
        o.join(n, group_col, "full_outer")
        .select(
            group_col,
            F.coalesce(F.col("n_old"), F.lit(0)).cast("long").alias("n_old"),
            F.coalesce(F.col("n_new"), F.lit(0)).cast("long").alias("n_new"),
            "mean_old",
            "mean_new",
            F.when(both, growth).alias("growth"),
            F.when(both, value_drift).alias("value_drift"),
            F.when(F.col("n_old").isNull(), F.lit("new_group"))
            .when(F.col("n_new").isNull(), F.lit("vanished_group"))
            .otherwise(F.lit("both"))
            .alias("presence"),
            (
                F.col("n_old").isNull()
                | F.col("n_new").isNull()
                | (F.abs(growth) > max_growth)
                # value_drift is NULL when mean_old is 0 or a side's mean
                # is NULL — the INFINITE-relative-drift cases. A bare
                # `value_drift > thr` would be NULL there and the whole
                # flag NULL (a gate on drifted=true silently misses the
                # most-drifted group), so those cases flag explicitly:
                # drifted whenever the means are not equal.
                | F.coalesce(
                    value_drift > max_value_drift,
                    ~(F.col("mean_new").eqNullSafe(F.col("mean_old"))),
                )
            ).alias("drifted"),
        )
    )


def hourly_anomalies(
    events: DataFrame,
    group_col: str = "event_type",
    ts_us_col: str = "ts_us",
    bucket_us: int = 3_600_000_000,
    k: float = 3.0,
) -> DataFrame:
    """Robust volume-anomaly detection over the hourly event grid: per
    group, flag buckets whose event count deviates from the group's
    MEDIAN by more than ``k`` times the MAD (median absolute deviation)
    — the standard robust alternative to mean/stddev control limits,
    immune to the very outliers it hunts. When MAD is 0 (over half the
    buckets share one count), any deviation at all is flagged — the
    degenerate-but-common case of a flat-lined metric.

    Output: (group, bucket_start_us, n, med, mad, is_anomaly).

    Scale shape: the corpus is scanned and shuffled exactly ONCE (the
    map-side-combinable (group, bucket) count, materialized because the
    stats, deviations and verdicts all derive from it — the
    resample_gap_fill discipline); both median passes run over the
    GRID-sized hourly relation, and the per-group stats (a handful of
    rows) broadcast back onto it. Medians are the EXACT interpolated
    `percentile` (DuckDB `quantile_cont` semantics), rounded to 4dp
    BEFORE deviations and verdicts are computed, so every comparison
    runs on identical literals in both engines; at petabyte grids the
    exact median over buckets stays cheap because the relation is
    grid-sized, not event-sized."""
    # floor division, NOT cast('long'): truncation disagrees with the
    # oracle's // on negative (pre-1970) timestamps.
    hb = F.floor(F.col(ts_us_col) / F.lit(bucket_us)).cast("long")
    hourly = (
        events.select(F.col(group_col), hb.alias("__hb"))
        .groupBy(group_col, "__hb")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    stats = hourly.groupBy(group_col).agg(
        F.round(F.expr("percentile(n, 0.5)"), 4).alias("med")
    )
    dev = hourly.join(F.broadcast(stats), group_col).withColumn(
        "__d", F.abs(F.col("n") - F.col("med"))
    )
    mads = dev.groupBy(group_col).agg(
        F.round(F.expr("percentile(__d, 0.5)"), 4).alias("mad")
    )
    flagged = F.when(F.col("mad") > 0, F.col("__d") > k * F.col("mad")).otherwise(
        F.col("__d") > 0
    )
    return dev.join(F.broadcast(mads), group_col).select(
        group_col,
        (F.col("__hb") * bucket_us).alias("bucket_start_us"),
        F.col("n").cast("long").alias("n"),
        "med",
        "mad",
        flagged.alias("is_anomaly"),
    )


def schema_drift(old: DataFrame, new: DataFrame) -> DataFrame:
    """Schema-level drift between two snapshots of a table: one row per
    column that was ADDED, REMOVED, or TYPE_CHANGED (nullability is a
    property of the data, not the contract — ignored). Complements
    `snapshot_drift` (value-level) with the contract-level check a
    nightly load runs BEFORE touching data.

    Pure metadata: both schemas live on the driver already, so this
    costs zero jobs and zero data movement at any scale — the returned
    frame is a `createDataFrame` over at most |columns| rows."""
    spark = old.sparkSession
    old_t = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    new_t = {f.name: f.dataType.simpleString() for f in new.schema.fields}
    rows = []
    for c in sorted(set(old_t) | set(new_t)):
        if c not in new_t:
            rows.append((c, "removed", old_t[c], None))
        elif c not in old_t:
            rows.append((c, "added", None, new_t[c]))
        elif old_t[c] != new_t[c]:
            rows.append((c, "type_changed", old_t[c], new_t[c]))
    return spark.createDataFrame(
        rows, "column string, status string, old_type string, new_type string"
    )


def histogram_profile(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bins: int = 10,
) -> DataFrame:
    """Equal-width histogram per group over GLOBAL value bounds:
    (group, bucket, bin_lo, bin_hi, n). Shared global bounds make the
    per-group histograms comparable (distribution drift between groups
    reads directly off the bucket counts — the numeric companion to
    `snapshot_drift`'s categorical compare).

    Scale shape: one scan computes min/max (scalar aggregate), broadcast
    to a second scan that buckets rows inside the projection — then one
    partial-aggregated groupBy on (group, bucket). Bucket arithmetic is
    plain IEEE ((v − mn) / width, floored, max clamped into the top
    bucket); a constant column (width 0) degenerates to bucket 0 instead
    of dividing by zero."""
    stats = df.agg(
        F.min(value_col).cast("double").alias("__mn"),
        F.max(value_col).cast("double").alias("__mx"),
    )
    width = (F.col("__mx") - F.col("__mn")) / F.lit(float(bins))
    bucket = F.when(F.col("__mx") == F.col("__mn"), F.lit(0)).otherwise(
        F.least(
            F.lit(bins - 1),
            F.floor((F.col(value_col) - F.col("__mn")) / width).cast("int"),
        )
    )
    return (
        df.join(F.broadcast(stats))
        .select(F.col(group_col), bucket.alias("bucket"), "__mn", "__mx", F.col(value_col))
        .groupBy(group_col, "bucket")
        .agg(
            F.round(F.min(F.col("__mn") + F.col("bucket") * width), 6).alias("bin_lo"),
            F.round(
                F.min(F.col("__mn") + (F.col("bucket") + 1) * width), 6
            ).alias("bin_hi"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def group_trend(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col,
    y_col,
    round_dp: int = 6,
) -> DataFrame:
    """Per-group ordinary-least-squares trend (slope + intercept of y
    over x) from SUFFICIENT STATISTICS — the drift detector's
    quantitative companion (`snapshot_drift` flags a shifted mean;
    the trend says how fast a metric is moving per unit x).

    One map-side-combinable aggregation computes (n, Σx, Σx², Σy, Σxy)
    per group; slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) and intercept
    follow row-locally — no second pass, no window. ``x_col`` is cast
    to BIGINT so Σx and Σx² are EXACT integer sums (use a compact
    ordinal — day index, batch number — not epoch micros: exactness
    plus small magnitudes keep the cancellation in the numerator
    cross-engine-stable; results round to ``round_dp``). Degenerate
    groups (all x equal → zero variance) yield NULL slope/intercept
    via try_divide instead of aborting under ANSI mode."""
    groups = list(group_cols)
    x = F.col(x_col).cast("long") if isinstance(x_col, str) else x_col.cast("long")
    y = F.col(y_col).cast("double") if isinstance(y_col, str) else y_col.cast("double")
    stats = (
        df.filter(x.isNotNull() & y.isNotNull())
        .groupBy(*groups)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).alias("__sx"),
            F.sum(x * x).alias("__sxx"),
            F.sum(y).alias("__sy"),
            F.sum(x.cast("double") * y).alias("__sxy"),
        )
    )
    nd = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    sxx = F.col("__sxx").cast("double")
    slope = F.try_divide(
        nd * F.col("__sxy") - sx * F.col("__sy"),
        nd * sxx - sx * sx,
    )
    sel = stats.withColumn("__slope", slope)
    intercept = F.try_divide(F.col("__sy") - F.col("__slope") * sx, nd)
    return (
        sel.withColumn("__icept", intercept)
        .select(
            *groups,
            "n",
            F.round("__slope", round_dp).alias("slope"),
            F.round("__icept", round_dp).alias("intercept"),
        )
    )


def weighted_median(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    weight_col: str,
    out_col: str = "weighted_median",
    pre_aggregate: bool = True,
) -> DataFrame:
    """Per-group WEIGHTED median: the smallest value v such that the
    total weight of rows with value ≤ v reaches half the group's weight
    (the lower weighted median — a real order statistic, no
    interpolation).

    Tie-proof, engine-stable formulation: weights are first summed per
    DISTINCT (group, value) — a map-side-combinable shuffle that also
    collapses duplicate fact rows, so no downstream step depends on an
    ordering among identical values — then one running-sum window over
    the collapsed relation (|distinct values| rows, not fact rows) finds
    the crossing point. Weights are cast to BIGINT: the cumulative sum
    is an EXACT integer, so the `2·cum ≥ total` crossing test never
    depends on float summation order (a double cumsum computed by
    running accumulation here vs a segment tree elsewhere can disagree
    in the last ulp exactly at the crossing). For a group whose
    distinct-value domain itself is beyond one task's sort, use
    :func:`weighted_median_twophase` (identical output, bounded sorts)
    or the mergeable binned sketch
    (`operators/sketches.py::binned_quantile_state`) when an estimate
    suffices; this operator pins the exact semantics both target.

    ``pre_aggregate`` is a cost-based switch, not a semantic one: the
    result is IDENTICAL either way (the crossing's min(value) depends
    only on each value-run's END cumulative sum — the max prefix within
    a run of equal values — which no intra-run ordering can change;
    equality is pinned by `test_weighted_median_direct_equals_preagg`).
    Collapse (True) when values repeat heavily — the window input
    shrinks to the distinct-value domain; skip it (False) when values
    are near-unique and the groupBy would shuffle the whole fact for
    nothing (measured −40%% on 99%%-distinct prices at sf0.1: one
    exchange instead of two)."""
    groups = list(group_cols)
    rows = df.filter(F.col(value_col).isNotNull())  # NULL values carry no
    # rank position; both engines would also order them differently
    if pre_aggregate:
        per_value = rows.groupBy(*groups, value_col).agg(
            F.sum(F.col(weight_col).cast("long")).alias("__w")
        )
    else:
        per_value = rows.select(
            *groups, value_col, F.col(weight_col).cast("long").alias("__w")
        )
    w_cum = (
        Window.partitionBy(*groups)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(*groups)
    crossed = per_value.select(
        *groups,
        value_col,
        F.sum("__w").over(w_cum).alias("__cw"),
        F.sum("__w").over(w_tot).alias("__tw"),
    ).filter(F.lit(2) * F.col("__cw") >= F.col("__tw"))
    return crossed.groupBy(*groups).agg(F.min(value_col).alias(out_col))


def winsorized_stats(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
    round_dp: int = 4,
) -> DataFrame:
    """Per-group winsorized profile: values are clamped into the group's
    [lo_q, hi_q] exact quantile band before averaging — the robust mean
    a quality gate compares across loads without a single fat-finger
    outlier moving it (`snapshot_drift`'s median/MAD limits are the
    alerting side; this is the reporting side).

    Two passes by necessity (the clamp bounds ARE group aggregates): a
    per-group quantile aggregate — a handful of rows — broadcast back
    onto the fact scan, then one clamped aggregation. `percentile`
    shares DuckDB's quantile_cont interpolation (a7), so the bounds are
    engine-exact. At 100 TB swap the exact percentile for
    approx_percentile (t-digest) and the plan shape is unchanged."""
    groups = list(group_cols)
    bounds = df.groupBy(*groups).agg(
        F.expr(f"percentile({value_col}, {lo_q!r})").alias("__lo"),
        F.expr(f"percentile({value_col}, {hi_q!r})").alias("__hi"),
    )
    clamped = df.join(F.broadcast(bounds), groups).withColumn(
        "__clamped",
        F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")),
    )
    return clamped.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("__clamped"), round_dp).alias("wins_mean"),
        F.sum(
            (
                (F.col(value_col) < F.col("__lo"))
                | (F.col(value_col) > F.col("__hi"))
            ).cast("long")
        ).alias("n_clipped"),
    )


def weighted_median_twophase(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    weight_col: str,
    out_col: str = "weighted_median",
    n_buckets: int = 1024,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """Fact-scale form of :func:`weighted_median` — identical output
    (pinned by `test_weighted_median_twophase_equals_simple`) without
    the single form's per-group sort of the WHOLE distinct-value
    domain, which serializes a hot group through one WindowExec task.

    ``bounds``: optional GLOBAL (lo, hi) for the binning grid — e.g.
    parquet zone-map stats via `sketches.py::parquet_column_bounds`
    (the sk6 pattern). Any monotone binning partitions the value axis,
    so global bounds are as correct as per-group ones; supplying them
    removes BOTH the bounds scan (one full pass of three) and the
    per-row broadcast bounds join on the two remaining passes
    (r13: 9.4 → 6.1 s at sf10). Per-group bins are tighter (smaller
    crossing-bin re-scan) — prefer them only when no cheap bounds
    source exists AND group ranges differ wildly.

    Two-phase exact selection (the distributed order-statistic
    pattern): (1) bucket values into ``n_buckets`` equal-width bins per
    group (bounds from one broadcast min/max aggregate), cumulate the
    per-bin INTEGER weights over ≤ n_buckets+1 rows per group, and find
    the bin containing the crossing; (2) re-scan only that bin's rows
    (a broadcast semi-filter), cumulate per-value weights within it,
    and pick the crossing value with the carried-in prefix. Every sort
    is bounded — n_buckets rows in phase 1, one bin's distinct values
    in phase 2 — and all crossing tests are exact integer comparisons,
    so bucket-boundary float wobble cannot change the result (any
    monotone binning partitions the value axis; the crossing value is
    defined by cumulative weights alone). Degenerate groups (all values
    equal) take the single-bin branch. Cost: two fact scans vs the
    simple form's one — at toy scale the simple form is faster
    (measured 1.9 s vs 2.4 s at sf0.1); beyond dimension-scale value
    domains the bounded sorts win."""
    groups = list(group_cols)
    v, w = F.col(value_col), F.col(weight_col).cast("long")
    fact = df.filter(v.isNotNull()).select(*groups, value_col, w.alias("__w"))
    if bounds is not None:
        lo, hi = float(bounds[0]), float(bounds[1])
        if hi > lo:
            g_width = (hi - lo) / n_buckets
            bkt = F.least(
                F.floor((v - F.lit(lo)) / F.lit(g_width)).cast("int"),
                F.lit(n_buckets),
            )
        else:  # degenerate global domain: one bin
            bkt = F.lit(0)
        binned = fact.withColumn("__bkt", bkt)
    else:
        grp_bounds = fact.groupBy(*groups).agg(
            F.min(value_col).alias("__lo"), F.max(value_col).alias("__hi")
        )
        width = (F.col("__hi") - F.col("__lo")) / F.lit(n_buckets)
        binned = fact.join(F.broadcast(grp_bounds), groups).withColumn(
            "__bkt",
            F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
                F.least(
                    F.floor((v - F.col("__lo")) / width).cast("int"),
                    F.lit(n_buckets),
                )
            ),
        )
    per_bin = binned.groupBy(*groups, "__bkt").agg(F.sum("__w").alias("__bw"))
    w_cum = (
        Window.partitionBy(*groups)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(*groups)
    cum = per_bin.select(
        *groups,
        "__bkt",
        "__bw",
        F.sum("__bw").over(w_cum).alias("__cw"),
        F.sum("__bw").over(w_tot).alias("__tw"),
    )
    # first crossing bin per group, with the prefix weight BEFORE it and
    # the group total carried forward (min over a struct keyed on the
    # bin id = the argmin, one row per group)
    crossing = (
        cum.filter(F.lit(2) * F.col("__cw") >= F.col("__tw"))
        .groupBy(*groups)
        .agg(F.min(F.struct("__bkt", "__cw", "__bw", "__tw")).alias("__s"))
        .select(
            *groups,
            F.col("__s.__bkt").alias("__cb"),
            (F.col("__s.__cw") - F.col("__s.__bw")).alias("__before"),
            F.col("__s.__tw").alias("__tw"),
        )
    )
    in_bin = binned.join(F.broadcast(crossing), groups).filter(
        F.col("__bkt") == F.col("__cb")
    )
    per_value = in_bin.groupBy(*groups, value_col, "__before", "__tw").agg(
        F.sum("__w").alias("__w2")
    )
    w_cum2 = (
        Window.partitionBy(*groups)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    refined = per_value.withColumn("__c2", F.sum("__w2").over(w_cum2))
    return (
        refined.filter(
            F.lit(2) * (F.col("__before") + F.col("__c2")) >= F.col("__tw")
        )
        .groupBy(*groups)
        .agg(F.min(value_col).alias(out_col))
    )
