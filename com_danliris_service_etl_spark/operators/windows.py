"""Window-function-shaped operators (SURVEY.md §2.5, W1-W3)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ordinal_index(
    df: DataFrame,
    partition_by: str | Sequence[str],
    order_by: Column | Sequence[Column],
    out_col: str = "ordinal",
    start: int = 1,
) -> DataFrame:
    """W1 — per-group ordinal counter (`index++` per fabricGradeTest in a QC).

    Reference: `ProductionOrderStatus/run.js:258,263,286`.
    """
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    order = [order_by] if isinstance(order_by, Column) else list(order_by)
    w = Window.partitionBy(*keys).orderBy(*order)
    rn = F.row_number().over(w)
    return df.withColumn(out_col, rn + F.lit(start - 1))


def last_in_group(
    df: DataFrame,
    partition_by: str | Sequence[str],
    order_by: Column | Sequence[Column],
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """W2 — value of ``value_col`` from the LAST row of each ordered group,
    attached to every row of the group.

    Reference: `GarmentPembelian/run.js:620` — `fulfillments[length-1]
    .deliveryOrderDate` (last delivery date per PO item).
    """
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    order = [order_by] if isinstance(order_by, Column) else list(order_by)
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return df.withColumn(out_col or f"last_{value_col}", F.last(value_col).over(w))


def surrogate_key(df: DataFrame, order_by: Column | Sequence[Column], out_col: str = "sk") -> DataFrame:
    """A4 — monotonic row counter as surrogate key, with an explicit
    deterministic ordering (the reference counts load order:
    `TotalHutang/run.js:208`).

    NOTE (scale): a global row_number() serializes through one partition.
    Fine for dimension-sized data; for fact-scale dense keys use
    :func:`surrogate_key_distributed` (identical output, parallel), or
    `monotonically_increasing_id()` when sparse ids suffice.
    """
    order = [order_by] if isinstance(order_by, Column) else list(order_by)
    return df.withColumn(out_col, F.row_number().over(Window.orderBy(*order)))


def surrogate_key_distributed(
    df: DataFrame,
    order_by: Column | Sequence[Column],
    out_col: str = "sk",
    num_partitions: int | None = None,
) -> DataFrame:
    """Fact-scale surrogate key: identical output to :func:`surrogate_key`
    (dense 1..N in global `order_by` order — pinned by
    `test_surrogate_key_distributed_equals_global`) without the global
    window's single-partition serialization.

    Two passes over a range shuffle: (1) `repartitionByRange(order)` puts
    each partition in a disjoint, ordered key range; per-partition row
    counts (one tiny metadata row per partition) come to the driver —
    the same deliberate small-collect as the watermark lookup — and
    cumulate into start offsets. (2) a per-partition `row_number`
    (parallel: one window group per partition id) plus the partition's
    offset yields the global dense rank.

    The ranged output is pinned with `localCheckpoint` before the counts
    pass: separate DataFrame actions re-plan and re-run the shuffle, and
    RangePartitioner's sampled boundaries are not stable across runs, so
    un-pinned passes can disagree on which partition a row is in
    (observed: overlapping offsets → duplicate keys). Materializing the
    shuffle once (executor memory/disk — the same cost zipWithIndex-
    style operators pay) makes both passes read identical partitions.
    Cost: one range shuffle materialized once + one pid shuffle, all
    partitions in parallel — vs funneling 100 TB through one task."""
    order = [order_by] if isinstance(order_by, Column) else list(order_by)
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, *order)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        r["__pid"]: r["cnt"]
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    if not counts:
        # empty input (a nightly increment with no new rows): zero-entry
        # create_map() is untyped and fails analysis — emit the schema
        # with no rows instead of crashing the job.
        return ranged.drop("__pid").withColumn(out_col, F.lit(None).cast("int"))
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_map = F.create_map(
        *[F.lit(x) for pid in offsets for x in (pid, offsets[pid])]
    )
    w = Window.partitionBy("__pid").orderBy(*order)
    return (
        ranged.withColumn(
            out_col, F.row_number().over(w) + off_map[F.col("__pid")]
        )
        .drop("__pid")
    )


def topk_per_group(
    df: DataFrame,
    partition_by: str | Sequence[str],
    order_by: Column | Sequence[Column],
    k: int,
    out_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group ("3 biggest orders per priority class") — the
    grouped cousin of O3's global TOP(N). One window rank + filter: the
    single shuffle partitions by the group key, and because row_number
    needs only a running counter per group, Spark's WindowExec keeps
    O(1) state per group — no per-group buffering of all rows. The
    caller must make `order_by` a TOTAL order (tiebreak column included)
    or ranks beyond the tie are partition-dependent — same contract as
    `first_match_join`."""
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    order = [order_by] if isinstance(order_by, Column) else list(order_by)
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn(out_col, F.row_number().over(w))
        .filter(F.col(out_col) <= k)
    )


def grouped_mode(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str = "modal_value",
    cnt_col: str = "cnt",
) -> DataFrame:
    """Per-group MODE (most frequent value) with a deterministic tiebreak:
    highest count first, then smallest value. One row per group:
    ``(*group_cols, out_col, cnt_col)``.

    Built as count-aggregate → per-group argmax rather than Spark's
    `F.mode` because (a) `mode()` ties are implementation-defined (its
    deterministic=true variant exists only in 4.x SQL) while the
    count/value tiebreak here is a TOTAL order, and (b) the two-stage
    shape scales: the first groupBy on (group, value) is a full-
    cardinality shuffle with map-side partial counts (no hot-key
    buffering — contrast count() OVER, which would buffer a hot group's
    whole multiset in one WindowExec task), and the argmax window then
    runs over one row per DISTINCT (group, value), bounded by the value
    domain rather than the fact row count. The second (window) exchange
    re-keys on the group alone — left to Catalyst on purpose: pre-
    repartitioning by a low-cardinality group key (w8's single-exchange
    trick) would collapse a 100 TB scan to |groups| tasks."""
    groups = list(group_cols)
    counts = df.groupBy(*groups, value_col).agg(F.count(F.lit(1)).alias(cnt_col))
    w = Window.partitionBy(*groups).orderBy(
        F.col(cnt_col).desc(), F.col(value_col).asc()
    )
    return (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .withColumnRenamed(value_col, out_col)
        .select(*groups, out_col, cnt_col)
    )


def running_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    entity_col: str,
    tick_col: str,
) -> DataFrame:
    """Cumulative DISTINCT entity count per group over an ordered tick
    axis ("distinct users ever seen, by day") without the O(n²) trap of
    `count(distinct) OVER (ORDER BY ... RANGE UNBOUNDED PRECEDING)`
    (unsupported in Spark, quadratic where supported).

    The distributed form: an entity contributes to the cumulative count
    exactly once — at its FIRST tick — so (1) groupBy(group, entity) →
    min(tick) finds each entity's debut (full-cardinality shuffle,
    map-side combinable), (2) groupBy(group, tick) counts debuts, and
    (3) a running sum over the per-(group, tick) relation — bounded by
    |groups| × |tick domain|, not the fact row count — turns debut
    counts into the cumulative distinct series. Returns one row per
    (group, tick) that has at least one debut: ``(*group_cols, tick_col,
    new_entities, cum_distinct)``."""
    groups = list(group_cols)
    debuts = df.groupBy(*groups, entity_col).agg(F.min(tick_col).alias(tick_col))
    per_tick = debuts.groupBy(*groups, tick_col).agg(
        F.count(F.lit(1)).alias("new_entities")
    )
    w = (
        Window.partitionBy(*groups)
        .orderBy(tick_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per_tick.withColumn("cum_distinct", F.sum("new_entities").over(w))


def gap_islands(
    df: DataFrame,
    group_cols: Sequence[str],
    tick_col: str,
) -> DataFrame:
    """Gaps-and-islands: collapse each group's integer tick set into its
    maximal runs of CONSECUTIVE ticks (activity streaks, sensor uptime
    segments, contiguous version ranges). The classic trick — after
    dedup, ``tick − row_number()`` is constant exactly within a
    consecutive run — turns run detection into a groupBy on that
    difference: no self-join, no iterative chaining.

    Returns one row per island: ``(*group_cols, island_start,
    island_end, island_len)``.

    ONE hash partition by the GROUP columns feeds everything: an
    explicit repartition(*groups) ahead of the dedup means
    HashPartitioning(groups) — a subset of every later requirement —
    satisfies the (groups, tick) dedup agg, the per-group window sort,
    and the island groupBy, so Catalyst inserts no further exchange
    (letting dropDuplicates pick its own partitioning would hash on
    (groups, tick) and force a SECOND exchange for the window).
    Duplicate ticks are collapsed first so row_number is dense over
    DISTINCT ticks — required for the difference trick and what makes
    the window input bounded by the tick domain, not the raw row count
    (a customer with 1M same-day events contributes one tick). Hot
    groups are bounded by their distinct-tick span; a group spanning
    the whole domain is still one sorted partition — at that grain use
    a coarser tick."""
    from pyspark.sql import Window

    groups = list(group_cols)
    ticks = df.select(*groups, F.col(tick_col).cast("long").alias("__tick")).filter(
        F.col("__tick").isNotNull()
    )
    if groups:
        ticks = ticks.repartition(*groups).dropDuplicates([*groups, "__tick"])
    else:
        ticks = ticks.distinct()
    w = Window.partitionBy(*groups).orderBy("__tick")
    runs = ticks.withColumn(
        "__grp", F.col("__tick") - F.row_number().over(w)
    )
    return (
        runs.groupBy(*groups, "__grp")
        .agg(
            F.min("__tick").alias("island_start"),
            F.max("__tick").alias("island_end"),
            F.count(F.lit(1)).alias("island_len"),
        )
        .drop("__grp")
    )


def grouped_running_sum_distributed(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Column | Sequence[Column],
    value_col: str,
    out_col: str = "run_sum",
    num_partitions: int | None = None,
    max_offset_rows: int = 100_000,
) -> DataFrame:
    """Fact-scale GROUPED running sum: identical output to
    ``sum(value) OVER (PARTITION BY group ORDER BY order ROWS UNBOUNDED
    PRECEDING)`` without serializing each group through one task — the
    missing half of the stratum-parallelism story: the plain window is
    already parallel when there are MANY groups (hash partitioning
    spreads them), but a handful of giant strata (llm15's per-language
    budget, a global ordered ledger) funnel each stratum into a single
    WindowExec task. This is :func:`surrogate_key_distributed`'s
    two-pass range recipe generalized to grouped prefix SUMS.

    Pass 1: ``repartitionByRange(group..., order...)`` gives every
    partition a contiguous, ordered slice (a group spans consecutive
    partitions); the ranged shuffle is pinned with ``localCheckpoint``
    (RangePartitioner boundaries are re-sampled per action — unpinned
    passes can disagree on row placement; the surrogate-key lesson).
    Per-(partition, group) value totals come to the driver — bounded
    metadata: contiguity caps the row count at n_partitions + n_groups —
    and cumulate into per-(group, partition) start offsets.
    Pass 2: a per-(partition, group) running sum (parallel — every
    window group is within one partition id) plus the broadcast offset.

    EXACT for integral value columns (driver offsets are Python-int
    sums of exact longs). For floating values the summation ORDER
    differs from the single-window form — both are valid float
    prefix-sums, but don't equivalence-test them bit-for-bit."""
    order = [order_by] if isinstance(order_by, Column) else list(order_by)
    groups = list(group_cols)
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, *[F.col(g) for g in groups], *order)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    totals_df = ranged.groupBy("__pid", *groups).agg(
        F.sum(value_col).alias("__t")
    )
    # Driver-collect guard (r9 verdict task 10): the collect is bounded by
    # n_partitions + n_groups (range contiguity), which is metadata-sized
    # for this operator's design point — a HANDFUL of giant strata. A
    # high-cardinality group key inverts that bound into a fact-scale
    # driver transfer AND means the plain hash-partitioned window was
    # already parallel, so this operator is the wrong tool: refuse loudly
    # rather than OOM the driver quietly.
    n_tot = totals_df.count()
    if n_tot > max_offset_rows:
        raise ValueError(
            f"grouped_running_sum_distributed: {n_tot} (partition, group) "
            f"offset rows exceed max_offset_rows={max_offset_rows}. The "
            "group key is high-cardinality — use the plain window form "
            "(hash partitioning already parallelizes many groups); this "
            "operator exists for a few giant strata."
        )
    totals = totals_df.collect()
    # The offset column carries SUMS of the value column, so it must be
    # typed as F.sum's RESULT type, not the input type: int32 inputs sum
    # to LongType partials whose cumulative offsets can exceed int32
    # range, and __local from F.sum is already the widened type.
    sum_dt = ranged.select(F.sum(value_col).alias("__s")).schema["__s"].dataType
    if not totals:
        return ranged.drop("__pid").withColumn(
            out_col, F.lit(None).cast(sum_dt)
        )
    # createDataFrame is type-strict: a DoubleType offset field rejects a
    # python int, so the accumulator starts in the sum type's own python
    # type (sums of longs stay exact python ints).
    from pyspark.sql.types import DecimalType, DoubleType, FloatType

    if isinstance(sum_dt, (DoubleType, FloatType)):
        zero = 0.0
    elif isinstance(sum_dt, DecimalType):
        from decimal import Decimal

        zero = Decimal(0)
    else:
        zero = 0
    by_group: dict[tuple, list] = {}
    for r in totals:
        by_group.setdefault(tuple(r[g] for g in groups), []).append(
            (r["__pid"], r["__t"])
        )
    rows = []
    for gkey, pids in by_group.items():
        acc = zero
        for pid, tot in sorted(pids):
            rows.append((*gkey, pid, acc))
            # F.sum skips NULLs; an all-NULL (partition, group) slice
            # yields __t = None — contribute 0, matching the window form.
            acc += tot if tot is not None else zero
    spark = df.sparkSession
    off_schema = ranged.select(*groups, "__pid").schema
    offsets_df = spark.createDataFrame(rows, off_schema.add("__off", sum_dt))
    w = (
        Window.partitionBy("__pid", *groups)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.withColumn("__local", F.sum(value_col).over(w))
        .join(F.broadcast(offsets_df), on=[*groups, "__pid"], how="left")
        .withColumn(out_col, F.col("__local") + F.coalesce(F.col("__off"), F.lit(0)))
        .drop("__pid", "__local", "__off")
    )
