"""Slowly-changing-dimension maintenance (Type 2: full history).

The reference's dimension loads overwrite in place (`Pembelian/run.js`
re-MERGEs current attribute values every night — Type 1), which silently
rewrites history: a fact row joined to its dimension tomorrow can report
a different attribute than it did when the fact happened. Type 2 keeps
every attribute version as its own row with a validity interval, so
point-in-time joins (`fact.ts BETWEEN dim.valid_from AND dim.valid_to`,
an `asof_join` on the fact side) reproduce what was true at event time.

`scd2_apply` is a PURE DataFrame transform — state in, state out — so it
composes with any sink (`merge_upsert` keyed on (business key,
valid_from) for the physical write) and is trivially testable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VALID_FROM = "valid_from"
VALID_TO = "valid_to"
IS_CURRENT = "is_current"


def scd2_init(updates: DataFrame, effective_col: str) -> DataFrame:
    """Bootstrap an empty Type-2 dimension from a first snapshot: every
    row becomes the open current version."""
    return updates.withColumn(VALID_FROM, F.col(effective_col)).withColumn(
        VALID_TO, F.lit(None).cast(updates.schema[effective_col].dataType)
    ).withColumn(IS_CURRENT, F.lit(True)).drop(effective_col)


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    tracked: Sequence[str],
    effective_col: str,
) -> DataFrame:
    """Advance a Type-2 dimension by one batch and return the new state.

    ``dim`` carries ``keys + tracked + valid_from/valid_to/is_current``;
    ``updates`` carries ``keys + tracked + effective_col``. For each key
    whose tracked attributes CHANGED (null-safe comparison), the open row
    closes at the batch's effective time and a new open row begins there;
    unchanged keys are untouched (re-delivering the same snapshot is a
    no-op — idempotence is what lets a failed nightly re-run safely).
    Brand-new keys open their first row.

    Shape at scale: one equi-join of the CURRENT slice against the batch
    on the business key plus unions — history rows (the bulk of a years-
    old dimension) pass through untouched, never shuffled. With the dim
    stored partitioned on ``is_current`` the closed-history scan is
    pruned entirely; the join side is |current| = live entity count, and
    a hot business key cannot exist (keys are unique in the current
    slice). If ``updates`` can contain several versions of one key, pick
    the latest per key first (`last_in_group`) — one batch advances each
    key at most once, matching nightly-snapshot semantics."""
    key_list = list(keys)
    tracked_list = list(tracked)
    out_cols = key_list + tracked_list + [VALID_FROM, VALID_TO, IS_CURRENT]

    history = dim.filter(~F.col(IS_CURRENT)).select(*out_cols)
    current = dim.filter(F.col(IS_CURRENT)).select(*out_cols)

    upd = updates.select(
        *[F.col(k).alias(f"__u_{k}") for k in key_list],
        *[F.col(t).alias(f"__u_{t}") for t in tracked_list],
        F.col(effective_col).alias("__u_eff"),
    )
    key_eq = None
    for k in key_list:
        eq = F.col(k).eqNullSafe(F.col(f"__u_{k}"))
        key_eq = eq if key_eq is None else (key_eq & eq)

    joined = current.join(upd, key_eq, "full_outer")
    in_cur = F.col(IS_CURRENT).isNotNull()
    in_upd = F.col("__u_eff").isNotNull()
    same = F.lit(True)
    for t in tracked_list:
        same = same & F.col(t).eqNullSafe(F.col(f"__u_{t}"))

    # 1. current rows with no update, or an identical re-delivery: unchanged
    untouched = joined.filter(in_cur & (~in_upd | same)).select(*out_cols)
    # 2. changed: the open row closes at the batch's effective time
    closed = (
        joined.filter(in_cur & in_upd & ~same)
        .select(
            *key_list,
            *tracked_list,
            F.col(VALID_FROM),
            F.col("__u_eff").alias(VALID_TO),
            F.lit(False).alias(IS_CURRENT),
        )
    )
    # 3. changed + brand-new keys: a new open row starts at effective time
    opened = (
        joined.filter(in_upd & (~in_cur | ~same))
        .select(
            *[F.col(f"__u_{k}").alias(k) for k in key_list],
            *[F.col(f"__u_{t}").alias(t) for t in tracked_list],
            F.col("__u_eff").alias(VALID_FROM),
            F.lit(None).cast(dim.schema[VALID_FROM].dataType).alias(VALID_TO),
            F.lit(True).alias(IS_CURRENT),
        )
    )
    return history.unionByName(untouched).unionByName(closed).unionByName(opened)


def scd2_from_changelog(
    changes: DataFrame,
    keys: Sequence[str],
    tracked: Sequence[str],
    ts_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Bulk-backfill form: rebuild the ENTIRE Type-2 history from a change
    log in one set-based pass (vs `scd2_apply`'s batch-at-a-time
    advance). Rows where the tracked attributes differ from the key's
    previous row (null-safe) are version starts; each version closes at
    the next version's start (`lead`), and the last stays open.

    Two windows over ONE (key, time) sort — Catalyst plans a single
    shuffle+sort for both lag and lead. ``tiebreak`` columns must make
    the per-key order total or version boundaries are nondeterministic.
    This is the recovery/backfill path: losing the dimension table costs
    one window pass over the retained changelog, which also makes the
    incremental `scd2_apply` auditable against it."""
    key_list, tracked_list = list(keys), list(tracked)
    from pyspark.sql import Window

    order = [F.col(ts_col), *[F.col(c) for c in tiebreak]]
    w = Window.partitionBy(*key_list).orderBy(*order)

    changed = F.lit(False)
    for t in tracked_list:
        changed = changed | ~F.col(t).eqNullSafe(F.lag(t).over(w))
    is_start = F.lag(ts_col).over(w).isNull() | changed

    starts = changes.withColumn("__start", is_start).filter(F.col("__start"))
    w2 = Window.partitionBy(*key_list).orderBy(*order)
    return starts.select(
        *key_list,
        *tracked_list,
        F.col(ts_col).alias(VALID_FROM),
        F.lead(ts_col).over(w2).alias(VALID_TO),
        F.lead(ts_col).over(w2).isNull().alias(IS_CURRENT),
    )


def point_in_time_lookup(
    facts: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    ts_col: str,
) -> DataFrame:
    """Join each fact row to the dimension version valid AT ITS OWN
    timestamp: the reason Type 2 exists. An open interval (valid_to NULL)
    matches everything from valid_from on. Equi-join on the business key
    plus a residual interval predicate — for version counts per key this
    stays O(fact × versions-of-its-key); a heavily-versioned key would
    switch to the union-sort `asof_join`, which is linear."""
    key_list = list(keys)
    d = dim
    for k in key_list:
        d = d.withColumnRenamed(k, f"__d_{k}")
    cond = None
    for k in key_list:
        eq = F.col(k).eqNullSafe(F.col(f"__d_{k}"))
        cond = eq if cond is None else (cond & eq)
    cond = (
        cond
        & (F.col(ts_col) >= F.col(VALID_FROM))
        & (F.col(VALID_TO).isNull() | (F.col(ts_col) < F.col(VALID_TO)))
    )
    return facts.join(d, cond, "left").drop(*[f"__d_{k}" for k in key_list])


def cdc_apply(
    changelog: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a CDC change log (Debezium/Delta-CDF shape: I/U/D rows with
    a per-key sequence) to produce the final table state: per key, the
    row with the highest sequence wins; keys whose latest operation is a
    delete disappear. The set-at-a-time generalization of the
    reference's nightly upsert (S6) to logs that also carry deletes —
    replaying the same log is idempotent by construction.

    ONE map-side-combinable aggregation: `max_by(struct(payload), seq)`
    per key — no window sort, no self-join; the delete filter runs over
    key-grain rows. ``seq_col`` must totally order each key's changes
    (a CDC stream's LSN/commit timestamp does; ties would make the
    winner undefined, so composite sequences belong in seq_col)."""
    keys = list(key_cols)
    payload = [c for c in changelog.columns if c not in (*keys, seq_col)]
    # F.max_by (not an F.expr string): CDC payloads routinely carry
    # source-system column names with spaces/hyphens/reserved words,
    # which an unquoted SQL interpolation would fail to parse.
    latest = changelog.groupBy(*keys).agg(
        *[
            F.max_by(F.col(c), F.col(seq_col)).alias(c)
            for c in payload
        ],
        F.max(seq_col).alias(seq_col),
    )
    return latest.filter(F.col(op_col) != delete_op).drop(op_col)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Extract a CDC changelog by DIFFING two keyed snapshots — the
    inverse of `cdc_apply`, and the extraction path when the source
    system exposes no change stream (the reference re-extracts whole
    tables nightly, e.g. `Pembelian/run.js`; diffing consecutive
    extracts recovers the I/U/D log a downstream incremental consumer
    needs). Emits one row per changed key: ``'I'`` (key only in new,
    new payload), ``'D'`` (key only in old, old payload — the
    last-known values a tombstone consumer wants), ``'U'`` (key in
    both, any payload column differing null-safely; new payload).
    Unchanged keys are dropped. Round-trip law (pinned in tests):
    ``cdc_apply(old-as-inserts ∪ snapshot_diff(old, new)) == new``.

    ONE full-outer shuffle join on the key columns — both snapshots
    hash-partition by key, compare row-locally; no window, no
    collect. Payload comparison is column-wise null-safe equality
    (works on any comparable type, no cross-engine row-hash needed).
    Both inputs must share the key+payload schema; payload order is
    taken from ``new``."""
    keys = list(keys)
    payload = [c for c in new.columns if c not in keys]
    o = old.select(*keys, *payload, F.lit(True).alias("__o_here"))
    for c in (*keys, *payload):
        o = o.withColumnRenamed(c, f"__o_{c}")
    n = new.select(*keys, *payload, F.lit(True).alias("__n_here"))

    cond = None
    for k in keys:
        eq = F.col(k).eqNullSafe(F.col(f"__o_{k}"))
        cond = eq if cond is None else (cond & eq)
    j = n.join(o, cond, "full_outer")

    in_old = F.col("__o_here").isNotNull()
    in_new = F.col("__n_here").isNotNull()
    same = F.lit(True)
    for c in payload:
        same = same & F.col(c).eqNullSafe(F.col(f"__o_{c}"))

    return (
        j.filter(~in_old | ~in_new | ~same)
        .select(
            *[
                F.when(in_new, F.col(k)).otherwise(F.col(f"__o_{k}")).alias(k)
                for k in keys
            ],
            *[
                F.when(in_new, F.col(c)).otherwise(F.col(f"__o_{c}")).alias(c)
                for c in payload
            ],
            F.when(~in_old, F.lit("I"))
            .when(~in_new, F.lit("D"))
            .otherwise(F.lit("U"))
            .alias(op_col),
        )
    )
