"""Join operators beyond plain `df.join` (SURVEY.md §2.3).

The reference implements joins four ways (SQL pushdown, `Array.find`
first-match probes, `Array.filter` group joins, per-row N+1 subqueries);
all become declarative Spark joins here. The two that need engine code:

- `first_match_join` (J6): the reference keeps the *first* matching row in
  DB return order (`ProductionOrderStatus/run.js:118`); Spark requires an
  explicit, deterministic tiebreak — this helper enforces one.
- `asof_join` (J7): latest right-side row with `right.on <= left.on` per key
  (`GarmentTotalHutang/run.js:122-124` — currency rate as of DO date).
  Spark has no native as-of join; compiled to a linear union-and-sort
  (tag both sides, one window carrying the latest right payload forward)
  with a broadcast sorted-array fast path for dimension-sized right sides.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _is_plain_unsorted_column(c: Column) -> bool:
    """True only when ``c`` POSITIVELY has no SortOrder wrapper — i.e. it is
    safe to treat as an implicitly-ascending struct field inside ``min_by``.
    Returns False (→ caller uses the always-correct window path) when a
    SortOrder is present OR when the expression cannot be classified."""
    # Classic JVM column: the underlying node/expression type is
    # authoritative (Column repr text is not a stable API). Spark 4.x
    # wraps a ColumnNode (`_jc.node()`); 3.x exposes the Catalyst
    # expression (`_jc.expr()`).
    for probe in ("node", "expr"):
        try:
            jobj = getattr(c._jc, probe)()  # noqa: SLF001 — engine introspection
            return "SortOrder" not in jobj.getClass().getSimpleName()
        except Exception:
            continue
    # Spark Connect column: `_expr` is a PYTHON expression object from
    # pyspark.sql.connect.expressions whose class name carries the node
    # type. A py4j JavaObject here (classic builds also define `_expr`)
    # is ambiguous — its proxy class name says nothing about the node —
    # so only a genuine Connect expression counts as evidence.
    try:
        expr = c._expr  # noqa: SLF001
        if "connect" in type(expr).__module__:
            return "SortOrder" not in type(expr).__name__
    except Exception:
        pass
    return False


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
    # Detection is POSITIVE: each order expression is probed for an
    # underlying SortOrder node (classic `_jc.expr()`, Connect `_expr`).
    # Any expression the probe cannot classify takes the window path —
    # the window is correct for EVERY order expression, so an unknown
    # Column representation (future repr changes, new client transports)
    # can only cost performance, never route a DESC order to the
    # plain-ascending min_by fast path (which would silently return the
    # wrong first-match row).
    plain_asc = all(_is_plain_unsorted_column(c) for c in order)
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
    strategy: str = "sort",
    segment_width: int | float | None = None,
) -> DataFrame:
    """J7 — point-in-time join: for each left row, the single right row
    nearest in time (backward: greatest ``right_on`` <= ``left_on``),
    matching on optional ``by`` equi-key pairs ``[(left_key, right_key)]``.

    Reference: `GarmentTotalHutang/run.js:122-124` — latest currency rate
    with rate.date <= doDate per currency code (the reference's default-to-1
    on no match is the caller's `coalesce`).

    ``tiebreak``: right-side column ordering equal-``right_on`` candidates —
    the HIGHEST tiebreak value wins (the determinism rule SURVEY.md §7.4
    requires).

    Physical strategies:

    - ``strategy="sort"`` (default; two large sides): union-and-sort as-of.
      Left and right rows are tagged and unioned on the by-key; ONE window
      over ``(key, time, tag)`` carries the latest right payload forward via
      ``last(..., ignorenulls=True)``. Cost is linear in |left|+|right| with
      a single shuffle — no per-left-row candidate blowup on hot keys, which
      is what a 100 TB clickstream needs (the old range-join + row_number
      form materialized |left × matching-right| per key before pruning).
    - ``strategy="broadcast"`` (small right side, e.g. a currency
      dimension): right is aggregated to one sorted array per key and
      broadcast; each left row picks its row by array lookup. Zero extra
      shuffle on the fact side.
    - ``strategy="segmented"`` (hot-key clickstreams; backward only,
      numeric times, requires ``segment_width``): the sort strategy's
      window partitions on the by-key alone, so ONE key owning 10% of a
      100 TB stream serializes 10% of the data through one sort task —
      the straggler salting exists for. Segmenting the time axis
      (seg = floor(ts / segment_width)) turns it into (key, seg)
      partitions: the within-segment running-last is the same window at
      1/segments the task size, and correctness across the boundary is
      restored by a segment-grain carry — per (key, seg) the last right
      payload, cumulated per key over the (bounded, seg-grain) segment
      relation and joined back. Every right row in an earlier segment
      has strictly smaller time than any row in a later one, so the
      carry needs no tag/exact-match logic; exact-time subtleties stay
      within a segment where the tag ordering already handles them.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if strategy not in ("sort", "broadcast", "segmented"):
        raise ValueError(
            f"strategy must be sort|broadcast|segmented, got {strategy!r}"
        )
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
    r_keys = [rename.get(rk, rk) for _, rk in pairs]
    l_keys = [lk for lk, _ in pairs]
    r_vals = [c for c in r.columns if c not in r_keys]

    # Rows whose event time is NULL can never match (SQL comparison with
    # NULL is never true); drop them from the right, mask them on the left.
    r = r.filter(F.col(r_on).isNotNull())

    if strategy == "broadcast":
        return _asof_broadcast(
            left, r, left_on, r_on, l_keys, r_keys, r_vals, r_tiebreak,
            direction, allow_exact_match,
        )
    if strategy == "segmented":
        if direction != "backward":
            raise ValueError(
                "segmented as-of supports direction='backward' only (the "
                "clickstream/rate-lookup case); mirror the time axis for "
                "forward semantics"
            )
        if segment_width is None or segment_width <= 0:
            raise ValueError(
                "segmented as-of requires a positive segment_width (time "
                "units per segment, e.g. one day of epoch-micros)"
            )
        return _asof_segmented(
            left, r, left_on, r_on, l_keys, r_keys, r_vals, r_tiebreak,
            allow_exact_match, segment_width,
        )
    return _asof_union_sort(
        left, r, left_on, r_on, l_keys, r_keys, r_vals, r_tiebreak,
        direction, allow_exact_match,
    )


def _asof_union_sort(
    left: DataFrame,
    r: DataFrame,
    left_on: str,
    r_on: str,
    l_keys: list[str],
    r_keys: list[str],
    r_vals: list[str],
    r_tiebreak: str | None,
    direction: str,
    allow_exact_match: bool,
) -> DataFrame:
    """Linear as-of: tag + union + one running-``last`` window.

    Ordering contract per key: ascending time (descending for forward), with
    right rows sorted BEFORE left rows at equal time when exact matches are
    allowed (after, when excluded), and equal-time right rows in ascending
    tiebreak order so the running ``last`` keeps the highest tiebreak.
    """
    from pyspark.sql import types as T

    l_struct_t = T.StructType([left.schema[c] for c in left.columns])
    r_struct_t = T.StructType([r.schema[c] for c in r_vals])
    tb_t = r.schema[r_tiebreak].dataType if r_tiebreak else T.IntegerType()

    # At equal time: visible side first. last() scans up to the current row,
    # so a right row is visible to a left row iff it sorts at-or-before it.
    r_tag, l_tag = (0, 1) if allow_exact_match else (1, 0)

    keys = [f"__asof_k{i}" for i in range(len(l_keys))]
    lu = left.select(
        *[F.col(lk).alias(k) for lk, k in zip(l_keys, keys)],
        F.col(left_on).alias("__asof_ts"),
        F.lit(l_tag).alias("__asof_tag"),
        F.lit(None).cast(tb_t).alias("__asof_tb"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__asof_l"),
        F.lit(None).cast(r_struct_t).alias("__asof_r"),
    )
    ru = r.select(
        *[F.col(rk).alias(k) for rk, k in zip(r_keys, keys)],
        F.col(r_on).alias("__asof_ts"),
        F.lit(r_tag).alias("__asof_tag"),
        (F.col(r_tiebreak) if r_tiebreak else F.lit(0)).cast(tb_t).alias("__asof_tb"),
        F.lit(None).cast(l_struct_t).alias("__asof_l"),
        F.struct(*[F.col(c) for c in r_vals]).alias("__asof_r"),
    )
    u = lu.unionByName(ru)

    ts_order = F.col("__asof_ts").asc() if direction == "backward" else F.col("__asof_ts").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("__asof_tag").asc(), F.col("__asof_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Equi-join NULL semantics: a NULL by-key matches NOTHING. The window
    # partitioner groups NULL keys together (SQL GROUP BY semantics), so
    # without this mask a NULL-key left row would pick up NULL-key right
    # rows — a match the broadcast strategy's join condition (and any SQL
    # equi-join) correctly refuses.
    cond = F.col("__asof_ts").isNotNull()
    for k in keys:
        cond = cond & F.col(k).isNotNull()
    matched = F.when(cond, F.last("__asof_r", ignorenulls=True).over(w))
    return (
        u.withColumn("__asof_m", matched)
        .filter(F.col("__asof_tag") == l_tag)
        .select(F.col("__asof_l.*"), F.col("__asof_m.*"))
    )


def _asof_segmented(
    left: DataFrame,
    r: DataFrame,
    left_on: str,
    r_on: str,
    l_keys: list[str],
    r_keys: list[str],
    r_vals: list[str],
    r_tiebreak: str | None,
    allow_exact_match: bool,
    segment_width: int | float,
) -> DataFrame:
    """Skew-salted backward as-of: the union-sort plan with the time axis
    cut into ``segment_width``-wide segments, so a hot key's window work
    spreads across (key, segment) tasks instead of serializing through
    one. Three pieces, all bounded:

    1. within-segment running-last — the `_asof_union_sort` window, just
       partitioned on (key, seg);
    2. a segment-grain carry: per (key, seg) the last right payload
       (max of a (ts, tb, payload) struct over right rows — order-
       insensitive, no sort), cumulated per key over segments STRICTLY
       BEFORE the current one (rows-between .. -1). The carry relation
       has one row per (key, active segment) — seg-grain, never
       row-grain;
    3. a (key, seg) equi-join of the carry back onto the unioned rows —
       the union side arrives hash(key, seg)-partitioned from the
       window, so only the seg-grain side reshuffles.

    coalesce(within, carry) is exact because segments partition the time
    axis: every right row of an earlier segment precedes every row of a
    later one, so cross-segment visibility is unconditional and the
    exact-match/tag ordering only ever decides WITHIN a segment."""
    from pyspark.sql import types as T

    l_struct_t = T.StructType([left.schema[c] for c in left.columns])
    r_struct_t = T.StructType([r.schema[c] for c in r_vals])
    tb_t = r.schema[r_tiebreak].dataType if r_tiebreak else T.IntegerType()
    r_tag, l_tag = (0, 1) if allow_exact_match else (1, 0)

    seg = F.floor(F.col("__asof_ts") / F.lit(segment_width)).cast("long")
    keys = [f"__asof_k{i}" for i in range(len(l_keys))]
    lu = left.select(
        *[F.col(lk).alias(k) for lk, k in zip(l_keys, keys)],
        F.col(left_on).alias("__asof_ts"),
        F.lit(l_tag).alias("__asof_tag"),
        F.lit(None).cast(tb_t).alias("__asof_tb"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__asof_l"),
        F.lit(None).cast(r_struct_t).alias("__asof_r"),
    )
    ru = r.select(
        *[F.col(rk).alias(k) for rk, k in zip(r_keys, keys)],
        F.col(r_on).alias("__asof_ts"),
        F.lit(r_tag).alias("__asof_tag"),
        (F.col(r_tiebreak) if r_tiebreak else F.lit(0)).cast(tb_t).alias("__asof_tb"),
        F.lit(None).cast(l_struct_t).alias("__asof_l"),
        F.struct(*[F.col(c) for c in r_vals]).alias("__asof_r"),
    )
    u = lu.unionByName(ru).withColumn("__asof_seg", seg)

    w_seg = (
        Window.partitionBy(*keys, "__asof_seg")
        .orderBy(
            F.col("__asof_ts").asc(),
            F.col("__asof_tag").asc(),
            F.col("__asof_tb").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cond = F.col("__asof_ts").isNotNull()
    for k in keys:
        cond = cond & F.col(k).isNotNull()
    within = u.withColumn(
        "__asof_w", F.last("__asof_r", ignorenulls=True).over(w_seg)
    )

    # segment-grain boundary: max over right rows of (ts, tb, payload) —
    # max() skips the NULL left-row entries, struct comparison encodes
    # the same (time, tiebreak) winner rule as the window ordering
    seg_b = u.groupBy(*keys, "__asof_seg").agg(
        F.max(
            F.when(
                F.col("__asof_tag") == F.lit(r_tag),
                F.struct(
                    F.col("__asof_ts").alias("ts"),
                    F.col("__asof_tb").alias("tb"),
                    F.col("__asof_r").alias("v"),
                ),
            )
        ).alias("__b")
    )
    w_carry = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__asof_seg").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = seg_b.select(
        *keys,
        "__asof_seg",
        F.last("__b", ignorenulls=True).over(w_carry)["v"].alias("__asof_c"),
    )

    return (
        within.filter(F.col("__asof_tag") == l_tag)
        .join(carry, [*keys, "__asof_seg"], "left")
        .withColumn(
            "__asof_m",
            F.when(cond, F.coalesce(F.col("__asof_w"), F.col("__asof_c"))),
        )
        .select(F.col("__asof_l.*"), F.col("__asof_m.*"))
    )


def _asof_broadcast(
    left: DataFrame,
    r: DataFrame,
    left_on: str,
    r_on: str,
    l_keys: list[str],
    r_keys: list[str],
    r_vals: list[str],
    r_tiebreak: str | None,
    direction: str,
    allow_exact_match: bool,
) -> DataFrame:
    """Small-right as-of: per-key sorted array, broadcast equi-join, array
    lookup per left row. The array is sorted ascending by (time, tiebreak),
    so backward picks the LAST qualifying element (greatest time, then
    greatest tiebreak) and forward the first qualifying time refined to its
    greatest tiebreak. ``F.get`` (never ``element_at``) keeps out-of-range
    lookups NULL under ANSI mode."""
    tb = F.col(r_tiebreak) if r_tiebreak else F.lit(0)
    packed = (
        r.groupBy(*r_keys)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(r_on).alias("__ts"),
                        tb.alias("__tb"),
                        F.struct(*[F.col(c) for c in r_vals]).alias("__v"),
                    )
                )
            ).alias("__arr")
        )
    )
    on = None
    for lk, rk in zip(l_keys, r_keys):
        eq = left[lk] == packed[rk]
        on = eq if on is None else (on & eq)
    joined = (
        left.join(F.broadcast(packed), on, "left")
        if on is not None
        else left.crossJoin(F.broadcast(packed))
    )

    lts = F.col(left_on)
    if direction == "backward":
        pred = (lambda x: x["__ts"] <= lts) if allow_exact_match else (lambda x: x["__ts"] < lts)
        cand = F.filter(F.col("__arr"), pred)
        picked = F.get(cand, F.size(cand) - 1)
    else:
        pred = (lambda x: x["__ts"] >= lts) if allow_exact_match else (lambda x: x["__ts"] > lts)
        cand = F.filter(F.col("__arr"), pred)
        first_ts = F.get(cand, 0)["__ts"]
        best = F.filter(cand, lambda x: x["__ts"] == first_ts)
        picked = F.get(best, F.size(best) - 1)

    out = joined.withColumn("__asof_m", picked["__v"]).drop("__arr", *r_keys)
    return out.select(*left.columns, F.col("__asof_m.*"))


def asof_nearest(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    by: Sequence[tuple[str, str]] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Nearest-direction as-of join (pandas ``merge_asof(direction=
    'nearest')``): for each left row, the right row with the smallest
    absolute time distance; exact/backward wins a distance tie, and among
    equal-time right rows the HIGHEST ``tiebreak`` wins (the same
    determinism rule as `asof_join` — pass a tiebreak that makes
    ``(time, tiebreak)`` unique per key or ties are partition-order
    dependent). ``tiebreak`` must be numeric (it is negated for the
    forward scan); ``left_on``/``right_on`` must support ``-`` with an
    ordered result (numeric or timestamp).

    Physical plan — the 100 TB shape: tag + union + ONE shuffle + ONE
    sort; both candidate scans are window frames over the same ordering
    (``max`` of a (ts, tb, payload) struct over the preceding frame =
    backward candidate; ``min`` of (ts, -tb, payload) over the following
    frame = forward candidate), so Spark plans a single WindowExec with
    two frames — no second sort, no per-left-row candidate blowup on hot
    keys. Struct-max/min (order-insensitive) rather than last()/first()
    keeps full-duplicate rows deterministic."""
    from pyspark.sql import types as T

    pairs = list(by or [])
    rename = {c: f"__r_{c}" for c in right.columns if c in left.columns}
    r = right
    for old, new in rename.items():
        r = r.withColumnRenamed(old, new)
    r_on = rename.get(right_on, right_on)
    r_tb = rename.get(tiebreak, tiebreak) if tiebreak else None
    r_keys = [rename.get(rk, rk) for _, rk in pairs]
    l_keys = [lk for lk, _ in pairs]
    r_vals = [c for c in r.columns if c not in r_keys]
    r = r.filter(F.col(r_on).isNotNull())

    l_struct_t = T.StructType([left.schema[c] for c in left.columns])
    r_struct_t = T.StructType([r.schema[c] for c in r_vals])
    tb_t = r.schema[r_tb].dataType if r_tb else T.IntegerType()

    keys = [f"__nst_k{i}" for i in range(len(l_keys))]
    lu = left.select(
        *[F.col(lk).alias(k) for lk, k in zip(l_keys, keys)],
        F.col(left_on).alias("__nst_ts"),
        F.lit(1).alias("__nst_tag"),
        F.lit(None).cast(tb_t).alias("__nst_tb"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__nst_l"),
        F.lit(None).cast(r_struct_t).alias("__nst_r"),
    )
    ru = r.select(
        *[F.col(rk).alias(k) for rk, k in zip(r_keys, keys)],
        F.col(r_on).alias("__nst_ts"),
        F.lit(0).alias("__nst_tag"),
        (F.col(r_tb) if r_tb else F.lit(0)).cast(tb_t).alias("__nst_tb"),
        F.lit(None).cast(l_struct_t).alias("__nst_l"),
        F.struct(*[F.col(c) for c in r_vals]).alias("__nst_r"),
    )
    u = lu.unionByName(ru)

    # Right rows sort BEFORE left rows at equal time (tag 0 < 1), so the
    # preceding frame sees exact matches and the following frame starts
    # strictly after them.
    order = [F.col("__nst_ts").asc(), F.col("__nst_tag").asc(), F.col("__nst_tb").asc()]
    wb = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    is_r = F.col("__nst_tag") == 0
    back = F.max(
        F.when(
            is_r,
            F.struct(
                F.col("__nst_ts").alias("ts"),
                F.col("__nst_tb").alias("tb"),
                F.col("__nst_r").alias("v"),
            ),
        )
    ).over(wb)
    fwd = F.min(
        F.when(
            is_r,
            F.struct(
                F.col("__nst_ts").alias("ts"),
                (-F.col("__nst_tb")).alias("ntb"),
                F.col("__nst_r").alias("v"),
            ),
        )
    ).over(wf)

    # NULL by-keys / NULL left time match nothing (equi-join semantics —
    # same mask as _asof_union_sort).
    valid = F.col("__nst_ts").isNotNull()
    for k in keys:
        valid = valid & F.col(k).isNotNull()

    lts = F.col("__nst_ts")
    b, f = F.col("__nst_b"), F.col("__nst_f")
    choose_back = b.isNotNull() & (
        f.isNull() | ((lts - b["ts"]) <= (f["ts"] - lts))
    )
    chosen = F.when(choose_back, b["v"]).otherwise(f["v"])
    return (
        u.withColumn("__nst_b", back)
        .withColumn("__nst_f", fwd)
        .withColumn("__nst_m", F.when(valid, chosen))
        .filter(F.col("__nst_tag") == 1)
        .select(F.col("__nst_l.*"), F.col("__nst_m.*"))
    )


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


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    equi_keys: Sequence[tuple[str, str]] = (),
    bin_width: int = 1,
) -> DataFrame:
    """Interval join — each point row pairs with every interval row whose
    (lo, hi] contains it — WITHOUT the naive theta-join's all-pairs scan.

    Spark has no native range join, and expressing this as
    `join(cond=(pt > lo) & (pt <= hi))` plans BroadcastNestedLoopJoin /
    cartesian: O(|points|·|intervals|) compares. The standard fix is BIN
    BUCKETING: both sides map to fixed-width bins of the point domain —
    a point to the single bin it falls in, an interval to every bin it
    overlaps (`sequence(floor(lo/w), floor(hi/w))` exploded) — and the
    join becomes an EQUI-join on (equi_keys…, bin) with the interval
    predicate left as a residual filter. Each matching pair meets in
    EXACTLY one bin (the point's own), so no dedup pass is needed.

    Cost: the interval side replicates ceil(len/w)+1× — choose
    ``bin_width`` ≈ the typical interval length so replication is ~2×.
    The shuffle is an ordinary hash exchange on (keys, bin): AQE splits
    hot bins, and both sides prune columns before the explode. Degenerate
    inputs (one interval spanning the whole domain) replicate that
    interval |domain|/w times — bounded by interval length, never by
    |points|·|intervals|.

    ``equi_keys`` maps point-side column → interval-side column; interval
    semantics are (lo, hi] (exclusive start — a point ON the boundary
    belongs to the earlier interval's end, matching session semantics).
    """
    p = points.withColumn(
        "__bin", F.floor(F.col(point_col) / F.lit(bin_width))
    )
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bin_width)),
                F.floor(F.col(hi_col) / F.lit(bin_width)),
            )
        ),
    )
    cond = p["__bin"] == iv["__bin"]
    for pk, ik in equi_keys:
        cond = cond & (p[pk] == iv[ik])
    residual = (p[point_col] > iv[lo_col]) & (p[point_col] <= iv[hi_col])
    return (
        p.join(iv, cond & residual, "inner")
        .drop(p["__bin"])
        .drop(iv["__bin"])
    )


def fuzzy_blocked_join(
    left: DataFrame,
    right: DataFrame,
    text_col: str,
    max_dist: int = 2,
    block_chars: int = 3,
) -> DataFrame:
    """Approximate string match across two tables (entity resolution:
    the same supplier/customer typed slightly differently in two source
    systems): pairs whose ``text_col`` values are within ``max_dist``
    Levenshtein edits, restricted to a BLOCK equi-join on the first
    ``block_chars`` characters — never an all-pairs cross product. Both
    inputs must carry disjointly-named columns apart from ``text_col``
    (callers alias their keys).

    Scale shape: the block key turns the candidate join into a
    shuffle-partitionable equi-join; the edit distance runs as a
    JVM-side residual (`levenshtein`, no UDF) only on co-blocked pairs.
    Block size drives cost quadratically — at 100 TB the block should
    be (prefix, length-band, phonetic key, …) composites tuned so the
    largest block stays executor-sized; prefix blocking misses pairs
    whose edits touch the prefix (recall/cost knob, same trade as LSH
    banding — run with two offset blockings and union for higher
    recall)."""
    lb = left.withColumn("__blk", F.substring(F.col(text_col), 1, block_chars)).withColumnRenamed(
        text_col, "__l_text"
    )
    rb = right.withColumn("__blk", F.substring(F.col(text_col), 1, block_chars)).withColumnRenamed(
        text_col, "__r_text"
    )
    # Two residual optimizations, value-identical: the length-difference
    # prefilter discards hopeless pairs with integer arithmetic before
    # any DP runs, and the THRESHOLD form of levenshtein (3-arg) bands
    # the DP to O(n·max_dist) with early exit — the difference between a
    # fuzzy join that scales with candidate count and one that scales
    # with candidate count × full quadratic DP.
    len_ok = (
        F.abs(F.length("__l_text") - F.length("__r_text")) <= max_dist
    )
    # NOTE: the threshold form returns -1 for pairs BEYOND the threshold
    # and the true distance (necessarily <= max_dist) otherwise, so the
    # residual filter is the SINGLE comparison `>= 0` — a `BETWEEN 0 AND
    # max_dist` would reference the expression twice, and Catalyst
    # collapses the projection into the join condition (visible in the
    # physical plan), so every extra reference is a full extra DP run
    # per candidate pair.
    lev = F.levenshtein(F.col("__l_text"), F.col("__r_text"), max_dist)
    # _spread (dedup.py): the residual DP is CPU-bound and a small
    # catalog arriving as one parquet file = one partition would probe
    # the broadcast relation single-threaded; a well-partitioned 100 TB
    # input passes through untouched.
    from com_danliris_service_etl_spark.operators.dedup import _spread

    return (
        _spread(lb).join(rb, "__blk")
        .filter(len_ok)
        .withColumn("edit_dist", lev.cast("long"))
        .filter(F.col("edit_dist") >= 0)
        .drop("__blk")
        .withColumnRenamed("__l_text", f"l_{text_col}")
        .withColumnRenamed("__r_text", f"r_{text_col}")
    )


def _bloom_positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k independent bit positions from the repo's shared cross-engine
    hash (md5 is the only deterministic hash Spark and DuckDB agree on;
    15 hex chars = 60 bits, no sign overflow)."""
    return [
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{i}:"), key.cast("string"))), 1, 15
                ),
                16,
                10,
            ).cast("long")
            % m_bits
        )
        for i in range(k)
    ]


def bloom_build(keys: DataFrame, key_col: str, m_bits: int = 8192, k: int = 3) -> DataFrame:
    """Build a Bloom filter over a key set as ONE ROW holding a dense
    ``array<long>`` of ``m_bits/64`` bitset words.

    Shape: k hash positions per key (one wide projection + explode),
    bit_or-aggregated into sparse words (map-side combinable — the
    shuffle carries at most ``m_bits/64`` rows per map task), then
    densified into a single array row via map lookup over
    ``sequence(0, n_words-1)``. The result is broadcast-sized by
    construction (1 KiB per 8192 bits) regardless of |keys| — that is
    the point: at 100 TB a dim-side key set can be far too large to
    broadcast as a set, while its Bloom image always fits."""
    n_words = m_bits // 64
    key = F.col(key_col)
    pos = keys.filter(key.isNotNull()).select(
        F.explode(F.array(*_bloom_positions(key, m_bits, k))).alias("__p")
    )
    # F.shiftleft only takes a literal int shift; call_function reaches
    # the SQL ShiftLeft expression, which accepts a column shift amount
    sparse = pos.groupBy((F.col("__p") / 64).cast("long").alias("__w")).agg(
        F.bit_or(
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("__p") % 64).cast("int")
            )
        ).alias("__bits")
    )
    return sparse.agg(
        F.map_from_entries(F.collect_list(F.struct("__w", "__bits"))).alias("__m")
    ).select(
        F.transform(
            F.sequence(F.lit(0).cast("long"), F.lit(n_words - 1).cast("long")),
            lambda w: F.coalesce(F.element_at(F.col("__m"), w), F.lit(0).cast("long")),
        ).alias("__bloom_words")
    )


def bloom_might_contain(key: Column, words: Column, m_bits: int, k: int) -> Column:
    """Row-local membership test: all k bits set. Each probe is one O(1)
    array index + one variable-shift bit test, entirely inside
    whole-stage codegen — no join, no per-row Python."""
    tests = []
    for p in _bloom_positions(key, m_bits, k):
        word = F.element_at(words, ((p / 64).cast("long") + 1).cast("int"))
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
        )
        tests.append(word.bitwiseAND(bit) != 0)
    out = tests[0]
    for t in tests[1:]:
        out = out & t
    return out


def bloom_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 8192,
    k: int = 3,
) -> DataFrame:
    """Bloom-pruned exact semi-join: broadcast the key set's Bloom image,
    drop fact rows that cannot match BEFORE the shuffle, then remove the
    (bounded-rate) false positives with the exact ``left_semi``.

    Output rows are EXACTLY ``fact ⋉ keys`` — the Bloom stage never
    changes the result, only the volume that reaches the exchange. At
    100 TB this is runtime row-level filtering made explicit: the fact
    side typically shrinks 10-1000× before its semi-join shuffle, while
    the broadcast is a fixed kilobyte bitset instead of an
    un-broadcastable key set."""
    words = bloom_build(keys, dim_key, m_bits, k)
    probed = fact.crossJoin(F.broadcast(words)).filter(
        bloom_might_contain(F.col(fact_key), F.col("__bloom_words"), m_bits, k)
    )
    return probed.drop("__bloom_words").join(
        keys.select(F.col(dim_key).alias(fact_key)).distinct(), fact_key, "left_semi"
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    equi_keys: Sequence[tuple[str, str]] = (),
    bin_width: int = 1,
) -> DataFrame:
    """Interval×interval OVERLAP join — each left row pairs with every
    right row whose half-open interval intersects it
    (``l_lo < r_hi AND r_lo < l_hi``) — without the all-pairs theta
    join Spark would otherwise plan (BroadcastNestedLoopJoin /
    cartesian).

    Same bin-bucketing family as `range_join`, but overlap needs a
    different dedup rule: BOTH sides explode to every bin their
    interval touches, so an overlapping pair meets in every bin the
    two intervals SHARE. The pair is kept only in the bin containing
    the LATER of the two starts (``floor(greatest(l_lo, r_lo) /
    bin_width)``) — that bin is shared whenever the intervals overlap
    (the later start lies inside both), is unique, and is computable
    row-locally from the joined pair, so no `.distinct()` shuffle of
    the pair set is ever needed.

    Cost: each side replicates ceil(len/bin_width)+1× — pick
    ``bin_width`` ≈ the typical interval length for ~2× replication.
    The join is an ordinary hash equi-join on (equi_keys…, bin):
    partial column pruning happens before the explode, AQE splits hot
    bins, and worst-case work is bounded by Σ interval-lengths /
    bin_width, never |left|·|right|. Ends are exclusive: touching
    intervals ([1,3) vs [3,5)) do NOT overlap — the same boundary
    convention as `range_join` and session windows.
    """
    lf = left.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(left_lo) / F.lit(bin_width)),
                F.floor(F.col(left_hi) / F.lit(bin_width)),
            )
        ),
    )
    rf = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / F.lit(bin_width)),
                F.floor(F.col(right_hi) / F.lit(bin_width)),
            )
        ),
    )
    cond = lf["__bin"] == rf["__bin"]
    for lk, rk in equi_keys:
        cond = cond & (lf[lk] == rf[rk])
    overlap = (lf[left_lo] < rf[right_hi]) & (rf[right_lo] < lf[left_hi])
    meet_once = lf["__bin"] == F.floor(
        F.greatest(lf[left_lo], rf[right_lo]) / F.lit(bin_width)
    )
    return (
        lf.join(rf, cond & overlap & meet_once, "inner")
        .drop(lf["__bin"])
        .drop(rf["__bin"])
    )


def interval_overlap_stats(
    intervals: DataFrame,
    lo: str,
    hi: str,
    by: Sequence[str],
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Per-group OVERLAP-PAIR AGGREGATES — ``n_pairs`` (count of
    unordered interval pairs with ``a.lo < b.hi AND b.lo < a.hi``) and
    ``overlap_days`` (Σ over those pairs of ``least(a.hi, b.hi) −
    greatest(a.lo, b.lo)``) — WITHOUT materializing the pairs.

    This is the sweep-line identity, not a join: at any instant t the
    number of overlapping pairs covering t is C(k_t, 2) where k_t is
    the count of open intervals, so
      overlap_days = Σ_gaps C(k, 2) · gap_length      (k constant
        between consecutive event positions), and
      n_pairs = Σ over starts of (#intervals open just before the
        start) — every unordered overlapping pair is counted exactly
        once, at the LATER start (equal starts: once per total order,
        = C(m, 2) within the tie group, order-invariant).
    Cost is O(n log n) per group (window sorts over the 2n-row event
    stream; the groupBy reuses the outer window's hash partitioning —
    superset rule) versus the bin-bucketed pair join's O(candidate
    pairs): a hot group with k concurrent intervals costs arithmetic
    here, k² materialized rows there. Boundary convention matches
    `interval_overlap_join`: half-open, ends sort BEFORE starts at the
    same position (typ 0 < 1), so touching intervals never pair. All
    arithmetic is exact BIGINT (k·(k−1) is always even, so the /2 is
    an exact integer). Groups whose every interval is disjoint emit
    n_pairs = 0 and are FILTERED (the pair-join form never emits them).

    Precondition: ``lo <= hi`` per row (same as the bin form, whose
    `sequence(floor(lo/w), floor(hi/w))` would otherwise DESCEND).
    A reversed interval here would close before it opens, driving the
    sweep's k negative and C(k, 2) positive — garbage, not an error.
    Empty intervals (lo == hi) are valid and behave exactly like the
    pair join: they PAIR (0 days) with any interval strictly
    straddling their position and with nothing else. They are NOT
    encoded as an open/close event pair — a zero-length interval's end
    would sort before its own start (typ order), leaving a phantom −1
    in the running count that the pair join has no counterpart for
    (and that two same-position empties of DISTINCT identity turn into
    an uncancelled miscount even under the fine-sweep correction).
    Instead each empty emits a single PROBE event ordered between the
    ends and the starts at its position: it reads k without changing
    it, so `#ends ≤ p` are already out (hi == p doesn't straddle) and
    `#starts = p` not yet in (lo == p doesn't straddle) — strict
    containment falls out of the event order. Property-tested on BOTH
    tiebreak paths, including same-position distinct-identity empties.

    ``tiebreak``: the interval's IDENTITY columns. Pairs require
    strictly ordered DISTINCT identities — rows sharing (by, tiebreak)
    (the fixture's duplicate (orderkey, linenumber) lineitems) never
    pair with EACH OTHER, exactly like the pair join's strict
    lexicographic tiebreak, while still pairing with every other row.
    Implemented as a second, finer sweep (partition by + identity)
    whose open/probe/C(k,2) terms are subtracted from the group-wide
    ones; with no tiebreak given, every row is its own identity, no
    same-identity pair exists to subtract, and — now that empties are
    probes, not event pairs — the correction is identically zero, so
    the fine sweep is skipped (the per-start and per-probe sums are
    order-invariant across equal (pos, typ) rows: equal starts yield
    C(m, 2) regardless of intra-tie order, and probes don't mutate k)."""
    from pyspark.sql import Window

    by = list(by)
    tiebreak = list(tiebreak)
    # Event types, ordered by sort position at equal `pos`:
    #   0 = end (half-open: an interval ending at p no longer covers p)
    #   1 = probe (empty interval at p: pairs iff strictly covered)
    #   2 = start
    ev = intervals.select(
        *by,
        *tiebreak,
        F.explode(
            F.when(
                F.col(lo) < F.col(hi),
                F.array(
                    F.struct(F.col(lo).alias("pos"), F.lit(2).alias("typ")),
                    F.struct(F.col(hi).alias("pos"), F.lit(0).alias("typ")),
                ),
            ).otherwise(
                F.array(
                    F.struct(F.col(lo).alias("pos"), F.lit(1).alias("typ"))
                )
            )
        ).alias("__e"),
    ).select(*by, *tiebreak, "__e.pos", "__e.typ")
    order = [F.col("pos"), F.col("typ"), *[F.col(t) for t in tiebreak]]

    def sweep_cols(partition: list):
        wc = (
            Window.partitionBy(*partition)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wl = Window.partitionBy(*partition).orderBy(*order)
        cs = F.sum((F.col("typ") == 2).cast("long")).over(wc)
        ce = F.sum((F.col("typ") == 0).cast("long")).over(wc)
        k = (cs - ce).cast("long")
        gap = F.coalesce(F.lead("pos").over(wl) - F.col("pos"), F.lit(0))
        # k·(k−1) is even: the double division is an exact integer < 2^53
        c2 = ((k * (k - F.lit(1))) / F.lit(2)).cast("long")
        open_before = (cs - 1 - ce).cast("long")  # at a start row: self excluded
        # At a probe row: k itself (the probe is in neither cs nor ce,
        # so no self term exists; probes never slice c2·gap wrongly —
        # they leave k unchanged, so split segments sum identically).
        return open_before, k, (c2 * gap.cast("long"))

    open_by, k_by, c2gap_by = sweep_cols(by)
    if tiebreak:
        open_key, k_key, c2gap_key = sweep_cols(by + tiebreak)
    else:
        zero = F.lit(0).cast("long")
        open_key, k_key, c2gap_key = zero, zero, zero
    scored = ev.select(
        *by,
        F.when(F.col("typ") == 2, open_by - open_key)
        .when(F.col("typ") == 1, k_by - k_key)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("__new_pairs"),
        (c2gap_by - c2gap_key).alias("__c2gap"),
    )
    return (
        scored.groupBy(*by)
        .agg(
            F.sum("__new_pairs").alias("n_pairs"),
            F.sum("__c2gap").alias("overlap_days"),
        )
        .filter(F.col("n_pairs") > 0)
    )
