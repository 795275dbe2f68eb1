"""Skew-handling operators: salted aggregation and salted broadcast-side
join (SCALE.md's "salting for skew" lever, made first-class).

AQE's skew-join splitting handles most hot keys at runtime; explicit
salting remains the tool when a single key dominates an AGGREGATION (AQE
cannot split a hash-aggregate group) or when a map-side combine doesn't
apply (e.g. collect_list of a hot parent's children).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys.

    ``aggs``: out_col -> (in_col, fn) with fn ∈ {sum, count, min, max}
    (the decomposable aggregates — each re-reduces with sum/sum/min/max).

    Stage 1 groups by (key, salt) — the hot key's rows spread over
    ``n_salts`` reducers; stage 2 re-reduces the ``n_salts`` partial rows
    per key. Cost: one extra (tiny) shuffle of partial states; win: no
    single reducer ever sees more than 1/n_salts of the hottest key.
    """
    refn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for out, (col, fn) in aggs.items():
        if fn not in refn:
            raise ValueError(f"{fn!r} is not decomposable (use sum/count/min/max)")
    salted = df.withColumn(
        "__salt", (F.rand(seed=7) * n_salts).cast("int")
    )
    # 'count' counts the NAMED column (null-skipping), matching what the
    # equivalent plain groupBy().agg(F.count(col)) computes — count(*)
    # here would silently overcount on nullable columns.
    stage1 = salted.groupBy(*keys, "__salt").agg(
        *[
            getattr(F, fn)(col).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )
    return stage1.groupBy(*keys).agg(
        *[
            getattr(F, refn[fn])(out).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )


def salted_broadcast_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "left",
    n_salts: int = 16,
) -> DataFrame:
    """Join a skewed big side against a small side by EXPLODING the small
    side across ``n_salts`` salt values: each big-side row picks a random
    salt, so a hot key's rows land on ``n_salts`` different partitions and
    each still finds its (replicated) match.

    Only sensible when ``small`` fits in memory × n_salts (it is
    broadcast); for two large sides, rely on AQE skew-join splitting.
    Join types that preserve UNMATCHED SMALL-SIDE rows (right/full) are
    rejected: every unmatched small row exists n_salts times after the
    explode and would be emitted once per salt copy.
    """
    if how in ("right", "rightouter", "right_outer", "full", "fullouter", "full_outer", "outer"):
        raise ValueError(
            f"salted_broadcast_join does not support how={how!r}: unmatched "
            "small-side rows would appear once per salt copy"
        )
    salted_big = skewed.withColumn("__salt", (F.rand(seed=7) * n_salts).cast("int"))
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_big.join(F.broadcast(salted_small), [on, "__salt"], how)
    return out.drop("__salt")
