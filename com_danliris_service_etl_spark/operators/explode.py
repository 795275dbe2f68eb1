"""Nested-document assembly and explode/flatten operators (SURVEY.md §2.8).

The reference assembles nested docs app-side (PR→items→fulfillments,
`GarmentPembelian/run.js:174-216,353-414`) then flattens them back to fact
rows with `[].concat.apply` (E1). In Spark both directions are first-class:

- nest:    groupBy(fk).agg(collect_list(struct(...)))
- flatten: explode (inner semantics, E4) / explode_outer (left semantics, E5)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def nest_children(
    parent: DataFrame,
    child: DataFrame,
    parent_key: str,
    child_fk: str,
    array_col: str,
    child_cols: Sequence[str] | None = None,
    order_by: str | None = None,
    parent_key_unique: bool = False,
) -> DataFrame:
    """Assemble child rows into an array<struct> column on the parent.

    Mirrors the reference's `Array.filter` group join populating `items[]`
    (`ShipmentDocument/run.js:145-150`, `PackingReceipt/run.js:121-123`).
    ``order_by`` pins array order (the reference relies on DB return order —
    SURVEY.md §7.4 determinism risk).

    ``parent_key_unique=True`` is the single-shuffle fast path for the
    common case where ``parent_key`` is the parent's primary key: parent
    and child rows UNION on the key and ONE groupBy carries the parent
    struct (first non-null) and collects the child array together —
    replacing groupBy(child) + parent join (two extra exchanges: the agg
    output and the parent side both reshuffle for the sort-merge join).
    Semantic deltas vs the join form, both explode-equivalent: childless
    parents get an EMPTY array instead of NULL (explode/explode_outer
    treat them identically), and duplicate parent keys would COLLAPSE —
    hence the explicit opt-in flag rather than a default.
    """
    cols = list(child_cols) if child_cols else [c for c in child.columns if c != child_fk]
    if order_by:
        cstruct = F.struct(
            F.col(order_by).alias("__ord"), *[F.col(c).alias(c) for c in cols]
        )
    else:
        cstruct = F.struct(*[F.col(c).alias(c) for c in cols])

    if parent_key_unique:
        from pyspark.sql import types as T

        pcols = parent.columns
        # NULL keys never equi-match: the groupBy below would MERGE every
        # NULL-key parent into one row (first() keeps one, the rest
        # vanish) and hand it the NULL-fk children the join form
        # correctly refuses. Route NULL-key parents around the groupBy
        # with an empty array; drop NULL-fk children (orphans either way).
        elem_t = (
            child.select(
                F.struct(*[F.col(c).alias(c) for c in cols]).alias("__e")
            ).schema["__e"].dataType
        )
        null_key_parents = parent.filter(F.col(parent_key).isNull()).withColumn(
            array_col, F.array().cast(T.ArrayType(elem_t))
        )
        p = parent.filter(F.col(parent_key).isNotNull()).select(
            F.col(parent_key).alias("__k"),
            F.struct(*[F.col(c) for c in pcols]).alias("__p"),
        )
        c = child.filter(F.col(child_fk).isNotNull()).select(
            F.col(child_fk).alias("__k"), cstruct.alias("__c")
        )
        u = p.unionByName(c, allowMissingColumns=True)
        arr = F.collect_list("__c")  # skips the parent rows' null __c
        if order_by:
            arr = F.transform(F.sort_array(arr), lambda s: s.dropFields("__ord"))
        grouped = (
            u.groupBy("__k")
            .agg(F.first("__p", ignorenulls=True).alias("__p"), arr.alias(array_col))
            # left-join semantics: orphan children (no parent row) drop out
            .filter(F.col("__p").isNotNull())
            .select(*[F.col(f"__p.{c}").alias(c) for c in pcols], array_col)
        )
        return grouped.unionByName(null_key_parents)

    if order_by:
        # sort_array over (key, struct) keeps the array deterministically ordered
        arrays = child.groupBy(F.col(child_fk).alias(parent_key)).agg(
            F.transform(
                F.sort_array(F.collect_list(cstruct)), lambda s: s.dropFields("__ord")
            ).alias(array_col)
        )
    else:
        arrays = child.groupBy(F.col(child_fk).alias(parent_key)).agg(
            F.collect_list(cstruct).alias(array_col)
        )
    return parent.join(arrays, parent_key, "left")


def explode_inner(df: DataFrame, array_col: str, prefix: str = "") -> DataFrame:
    """E1-E4 — flatten array<struct> to rows, dropping parents with
    empty/null arrays (inner-join semantics, `ShipmentDocument/run.js:162-198`)."""
    return _explode(df, array_col, prefix, outer=False)


def explode_left(df: DataFrame, array_col: str, prefix: str = "") -> DataFrame:
    """E5 — flatten keeping parents with empty/null arrays (child cols null;
    `GarmentPembelian/run.js:689-762`, `ProductionOrderStatus/run.js:293-319`)."""
    return _explode(df, array_col, prefix, outer=True)


def _explode(df: DataFrame, array_col: str, prefix: str, outer: bool) -> DataFrame:
    fn = F.explode_outer if outer else F.explode
    exploded = df.withColumn("__child", fn(F.col(array_col))).drop(array_col)
    struct_fields = [
        f.name for f in exploded.schema["__child"].dataType.fields  # type: ignore[union-attr]
    ]
    # Fail HERE, not three operators later with AMBIGUOUS_REFERENCE: a
    # child field shadowing an existing top-level column (parent and
    # child sharing a name is common after nest_children) would emit two
    # identically-named columns.
    clashes = {f"{prefix}{n}" for n in struct_fields} & set(exploded.columns) - {"__child"}
    if clashes:
        raise ValueError(
            f"explode of {array_col!r} would duplicate column(s) "
            f"{sorted(clashes)}; pass a prefix to disambiguate"
        )
    flat = exploded.select(
        "*", *[F.col(f"__child.{name}").alias(f"{prefix}{name}") for name in struct_fields]
    ).drop("__child")
    return flat
