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
) -> DataFrame:
    """Assemble child rows into an array<struct> column on the parent.

    Mirrors the reference's `Array.filter` group join populating `items[]`
    (`ShipmentDocument/run.js:145-150`, `PackingReceipt/run.js:121-123`).
    ``order_by`` pins array order (the reference relies on DB return order —
    SURVEY.md §7.4 determinism risk).
    """
    cols = list(child_cols) if child_cols else [c for c in child.columns if c != child_fk]
    if order_by:
        # sort_array over (key, struct) keeps the array deterministically ordered
        agg = F.sort_array(
            F.collect_list(F.struct(F.col(order_by).alias("__ord"), *[F.col(c).alias(c) for c in cols]))
        )
        arrays = child.groupBy(F.col(child_fk).alias(parent_key)).agg(
            F.transform(agg, lambda s: s.dropFields("__ord")).alias(array_col)
        )
    else:
        arrays = child.groupBy(F.col(child_fk).alias(parent_key)).agg(
            F.collect_list(F.struct(*[F.col(c).alias(c) for c in cols])).alias(array_col)
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
    flat = exploded.select(
        "*", *[F.col(f"__child.{name}").alias(f"{prefix}{name}") for name in struct_fields]
    ).drop("__child")
    return flat
