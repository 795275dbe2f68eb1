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
    Fine for dimension-sized data; for fact-scale surrogate keys use
    `monotonically_increasing_id()` (sparse but parallel) instead.
    """
    order = [order_by] if isinstance(order_by, Column) else list(order_by)
    return df.withColumn(out_col, F.row_number().over(Window.orderBy(*order)))
