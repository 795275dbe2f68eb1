"""String scalar functions (SURVEY.md §2.10, T1-T5)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


def quote_sanitize(col: ColumnOrName) -> Column:
    """T1 — single→double quote replacement for sink-literal safety.

    Reference: `Pembelian/run.js:230,248` (`replace(/'/g,'"')`). Kept to
    bit-match reference outputs even though our typed writer doesn't need it.
    """
    return F.regexp_replace(_c(col), "'", '"')


def truncate(col: ColumnOrName, n: int) -> Column:
    """T2 — truncation to target varchar width.

    Reference: `DailyOperation/run.js:160-201` (`substring(0,N)`, N in
    {5,10,25,50,100,255,500} minus one).
    """
    return F.substring(_c(col), 1, n)


def concat_ws_nullsafe(sep: str, *cols: ColumnOrName) -> Column:
    """T3 — separator concat that yields NULL when any part is NULL
    (JS string + null propagates as the string 'null'; the reference guards
    with ternaries — the *intent* is null-propagating concat).

    Reference: `SpinningSC/run.js:96-102`, `ProductionOrder/run.js:107-113`
    (construction = material + ' ' + construction + ' ' + yarn + ' ' + width).
    `F.concat` is null-propagating; interpose literal separators.
    """
    parts: list[Column] = []
    for i, col in enumerate(cols):
        if i:
            parts.append(F.lit(sep))
        parts.append(_c(col))
    return F.concat(*parts)
