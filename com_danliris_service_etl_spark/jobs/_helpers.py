"""Shared column-shaping helpers for the 22 job pipelines.

The reference emits every output column through the same few idioms
(null-guarded ternary + quote sanitization + optional truncation + the
+7h Jakarta shift before formatting — e.g. `Packing/run.js:118-160`,
`DailyOperation/run.js:155-201`). These helpers express those idioms once,
as native Spark expressions (zero Python UDFs).

Unlike the reference — which renders values to pre-quoted SQL literal
strings for its INSERT batching (`InventorySummaries/run.js:88-99`) — the
engine keeps columns typed end-to-end (SURVEY.md §1.3); the writer handles
encoding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from com_danliris_service_etl_spark.functions.dates import (
    fmt_date,
    fmt_datetime,
    fmt_time,
    to_jakarta,
)
from com_danliris_service_etl_spark.functions.strings import quote_sanitize, truncate


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def nz_str(c: str | Column, n: int | None = None, sanitize: bool = True) -> Column:
    """Null-guarded string column: `x ? '${x.replace(/'/g,'"')}' : null`
    (T1/T2/M10). Empty string is falsy in JS, so '' also maps to NULL."""
    col = _col(c).cast("string")
    if n is not None:
        col = truncate(col, n)  # T2 — one implementation (functions/strings.py)
    if sanitize:
        col = quote_sanitize(col)
    return F.when((_col(c).isNotNull()) & (_col(c).cast("string") != ""), col)


def nz_num(c: str | Column, default: float | None = None) -> Column:
    """Numeric with JS falsy semantics (P8): 0/NULL/NaN → default (NULL
    keeps the strict ternary `x ? x : null`; a 0 default mirrors
    `x ? x : 0`). NaN is falsy in JS, so a corrupted NaN field maps to the
    default instead of flowing into the fact and poisoning SUM/AVG
    downstream; the isnan probe runs on a double cast so integer/decimal
    inputs stay valid."""
    col = _col(c)
    falsy = col.isNull() | F.isnan(col.cast("double")) | (col == 0)
    if default is None:
        return F.when(~falsy, col)
    return F.when(~falsy, col).otherwise(F.lit(default)).cast("double")


def bool_str(c: str | Column) -> Column:
    """Booleans load as `'true'`/`'false'` strings in the reference facts
    (`Pembelian/run.js:277-278`: ``deletedPR: `'${item.prDeleted}'` `` — a
    raw template literal, so the reference renders a MISSING flag as the
    junk string `'undefined'` (and null as `'null'`). That is a §2.14
    reference-bug class; the engine keeps NULL for NULL — the documented
    intent divergence — and `'true'`/`'false'` for real booleans."""
    return _col(c).cast("string")


def jkt_date(c: str | Column) -> Column:
    """D3+D4 — `moment(x).add(7,'hours').format('YYYY-MM-DD')`. The shift
    and format are null-propagating, so NULL in → NULL out needs no guard."""
    return fmt_date(to_jakarta(_col(c)))


def jkt_datetime(c: str | Column) -> Column:
    """D3+D4 — `...format('YYYY-MM-DD HH:mm:ss')`, null-propagating."""
    return fmt_datetime(to_jakarta(_col(c)))


def jkt_time(c: str | Column) -> Column:
    """D3+D4 — `...format('HH:mm:ss')`, null-propagating."""
    return fmt_time(to_jakarta(_col(c)))
