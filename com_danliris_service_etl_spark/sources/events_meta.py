"""Events-table physical-type dispatch, shared by the batch and streaming
read paths.

The driver's `events.parquet` fixture has shipped with three different
physical types for `ts` across generations:

- TIMESTAMP(MICROS, isAdjustedToUTC=false)  → Spark TIMESTAMP_NTZ
- TIMESTAMP(MICROS, isAdjustedToUTC=true)   → Spark TIMESTAMP
- legacy TIMESTAMP(NANOS)                   → unreadable by Spark unless
  `spark.sql.legacy.parquet.nanosAsLong` surfaces it as a plain BIGINT

Both `plans/registry.py::_events` (batch) and `streaming/jobs.py`
(readStream, which needs an explicit schema up front) must agree on the
dispatch, so the footer inspection lives here once. The footer is read with
pyarrow — no SparkSession, no session-config mutation for the common
(micros) case; the nanosAsLong conf is only set when a NANOS fixture is
actually present.
"""

from __future__ import annotations

import glob
import os
from functools import lru_cache

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@lru_cache(maxsize=None)
def events_ts_kind(sf_dir: str) -> str:
    """'micros' | 'ntz' | 'nanos' — the physical flavor of events.ts,
    resolved from the parquet footer (cached per directory; fixtures are
    immutable within a round).

    DRIVER-LOCAL BY DESIGN: the footer is read with pyarrow through the
    driver's filesystem, so ``sf_dir`` must be a local (or fuse-mounted)
    fixture path — which is the tool's whole scope: a schema probe over
    the test fixtures. Production readers don't probe; they declare their
    schema (streaming) or let Spark infer from the scheme-resolved store
    (batch). Remote-scheme store probes belong to `sources/fsutil.py`."""
    path = f"{sf_dir}/events.parquet"
    if os.path.isdir(path):
        parts = sorted(glob.glob(f"{path}/*.parquet"))
        if not parts:
            raise FileNotFoundError(f"no parquet parts under {path}")
        path = parts[0]
    import pyarrow.parquet as pq

    field = pq.read_schema(path).field("ts")
    t = field.type
    unit = getattr(t, "unit", None)
    if unit == "ns":
        return "nanos"
    if unit == "us" and t.tz is None:
        return "ntz"
    return "micros"


def events_spark_ts_type(kind: str) -> T.DataType:
    """The Spark type `ts` surfaces as, per kind (nanos arrives as BIGINT
    via the nanosAsLong legacy conf)."""
    return {
        "nanos": T.LongType(),
        "ntz": T.TimestampNTZType(),
        "micros": T.TimestampType(),
    }[kind]


def events_ts_us_expr(kind: str) -> F.Column:
    """`ts` → epoch-MICROS BIGINT, the representation Spark and DuckDB
    agree on exactly (oracle side: ``epoch_us(ts)``).

    The NTZ branch converts via ``timestampdiff`` against an NTZ epoch
    literal, which is session-timezone-independent (the driver session's
    tz is unknown)."""
    if kind == "nanos":
        return F.expr("ts div 1000")
    if kind == "ntz":
        return F.expr(
            "timestampdiff(MICROSECOND,"
            " CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ), ts)"
        )
    return F.unix_micros(F.col("ts"))


def configure_session_for_events(spark: SparkSession, sf_dir: str) -> str:
    """Resolve the fixture's ts kind and — ONLY for a legacy NANOS fixture —
    set the runtime conf Spark needs to read it at all. Returns the kind.

    Confining the conf mutation to the nanos case keeps the common path
    free of session side effects (the conf is a no-op for micros data but
    mutating a caller's session unasked is a surprising contract)."""
    kind = events_ts_kind(sf_dir)
    if kind == "nanos":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return kind
