"""Footer-driven events-timestamp dispatch (sources/events_meta.py).

The driver's events.parquet has shipped with three physical types for
`ts` across rounds (legacy NANOS, MICROS-NTZ, MICROS-UTC); a hardcoded
schema fails at read time on a regenerated fixture. These tests build a
tiny fixture of EACH generation with pyarrow and pin that batch
(`_events`) and streaming (`events_schema`) read paths both resolve the
kind from the footer and produce identical epoch-micros values.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from com_danliris_service_etl_spark.sources.events_meta import (
    events_spark_ts_type,
    events_ts_kind,
)

# one known instant: 2024-03-01 12:30:45.123456 UTC
_EPOCH_US = 1_709_296_245_123_456


def _write_events(tmp_path, ts_array: pa.Array) -> str:
    sf_dir = str(tmp_path)
    table = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([7], pa.int64()),
            "event_type": pa.array(["click"], pa.string()),
            "value": pa.array([1.5], pa.float64()),
            "props": pa.array(["{}"], pa.string()),
        }
    )
    pq.write_table(table, f"{sf_dir}/events.parquet")
    return sf_dir


_GENERATIONS = {
    "nanos": pa.array([_EPOCH_US * 1000], pa.timestamp("ns")),
    "ntz": pa.array([_EPOCH_US], pa.timestamp("us")),
    "micros": pa.array([_EPOCH_US], pa.timestamp("us", tz="UTC")),
}


@pytest.mark.parametrize("kind", sorted(_GENERATIONS))
def test_kind_detected_from_footer(tmp_path, kind):
    sf_dir = _write_events(tmp_path, _GENERATIONS[kind])
    assert events_ts_kind(sf_dir) == kind
    # the streaming schema's ts field follows the kind
    from com_danliris_service_etl_spark.streaming.jobs import events_schema

    assert events_schema(sf_dir)["ts"].dataType == events_spark_ts_type(kind)


@pytest.mark.parametrize("kind", sorted(_GENERATIONS))
def test_batch_read_normalizes_to_epoch_micros(spark, tmp_path, kind):
    sf_dir = _write_events(tmp_path, _GENERATIONS[kind])
    from com_danliris_service_etl_spark.plans.registry import _events

    row = _events(spark, sf_dir).select("event_id", "ts_us").collect()[0]
    assert row.ts_us == _EPOCH_US, kind


@pytest.mark.parametrize("kind", sorted(_GENERATIONS))
def test_streaming_read_normalizes_to_epoch_micros(spark, tmp_path, kind):
    from com_danliris_service_etl_spark.streaming.jobs import streaming_events

    sf_dir = _write_events(tmp_path, _GENERATIONS[kind])
    ev = streaming_events(spark, sf_dir).select("event_id", "ts_us")
    q = (
        ev.writeStream.outputMode("append")
        .format("memory")
        .queryName(f"ev_meta_{kind}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(f"ev_meta_{kind}").collect()
    assert len(rows) == 1 and rows[0].ts_us == _EPOCH_US, kind
