"""Structured Streaming ≡ batch equivalence for the windowed aggregation."""

from __future__ import annotations

from com_danliris_service_etl_spark.plans.registry import load_all
from com_danliris_service_etl_spark.streaming.jobs import run_streaming_windowed_counts
from tests.conftest import SF_DIR, assert_frames_match

load_all()


def test_streaming_matches_batch(spark):
    from com_danliris_service_etl_spark.plans.queries_streaming import st1_tumbling_window

    stream_out = run_streaming_windowed_counts(spark, SF_DIR, "st_eq_test").toPandas()
    batch_out = st1_tumbling_window(spark, SF_DIR).toPandas()
    assert_frames_match(stream_out, batch_out, "streaming_vs_batch")
