"""Streaming surface.

The reference has no streaming runtime (SURVEY.md §2.12) — its incremental
semantics are nightly watermark batches. This module gives the engine a real
Structured Streaming path for the same semantics plus the standard windowed
operators over the `events` table, each with an identical batch-mode twin
(plans/queries_streaming.py) that the DuckDB oracle checks.
"""

from com_danliris_service_etl_spark.streaming.jobs import (  # noqa: F401
    run_streaming_windowed_counts,
    streaming_events,
)
