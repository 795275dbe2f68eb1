"""Operator library — relational + LLM-data-pipeline operators.

Relational operators mirror SURVEY.md §2 (joins, windows, explodes);
the dedup/similarity/text/multimodal modules are the scale extensions a
100 TB training-data pipeline needs (BASELINE.json north star).
"""

from com_danliris_service_etl_spark.operators.joins import (  # noqa: F401
    asof_join,
    first_match_join,
    latest_per_key,
)
