"""The correctness gate, locally: every registry query runs on Spark and on
the DuckDB oracle at sf0.001; results must match order-insensitively.
Queries without an oracle get a rows-run smoke check (same as the driver's
weaker rows-only path)."""

from __future__ import annotations

import pytest

from com_danliris_service_etl_spark.plans.registry import load_all

REGISTRY = load_all()
from tests.conftest import SF_DIR, assert_frames_match


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, oracle):
    fn, sql = REGISTRY[name]
    sdf = fn(spark, SF_DIR).toPandas()
    if sql is None:
        assert sdf is not None  # rows-only smoke: it ran and produced a frame
        return
    odf = oracle.execute(sql).df()
    assert_frames_match(sdf, odf, name)
