"""The reference's 22 ETL pipelines (+ the migration-log sync) as
declarative JobSpecs over the engine's operator library (SURVEY.md §7.2
steps 1-6).

Every job is the same protocol (`plans/jobs.py`): read watermark → build
the extract/join/transform plan → MERGE into the fact target → advance the
watermark on success. `ALL_SPECS` is keyed by the reference's migration-log
description strings, so a reference user can run the same nightly set by
name.
"""

from __future__ import annotations

from com_danliris_service_etl_spark.jobs import (
    control,
    deal,
    garment,
    inventory,
    production,
    purchasing,
    qc,
    sales,
)
from com_danliris_service_etl_spark.plans.jobs import JobSpec

ALL_SPECS: dict[str, JobSpec] = {
    spec.name: spec
    for module in (inventory, production, sales, deal, purchasing, qc, garment, control)
    for spec in module.SPECS
}
