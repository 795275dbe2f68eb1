"""SCD Type-2 lifecycle: bootstrap, change capture, idempotent re-delivery,
new-key insertion, and point-in-time joins over the produced history."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from com_danliris_service_etl_spark.operators.scd import (
    point_in_time_lookup,
    scd2_apply,
    scd2_init,
)

T1 = dt.datetime(2024, 1, 1)
T2 = dt.datetime(2024, 2, 1)
T3 = dt.datetime(2024, 3, 1)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "supplier_id long, city string, tier string, eff timestamp"
    )


def test_scd2_full_lifecycle(spark):
    keys, tracked = ["supplier_id"], ["city", "tier"]

    dim = scd2_init(_batch(spark, [(1, "Bandung", "A", T1), (2, "Jakarta", "B", T1)]), "eff")
    assert {(r.supplier_id, r.is_current) for r in dim.collect()} == {(1, True), (2, True)}

    # batch 2: supplier 1 moves city, supplier 2 unchanged, supplier 3 new
    dim2 = scd2_apply(
        dim,
        _batch(spark, [(1, "Surabaya", "A", T2), (2, "Jakarta", "B", T2), (3, "Medan", "C", T2)]),
        keys, tracked, "eff",
    )
    rows = {(r.supplier_id, r.city, r.is_current, r.valid_from, r.valid_to) for r in dim2.collect()}
    assert (1, "Bandung", False, T1, T2) in rows      # closed at change time
    assert (1, "Surabaya", True, T2, None) in rows    # new open version
    assert (2, "Jakarta", True, T1, None) in rows     # untouched (not re-opened)
    assert (3, "Medan", True, T2, None) in rows       # new key
    assert len(rows) == 4

    # re-delivering batch 2 is a no-op (failed-run retry safety)
    dim2b = scd2_apply(
        dim2,
        _batch(spark, [(1, "Surabaya", "A", T3), (2, "Jakarta", "B", T3), (3, "Medan", "C", T3)]),
        keys, tracked, "eff",
    )
    assert {tuple(r) for r in dim2b.collect()} == {tuple(r) for r in dim2.collect()}


def test_point_in_time_lookup_reproduces_history(spark):
    keys, tracked = ["supplier_id"], ["city", "tier"]
    dim = scd2_init(_batch(spark, [(1, "Bandung", "A", T1)]), "eff")
    dim = scd2_apply(dim, _batch(spark, [(1, "Surabaya", "A", T2)]), keys, tracked, "eff")

    facts = spark.createDataFrame(
        [(100, 1, dt.datetime(2024, 1, 15)), (101, 1, dt.datetime(2024, 2, 15))],
        "fact_id long, supplier_id long, ts timestamp",
    )
    got = {
        (r.fact_id, r.city)
        for r in point_in_time_lookup(facts, dim, keys, "ts").collect()
    }
    # the January fact sees Bandung even though the CURRENT city is Surabaya
    assert got == {(100, "Bandung"), (101, "Surabaya")}
