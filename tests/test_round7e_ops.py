"""Round-7e queries: TPC-H Q3/Q5 shapes and positional explode —
semantic properties beyond the oracle parity test."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_shipping_priority_rows_satisfy_all_predicates(spark):
    from com_danliris_service_etl_spark.plans.registry import load_all
    from tests.conftest import SF_DIR

    fn, _ = load_all()["a14_shipping_priority"]
    rows = fn(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 10
    # ranked by rounded revenue descending
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    # every surviving order is a BUILDING-segment order placed pre-cutoff
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    keys = {r.l_orderkey for r in rows}
    checked = (
        o.filter(F.col("o_orderkey").isin(list(keys)))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_mktsegment", "o_orderdate")
        .collect()
    )
    assert {r.o_orderkey for r in checked} == keys
    for r in checked:
        assert r.c_mktsegment == "BUILDING"
        assert r.o_orderdate.isoformat() < "1995-03-15"


def test_region_revenue_covers_exactly_the_region_nations(spark):
    from com_danliris_service_etl_spark.plans.registry import load_all
    from tests.conftest import SF_DIR

    fn, _ = load_all()["a15_region_revenue"]
    got = {r.n_name: r.revenue for r in fn(spark, SF_DIR).collect()}
    n = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    r = spark.read.parquet(f"{SF_DIR}/region.parquet").filter(
        F.col("r_name") == "ASIA"
    )
    asia_nations = {
        row.n_name
        for row in n.join(r, n["n_regionkey"] == r["r_regionkey"]).collect()
    }
    # every reported nation is in ASIA and had revenue; all positive
    assert set(got) <= asia_nations and got
    assert all(v > 0 for v in got.values())


def test_posexplode_positions_are_ordinal(spark):
    df = spark.createDataFrame([(1, "a b c d e f g"), (2, "x")], "doc_id long, text string")
    out = (
        df.select("doc_id", F.slice(F.split("text", " "), 1, 5).alias("t"))
        .select("doc_id", F.posexplode("t").alias("pos0", "tok"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
        .collect()
    )
    got = {(r.doc_id, r.pos): r.tok for r in out}
    assert got == {
        (1, 1): "a", (1, 2): "b", (1, 3): "c", (1, 4): "d", (1, 5): "e",
        (2, 1): "x",
    }  # capped at 5, ordinals 1-based, short docs keep their length
