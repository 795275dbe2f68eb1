"""Round-9 registry queries.

a23_returned_items closes the last distinct decision-support shape the
driver fixture supports (VERDICT r8 task 6): the TPC-H Q10 returned-item
report — one quarter's orders x customers whose lineitems came back
(`l_returnflag = 'R'`), revenue-ranked top 20. Q14 reduces to a20's
CASE-in-sum, and Q2/Q9/Q16 need a partsupp table the fixture does not
carry (COVERAGE.md records that closure).

Reference provenance: the reference's sales dashboards rank customers by
returned/credited value over a period (the SC-family facts,
`Connection/Sales/*`); this is that panel as one set-at-a-time plan.

Determinism notes (cross-engine hash gate):
- revenue = sum(l_extendedprice * (1 - l_discount)) is rounded 2dp on
  both sides BEFORE the rank; the top-20 cut is totally ordered by
  (revenue_2dp DESC, c_custkey) so the boundary row is engine-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from com_danliris_service_etl_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# A23 — returned-item revenue report (TPC-H Q10 shape)
# ---------------------------------------------------------------------------

_A23_SQL = """
WITH rev AS (
  SELECT o_custkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         count(*)::BIGINT AS n_items
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
  GROUP BY o_custkey)
SELECT c_custkey, c_name, n_name, revenue,
       round(c_acctbal, 2) AS acctbal, n_items
FROM rev
JOIN customer ON c_custkey = o_custkey
JOIN nation   ON n_nationkey = c_nationkey
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("a23_returned_items", _A23_SQL)
def a23_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue lost to returned items in one quarter
    (TPC-H Q10 shape) — the returned-items report panel.

    Scale shape: the returnflag filter and the 4-column projection push
    to the lineitem scan; the quarter band pushes to the orders scan.
    ONE fact-fact shuffle join (lineitem ⋈ orders on orderkey), then the
    aggregate collapses to per-customer grain BEFORE any dimension
    joins — the customer join probes with |active customers in the
    quarter| rows, not the fact. Customer is the fact-sized-dimension
    class (a20 discipline): no explicit broadcast hint — AQE broadcasts
    it at fixture scale and shuffles at 100 TB; nation broadcasts
    unconditionally. The top-20 is TakeOrderedAndProject (bounded
    driver-side), totally ordered by (revenue 2dp DESC, c_custkey)."""
    band_lo = F.lit("1995-10-01 00:00:00").cast("timestamp")
    band_hi = F.lit("1996-01-01 00:00:00").cast("timestamp")
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= band_lo) & (F.col("o_orderdate") < band_hi))
        .select("o_orderkey", "o_custkey")
    )
    rev = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        rev.join(c, rev["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_items",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )
