"""Round-7e registry queries: the two classic TPC-H analytic shapes the
registry's flagship family was missing, plus positional explode.

- a14_shipping_priority — TPC-H Q3: 3-way join, disjoint date
  predicates pushed to both fact scans, grouped revenue, global top-10.
- a15_region_revenue — TPC-H Q5 shape: region→nation→customer dims
  broadcast down onto the orders⋈lineitem fact join.
- e6_posexplode — positional explode (ordinal-preserving flatten),
  completing the explode family's E1-E5 with the WITH ORDINALITY form.

Each query pairs an idiomatic Spark plan with a DuckDB oracle over the
driver's parquet tables (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from com_danliris_service_etl_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# A14 — TPC-H Q3 shipping priority (join + disjoint date bands + top-k)
# ---------------------------------------------------------------------------

_A14_SQL = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


@register("a14_shipping_priority", _A14_SQL)
def a14_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): unshipped revenue of BUILDING-
    segment orders placed before a date, ranked. The plan the optimizer
    should produce and does: both date predicates reach their parquet
    scans (PushedFilters — lineitem rows shipped early never leave the
    scan), the segment-filtered customer key set broadcasts onto
    orders, that result broadcasts onto lineitem, one grouped aggregate,
    and TakeOrderedAndProject for the top-10 (per-partition top-k,
    never a global sort). Revenue is rounded 2dp on BOTH sides before
    the rank so the top-10 boundary is engine-deterministic, with
    (o_orderdate, l_orderkey) completing the total order."""
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    # the filtered-customer DIM broadcasts; the orders side does NOT (a
    # date-banded fact is still a fact at 1000x). The fact⋈fact edge is
    # hinted SHUFFLE_HASH (r14 stage breakdown, BASELINE.md): building a
    # per-partition hash of the smaller banded side beats sorting the
    # 58M-row probe (SMJ) at every measured scale (sf0.1 0.62→0.42 s,
    # sf10 2.6→2.3 s), and stays 100 TB-safe — the build is per
    # REDUCER partition (bounded by shuffle width, which scales with
    # the cluster), never a driver broadcast, and AQE skew-split still
    # applies to shuffled-hash since Spark 3.2.
    j = li.join(
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).hint(
            "shuffle_hash"
        ),
        li["l_orderkey"] == o["o_orderkey"],
    )
    return (
        j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# A15 — TPC-H Q5 shape: revenue by nation within a region
# ---------------------------------------------------------------------------

_A15_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*)::BIGINT AS n_lineitems
FROM region
JOIN nation ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
GROUP BY n_name
"""


@register("a15_region_revenue", _A15_SQL)
def a15_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: per-nation revenue within one region over a date
    band — the canonical star-join rollup. The dimension chain
    (region→nation→customer) collapses to ONE broadcast key set before
    touching facts; the date band is pushed to the orders scan; the
    only shuffle is the final 5-row aggregate. At 100 TB the identical
    plan holds: dims broadcast, facts join key-on-key with AQE picking
    the strategy."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    dims = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("c_custkey", "n_name")
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    # dims broadcast; the date-banded orders side does NOT (fact at
    # 1000x). Fact⋈fact edge hinted SHUFFLE_HASH — same r14 adjudication
    # as a14: per-reducer hash build of the banded side beats sorting
    # the unfiltered lineitem probe, at every scale, without a
    # fact-sized broadcast (BASELINE.md r14 stage breakdown).
    j = li.join(
        o.join(F.broadcast(dims), o["o_custkey"] == dims["c_custkey"]).hint(
            "shuffle_hash"
        ),
        li["l_orderkey"] == o["o_orderkey"],
    )
    return j.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


# ---------------------------------------------------------------------------
# E6 — positional explode (ordinal-preserving flatten)
# ---------------------------------------------------------------------------

_E6_SQL = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
)
SELECT doc_id, CAST(pos AS INT) AS pos, toks[pos] AS tok
FROM d, unnest(range(1, least(len(toks), 5) + 1)) AS r(pos)
"""


@register("e6_posexplode", _E6_SQL)
def e6_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode — the flatten that keeps each element's
    ordinal (E1-E5 lose it): the first five tokens of every document
    with their 1-based positions, the lead-text feature a quality
    classifier reads. Spark's `posexplode` emits (pos, element) in one
    generator (no join back to recover order); the oracle states the
    same relation as a correlated lateral unnest over the index
    range."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.slice(F.split("text", " "), 1, 5).alias("toks")
    )
    return d.select(
        "doc_id", F.posexplode("toks").alias("pos0", "tok")
    ).select(
        "doc_id", (F.col("pos0") + 1).cast("int").alias("pos"), "tok"
    )
