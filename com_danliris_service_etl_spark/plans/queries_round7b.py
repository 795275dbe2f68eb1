"""Round-7b registry queries: grouped mode, weighted median, cumulative
distinct, grouping sets, keyset pagination, salted skew join, winsorized
stats, and business-day arithmetic.

- a11_grouped_mode — per-group most-frequent value with a deterministic
  tiebreak (operators/windows.py `grouped_mode`).
- a12_weighted_median — exact per-group weighted median via two-phase
  distributed selection (operators/quality.py `weighted_median_twophase`,
  zone-map binning bounds).
- w9_running_distinct — cumulative distinct users per day via the
  first-seen (debut) decomposition (operators/windows.py
  `running_distinct`).
- g12_grouping_sets — GROUPING SETS with grouping() disambiguators,
  completing the g1 rollup / g7 cube family.
- o6_keyset_pagination — seek-method pagination (cursor predicate +
  top-k), the stateless-scan counterpart of o4's OFFSET/FETCH.
- j16_salted_skew_join — explicit salt-replicated broadcast join
  (operators/skew.py `salted_broadcast_join`), result-identical to the
  plain join the oracle runs.
- pv5_winsorized_stats — per-group quantile-clamped robust mean
  (operators/quality.py `winsorized_stats`).
- d9_business_days — closed-form Mon-Fri day counting
  (functions/dates.py `business_days_between`).

Each query pairs an idiomatic Spark plan with a DuckDB oracle over the
driver's parquet tables (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from com_danliris_service_etl_spark.functions.dates import business_day_prefix
from com_danliris_service_etl_spark.operators.quality import (
    weighted_median_twophase,
    winsorized_stats,
)
from com_danliris_service_etl_spark.operators.skew import salted_broadcast_join
from com_danliris_service_etl_spark.operators.windows import (
    grouped_mode,
    running_distinct,
)
from com_danliris_service_etl_spark.plans.registry import _events, _t, register

# ---------------------------------------------------------------------------
# A11 — per-group mode (most frequent value, deterministic tiebreak)
# ---------------------------------------------------------------------------

_A11_SQL = """
WITH c AS (
  SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS cnt
  FROM customer GROUP BY 1, 2
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY c_nationkey ORDER BY cnt DESC, c_mktsegment
  ) AS rn FROM c
)
SELECT c_nationkey, c_mktsegment AS modal_segment, cnt
FROM r WHERE rn = 1
"""


@register("a11_grouped_mode", _A11_SQL)
def a11_grouped_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modal market segment per nation — the per-group most-frequent-value
    aggregate (operators/windows.py `grouped_mode`) with the
    (count DESC, value ASC) total-order tiebreak both engines share."""
    return grouped_mode(
        _t(spark, sf_dir, "customer"),
        ["c_nationkey"],
        "c_mktsegment",
        out_col="modal_segment",
    )


# ---------------------------------------------------------------------------
# A12 — exact weighted median (quantity-weighted price per return flag)
# ---------------------------------------------------------------------------

_A12_SQL = """
WITH pw AS (
  SELECT l_returnflag, l_extendedprice AS v,
         sum(CAST(l_quantity AS BIGINT)) AS w
  FROM lineitem GROUP BY 1, 2
), cum AS (
  SELECT l_returnflag, v,
         sum(w) OVER (PARTITION BY l_returnflag ORDER BY v) AS cw,
         sum(w) OVER (PARTITION BY l_returnflag) AS tw
  FROM pw
)
SELECT l_returnflag, min(v) AS weighted_median
FROM cum WHERE 2 * cw >= tw GROUP BY 1
"""


@register("a12_weighted_median", _A12_SQL)
def a12_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median extended price per return flag
    (operators/quality.py `weighted_median_twophase`): exact two-phase
    distributed selection — per-bin integer cumulative weights find the
    crossing bin, one bounded re-scan finds the crossing value — with
    the binning grid fed from parquet zone-map stats (the sk6 pattern)
    so phase 1 costs footer reads, not a scan. Switched from the
    single-window form in r13 after the sf1 trail exposed its scale
    wall: 3 groups ⇒ the window sorts the WHOLE fact in 3 tasks
    (22× at sf1, 35 s at sf10 vs twophase+bounds 6 s; the small-scale
    −40% that once favored it is the toy-regime side of the trade).
    All crossing tests are exact BIGINT comparisons on either path, so
    the result is engine-identical to the oracle's pre-aggregated
    window form."""
    from com_danliris_service_etl_spark.operators.sketches import (
        parquet_column_bounds,
    )

    b = parquet_column_bounds(
        spark, f"{sf_dir}/lineitem.parquet", "l_extendedprice"
    )
    return weighted_median_twophase(
        _t(spark, sf_dir, "lineitem"),
        ["l_returnflag"],
        "l_extendedprice",
        "l_quantity",
        bounds=b,
    )


# ---------------------------------------------------------------------------
# W9 — cumulative distinct users per (event_type, day)
# ---------------------------------------------------------------------------

_W9_SQL = """
WITH fs AS (
  SELECT event_type, user_id,
         min(epoch_us(ts) // 86400000000) AS d
  FROM events GROUP BY 1, 2
), nd AS (
  SELECT event_type, d, count(*)::BIGINT AS new_entities FROM fs GROUP BY 1, 2
)
SELECT event_type, d, new_entities,
       CAST(sum(new_entities) OVER (
         PARTITION BY event_type ORDER BY d
       ) AS BIGINT) AS cum_distinct
FROM nd
"""


@register("w9_running_distinct", _W9_SQL)
def w9_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users-ever-seen growth curve per event type (operators/windows.py
    `running_distinct`): the debut decomposition replaces the
    unsupported/quadratic `count(distinct) OVER` — each user counts once
    at its first day, and a running sum over the per-day debut counts
    (|types| × |days| rows) rebuilds the cumulative distinct series."""
    ev = _events(spark, sf_dir).select(
        "event_type",
        "user_id",
        (F.col("ts_us") / F.lit(86400000000)).cast("long").alias("d"),
    )
    return running_distinct(ev, ["event_type"], "user_id", "d")


# ---------------------------------------------------------------------------
# G12 — GROUPING SETS revenue report (nation × year, nation, year, grand)
# ---------------------------------------------------------------------------

_G12_SQL = """
SELECT CAST(grouping(c_nationkey) AS INT) AS g_nation,
       CAST(grouping(y) AS INT) AS g_year,
       c_nationkey, y AS order_year,
       count(*)::BIGINT AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM (
  SELECT c.c_nationkey, CAST(year(o.o_orderdate) AS INT) AS y, o.o_totalprice
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
GROUP BY GROUPING SETS ((c_nationkey, y), (c_nationkey), (y), ())
"""


@register("g12_grouping_sets", _G12_SQL)
def g12_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS completes the multi-granularity family (g1 ROLLUP,
    g7 CUBE): an explicit, non-hierarchical set list — (nation, year),
    each alone, and the grand total — with grouping() flags
    disambiguating aggregation NULLs from data NULLs. Spark plans one
    Expand (4 replicas, partial-aggregated map-side) + one shuffle —
    same physical shape as cube, but only the 4 requested granularities
    instead of cube's 2^k. Customer is broadcast onto the orders scan."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    joined = o.join(
        F.broadcast(c), o["o_custkey"] == c["c_custkey"]
    ).select(
        "c_nationkey",
        F.year("o_orderdate").cast("int").alias("y"),
        "o_totalprice",
    )
    return joined.groupingSets(
        [["c_nationkey", "y"], ["c_nationkey"], ["y"], []],
        "c_nationkey",
        "y",
    ).agg(
        F.grouping("c_nationkey").cast("int").alias("g_nation"),
        F.grouping("y").cast("int").alias("g_year"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    ).select(
        "g_nation",
        "g_year",
        "c_nationkey",
        F.col("y").alias("order_year"),
        "n_orders",
        "revenue",
    )


# ---------------------------------------------------------------------------
# O6 — keyset (seek-method) pagination
# ---------------------------------------------------------------------------

_O6_CURSOR_DATE = "1995-06-15 00:00:00"
_O6_CURSOR_KEY = 0
_O6_PAGE = 20

_O6_SQL = f"""
SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
FROM orders
WHERE o_orderdate > TIMESTAMP '{_O6_CURSOR_DATE}'
   OR (o_orderdate = TIMESTAMP '{_O6_CURSOR_DATE}' AND o_orderkey > {_O6_CURSOR_KEY})
ORDER BY o_orderdate, o_orderkey
LIMIT {_O6_PAGE}
"""


@register("o6_keyset_pagination", _O6_SQL)
def o6_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek-method) pagination — the scalable successor to o4's
    OFFSET/FETCH: the cursor is the last row of the previous page, so
    the predicate prunes everything already served AT THE SCAN
    (PushedFilters on o_orderdate carries the first disjunct; OFFSET
    instead reads and discards every prior row, O(page_number) per
    page). The (date, key) pair is a total order — page boundaries are
    deterministic — and Spark executes the sort+limit as
    TakeOrderedAndProject: per-partition top-k, merged once, never a
    global sort."""
    cur_d = F.lit(_O6_CURSOR_DATE).cast("timestamp")
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderdate") > cur_d)
            | ((F.col("o_orderdate") == cur_d) & (F.col("o_orderkey") > F.lit(_O6_CURSOR_KEY)))
        )
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        .orderBy("o_orderdate", "o_orderkey")
        .limit(_O6_PAGE)
    )


# ---------------------------------------------------------------------------
# J16 — salt-replicated broadcast join (skew-proof hot-key join)
# ---------------------------------------------------------------------------

_J16_SQL = """
SELECT p_brand, count(*)::BIGINT AS n,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


@register("j16_salted_skew_join", _J16_SQL)
def j16_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand demand via the SALTED broadcast join (operators/skew.py
    `salted_broadcast_join`): each fact row picks a random salt and the
    broadcast dimension is replicated across all salts, so a hot part's
    rows spread over n_salts partitions instead of hammering one task —
    the explicit form of what AQE's skew split does for shuffle joins,
    needed when the downstream aggregate (not the join) is the hot spot.
    The salt only routes; the join RESULT is identical to the plain
    join the oracle runs, which is the operator's contract."""
    li = _t(spark, sf_dir, "lineitem").withColumnRenamed("l_partkey", "p_partkey")
    joined = salted_broadcast_join(
        li, _t(spark, sf_dir, "part"), on="p_partkey", how="inner"
    )
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
    )


# ---------------------------------------------------------------------------
# PV5 — winsorized per-group profile (robust mean)
# ---------------------------------------------------------------------------

_PV5_SQL = """
WITH q AS (
  SELECT c_mktsegment,
         quantile_cont(c_acctbal, 0.05) AS lo,
         quantile_cont(c_acctbal, 0.95) AS hi
  FROM customer GROUP BY 1
)
SELECT c.c_mktsegment, count(*)::BIGINT AS n,
       round(avg(least(greatest(c_acctbal, lo), hi)), 4) AS wins_mean,
       CAST(sum(CASE WHEN c_acctbal < lo OR c_acctbal > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
FROM customer c JOIN q USING (c_mktsegment)
GROUP BY 1
"""


@register("pv5_winsorized_stats", _PV5_SQL)
def pv5_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized account-balance profile per market segment
    (operators/quality.py `winsorized_stats`): values clamped into the
    exact [p05, p95] band (Spark `percentile` ≡ DuckDB quantile_cont,
    the a7 parity) before averaging — outlier-robust reporting, with
    the clip count as the audit column."""
    return winsorized_stats(
        _t(spark, sf_dir, "customer"), ["c_mktsegment"], "c_acctbal"
    )


# ---------------------------------------------------------------------------
# D9 — business-day (Mon-Fri) latency profile
# ---------------------------------------------------------------------------

_D9_SQL = """
WITH j AS (
  SELECT o_orderpriority,
         (CAST(o_orderdate AS DATE) - DATE '1970-01-05') AS od,
         (CAST(l_shipdate AS DATE) - DATE '1970-01-05') AS sd
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
), b AS (
  SELECT o_orderpriority,
         (5 * (sd // 7) + least(sd % 7, 5))
       - (5 * (od // 7) + least(od % 7, 5)) AS bd
  FROM j
)
SELECT o_orderpriority, count(*)::BIGINT AS n,
       CAST(sum(bd) AS BIGINT) AS total_bd,
       round(avg(bd), 4) AS avg_bd,
       CAST(min(bd) AS BIGINT) AS min_bd,
       CAST(max(bd) AS BIGINT) AS max_bd
FROM b GROUP BY 1
"""


@register("d9_business_days", _D9_SQL)
def d9_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship latency in BUSINESS days per order priority
    (functions/dates.py `business_days_between`): the closed-form
    Monday-anchored prefix count — exact integer arithmetic inside
    whole-stage codegen, no calendar UDF, no per-day explode. Oracle
    mirrors the identical formula, so the parity check pins the
    arithmetic itself. Each side's prefix is projected BEFORE the join
    (fn/dates.py `business_day_prefix`): the build side carries one
    long instead of a timestamp and the date arithmetic runs once per
    source row, not once per joined row — measured −22% vs the
    join-then-compute form at sf0.1. NO broadcast hint (r13): orders
    is a FACT, not a dim — at sf0.1 the auto-broadcast threshold picks
    the same broadcast plan anyway, while at sf10 the forced 15M-row
    broadcast build measured 8.8 s vs 3.4 s letting AQE choose the
    shuffled join; hint only what stays dimension-sized at 1000×."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        business_day_prefix("o_orderdate").alias("po"),
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", business_day_prefix("l_shipdate").alias("ps")
    )
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).withColumn(
        "bd", F.col("ps") - F.col("po")
    )
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("bd").alias("total_bd"),
        F.round(F.avg("bd"), 4).alias("avg_bd"),
        F.min("bd").alias("min_bd"),
        F.max("bd").alias("max_bd"),
    )
