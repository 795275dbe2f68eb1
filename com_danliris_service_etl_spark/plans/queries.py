"""Driver-facing query registry: SURVEY.md §2 operator inventory expressed
over the standard test tables (TESTDATA.md), each paired with a DuckDB
oracle SQL producing identical column names and values.

Conventions (the correctness gate hashes values with columns sorted by
name — BASELINE.md):
- every computed column is aliased identically in Spark and SQL;
- double *aggregates* are rounded (sum→2dp, avg→4-6dp) because summation
  order differs across engines; raw IEEE arithmetic (products, subtractions)
  is bit-deterministic and left unrounded;
- every window/first-match/top-k has a total-order tiebreak (SURVEY §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from com_danliris_service_etl_spark.functions import (
    bucket_days_month,
    bucket_days_week,
    category_bahan_baku,
    category_garment,
    clamp_min_date,
    concat_ws_nullsafe,
    day_diff,
    epoch_millis_time_of_day,
    fmt_date,
    fmt_datetime,
    minute_diff,
    nan_guard,
    null_guard,
    on_time_status,
    quote_sanitize,
    repair_year_typos,
    to_jakarta,
    truncate,
    uom_to_meter,
    weighted_score,
)
from com_danliris_service_etl_spark.operators.explode import (
    explode_inner,
    explode_left,
    nest_children,
)
from com_danliris_service_etl_spark.operators.joins import (
    asof_join,
    first_match_join,
    latest_per_key,
)
from com_danliris_service_etl_spark.operators.windows import (
    last_in_group,
    ordinal_index,
    surrogate_key,
)

from com_danliris_service_etl_spark.plans.registry import (
    REGISTRY,
    _events,
    _t,
    register,
)


# ---------------------------------------------------------------------------
# Flagship / generic aggregation (SURVEY §2.4; TPC-H Q1 shape)
# ---------------------------------------------------------------------------


@register(
    "a0_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 6)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a0_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: scan → filter → groupBy → 8 aggregates. Filter and the
    2-column grouping push down to the parquet scan; partial aggregation is
    map-side so the shuffle carries only group states."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Projections / filters / predicates (SURVEY §2.2)
# ---------------------------------------------------------------------------


@register(
    "p1_projection_alias",
    """
    SELECT l_orderkey AS okey, l_linenumber AS line_no,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    """,
)
def p1_projection_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 — explicit column projection with aliasing (`Pembelian/run.js:125-164`).
    Catalyst prunes the parquet ReadSchema to the three referenced columns."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("line_no"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
    )


@register(
    "p2_incremental_watermark",
    """
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders WHERE o_orderdate > TIMESTAMP '1996-06-30'
    """,
)
def p2_incremental_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/S4 — watermark predicate `lastmodifiedutc > :wm`
    (`Pembelian/run.js:166`). Pushed to the parquet scan (min/max skipping);
    on a date-partitioned 100 TB fact this is partition pruning."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") > F.lit("1996-06-30").cast("timestamp"))
        .select("o_orderkey", "o_orderdate", "o_totalprice")
    )


@register(
    "p4_exclusion_filter",
    """
    SELECT c_custkey, c_name, c_mktsegment FROM customer
    WHERE c_mktsegment NOT IN ('AUTOMOBILE', 'MACHINERY')
    """,
)
def p4_exclusion_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 — `createdby not in ('dev','unit-test')` exclusion
    (`Pembelian/run.js:166-167`) over the test-data segment column."""
    c = _t(spark, sf_dir, "customer")
    return c.filter(~F.col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY")).select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "p6_semi_join",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def p6_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 — the reference ships parent-id IN-lists to child queries
    (`GarmentPembelian/run.js:327`); Spark plans it as a left-semi join —
    at scale this becomes a runtime (bloom/DPP) filter, no id plumbing."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.join(o, "c_custkey", "left_semi").select("c_custkey", "c_name")


@register(
    "p7_empty_string_guard",
    """
    SELECT doc_id,
           CASE WHEN length(trim(text)) > 0 THEN lang END AS lang_checked,
           n_chars
    FROM documents
    """,
)
def p7_empty_string_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 — `x && x !== ''` guard (`FabricQC/run.js:126-166`)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        null_guard(F.length(F.trim(F.col("text"))) > 0, F.col("lang")).alias("lang_checked"),
        "n_chars",
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# ---------------------------------------------------------------------------


@register(
    "j1_multiway_left_join",
    """
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderdate, c.c_name, n.n_name, r.r_name
    FROM lineitem l
    LEFT JOIN orders o   ON o.o_orderkey  = l.l_orderkey
    LEFT JOIN customer c ON c.c_custkey   = o.o_custkey
    LEFT JOIN nation n   ON n.n_nationkey = c.c_nationkey
    LEFT JOIN region r   ON r.r_regionkey = n.n_regionkey
    """,
)
def j1_multiway_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — the reference's 10-table LEFT JOIN chain (`Pembelian/run.js:165`)
    as a declarative 5-way chain. Catalyst broadcast-joins the small dims
    (customer/nation/region) and sort-merge-joins lineitem⨝orders; AQE
    re-plans to broadcast at runtime when a side is small."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "left")
        .join(c, o.o_custkey == c.c_custkey, "left")
        .join(n, c.c_nationkey == n.n_nationkey, "left")
        .join(r, n.n_regionkey == r.r_regionkey, "left")
        .select("l_orderkey", "l_linenumber", "o_orderdate", "c_name", "n_name", "r_name")
    )


@register(
    "j2_inner_join",
    """
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def j2_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — inner join (`DailyOperation/run.js:128`)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@register(
    "j3_broadcast_dim_join",
    """
    SELECT c.c_custkey, c.c_name, n.n_name, r.r_name
    FROM customer c
    LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
    LEFT JOIN region r ON r.r_regionkey = n.n_regionkey
    """,
)
def j3_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — the reference loads small dims fully and probes in-process
    (`Pembelian/run.js:183-199`); here an explicit broadcast hash join —
    the dim ships to every executor once, no shuffle of the fact side."""
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey, "left")
        .join(r, n.n_regionkey == r.r_regionkey, "left")
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@register(
    "j6_first_match_join",
    """
    SELECT o.o_orderkey, o.o_orderdate, l.first_partkey, l.first_qty
    FROM orders o LEFT JOIN (
      SELECT l_orderkey AS o_orderkey, l_partkey AS first_partkey, l_quantity AS first_qty
      FROM (SELECT l_orderkey, l_partkey, l_quantity,
                   row_number() OVER (PARTITION BY l_orderkey
                                      ORDER BY l_linenumber, l_partkey, l_quantity) AS rn
            FROM lineitem)
      WHERE rn = 1
    ) l USING (o_orderkey)
    """,
)
def j6_first_match_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 — first-match join with an explicit deterministic tiebreak
    (`ProductionOrderStatus/run.js:118` keeps DB-order-first; we require
    ORDER BY l_linenumber, l_partkey)."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.col("l_partkey").alias("first_partkey"),
        F.col("l_quantity").alias("first_qty"),
        "l_linenumber",
    )
    out = first_match_join(
        o,
        li,
        on="o_orderkey",
        order_by=[F.col("l_linenumber"), F.col("first_partkey"), F.col("first_qty")],
    )
    return out.select("o_orderkey", "o_orderdate", "first_partkey", "first_qty")


@register(
    "j7_asof_join",
    """
    WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
               WHERE event_type = 'purchase'),
         c AS (SELECT user_id, epoch_us(ts) AS click_ts_us, event_id AS click_id,
                      value AS click_value
               FROM events WHERE event_type = 'click'),
         j AS (SELECT p.event_id, p.user_id, p.ts_us, c.click_ts_us, c.click_value,
                      row_number() OVER (PARTITION BY p.event_id
                                         ORDER BY c.click_ts_us DESC, c.click_id DESC) AS rn
               FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.click_ts_us <= p.ts_us)
    SELECT event_id, user_id, ts_us, click_ts_us, click_value FROM j WHERE rn = 1
    """,
)
def j7_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 — as-of (point-in-time) join: for each purchase, the latest prior
    click by the same user. Mirrors the currency-rate-as-of-DO-date join
    (`GarmentTotalHutang/run.js:122-124`)."""
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts_us")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts_us").alias("click_ts_us"),
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
    )
    out = asof_join(
        purchases,
        clicks,
        left_on="ts_us",
        right_on="click_ts_us",
        by=[("user_id", "user_id")],
        direction="backward",
        tiebreak="click_id",
    )
    return out.select("event_id", "user_id", "ts_us", "click_ts_us", "click_value")


# ---------------------------------------------------------------------------
# Aggregations / windows (SURVEY §2.4, §2.5)
# ---------------------------------------------------------------------------


@register(
    "a1_latest_per_key",
    """
    SELECT user_id, event_id AS last_event_id, epoch_us(ts) AS last_ts_us,
           event_type AS last_type
    FROM (SELECT user_id, event_id, ts, event_type,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
)
def a1_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — latest-record-per-group argmax (`MigrationLogFunc/index.js:33-41`)."""
    ev = _events(spark, sf_dir)
    out = latest_per_key(ev, "user_id", max_of=["ts_us", "event_id"])
    return out.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("ts_us").alias("last_ts_us"),
        F.col("event_type").alias("last_type"),
    )


@register(
    "a2_max_per_key",
    """
    SELECT user_id, max(epoch_us(ts)) AS max_ts_us, count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events GROUP BY user_id
    """,
)
def a2_max_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — max-per-key watermark aggregate (`Pembelian/run.js:44-46`)."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.max("ts_us").alias("max_ts_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@register(
    "a3_weighted_score",
    """
    SELECT p_partkey,
           CASE WHEN p_size = 10
                THEN p_retailprice * 1 + p_retailprice * 3 + p_retailprice * 5 + p_size * 10
           END AS score
    FROM part
    """,
)
def a3_weighted_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — weighted linear score gated on a point system (`FabricQC/run.js:120-124`)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        weighted_score(
            "p_retailprice", "p_retailprice", "p_retailprice", "p_size", "p_size"
        ).alias("score"),
    )


@register(
    "a4_surrogate_key",
    """
    SELECT row_number() OVER (ORDER BY s_suppkey) AS sk, s_suppkey, s_name FROM supplier
    """,
)
def a4_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — monotonic surrogate key with explicit ordering
    (`TotalHutang/run.js:208` counts load order). Dimension-sized only —
    see operators/windows.py scale note."""
    s = _t(spark, sf_dir, "supplier")
    return surrogate_key(s, F.col("s_suppkey"), "sk").select("sk", "s_suppkey", "s_name")


@register("a5_row_count", "SELECT count(*) AS n FROM lineitem")
def a5_row_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — row-count telemetry (`FabricQC/run.js:5,22,200`)."""
    return _t(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n"))


@register(
    "w1_ordinal_index",
    """
    SELECT l_orderkey, l_linenumber,
           row_number() OVER (PARTITION BY l_orderkey
                              ORDER BY l_linenumber, l_partkey) AS ordinal
    FROM lineitem
    """,
)
def w1_ordinal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — per-group ordinal index (`ProductionOrderStatus/run.js:258`)."""
    li = _t(spark, sf_dir, "lineitem")
    out = ordinal_index(li, "l_orderkey", [F.col("l_linenumber"), F.col("l_partkey")], "ordinal")
    return out.select("l_orderkey", "l_linenumber", "ordinal")


@register(
    "w2_last_in_group",
    """
    SELECT l_orderkey, l_linenumber,
           last_value(l_shipdate) OVER (PARTITION BY l_orderkey
                                        ORDER BY l_linenumber, l_partkey, l_shipdate
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND UNBOUNDED FOLLOWING) AS last_ship
    FROM lineitem
    """,
)
def w2_last_in_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — last element of an ordered child group
    (`GarmentPembelian/run.js:620` — fulfillments[length-1].deliveryOrderDate)."""
    li = _t(spark, sf_dir, "lineitem")
    out = last_in_group(
        li,
        "l_orderkey",
        [F.col("l_linenumber"), F.col("l_partkey"), F.col("l_shipdate")],
        "l_shipdate",
        "last_ship",
    )
    return out.select("l_orderkey", "l_linenumber", "last_ship")


# ---------------------------------------------------------------------------
# Sorts / limits / set ops (SURVEY §2.6, §2.7)
# ---------------------------------------------------------------------------


@register(
    "o3_top_n",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def o3_top_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 — TOP(N) with total-order tiebreak (`Pembelian/run.js:44`).
    Spark plans this as TakeOrderedAndProject — per-partition top-N then a
    driver-side merge of N×partitions rows, no global sort."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "o4_offset_fetch",
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_orderkey OFFSET 900 LIMIT 50
    """,
)
def o4_offset_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 — OFFSET/FETCH pagination (`FabricQC/run.js:75-77`). Kept for
    parity; at scale the engine replaces it with partitioned reads."""
    o = _t(spark, sf_dir, "orders")
    return o.orderBy("o_orderkey").offset(900).limit(50).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@register(
    "u2_union_discriminator",
    """
    SELECT c_custkey AS entity_id, c_name AS name, c_acctbal AS acctbal,
           c_nationkey AS nationkey, c_mktsegment AS segment,
           'customer' AS entity_type
    FROM customer
    UNION ALL
    SELECT s_suppkey, s_name, s_acctbal, s_nationkey,
           CAST(NULL AS VARCHAR), 'supplier'
    FROM supplier
    """,
)
def u2_union_discriminator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 — union of heterogeneous sources into one fact with a literal
    discriminator; missing columns null-harmonized
    (`SpinningSC/run.js:124` vs `WeavingSC/run.js:128`)."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("customer").alias("entity_type"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_id"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
        F.col("s_nationkey").alias("nationkey"),
        F.lit("supplier").alias("entity_type"),
    )
    return c.unionByName(s, allowMissingColumns=True)


# ---------------------------------------------------------------------------
# Nest / explode (SURVEY §2.8)
# ---------------------------------------------------------------------------


@register(
    "e2_explode_roundtrip",
    """
    SELECT o.o_orderkey, o.o_orderdate, l.l_linenumber, l.l_partkey, l.l_quantity
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    """,
)
def e2_explode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1/E2 — assemble child array (the reference's app-side nested docs,
    `GarmentPembelian/run.js:174-216`) then flatten with inner semantics:
    round-trips to the plain inner join."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity"
    )
    nested = nest_children(
        o, li, parent_key="o_orderkey", child_fk="l_orderkey", array_col="items",
        order_by="l_linenumber", parent_key_unique=True,
    )
    return explode_inner(nested, "items").select(
        "o_orderkey", "o_orderdate", "l_linenumber", "l_partkey", "l_quantity"
    )


@register(
    "e5_explode_outer",
    """
    SELECT o.o_orderkey, o.o_orderdate, l.l_linenumber, l.l_quantity
    FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    """,
)
def e5_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 — flatten keeping parents whose child array is empty
    (`GarmentPembelian/run.js:767-838` — PR without PO)."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    nested = nest_children(
        o, li, parent_key="o_orderkey", child_fk="l_orderkey", array_col="items",
        order_by="l_linenumber", parent_key_unique=True,
    )
    return explode_left(nested, "items").select(
        "o_orderkey", "o_orderdate", "l_linenumber", "l_quantity"
    )
