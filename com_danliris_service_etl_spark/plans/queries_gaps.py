"""Registry queries completing the SURVEY.md §2 inventory rows that the
other query-family modules cover only implicitly: P3/P5/P8 predicates,
J4 group join, J5 correlated-subquery shape, E3/E4 deep explodes, O1/O2
ordered extraction, and the embedding-cosine near-dup (dedup family).

Each query pairs an idiomatic Spark plan with a DuckDB oracle over the
driver's parquet tables (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from com_danliris_service_etl_spark.operators.dedup import embedding_neardup_pairs
from com_danliris_service_etl_spark.operators.explode import (
    explode_inner,
    nest_children,
)
from com_danliris_service_etl_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# Predicates (SURVEY §2.2)
# ---------------------------------------------------------------------------


@register(
    "p3_soft_delete",
    """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE NOT (l_returnflag = 'R')
    """,
)
def p3_soft_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 — soft-delete filter `isdeleted = 0` (`Pembelian/run.js:166`,
    `ProductionOrderStatus/run.js:113`), emulated on the returnflag column.
    A boolean/flag equality pushes to the parquet scan (dictionary filter)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(~(F.col("l_returnflag") == "R")).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "p5_not_null",
    """
    SELECT event_id, nullif(props, '{}') AS props_nn
    FROM events WHERE nullif(props, '{}') IS NOT NULL
    """,
)
def p5_not_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 — `input is not null` (`ProductionOrderStatus/run.js:175`). The
    test tables carry no physical NULLs, so empty-JSON props are nulled
    first (`nullif`), then the IsNotNull predicate — which Catalyst still
    pushes below the projection."""
    ev = _t(spark, sf_dir, "events")
    props_nn = F.nullif(F.col("props"), F.lit("{}"))
    return (
        ev.select(F.col("event_id"), props_nn.alias("props_nn"))
        .filter(F.col("props_nn").isNotNull())
    )


@register(
    "p8_falsy_zero",
    """
    SELECT event_id,
           CASE WHEN v IS NULL OR v = 0 THEN 0 ELSE v END AS value_filled
    FROM (SELECT event_id, nullif(round(value, 0), 0) AS v FROM events)
    """,
)
def p8_falsy_zero(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 — JS-truthiness zero coalescing `x ? x : 0`
    (`Packing/run.js:151-153`): NULL and numeric 0 both collapse to 0.
    Derives a null-or-zero column first (the fixtures have neither), then
    applies the literal falsy semantics SURVEY §2.2 P8 documents."""
    ev = _t(spark, sf_dir, "events")
    v = F.nullif(F.round(F.col("value"), 0), F.lit(0.0))
    filled = F.when(v.isNull() | (v == 0), F.lit(0.0)).otherwise(v)
    return ev.select(F.col("event_id"), filled.alias("value_filled"))


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# ---------------------------------------------------------------------------


@register(
    "j4_group_join",
    """
    SELECT o.o_orderkey, o.o_orderstatus,
           coalesce(l.n_items, 0)                 AS n_items,
           round(coalesce(l.total_qty, 0.0), 2)   AS total_qty
    FROM orders o
    LEFT JOIN (SELECT l_orderkey, count(*) AS n_items, sum(l_quantity) AS total_qty
               FROM lineitem GROUP BY l_orderkey) l
      ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey % 7 = 0
    """,
)
def j4_group_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — `Array.filter` group join populating child arrays
    (`ShipmentDocument/run.js:145-150`): children are assembled into an
    array<struct> on the parent (nest_children = groupBy + collect_list +
    left join), then consumed with array aggregates — the array never
    round-trips through Python. Parents without children keep an empty
    array (left semantics)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_linenumber", "l_quantity"
    )
    nested = nest_children(
        o.select("o_orderkey", "o_orderstatus"),
        li,
        parent_key="o_orderkey",
        child_fk="o_orderkey",
        array_col="items",
        child_cols=["l_linenumber", "l_quantity"],
    )
    total = F.aggregate(
        F.coalesce(F.col("items"), F.array()),
        F.lit(0.0),
        lambda acc, s: acc + s["l_quantity"],
    )
    return nested.select(
        "o_orderkey",
        "o_orderstatus",
        F.size(F.coalesce(F.col("items"), F.array())).cast("long").alias("n_items"),
        F.round(total, 2).alias("total_qty"),
    )


@register(
    "j5_correlated_subquery",
    """
    SELECT o_orderkey, o_orderdate,
           (SELECT count(*) FROM lineitem l
             WHERE l.l_orderkey = o.o_orderkey)      AS n_items,
           (SELECT max(l_shipdate) FROM lineitem l
             WHERE l.l_orderkey = o.o_orderkey)      AS last_ship
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1998-06-01'
    """,
)
def j5_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 — the reference's N+1 per-parent-row query loop
    (`MonitoringEvent/run.js:96-100`, `ProductionOrderStatus/run.js:91-94`)
    becomes one set-at-a-time plan: pre-aggregate the child once, left-join.
    One shuffle on the join key instead of N round-trips."""
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-06-01").cast("timestamp")
    )
    agg = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.count(F.lit(1)).alias("n_items"), F.max("l_shipdate").alias("last_ship"))
    )
    return (
        o.join(agg, "o_orderkey", "left")
        .select(
            "o_orderkey",
            "o_orderdate",
            F.coalesce("n_items", F.lit(0)).alias("n_items"),
            "last_ship",
        )
    )


# ---------------------------------------------------------------------------
# Deep explodes (SURVEY §2.8)
# ---------------------------------------------------------------------------


@register(
    "e3_explode_3level",
    """
    SELECT r.r_name, n.n_name, s.s_name, s.s_acctbal
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN supplier s ON s.s_nationkey = n.n_nationkey
    """,
)
def e3_explode_3level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 — 3-level nested doc flattened by chained explodes
    (`FabricQC/run.js:117-173` QC→gradeTests→criteria): region docs are
    assembled with nations[] each holding suppliers[], then exploded twice.
    The assembly shuffles each child once on its fk; the explodes are
    narrow (no shuffle)."""
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    n = _t(spark, sf_dir, "nation").select("n_regionkey", "n_nationkey", "n_name")
    s = _t(spark, sf_dir, "supplier").select("s_nationkey", "s_name", "s_acctbal")
    n_nested = nest_children(
        n, s, parent_key="n_nationkey", child_fk="s_nationkey",
        array_col="suppliers", child_cols=["s_name", "s_acctbal"],
    )
    r_nested = nest_children(
        r, n_nested, parent_key="r_regionkey", child_fk="n_regionkey",
        array_col="nations", child_cols=["n_name", "suppliers"],
    )
    flat_n = explode_inner(r_nested, "nations")
    flat_s = explode_inner(flat_n, "suppliers")
    return flat_s.select("r_name", "n_name", "s_name", "s_acctbal")


@register(
    "e4_explode_inner",
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey % 5 = 0
    """,
)
def e4_explode_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 — explode with inner-join semantics: parents with no children are
    dropped (`ShipmentDocument/run.js:162-198` skips empty item lists).
    `explode` (not `_outer`) gives exactly that."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 5 == 0)
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
    )
    nested = nest_children(
        c.select("c_custkey", "c_name"),
        o,
        parent_key="c_custkey",
        child_fk="c_custkey",
        array_col="orders",
        child_cols=["o_orderkey", "o_totalprice"],
    )
    return explode_inner(nested, "orders").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


# ---------------------------------------------------------------------------
# Ordered extraction (SURVEY §2.6 O1/O2)
# ---------------------------------------------------------------------------


@register(
    "o1_o2_ordered_extract",
    """
    SELECT s_suppkey, s_name, s_acctbal FROM supplier
    ORDER BY s_acctbal DESC, s_suppkey LIMIT 100
    """,
)
def o1_o2_ordered_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O2 — ORDER BY in extraction (`DailyOperation/run.js:107`) and the
    descending in-memory sort (`GarmentTotalHutang/run.js:124`), made
    observable through a LIMIT. Spark plans TakeOrderedAndProject: per-
    partition top-N, then a driver merge of N×partitions rows — no global
    sort at any scale."""
    s = _t(spark, sf_dir, "supplier")
    return (
        s.orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
        .limit(100)
        .select("s_suppkey", "s_name", "s_acctbal")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (dedup family)
# ---------------------------------------------------------------------------

_DD5_DOT = (
    "list_reduce(list_prepend(0.0, list_transform(range(1, 65), i -> {a}[i] * {b}[i])),"
    " (acc, v) -> acc + v)"
)


# Sign-bit LSH bucket over the first 8 dims (mirrors similarity.signbit_bucket;
# DuckDB arrays are 1-based, Spark's 0-based — same elements).
_DD5_BUCKET = " + ".join(
    f"(CASE WHEN {{v}}[{d + 1}] > 0 THEN {1 << d} ELSE 0 END)" for d in range(8)
)


@register(
    "dd5_embedding_neardup",
    f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e,
                      ({_DD5_BUCKET.format(v="embedding")}) AS blk
               FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round({_DD5_DOT.format(a="a.e", b="b.e")}
                   / (sqrt({_DD5_DOT.format(a="a.e", b="a.e")})
                      * sqrt({_DD5_DOT.format(a="b.e", b="b.e")})), 6) AS cos_sim
      FROM v a JOIN v b ON a.vec_id < b.vec_id AND a.blk = b.blk)
    SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= 0.3
    """,
)
def dd5_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked on a COMPUTED sign-bit
    LSH bucket (no label / prior clustering needed) — the Σ block² scale
    path (vs n² cross product). 2^8 buckets ⇒ mean block = n/256."""
    emb = _t(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(emb, threshold=0.3, lsh_bits=8)


@register(
    "s7_date_dimension",
    """
    SELECT DISTINCT o_orderdate::DATE::TIMESTAMP AS date,
           year(o_orderdate)          AS year,
           quarter(o_orderdate)       AS quarter,
           month(o_orderdate)         AS month,
           day(o_orderdate)           AS day,
           dayofweek(o_orderdate) + 1 AS day_of_week,
           weekofyear(o_orderdate)    AS week_of_year,
           monthname(o_orderdate)     AS month_name,
           dayname(o_orderdate)       AS day_name
    FROM orders WHERE o_orderdate IS NOT NULL
    """,
)
def s7_date_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 — the `DL_INSERT_DIMTIME` date dimension derived set-at-a-time
    from fact dates (`Pembelian/run.js:331`): distinct dates + calendar
    attributes. (Spark's dayofweek is 1=Sunday; the oracle offsets DuckDB's
    0=Sunday to match.)"""
    from com_danliris_service_etl_spark.sources.sinks import date_dimension

    dim = date_dimension(spark, _t(spark, sf_dir, "orders"), "o_orderdate")
    # DateType → timestamp purely for the cross-engine compare (pandas
    # renders Spark dates as python objects, DuckDB dates as datetime64).
    return dim.withColumn("date", F.col("date").cast("timestamp"))
