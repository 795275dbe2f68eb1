"""OLAP / warehouse extensions beyond the reference's flat GROUP BYs:
ROLLUP subtotals, a crosstab, window frames, statistical profiles,
INTERSECT/EXCEPT, verified sketches, SCD Type-2 history, and a binned
range join.

The reference aggregates only at a single grain per query (e.g.
`Pembelian/run.js:165` groups once and loads one fact table per grain)
and overwrites dimensions in place; an analytics engine serving the same
warehouse should answer the subtotal/crosstab/history shapes downstream
BI derives from those facts — in one pass each. Every query here pairs
with an exact DuckDB oracle, and the plan shapes (single Expand+shuffle
rollup, single-aggregate crosstab, shared-sort windows) are pinned by
tests/test_plan_assertions.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from com_danliris_service_etl_spark.plans.registry import _events, _t, register

# ---------------------------------------------------------------------------
# Grouping sets / ROLLUP
# ---------------------------------------------------------------------------


@register(
    "g1_rollup_corpus",
    """
    SELECT lang, source,
           GROUPING(lang)::INT   AS g_lang,
           GROUPING(source)::INT AS g_source,
           count(*)::BIGINT      AS n_docs,
           sum(n_chars)::BIGINT  AS total_chars
    FROM documents
    GROUP BY ROLLUP(lang, source)
    """,
)
def g1_rollup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus size at every grain — (lang, source), per-lang subtotal,
    grand total — in ONE pass. Spark's `rollup` compiles to a single
    Expand + hash aggregate: each input row is replicated once per
    grouping set map-side and partially aggregated before the one
    shuffle, so the subtotals cost no extra scan or shuffle — exactly
    how a 100 TB corpus report should be produced (never one query per
    grain). GROUPING() flags disambiguate subtotal NULLs from data
    NULLs, same semantics both engines."""
    docs = _t(spark, sf_dir, "documents")
    return docs.rollup("lang", "source").agg(
        F.grouping("lang").cast("int").alias("g_lang"),
        F.grouping("source").cast("int").alias("g_source"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    ).select("lang", "source", "g_lang", "g_source", "n_docs", "total_chars")


# ---------------------------------------------------------------------------
# Pivot / crosstab
# ---------------------------------------------------------------------------


@register(
    "g2_pivot_status_matrix",
    """
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F')::BIGINT AS status_f,
           count(*) FILTER (WHERE o_orderstatus = 'O')::BIGINT AS status_o,
           count(*) FILTER (WHERE o_orderstatus = 'P')::BIGINT AS status_p,
           round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2)
             AS value_f
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def g2_pivot_status_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority × status crosstab as DIRECT conditional aggregation: one
    hash aggregate, one shuffle, map-side partials. Two pivot traps are
    deliberately avoided: `pivot(col)` without values runs a full
    distinct scan to discover columns (never acceptable at 100 TB, and a
    nondeterministic schema besides), and even `pivot(col, values)`
    compiles to TWO aggregates (PivotFirst over a (group, pivot)-keyed
    pre-aggregate — measured: 2 exchanges vs 1 for this form). Declared
    values + count(when(...)) is the plan a crosstab should have; empty
    cells are 0 like the oracle's FILTER counts."""
    orders = _t(spark, sf_dir, "orders")

    def n_of(status: str) -> F.Column:
        return F.count(F.when(F.col("o_orderstatus") == status, 1))

    return orders.groupBy("o_orderpriority").agg(
        n_of("F").alias("status_f"),
        n_of("O").alias("status_o"),
        n_of("P").alias("status_p"),
        F.round(
            F.sum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))),
            2,
        ).alias("value_f"),
    )


# ---------------------------------------------------------------------------
# Window frames (sliding aggregates)
# ---------------------------------------------------------------------------


@register(
    "w4_moving_avg",
    """
    SELECT o_orderkey,
           o_custkey,
           round(avg(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
             AS avg_last3,
           round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_total
    FROM orders
    """,
)
def w4_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding ROWS-frame aggregates per customer: 3-order moving average
    and running total in one window (one shuffle on the partition key,
    both frames computed in the same sort pass). Ordering includes
    o_orderkey because o_orderdate ties are real in this data — a frame
    over a non-total order is nondeterministic across engines (verify
    skill gotcha). Per-customer state is O(frame), so the operator is
    memory-safe on arbitrarily long histories; a skewed mega-customer is
    the known worst case and would be range-chunked at real scale."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).alias(
            "avg_last3"
        ),
        F.round(
            F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
            2,
        ).alias("running_total"),
    )


# ---------------------------------------------------------------------------
# Statistical profile (ordered-set + moment aggregates)
# ---------------------------------------------------------------------------


@register(
    "a6_stats_profile",
    """
    SELECT lang,
           count(DISTINCT source)::BIGINT              AS n_sources,
           round(quantile_cont(n_chars, 0.5), 4)       AS p50_chars,
           round(quantile_cont(n_chars, 0.95), 4)      AS p95_chars,
           round(stddev_samp(n_chars), 4)              AS sd_chars,
           round(corr(n_chars, length(text)::DOUBLE), 6) AS corr_len
    FROM documents
    GROUP BY lang
    """,
)
def a6_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus profile: exact distinct-count, interpolated
    percentiles (Spark `percentile` and DuckDB `quantile_cont` share the
    rank = p·(n-1) linear-interpolation definition — verified equal to
    6dp), sample stddev and Pearson correlation. The moment aggregates
    (stddev/corr) are map-side combinable; `percentile` is the EXACT
    ordered-set form, which buffers each group's values — right for a
    bounded-cardinality profile like this, while an unbounded-group
    profile at 100 TB would switch to `approx_percentile` (t-digest,
    mergeable, bounded memory) and forgo cross-engine hash equality.
    count(DISTINCT) plans as Spark's two-phase distinct aggregate —
    partial dedup before the shuffle, no full value set on one node."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.countDistinct("source").alias("n_sources"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 4).alias("p50_chars"),
        F.round(F.expr("percentile(n_chars, 0.95)"), 4).alias("p95_chars"),
        F.round(F.stddev_samp("n_chars"), 4).alias("sd_chars"),
        F.round(
            F.corr("n_chars", F.length("text").cast("double")), 6
        ).alias("corr_len"),
    )


# ---------------------------------------------------------------------------
# Set operations beyond UNION (INTERSECT / EXCEPT)
# ---------------------------------------------------------------------------


@register(
    "u3_intersect_except",
    """
    SELECT o_custkey, 'both_f_o' AS set_op FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    UNION ALL
    SELECT o_custkey, 'f_not_p' AS set_op FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
    """,
)
def u3_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT with SQL (distinct) semantics: customers active
    in both F and O order states, plus F-customers never seen in P.
    Spark plans both as distinct-aggregated semi/anti hash joins — the
    pre-join distinct collapses each side to unique keys before any
    shuffle, so the join sides are bounded by key cardinality, not row
    count; both branches then union without a shuffle."""
    orders = _t(spark, sf_dir, "orders")

    def keys(status: str) -> DataFrame:
        return orders.filter(F.col("o_orderstatus") == status).select("o_custkey")

    both = keys("F").intersect(keys("O")).withColumn("set_op", F.lit("both_f_o"))
    # subtract == SQL EXCEPT (distinct); exceptAll would be bag semantics —
    # it removes ONE right occurrence per key and leaves a duplicated
    # left key alive, which is not what EXCEPT means.
    f_not_p = keys("F").subtract(keys("P")).withColumn("set_op", F.lit("f_not_p"))
    return both.unionByName(f_not_p)


# ---------------------------------------------------------------------------
# Mergeable sketches with verified accuracy (HLL / t-digest)
# ---------------------------------------------------------------------------


@register(
    "sk1_sketch_accuracy",
    """
    SELECT lang,
           count(DISTINCT doc_id)::BIGINT AS n_exact,
           TRUE AS hll_ok,
           TRUE AS p50_ok
    FROM documents
    GROUP BY lang
    """,
)
def sk1_sketch_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB cardinality path, with its accuracy bound VERIFIED
    in-query: HyperLogLog++ (`approx_count_distinct`, rsd 1%) and
    t-digest (`approx_percentile`, accuracy 10000) are mergeable,
    constant-memory sketches — the structures a real deployment uses
    where exact distinct/percentile would shuffle every value. Sketch
    estimates differ across engines by construction, so the oracle can't
    compare them directly; instead the query emits the EXACT values plus
    booleans asserting the sketch landed within tolerance (5% on
    distinct, 5% of the exact median), and the oracle pins those flags
    TRUE — a cross-engine-checkable accuracy contract rather than an
    unverifiable estimate dump.

    r14: the distinct count runs in its OWN aggregate, joined back on
    lang. Mixing countDistinct with the sketch functions in one agg made
    Spark's distinct rewrite push the sketch PARTIALS into the
    (lang, doc_id) pre-aggregation — one HLL(rsd 1%) register bank, one
    exact-percentile buffer and one t-digest PER DOCUMENT (5k heavyweight
    buffers at sf0.1, |docs| at scale) that the final merge then folded
    per lang. Split, the sketch pass keeps |lang| buffers per partition
    (partial aggregation as designed) and the distinct pass shuffles bare
    (lang, doc_id) keys: 4.1 s → 0.4 s at sf0.1, identical output (HLL
    register merge is commutative; the t-digest at accuracy 10000 over 5k
    values is rank-exact; the oracle pins both flags either way)."""
    docs = _t(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    exact = docs.groupBy("lang").agg(F.countDistinct("doc_id").alias("n_exact"))
    sketch = docs.groupBy("lang").agg(
        F.approx_count_distinct("doc_id", rsd=0.01).alias("n_hll"),
        F.expr("percentile(n_chars, 0.5)").alias("p50_exact"),
        F.expr("approx_percentile(n_chars, 0.5, 10000)").alias("p50_tdig"),
    )
    agg = exact.join(sketch, "lang")
    tol_n = F.col("n_exact").cast("double") * 0.05
    tol_p = F.abs(F.col("p50_exact")) * 0.05
    return agg.select(
        "lang",
        "n_exact",
        (F.abs(F.col("n_hll") - F.col("n_exact")) <= tol_n).alias("hll_ok"),
        (F.abs(F.col("p50_tdig") - F.col("p50_exact")) <= tol_p).alias("p50_ok"),
    )


# ---------------------------------------------------------------------------
# Dimension history (SCD Type 2, bulk form)
# ---------------------------------------------------------------------------


@register(
    "s11_scd2_history",
    """
    WITH ordered AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
             lag(event_type) OVER w AS prev_type,
             lag(epoch_us(ts)) OVER w AS prev_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
    starts AS (
      SELECT user_id, event_type, ts_us, event_id FROM ordered
      WHERE prev_ts IS NULL OR event_type IS DISTINCT FROM prev_type)
    SELECT user_id, event_type, ts_us AS valid_from,
           lead(ts_us) OVER w2 AS valid_to,
           (lead(ts_us) OVER w2 IS NULL) AS is_current
    FROM starts
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    """,
)
def s11_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 bulk backfill (`operators/scd.py::scd2_from_changelog`):
    the full versioned history of each user's event_type rebuilt from the
    changelog in one pass — change points via lag, validity intervals via
    lead, both windows sharing a single (user_id, time) shuffle+sort.
    The incremental sibling `scd2_apply` (close-and-open per batch) and
    `point_in_time_lookup` are pinned by tests/test_scd.py; this query
    pins the set-based form against the oracle. The reference overwrites
    dimensions in place (Type 1, `Pembelian/run.js` nightly re-MERGE) —
    history is an engine extension its warehouse cannot answer."""
    from com_danliris_service_etl_spark.operators.scd import scd2_from_changelog

    ev = _events(spark, sf_dir).select("user_id", "event_type", "ts_us", "event_id")
    return scd2_from_changelog(
        ev, keys=["user_id"], tracked=["event_type"], ts_col="ts_us",
        tiebreak=["event_id"],
    )


# ---------------------------------------------------------------------------
# Range / interval join
# ---------------------------------------------------------------------------


@register(
    "j10_range_join",
    """
    SELECT p.event_id AS purchase_id,
           count(*)::BIGINT AS n_follow,
           min(epoch_us(v.ts) - epoch_us(p.ts)) AS first_follow_us
    FROM events p
    JOIN events v
      ON v.user_id = p.user_id
     AND v.event_type IN ('view', 'click')
     AND epoch_us(v.ts) >  epoch_us(p.ts)
     AND epoch_us(v.ts) <= epoch_us(p.ts) + 1800000000
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """,
)
def j10_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-purchase attribution window: view/click events within 30 min
    AFTER each purchase by the same user, via the binned
    `operators/joins.py::range_join` — an equi-join on (user, 30-min
    bin) with the interval predicate residual, never the
    BroadcastNestedLoopJoin a raw BETWEEN condition would plan. Bin
    width == window length, so each purchase interval replicates at most
    2x. Purchases with no follow-up events drop out (inner semantics),
    mirrored by the oracle's plain JOIN."""
    from com_danliris_service_etl_spark.operators.joins import range_join

    ev = _events(spark, sf_dir)
    win_us = 30 * 60 * 1_000_000
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts_us").alias("lo_us"),
        (F.col("ts_us") + win_us).alias("hi_us"),
    )
    follows = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", "ts_us"
    )
    joined = range_join(
        follows, purchases, "ts_us", "lo_us", "hi_us",
        equi_keys=[("user_id", "p_user")], bin_width=win_us,
    )
    return joined.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("n_follow"),
        F.min(F.col("ts_us") - F.col("lo_us")).alias("first_follow_us"),
    )


# ---------------------------------------------------------------------------
# Data-quality constraint report
# ---------------------------------------------------------------------------


@register(
    "q1_data_quality",
    """
    SELECT 'completeness(o_totalprice)' AS check,
           (count(o_totalprice)::DOUBLE / count(*)::DOUBLE) AS metric,
           (count(o_totalprice)::DOUBLE / count(*)::DOUBLE) >= 1.0 AS passed
    FROM orders
    UNION ALL
    SELECT 'uniqueness(o_orderkey)',
           (count(*) - count(DISTINCT o_orderkey))::DOUBLE,
           count(*) = count(DISTINCT o_orderkey)
    FROM orders
    UNION ALL
    SELECT 'in_range(o_totalprice,0.0,1000000.0)',
           count(*) FILTER (WHERE o_totalprice < 0 OR o_totalprice > 1000000)::DOUBLE,
           count(*) FILTER (WHERE o_totalprice < 0 OR o_totalprice > 1000000) = 0
    FROM orders
    UNION ALL
    SELECT 'referential_integrity(o_custkey)',
           count(*)::DOUBLE,
           count(*) = 0
    FROM orders o
    WHERE o.o_custkey IS NOT NULL
      AND o.o_custkey NOT IN (SELECT c_custkey FROM customer)
    """,
)
def q1_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The publish gate (`operators/quality.py`): completeness,
    key uniqueness, value range, and orders→customer referential
    integrity as one metrics report. Each scalar check is a single
    two-phase aggregate over the scan; the FK check is a left-anti
    probe against the distinct dimension keys. The reference loads
    blindly (SURVEY §2.14 crash sites are uncontracted inputs) — this
    is the check a nightly run reads before it MERGEs."""
    from com_danliris_service_etl_spark.operators import quality as Q

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return Q.run_checks(
        [
            Q.completeness(orders, "o_totalprice"),
            Q.uniqueness(orders, ["o_orderkey"]),
            Q.in_range(orders, "o_totalprice", 0.0, 1_000_000.0),
            Q.referential_integrity(orders, customer, "o_custkey", "c_custkey"),
        ]
    )
