"""Round-7d registry queries: Jaccard neighbor similarity, ISO-week
calendar rollup, systematic sampling, and a multi-relationship orphan
profile.

- g13_jaccard_neighbors — set-overlap link prediction over the part
  co-purchase bipartite (operators/graph.py `cooccurrence_jaccard`),
  the companion to g11's Adamic-Adar rarity weighting.
- d10_iso_week — ISO-8601 week/week-year revenue rollup (the calendar
  where Jan 1 can belong to last year's week 52/53).
- o7_systematic_sample — every-Nth-row sampling in a declared total
  order, the auditors' deterministic sample (vs llm2's hash split).
- q5_orphan_profile — dangling-foreign-key counts across four
  relationships in one report, the referential side of q1's gate.
- st10_running_distinct — incremental first-seen (debut) merge, the
  batch twin of `streaming/jobs.py::run_streaming_running_distinct`:
  pins merge ≡ one-shot for the keep-min fold.
- st11_outer_interval_join — LEFT OUTER watermarked stream-stream
  interval join (unconverted views kept), batch twin of
  `run_streaming_interval_join_outer`.

Each query pairs an idiomatic Spark plan with a DuckDB oracle over the
driver's parquet tables (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from com_danliris_service_etl_spark.operators.graph import cooccurrence_jaccard
from com_danliris_service_etl_spark.plans.registry import _events, _t, register

# ---------------------------------------------------------------------------
# G13 — Jaccard neighborhood similarity (part co-purchase)
# ---------------------------------------------------------------------------

_G13_SQL = """
WITH pg AS (
  SELECT DISTINCT l_orderkey AS g, l_partkey AS item FROM lineitem
), deg AS (
  SELECT item, count(*)::BIGINT AS d FROM pg GROUP BY 1
), pairs AS (
  SELECT a.item AS src, b.item AS dst, count(*)::BIGINT AS n_common
  FROM pg a JOIN pg b ON a.g = b.g AND a.item < b.item
  GROUP BY 1, 2 HAVING count(*) >= 2
)
SELECT src, dst, n_common,
       round(n_common / CAST(da.d + db.d - n_common AS DOUBLE), 6) AS jaccard
FROM pairs
JOIN deg da ON src = da.item
JOIN deg db ON dst = db.item
"""


@register("g13_jaccard_neighbors", _G13_SQL)
def g13_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard set-overlap similarity between co-purchased parts
    (operators/graph.py `cooccurrence_jaccard`): |shared orders| over
    |union of orders|, exact integers via inclusion-exclusion. Same
    in-array pair generation as g11 (one fact groupBy, never a
    fact×fact self-join); the oracle states the relation as the naive
    equi-self-join, which is what the operator avoids at scale.

    Runs over the PRODUCTION LAYOUT — the fact bucketed by the group key
    (`ensure_bucketed_fact`; first call per session materializes it, the
    layout cost a real warehouse pays once at load) — so the per-order
    collect_set aggregate plans zero exchanges and the pair aggregation
    is the only fact-scale shuffle. Promoted from a CI pin to the
    registry path per VERDICT r10 task 1; the unbucketed form measured
    3.56x vs the oracle at the sf10 decade, this layout 2.75x with an
    identical result (BASELINE.md g13 trail; five alternative plans —
    diagonal-fused degree, deg-from-base, deg-early struct arrays —
    measured slower or OOM there, recorded in the same trail)."""
    from com_danliris_service_etl_spark.operators.bucketing import (
        ensure_bucketed_fact,
    )

    li = ensure_bucketed_fact(
        spark, sf_dir, "lineitem", ["l_orderkey"],
        columns=["l_orderkey", "l_partkey"],
    )
    return cooccurrence_jaccard(li, "l_orderkey", "l_partkey", min_common=2)


# ---------------------------------------------------------------------------
# D10 — ISO-8601 week rollup
# ---------------------------------------------------------------------------

_D10_SQL = """
SELECT CAST(isoyear(o_orderdate) AS INT) AS iso_year,
       CAST(week(o_orderdate) AS INT) AS iso_week,
       count(*)::BIGINT AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders GROUP BY 1, 2
"""


@register("d10_iso_week", _D10_SQL)
def d10_iso_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by ISO-8601 week — the fiscal-reporting calendar where
    the week-year differs from the calendar year at boundaries (Jan 1
    can land in week 52/53 OF THE PRIOR week-year; grouping by
    (year(d), weekofyear(d)) instead silently merges those weeks across
    years). Spark's weekofyear/YEAROFWEEK and DuckDB's week/isoyear
    both implement ISO-8601, making this an exact-parity calendar
    query; one map-side-combinable aggregate."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(
        F.expr("extract(YEAROFWEEK FROM o_orderdate)").cast("int").alias("iso_year"),
        F.weekofyear("o_orderdate").cast("int").alias("iso_week"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# O7 — systematic (every-Nth) sampling in a declared total order
# ---------------------------------------------------------------------------

_O7_STRIDE = 200

_O7_SQL = f"""
WITH r AS (
  SELECT event_type, event_id, value,
         row_number() OVER (
           PARTITION BY event_type ORDER BY epoch_us(ts), event_id
         ) AS rn
  FROM events
)
SELECT event_type, rn, event_id, value
FROM r WHERE (rn - 1) % {_O7_STRIDE} = 0
"""


@register("o7_systematic_sample", _O7_SQL)
def o7_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic sampling: every 200th event per type in (ts, event_id)
    order — the auditor's deterministic, evenly-spaced sample (contrast
    llm2's hash split: uniform but order-blind). The tiebreak column
    makes the order TOTAL, so the sample is reproducible across
    engines. Scale note: a per-type ordinal serializes each type
    through one sort partition — systematic sampling inherently needs
    the group's total order; beyond dimension-scale groups use
    surrogate_key_distributed's two-pass range form (equivalence-
    tested) or switch to the hash sample."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts_us", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") - 1) % _O7_STRIDE == 0)
        .select("event_type", "rn", "event_id", "value")
    )


# ---------------------------------------------------------------------------
# Q5 — multi-relationship orphan (dangling-FK) profile
# ---------------------------------------------------------------------------

_Q5_SQL = """
SELECT 'lineitem->orders' AS fk, count(*)::BIGINT AS n_orphans
FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
UNION ALL
SELECT 'lineitem->part', count(*)::BIGINT
FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey)
UNION ALL
SELECT 'orders->customer', count(*)::BIGINT
FROM orders WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
UNION ALL
SELECT 'canary(all-dangling)', count(*)::BIGINT
FROM events WHERE user_id IS NOT NULL
  AND NOT EXISTS (
    SELECT 1 FROM customer WHERE c_custkey = user_id + 2000000000
  )
"""


@register("q5_orphan_profile", _Q5_SQL)
def q5_orphan_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dangling-foreign-key counts across the star schema's four FK
    relationships in one report — the referential-health profile a
    loader publishes alongside q1's pass/fail gate. Each relationship
    is a broadcast membership probe against the deduped parent key set
    (dimension-scale) reduced to one scalar row (allowlisted
    SinglePartition exchanges — one partial state per partition reaches
    the final task). The star schema is clean by construction, so the
    fourth row is a CANARY: keys shifted out of the customer range are
    ALL dangling by construction, pinning the detector's count equal to
    the child row count in-query — an all-zeros report can never hide a
    broken detector (the sk1 accuracy-contract pattern).

    Fusion (VERDICT r10 task 6): the two lineitem relationships share
    ONE fact scan — both parent key sets ride broadcast LEFT joins with
    presence markers and the orphan counts are conditional sums in one
    aggregate (replacing two anti-join+count branches: one lineitem
    scan and one scalar collapse instead of two of each; the markers
    require the parents deduped, which the anti-join form also paid).
    Child FK null semantics unchanged: a NULL FK is not an orphan."""

    def marker(parent: DataFrame, pk: str, fk: str, mark: str) -> DataFrame:
        return F.broadcast(
            parent.select(F.col(pk).alias(fk)).distinct().withColumn(mark, F.lit(1))
        )

    def orphan_count(fk: str, mark: str):
        # count(when(...)), not sum(when...otherwise 0): a global sum over
        # ZERO rows is NULL while the oracle's count(*) is 0 — the empty /
        # fully-filtered-child degenerate case must still report 0 orphans
        return F.count(
            F.when(F.col(fk).isNotNull() & F.col(mark).isNull(), 1)
        ).cast("long")

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    p = _t(spark, sf_dir, "part")

    li_counts = (
        li.select("l_orderkey", "l_partkey")
        .join(marker(o, "o_orderkey", "l_orderkey", "__has_o"), "l_orderkey", "left")
        .join(marker(p, "p_partkey", "l_partkey", "__has_p"), "l_partkey", "left")
        .agg(
            orphan_count("l_orderkey", "__has_o").alias("__n_o"),
            orphan_count("l_partkey", "__has_p").alias("__n_p"),
        )
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("lineitem->orders").alias("fk"),
                        F.col("__n_o").alias("n_orphans"),
                    ),
                    F.struct(
                        F.lit("lineitem->part").alias("fk"),
                        F.col("__n_p").alias("n_orphans"),
                    ),
                )
            ).alias("r")
        )
        .select("r.fk", "r.n_orphans")
    )

    def orphans(label: str, child: DataFrame, fk: str, parent: DataFrame, pk: str) -> DataFrame:
        dangling = child.filter(F.col(fk).isNotNull()).join(
            F.broadcast(parent.select(F.col(pk).alias(fk)).distinct()),
            fk,
            "left_anti",
        )
        return dangling.agg(
            F.lit(label).alias("fk"), F.count(F.lit(1)).alias("n_orphans")
        )

    canary = _events(spark, sf_dir).select(
        (F.col("user_id") + F.lit(2000000000)).alias("user_id")
    )
    return li_counts.unionByName(
        orphans("orders->customer", o, "o_custkey", c, "c_custkey")
    ).unionByName(
        orphans("canary(all-dangling)", canary, "user_id", c, "c_custkey")
    )


# ---------------------------------------------------------------------------
# ST10 — incremental first-seen merge (streaming running-distinct twin)
# ---------------------------------------------------------------------------

_ST10_SQL = """
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


@register("st10_running_distinct", _ST10_SQL)
def st10_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of `streaming/jobs.py::run_streaming_running_distinct`:
    the event history split into two "nightly" increments, each reduced
    to its debut candidates, keep-min merged — the exact fold the
    streaming job runs per micro-batch (`fold_first_seen`) — then
    summarized with `running_distinct`. The oracle is the ONE-SHOT
    computation (w9's SQL): the query pins merge ≡ one-shot, the
    incremental-correctness law that lets the stream never reprocess
    history. MIN-merge is idempotent and commutative, so increment
    order and redelivery cannot change the state."""
    from com_danliris_service_etl_spark.operators.windows import running_distinct

    ev = _events(spark, sf_dir).select(
        "event_id",
        "event_type",
        "user_id",
        (F.col("ts_us") / F.lit(86400000000)).cast("long").alias("d"),
    )

    def debuts(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type", "user_id").agg(F.min("d").alias("d"))

    inc1 = debuts(ev.filter(F.col("event_id") % 2 == 0))
    inc2 = debuts(ev.filter(F.col("event_id") % 2 == 1))
    state = (
        inc1.unionByName(inc2)
        .groupBy("event_type", "user_id")
        .agg(F.min("d").alias("d"))
    )
    return running_distinct(state, ["event_type"], "user_id", "d")


# ---------------------------------------------------------------------------
# ST11 — LEFT OUTER interval join (unconverted views kept)
# ---------------------------------------------------------------------------

_ST11_SQL = """
WITH v AS (
  SELECT event_id AS view_id, user_id, epoch_us(ts) AS vts
  FROM events WHERE event_type = 'view'
), p AS (
  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pts
  FROM events WHERE event_type = 'purchase'
)
SELECT v.view_id, p.purchase_id, v.user_id,
       CAST(p.pts - v.vts AS BIGINT) AS lag_us
FROM v LEFT JOIN p
  ON p.user_id = v.user_id
 AND p.pts > v.vts
 AND p.pts <= v.vts + 3600000000
"""


@register("st11_outer_interval_join", _ST11_SQL)
def st11_outer_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER view→purchase attribution: st6's inner interval join
    plus the rows conversion analysis actually needs — views that did
    NOT convert within the hour (NULL purchase). Batch twin of
    `streaming/jobs.py::run_streaming_interval_join_outer`, whose
    streaming form can only emit an unmatched view after the watermark
    passes its eviction point (the emission-semantics contract
    tests/test_streaming.py pins on the emittable region). Same single
    equi-shuffle on user_id with the time band as residual; the outer
    side adds no shuffle."""
    ev = _events(spark, sf_dir)
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts_us").alias("__v_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("__p_user"),
        F.col("ts_us").alias("__p_ts"),
    )
    return (
        v.join(
            p,
            (F.col("user_id") == F.col("__p_user"))
            & (F.col("__p_ts") > F.col("__v_ts"))
            & (F.col("__p_ts") <= F.col("__v_ts") + 3_600_000_000),
            "left",
        )
        .select(
            "view_id",
            "purchase_id",
            "user_id",
            (F.col("__p_ts") - F.col("__v_ts")).cast("long").alias("lag_us"),
        )
    )
