"""Round-7c registry queries: vocabulary growth, corpus dataset card,
ratio-to-report shares, unpivot/melt, null-safe join, and Benford
first-digit profiling.

- txt15_heaps_hapax — per-source vocabulary growth profile
  (operators/text.py `vocab_growth_stats`).
- llm14_corpus_report — the "dataset card" aggregate: per (source,
  lang) doc/dup/token/char totals via two-level hash aggregation (no
  join, no window).
- a13_ratio_to_report — within-group share-of-total (the classic
  RATIO_TO_REPORT), window over the aggregated relation.
- u4_unpivot — wide→long melt with Spark's native `unpivot` (one scan
  + Expand; the oracle spells out the equivalent UNION ALL).
- j17_null_safe_join — null-safe equality join (`eqNullSafe` /
  IS NOT DISTINCT FROM): NULL keys match each other, still hash-join.
- q4_benford_digits — first-significant-digit distribution vs the
  Benford expectation, digits extracted via exact integer/string
  arithmetic (no cross-engine log10-boundary hazard).

Each query pairs an idiomatic Spark plan with a DuckDB oracle over the
driver's parquet tables (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from com_danliris_service_etl_spark.operators.text import vocab_growth_stats
from com_danliris_service_etl_spark.plans.registry import _events, _t, register

# ---------------------------------------------------------------------------
# TXT15 — per-source vocabulary growth (Heaps-law numbers, hapax ratio)
# ---------------------------------------------------------------------------

_TXT15_SQL = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
), wf AS (
  SELECT source, w, count(*)::BIGINT AS f FROM tok GROUP BY 1, 2
)
SELECT source,
       CAST(sum(f) AS BIGINT) AS n_tokens,
       count(*)::BIGINT AS n_types,
       CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       round(count(*) / CAST(sum(f) AS DOUBLE), 6) AS type_token_ratio,
       round(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6) AS hapax_ratio
FROM wf GROUP BY 1
"""


@register("txt15_heaps_hapax", _TXT15_SQL)
def txt15_heaps_hapax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth profile per source (operators/text.py
    `vocab_growth_stats`): type/token and hapax ratios — the curator's
    signal for whether new crawl data still adds vocabulary. Exact
    integer counts; the word relation is bounded by the vocabulary."""
    return vocab_growth_stats(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# LLM14 — corpus dataset card (docs / dups / tokens / chars per slice)
# ---------------------------------------------------------------------------

_LLM14_SQL = """
WITH h AS (
  SELECT source, lang, md5(text) AS hh, count(*)::BIGINT AS c,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tok,
         CAST(sum(n_chars) AS BIGINT) AS chars
  FROM documents GROUP BY 1, 2, 3
)
SELECT source, lang,
       CAST(sum(c) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup_docs,
       CAST(sum(tok) AS BIGINT) AS total_tokens,
       round(sum(chars) / CAST(sum(c) AS DOUBLE), 4) AS avg_chars,
       round(sum(CASE WHEN c > 1 THEN c ELSE 0 END) / CAST(sum(c) AS DOUBLE), 6) AS dup_ratio
FROM h GROUP BY 1, 2
"""


@register("llm14_corpus_report", _LLM14_SQL)
def llm14_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-card aggregate a training-data pipeline publishes per
    (source, lang) slice: doc count, exact-duplicate count (docs whose
    md5(text) appears more than once in the slice), token and char
    totals, dup ratio. TWO-LEVEL hash aggregation — per-(slice, hash)
    partials first, then the slice reduce — so duplicate detection
    costs no self-join and no window over a hot hash key; both
    aggregations are map-side combinable, and every output number is a
    sum/division of exact integers."""
    d = _t(spark, sf_dir, "documents")
    per_hash = d.groupBy(
        "source", "lang", F.md5("text").alias("hh")
    ).agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.size(F.split("text", " ")).cast("long")).alias("tok"),
        F.sum("n_chars").alias("chars"),
    )
    dup_c = F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))
    return per_hash.groupBy("source", "lang").agg(
        F.sum("c").alias("n_docs"),
        F.sum(dup_c).alias("n_dup_docs"),
        F.sum("tok").alias("total_tokens"),
        F.round(F.sum("chars").cast("double") / F.sum("c"), 4).alias("avg_chars"),
        F.round(F.sum(dup_c).cast("double") / F.sum("c"), 6).alias("dup_ratio"),
    )


# ---------------------------------------------------------------------------
# A13 — ratio-to-report (within-group share of total)
# ---------------------------------------------------------------------------

_A13_SQL = """
WITH g AS (
  SELECT l_returnflag, l_linestatus,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev
  FROM lineitem GROUP BY 1, 2
)
SELECT l_returnflag, l_linestatus, rev,
       round(rev / sum(rev) OVER (PARTITION BY l_returnflag), 6) AS rev_share
FROM g
"""


@register("a13_ratio_to_report", _A13_SQL)
def a13_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total within a group (RATIO_TO_REPORT): revenue share of
    each line status within its return flag. The window runs over the
    ALREADY-AGGREGATED relation (one row per (flag, status)) — the
    share computation costs a shuffle of |groups| rows, never a second
    pass over the fact. Shares divide 2dp-rounded sums so both engines
    divide identical operands."""
    li = _t(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "rev"
        )
    )
    w = Window.partitionBy("l_returnflag")
    return g.withColumn("rev_share", F.round(F.col("rev") / F.sum("rev").over(w), 6))


# ---------------------------------------------------------------------------
# U4 — unpivot / melt (wide → long)
# ---------------------------------------------------------------------------

_U4_SQL = """
SELECT l_returnflag, measure, round(sum(val), 2) AS total
FROM (
  SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_tax', l_tax FROM lineitem
)
GROUP BY 1, 2
"""


@register("u4_unpivot", _U4_SQL)
def u4_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt via Spark's native `unpivot` — g2's pivot run in
    reverse, completing the reshape pair. One scan + an Expand node (4
    output rows per input row, partial-aggregated map-side before the
    single shuffle); the oracle spells the same relation as UNION ALL,
    which would cost four scans — the unpivot operator's win."""
    li = _t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "val",
    )
    return long.groupBy("l_returnflag", "measure").agg(
        F.round(F.sum("val"), 2).alias("total")
    )


# ---------------------------------------------------------------------------
# J17 — null-safe equality join (NULL keys match each other)
# ---------------------------------------------------------------------------

_J17_SQL = """
WITH ev AS (
  SELECT nullif(event_type, 'click') AS k, value FROM events
), dim AS (
  SELECT DISTINCT nullif(event_type, 'click') AS k,
         coalesce(nullif(event_type, 'click'), 'NULL_KEY') AS label
  FROM events
)
SELECT d.label, count(*)::BIGINT AS n, round(sum(ev.value), 2) AS sum_value
FROM ev JOIN dim d ON ev.k IS NOT DISTINCT FROM d.k
GROUP BY 1
"""


@register("j17_null_safe_join", _J17_SQL)
def j17_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join: a nullable dimension key (here
    synthesized with nullif) where NULL must match the dimension's NULL
    row — plain `=` silently drops those rows. Spark's `eqNullSafe`
    (`<=>`) keeps the condition an EQUI-join key (BroadcastHashJoin,
    NULLs hashing to one bucket), unlike an `isNull AND isNull` OR-
    rewrite, which degrades to a nested-loop condition. NULL-key skew
    caveat at scale: every NULL row lands in one bucket — here the dim
    is broadcast so NULL rows stay spread across input partitions."""
    ev = _events(spark, sf_dir).select(
        F.nullif("event_type", F.lit("click")).alias("k"), "value"
    )
    dim = (
        _events(spark, sf_dir)
        .select(F.nullif("event_type", F.lit("click")).alias("k"))
        .distinct()
        .withColumn("label", F.coalesce(F.col("k"), F.lit("NULL_KEY")))
    )
    joined = ev.join(F.broadcast(dim), ev["k"].eqNullSafe(dim["k"]))
    return joined.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Q4 — Benford first-digit profile
# ---------------------------------------------------------------------------

_Q4_SQL = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
  FROM orders
), g AS (
  SELECT digit, count(*)::BIGINT AS n FROM d GROUP BY 1
)
SELECT digit, n,
       round(n / CAST(sum(n) OVER () AS DOUBLE), 6) AS obs_freq,
       round(log10(1.0 + 1.0 / digit), 6) AS benford_freq
FROM g
"""


@register("q4_benford_digits", _Q4_SQL)
def q4_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals against the
    Benford expectation — the forensic data-quality screen for
    fabricated or truncated monetary columns. The digit is extracted by
    exact arithmetic (floor → BIGINT → first character of the decimal
    rendering): no log10 on data values, whose floating-point boundary
    at exact powers of ten would be an engine-dependent coin flip. The
    global-share window runs over the 9-row digit aggregate (allowlisted
    single-partition exchange — bounded by the digit alphabet)."""
    o = _t(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
    ).cast("int")
    g = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy()
    return g.select(
        "digit",
        "n",
        F.round(F.col("n") / F.sum("n").over(w), 6).alias("obs_freq"),
        F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias("benford_freq"),
    )
