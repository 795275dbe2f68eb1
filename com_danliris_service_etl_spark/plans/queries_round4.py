"""Round-4 registrations: driver-visible query shapes for two operators
that previously had only pytest evidence.

- s6_merge_idempotent: the S6 staged-upsert contract (reference:
  `Pembelian/run.js:299-360`'s stage-then-`DL_UPSERT_FACT_*` shape) run
  TWICE through the parquet-fallback merge — the oracle states the
  once-merged result, so a green row proves the re-run changed nothing
  (idempotence, SURVEY.md §5.4).
- sk2_salted_aggregate: the skew lever (operators/skew.py) — the
  two-stage (key, salt) aggregation must be value-identical to the plain
  one-stage groupBy the oracle states.

Oracle SQL is expression-identical where values are computed; exact
(integer / count) aggregates are used so float summation order can never
split the engines.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from com_danliris_service_etl_spark.operators.skew import salted_aggregate
from com_danliris_service_etl_spark.plans.registry import _t, register
from com_danliris_service_etl_spark.sources.sinks import merge_upsert

# ---------------------------------------------------------------------------
# s6: MERGE/upsert idempotence (sources/sinks.py::merge_upsert)
# ---------------------------------------------------------------------------

# The oracle is the ONCE-merged fact: target rows whose key is not in the
# update batch, plus the batch. The Spark side runs merge_upsert TWICE, so
# equality with this SQL is exactly the idempotence contract.
_S6_SQL = """
    WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                  FROM orders WHERE o_orderkey % 5 = 0),
    t0 AS (SELECT * FROM base WHERE o_orderkey % 10 < 8),
    u AS (SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 2 AS o_totalprice
          FROM base WHERE o_orderkey % 10 >= 5),
    merged AS (
      SELECT * FROM t0 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      UNION ALL
      SELECT * FROM u)
    SELECT o_orderstatus,
           count(*)::BIGINT AS n_rows,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
           min(o_orderkey) AS min_key,
           max(o_orderkey) AS max_key
    FROM merged GROUP BY o_orderstatus
"""


@register("s6_merge_idempotent", _S6_SQL)
def s6_merge_idempotent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 upsert, proven idempotent through the driver: seed a fact with
    80% of an orders slice, upsert a batch that updates the 5-7 keys-mod-10 slice
    and inserts the 8-9 slice, then upsert the SAME batch again. The
    returned per-status profile (exact integer aggregates over the merge
    keys) matches the once-merged oracle iff the second run was a no-op —
    the `DL_UPSERT_FACT_*` contract of the reference
    (`Pembelian/run.js:299-360`). Runs the parquet anti-join fallback in
    this image; on a Delta-enabled cluster the same call compiles to
    MERGE INTO (branch shape-tested in tests/test_merge_shape.py)."""
    key = F.col("o_orderkey")
    # 20% slice: the physical writes are the query's real cost (the oracle
    # writes nothing), and idempotence is grain-independent — keep the
    # fact small so the bench measures the merge, not parquet I/O volume.
    orders = _t(spark, sf_dir, "orders").filter(key % 5 == 0)
    target0 = orders.filter(key % 10 < 8).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    updates = orders.filter(key % 10 >= 5).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * 2).alias("o_totalprice"),
    )
    # scratch fact in the OS temp dir — the query owns its sink
    path = os.path.join(tempfile.mkdtemp(prefix="s6_merge_"), "fact")
    target0.write.mode("overwrite").parquet(path)
    merge_upsert(spark, path, updates, ["o_orderkey"])
    merge_upsert(spark, path, updates, ["o_orderkey"])  # must be a no-op
    return (
        spark.read.parquet(path)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_orderkey").alias("key_sum"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
    )


# ---------------------------------------------------------------------------
# sk2: salted two-stage aggregation ≡ plain aggregation
# ---------------------------------------------------------------------------

# The oracle is the PLAIN one-stage aggregation; the Spark side computes it
# through the (key, salt) two-stage decomposition, so a green row pins the
# salting's value-equivalence. l_returnflag has 3 values over ~600k rows at
# sf0.1 — exactly the hot-key shape the operator exists for. l_quantity is
# integral-valued, so the double sums are exact in both engines.
_SK2_SQL = """
    SELECT l_returnflag,
           count(*)::BIGINT AS n_rows,
           sum(l_quantity) AS sum_qty,
           min(l_quantity) AS min_qty,
           max(l_quantity) AS max_qty
    FROM lineitem GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# dd8: passage-grain exact dedup (operators/dedup.py::passage_dedup)
# ---------------------------------------------------------------------------

_DD8_K = 20
_DD8_MAXPOS = 100_000

_DD8_SQL = f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    passages AS (
      SELECT doc_id, i AS pos,
             array_to_string(t[(i * {_DD8_K} + 1):((i + 1) * {_DD8_K})], ' ') AS passage
      FROM toks,
           unnest(range(0, CAST(ceil(len(t) / {_DD8_K}.0) AS BIGINT))) AS r(i)),
    keyed AS (
      SELECT doc_id, pos, passage, md5(passage) AS h,
             doc_id * {_DD8_MAXPOS} + pos AS ord
      FROM passages),
    owners AS (SELECT h, min(ord) AS owner FROM keyed GROUP BY h),
    flagged AS (
      SELECT k.doc_id, k.pos, k.passage, (k.ord = o.owner) AS keep
      FROM keyed k JOIN owners o USING (h))
    SELECT doc_id,
           count(*)::BIGINT AS n_passages,
           CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dup,
           md5(coalesce(string_agg(passage, ' ' ORDER BY pos)
                          FILTER (WHERE keep), '')) AS clean_md5
    FROM flagged GROUP BY doc_id
"""


@register("dd8_passage_dedup", _DD8_SQL)
def dd8_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-grain exact dedup (`operators/dedup.py::passage_dedup`):
    every 20-token window kept only at its first corpus occurrence; the
    per-document report carries the count of boilerplate passages
    removed and an md5 of the cleaned text. One uniform hash groupBy +
    one same-key join + one per-doc reassembly — the fixed-window
    relational form of RefinedWeb-style exact-substring dedup."""
    from com_danliris_service_etl_spark.operators.dedup import passage_dedup

    return passage_dedup(
        _t(spark, sf_dir, "documents"), k=_DD8_K, max_pos=_DD8_MAXPOS
    )


@register("sk2_salted_aggregate", _SK2_SQL)
def sk2_salted_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted aggregation (operators/skew.py::salted_aggregate) over
    lineitem's 3-value l_returnflag — a deliberately hot grouping key.
    Stage 1 spreads each key over 16 salts (no reducer sees more than
    1/16th of a hot key), stage 2 re-reduces the tiny partial rows; the
    oracle's plain GROUP BY pins value-equivalence of the decomposition."""
    return salted_aggregate(
        _t(spark, sf_dir, "lineitem"),
        keys=["l_returnflag"],
        aggs={
            "n_rows": ("l_quantity", "count"),
            "sum_qty": ("l_quantity", "sum"),
            "min_qty": ("l_quantity", "min"),
            "max_qty": ("l_quantity", "max"),
        },
        n_salts=16,
    )
