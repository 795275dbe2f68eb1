"""Round-11 registry queries.

- dd13_duplicate_spans — exact duplicate-span profile over sliding
  k-token windows (Lee et al. 2022 exact-substring dedup, the sliding /
  span-structure complement to dd8's fixed-passage rewrite plan).

Each query pairs an idiomatic Spark plan with a DuckDB oracle over the
driver's parquet tables (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from com_danliris_service_etl_spark.operators.dedup import duplicate_spans
from com_danliris_service_etl_spark.plans.registry import _t, register

_DD13_K = 8

# Sliding windows via a correlated lateral unnest over the 0-based
# position range (the txt posexplode twin); DuckDB list slices are
# 1-based inclusive, so window pos covers toks[pos+1 : pos+k]. Islands
# are gaps-and-islands on duplicated positions (pos - row_number).
_DD13_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  WHERE len(string_split(text, ' ')) >= {_DD13_K}
), base AS (
  SELECT doc_id, (len(toks) - {_DD13_K} + 1)::BIGINT AS n_windows FROM t
), w AS (
  SELECT doc_id, r.pos,
         array_to_string(toks[r.pos + 1 : r.pos + {_DD13_K}], ' ') AS gram
  FROM t, unnest(range(0, len(toks) - {_DD13_K} + 1)) AS r(pos)
), owners AS (
  SELECT gram FROM w GROUP BY gram HAVING count(*) >= 2
), dup AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
  FROM w WHERE gram IN (SELECT gram FROM owners)
), runs AS (
  SELECT doc_id, count(*)::BIGINT AS run FROM dup GROUP BY doc_id, isl
), stats AS (
  SELECT doc_id, CAST(sum(run) AS BIGINT) AS n_dup,
         CAST(max(run) AS BIGINT) AS longest_run
  FROM runs GROUP BY doc_id
)
SELECT b.doc_id, b.n_windows,
       COALESCE(s.n_dup, 0)::BIGINT AS n_dup,
       COALESCE(s.longest_run, 0)::BIGINT AS longest_run,
       (COALESCE(s.n_dup, 0) * 1000000) // b.n_windows AS dup_micro
FROM base b LEFT JOIN stats s USING (doc_id)
"""


@register("dd13_duplicate_spans", _DD13_SQL)
def dd13_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-span profile of the corpus at k=8 sliding token
    windows (operators/dedup.py::duplicate_spans): per document, how
    many windows are duplicated ANYWHERE in the corpus and the longest
    consecutive duplicated run — the statistic exact-substring dedup
    (Lee et al. 2022) thresholds to cut memorized/boilerplate spans.
    One fact-scale gram-count exchange + one semi-join back on the gram
    key; run structure reuses the per-doc window exchange for both of
    its aggregates; per-doc totals are row-local (token count - k + 1),
    never a second pass over the window relation."""
    return duplicate_spans(_t(spark, sf_dir, "documents"), k=_DD13_K)
