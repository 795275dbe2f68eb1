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


# ---------------------------------------------------------------------------
# dd14: sorted-suffix longest duplicated substring
# (operators/dedup.py::longest_duplicate_substring)
# ---------------------------------------------------------------------------

_DD14_L = 5    # min reported length (tokens) = the seed-bucket grain
_DD14_D = 64   # suffix truncation depth (tokens)

# The oracle is the TEXTBOOK suffix-array form — ALL suffixes in one
# global sorted order, adjacent-LCP, filter >= L — deliberately a
# different formulation from the Spark plan's seed-bucket + in-bucket
# extension (global vs bucketed adjacency agree exactly for every LCP
# >= L because two suffixes sharing >= L tokens share the seed bucket,
# and max-adjacent == max-anywhere holds in any prefix-clustering
# order). LCP of two capped token lists: first position where the
# zipped pair compares unequal (pads compare false via coalesce), else
# the shorter length; DuckDB list slicing is 1-based inclusive, so
# toks[pos+1 : pos+D] is the D-token cap.
_DD14_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  WHERE len(string_split(text, ' ')) >= {_DD14_L}
), suf AS (
  SELECT doc_id, r.pos, toks[r.pos + 1 : r.pos + {_DD14_D}] AS sfx
  FROM t, unnest(range(0, len(toks) - {_DD14_L} + 1)) AS r(pos)
), adj AS (
  SELECT doc_id, pos, sfx, lag(sfx) OVER w AS p, lead(sfx) OVER w AS n
  FROM suf WINDOW w AS (ORDER BY sfx)
), mis AS (
  SELECT doc_id, pos, sfx, p, n,
    list_position(list_transform(list_zip(sfx, p),
                  x -> coalesce(x[1] = x[2], false)), false) AS pm,
    list_position(list_transform(list_zip(sfx, n),
                  x -> coalesce(x[1] = x[2], false)), false) AS nm
  FROM adj
), scored AS (
  SELECT doc_id, pos,
    greatest(
      CASE WHEN p IS NULL THEN -1
           WHEN pm = 0 OR pm IS NULL THEN least(len(sfx), len(p))
           ELSE pm - 1 END,
      CASE WHEN n IS NULL THEN -1
           WHEN nm = 0 OR nm IS NULL THEN least(len(sfx), len(n))
           ELSE nm - 1 END) AS l
  FROM mis
), best AS (
  SELECT doc_id, pos, l,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY l DESC, pos ASC) AS rn
  FROM scored WHERE l >= {_DD14_L}
)
SELECT b.doc_id, b.l::BIGINT AS lrs_len, b.pos::BIGINT AS lrs_pos,
       md5(array_to_string(t.toks[b.pos + 1 : b.pos + b.l], ' ')) AS lrs_md5
FROM best b JOIN t USING (doc_id) WHERE b.rn = 1
"""


@register("dd14_longest_dup_substring", _DD14_SQL)
def dd14_longest_dup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-suffix longest-duplicated-substring
    (`operators/dedup.py::longest_duplicate_substring`): per document,
    the longest token substring (>= 5 tokens, truncation depth 64)
    appearing >= 2 times anywhere in the corpus, its first offset and
    md5 — the suffix-array member of the exact-substring dedup family
    (Lee et al. 2022), with the length DISCOVERED by sorted-suffix
    extension instead of preset by a window size (dd8/dd13). Plan: one
    row-local suffix explode, one seed-bucket exchange whose in-bucket
    sort + lag/lead does the extension, one per-doc argmax window, one
    doc-keyed join back for the digest — no all-pairs, no global
    sort."""
    from com_danliris_service_etl_spark.operators.dedup import (
        longest_duplicate_substring,
    )

    return longest_duplicate_substring(
        _t(spark, sf_dir, "documents"), min_len=_DD14_L, max_depth=_DD14_D
    )


# ---------------------------------------------------------------------------
# dd15: exact-substring dedup REWRITE
# (operators/dedup.py::substring_dedup_rewrite)
# ---------------------------------------------------------------------------

_DD15_K = 8
_DD15_MAXP = 100_000

# Oracle mirrors the pinned semantics relationally: sliding k-gram
# windows, first-occurrence ownership on the doc·max_pos+pos encoding,
# non-first windows' spans unioned per doc (gaps-and-islands: a start
# extends the span iff start − prev_start <= k), then a token-grain
# rebuild via NOT EXISTS against the span set (DuckDB has no
# higher-order filter-with-index; the correlated anti-join is its
# equivalent at sf0.01 grain). Empty rebuilds coalesce to md5('') —
# identical to Spark's concat_ws over an empty array.
_DD15_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), w AS (
  SELECT doc_id, r.pos,
         md5(array_to_string(toks[r.pos + 1 : r.pos + {_DD15_K}], ' ')) AS h,
         doc_id * {_DD15_MAXP} + r.pos AS ord
  FROM t, unnest(range(0, len(toks) - {_DD15_K} + 1)) AS r(pos)
  WHERE len(toks) >= {_DD15_K}
), own AS (
  SELECT h, min(ord) AS owner FROM w GROUP BY h
), dup AS (
  SELECT w.doc_id, w.pos FROM w JOIN own USING (h) WHERE w.ord > own.owner
), brk AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   <= {_DD15_K} THEN 0 ELSE 1 END AS b
  FROM dup
), isl AS (
  SELECT doc_id, pos,
         sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS UNBOUNDED PRECEDING) AS isl_id
  FROM brk
), spans AS (
  SELECT doc_id, isl_id, min(pos) AS s, max(pos) + {_DD15_K} AS e
  FROM isl GROUP BY doc_id, isl_id
), removed AS (
  SELECT doc_id, CAST(sum(e - s) AS BIGINT) AS n_removed
  FROM spans GROUP BY doc_id
), kept AS (
  SELECT t.doc_id, r.i, t.toks[r.i + 1] AS tok
  FROM t, unnest(range(0, len(toks))) AS r(i)
  WHERE NOT EXISTS (SELECT 1 FROM spans s
                    WHERE s.doc_id = t.doc_id AND r.i >= s.s AND r.i < s.e)
), clean AS (
  SELECT doc_id, md5(coalesce(string_agg(tok, ' ' ORDER BY i), '')) AS clean_md5,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id, len(t.toks)::BIGINT AS n_tokens,
       COALESCE(rm.n_removed, 0)::BIGINT AS n_removed,
       COALESCE(c.clean_md5, md5('')) AS clean_md5
FROM t LEFT JOIN removed rm USING (doc_id) LEFT JOIN clean c USING (doc_id)
"""


@register("dd15_substring_rewrite", _DD15_SQL)
def dd15_substring_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup REWRITE
    (`operators/dedup.py::substring_dedup_rewrite`): every token
    covered by a non-first duplicated 8-gram window is cut (first
    corpus occurrence keeps its text), documents re-emitted with the
    removal count and cleaned digest — the Lee et al. 2022 removal
    step at arbitrary offsets, completing the family dd13 profiles and
    dd14 locates. One uniform gram-key exchange + same-key join back,
    one per-doc span window, row-local rebuild — text never shuffles,
    no token-grain join."""
    from com_danliris_service_etl_spark.operators.dedup import (
        substring_dedup_rewrite,
    )

    return substring_dedup_rewrite(
        _t(spark, sf_dir, "documents"), k=_DD15_K, max_pos=_DD15_MAXP
    )
