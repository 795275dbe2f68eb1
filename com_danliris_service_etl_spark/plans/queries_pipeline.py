"""Training-data pipeline queries round 2: sequence packing / chunking,
privacy (k-anonymity), repetition quality, and inverted-index build.

Extensions beyond the reference ETL's own surface (which has none of
these — danliris/com-danliris-service-etl stops at warehouse facts); they
are the operations a 100 TB LLM-corpus pipeline layers on top. Oracle SQL
is kept expression-for-expression identical to the Spark plan (same
tokenization, same rounding, same digests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from com_danliris_service_etl_spark.operators import packing as pk
from com_danliris_service_etl_spark.operators import privacy as pv
from com_danliris_service_etl_spark.operators import text as tx
from com_danliris_service_etl_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# Sequence packing / chunking
# ---------------------------------------------------------------------------

_PACK_BUDGET = 256
_PACK_SHARDS = pk.DEFAULT_PACK_SHARDS


@register(
    "pk1_sequence_packing",
    f"""
    WITH a AS (
      SELECT lang,
             ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT
               % {_PACK_SHARDS} AS shard,
             doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             COALESCE(CAST(sum(len(string_split(text, ' '))) OVER (
                 PARTITION BY lang,
                   ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                     % {_PACK_SHARDS}
                 ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
               0) AS tokens_before
      FROM documents),
    b AS (SELECT lang, shard, doc_id, n_tokens,
                 CAST(floor(tokens_before / {float(_PACK_BUDGET)}) AS BIGINT) AS pack_id
          FROM a)
    SELECT lang, shard, pack_id, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc,
           round(CAST(sum(n_tokens) AS DOUBLE) / {float(_PACK_BUDGET)}, 6) AS fill_ratio
    FROM b GROUP BY lang, shard, pack_id
    """,
)
def pk1_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk pack manifest: cumulative token count per
    (language, md5-shard) stream → fixed-budget pack assignment →
    per-pack summary. One window + one same-key aggregation; the
    composite stream key keeps parallelism proportional to shard count
    instead of capping at the number of languages."""
    docs = _t(spark, sf_dir, "documents")
    return pk.pack_summary(pk.pack_assignments(docs, budget=_PACK_BUDGET), budget=_PACK_BUDGET)


_CHUNK_W, _CHUNK_S = 64, 48


@register(
    "pk2_chunk_documents",
    f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    s AS (SELECT doc_id, t, unnest(range(0, greatest(len(t), 1), {_CHUNK_S})) AS st FROM t)
    SELECT doc_id,
           CAST(floor(st / {float(_CHUNK_S)}) AS BIGINT) AS chunk_idx,
           CAST(len(list_slice(t, st + 1, st + {_CHUNK_W})) AS BIGINT) AS chunk_tokens,
           md5(array_to_string(list_slice(t, st + 1, st + {_CHUNK_W}), ' ')) AS chunk_md5
    FROM s
    """,
)
def pk2_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style overlapping chunks (window 64, stride 48): per-row
    sequence+explode fanout, zero shuffles, digest per chunk."""
    docs = _t(spark, sf_dir, "documents")
    return pk.chunk_documents(docs, window=_CHUNK_W, stride=_CHUNK_S)


# ---------------------------------------------------------------------------
# Privacy: pseudonymize + generalize + k-anonymity audit
# ---------------------------------------------------------------------------

_KANON_BAND = 1000.0


@register(
    "pv1_k_anonymity",
    f"""
    WITH g AS (
      SELECT c_custkey, md5(CAST(c_name AS VARCHAR)) AS c_name_pseudo,
             CAST(floor(c_acctbal / {_KANON_BAND}) AS BIGINT) * {int(_KANON_BAND)}
               AS c_acctbal_band,
             c_nationkey, c_mktsegment
      FROM customer)
    SELECT c_custkey, c_name_pseudo, c_acctbal_band, c_nationkey,
           CASE WHEN count(*) OVER (PARTITION BY c_acctbal_band, c_nationkey) < 5
                THEN '*' ELSE c_mktsegment END AS c_mktsegment,
           count(*) OVER (PARTITION BY c_acctbal_band, c_nationkey) AS k_anon
    FROM g
    """,
)
def pv1_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudonymize direct identifiers (deterministic md5 so joins still
    work), generalize acctbal into 1000-wide bands, and suppress the
    sensitive segment in quasi-identifier groups smaller than k=5.
    One shuffle on the quasi-identifier key."""
    cust = _t(spark, sf_dir, "customer")
    return pv.pseudonymize_k_anon(
        cust,
        key_col="c_custkey",
        hash_cols=["c_name"],
        band_col="c_acctbal",
        band_width=_KANON_BAND,
        quasi_cols=["c_nationkey"],
        sensitive_col="c_mktsegment",
        k=5,
    )


# ---------------------------------------------------------------------------
# Text quality: repetition features; inverted index
# ---------------------------------------------------------------------------


@register(
    "txt6_repetition_stats",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    per AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
                   len(list_distinct(t)) AS nd,
                   CASE WHEN len(t) >= 2
                        THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
                        ELSE CAST([] AS VARCHAR[]) END AS bg
            FROM t),
    per2 AS (SELECT doc_id, n_tokens, nd, len(bg) AS nb, len(list_distinct(bg)) AS nbd
             FROM per),
    top AS (SELECT doc_id, max(tf) AS top_tf FROM (
              SELECT doc_id, tok, count(*) AS tf
              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
              GROUP BY doc_id, tok)
            GROUP BY doc_id)
    SELECT p.doc_id, p.n_tokens,
           round(t.top_tf / p.n_tokens, 6) AS top_token_frac,
           round(1.0 - p.nd / p.n_tokens, 6) AS dup_token_frac,
           CASE WHEN p.nb > 0 THEN round(1.0 - p.nbd / p.nb, 6) ELSE 0.0 END
             AS dup_bigram_frac,
           (round(t.top_tf / p.n_tokens, 6) > 0.2
            OR CASE WHEN p.nb > 0 THEN round(1.0 - p.nbd / p.nb, 6) ELSE 0.0 END > 0.9)
             AS is_repetitive
    FROM per2 p JOIN top t ON p.doc_id = t.doc_id
    """,
)
def txt6_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition features (top-token / dup-unigram /
    dup-bigram fractions) + composite flag. One (doc, token) shuffle with
    map-side combine; the ratio features are pure codegen."""
    return tx.repetition_stats(_t(spark, sf_dir, "documents"))


@register(
    "txt7_inverted_index",
    """
    WITH tf AS (SELECT term, doc, count(*) AS tf FROM (
        SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS term FROM documents)
      GROUP BY term, doc)
    SELECT term, count(*) AS doc_freq, CAST(sum(tf) AS BIGINT) AS coll_freq,
           md5(string_agg(CAST(doc AS VARCHAR) || ':' || CAST(tf AS VARCHAR),
                          ',' ORDER BY doc)) AS postings_md5
    FROM tf GROUP BY term
    """,
)
def txt7_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index dictionary: per-term document frequency, collection
    frequency, and an order-canonical postings digest. Two shuffles —
    (doc, term) tf with map-side combine, then (term)."""
    return tx.inverted_index(_t(spark, sf_dir, "documents"))
