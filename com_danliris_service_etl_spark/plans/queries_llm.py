"""LLM-training-data pipeline queries (BASELINE.json north star): dedup,
similarity search, text analysis, multimodal plumbing — over the
`documents` and `embeddings` tables.

Oracle SQL is generated programmatically next to each Spark plan so the two
sides stay expression-for-expression identical (same hash inputs, same fold
order, same rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from com_danliris_service_etl_spark.operators import dedup as dd
from com_danliris_service_etl_spark.operators import multimodal as mm
from com_danliris_service_etl_spark.operators import similarity as sim
from com_danliris_service_etl_spark.operators import text as tx
from com_danliris_service_etl_spark.operators.text import LANG_MARKERS
from com_danliris_service_etl_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@register(
    "dd1_exact_dedup",
    """
    SELECT md5(text) AS text_hash, min(doc_id) AS keeper_id, count(*) AS n_docs
    FROM documents GROUP BY md5(text)
    """,
)
def dd1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: digest → (keeper, count). One uniform shuffle."""
    return dd.exact_dedup_groups(_t(spark, sf_dir, "documents"))


def _minhash_sql(n_perms: int = 16, bands: int = 4, k: int = 3) -> str:
    from com_danliris_service_etl_spark.operators.dedup import (
        MINHASH_PRIME,
        _perm_consts,
    )

    rpb = n_perms // bands
    mins = ",\n             ".join(
        f"min(({a} * h + {b}) % {MINHASH_PRIME}) AS mh{p}"
        for p, (a, b) in enumerate(_perm_consts(n_perms))
    )
    band_cases = " ".join(
        "WHEN {b} THEN md5({parts})".format(
            b=b,
            parts=" || ':' || ".join(
                f"mh{p}::VARCHAR" for p in range(b * rpb, (b + 1) * rpb)
            ),
        )
        for b in range(bands)
    )
    est = " + ".join(f"CASE WHEN sa.mh{p} = sb.mh{p} THEN 1 ELSE 0 END" for p in range(n_perms))
    shingle = " || ' ' || ".join(f"t[i+{j}]" for j in range(k))
    return f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT DISTINCT doc_id, {shingle} AS s
           FROM toks, UNNEST(range(1, len(t) - {k - 2})) AS u(i)
           WHERE len(t) >= {k}),
    shh AS (SELECT doc_id, ('0x' || substring(md5(s), 1, 8))::BIGINT AS h FROM sh),
    mh AS (SELECT doc_id, {mins} FROM shh GROUP BY doc_id),
    bands AS (SELECT doc_id, b.b AS band_idx, CASE b.b {band_cases} END AS band_hash
              FROM mh, (VALUES (0),(1),(2),(3)) b(b)),
    pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
              FROM bands x JOIN bands y
                ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
                   AND x.doc_id < y.doc_id)
    SELECT p.doc_a, p.doc_b, ({est}) / {float(n_perms)} AS est_jaccard
    FROM pairs p JOIN mh sa ON sa.doc_id = p.doc_a JOIN mh sb ON sb.doc_id = p.doc_b
    """


@register("dd2_minhash_lsh", _minhash_sql())
def dd2_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16 perms) + LSH(4 bands) near-dup candidate pairs with
    estimated Jaccard. No O(n²) stage — see operators/dedup.py."""
    return dd.minhash_lsh_pairs(_t(spark, sf_dir, "documents"))


def _simhash_sql(hex_chars: int = 4) -> str:
    votes = []
    for j in range(hex_chars):
        nib = f"(strpos('0123456789abcdef', substring(h, {j + 1}, 1)) - 1)"
        for kbit in range(4):
            bit = 4 * j + kbit
            votes.append(
                f"sum(CASE WHEN (({nib} >> {kbit}) & 1) = 1 THEN 1 ELSE -1 END) AS v{bit}"
            )
    votes_sql = ",\n               ".join(votes)
    fp = " + ".join(
        f"CASE WHEN v{bit} > 0 THEN {1 << bit} ELSE 0 END" for bit in range(4 * hex_chars)
    )
    return f"""
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    h AS (SELECT doc_id, substring(md5(tok), 1, {hex_chars}) AS h FROM toks),
    votes AS (SELECT doc_id, {votes_sql}
              FROM h GROUP BY doc_id)
    SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM votes
    """


@register("dd3_simhash", _simhash_sql())
def dd3_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints (16-bit, token-frequency weighted)."""
    return dd.simhash_fingerprints(_t(spark, sf_dir, "documents"))


@register(
    "dd4_ngram_jaccard",
    """
    WITH prepped AS (
      SELECT doc_id, lang, source, CAST(floor(n_chars / 50) AS BIGINT) AS size_bucket,
             list_distinct(string_split(text, ' ')) AS toks
      FROM documents)
    SELECT doc_a, doc_b, jaccard FROM (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
                   CAST(len(a.toks) + len(b.toks)
                        - len(list_intersect(a.toks, b.toks)) AS DOUBLE), 6) AS jaccard
      FROM prepped a JOIN prepped b
        ON a.lang = b.lang AND a.source = b.source
           AND a.size_bucket = b.size_bucket AND a.doc_id < b.doc_id)
    WHERE jaccard >= 0.5
    """,
)
def dd4_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked token-set Jaccard near-dup pairs (block = lang × size
    bucket): Σ block² cost, not n²."""
    return dd.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_FOLD_DOT = (
    "list_reduce(list_prepend(0.0, list_transform(range(1, 65), i -> {a}[i] * {b}[i])),"
    " (acc, v) -> acc + v)"
)


def _cosine_sql(where: str, join: str) -> str:
    dot = _FOLD_DOT.format(a="q.qv", b="c.cv")
    nq = _FOLD_DOT.format(a="q.qv", b="q.qv")
    nc = _FOLD_DOT.format(a="c.cv", b="c.cv")
    return f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings {where}),
    c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
    scored AS (
      SELECT query_id, neighbor_id,
             round({dot} / (sqrt({nq}) * sqrt({nc})), 6) AS cos_sim
      FROM q JOIN c ON query_id <> neighbor_id {join})
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored)
    WHERE rank <= 5
    """


@register("sim1_cosine_topk", _cosine_sql("WHERE vec_id < 10", ""))
def sim1_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for the first 10 query vectors."""
    emb = _t(spark, sf_dir, "embeddings")
    return sim.brute_force_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


_BUCKET_SQL = " + ".join(
    f"(CASE WHEN {{v}}[{d + 1}] > 0 THEN {1 << d} ELSE 0 END)" for d in range(8)
)


@register(
    "sim2_lsh_bucketed_topk",
    _cosine_sql(
        "WHERE vec_id < 10",
        "AND (" + _BUCKET_SQL.format(v="q.qv") + ") = (" + _BUCKET_SQL.format(v="c.cv") + ")",
    ),
)
def sim2_lsh_bucketed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5: candidates restricted to the query's sign-bit LSH
    bucket — the equi-join scale path (no cross product)."""
    emb = _t(spark, sf_dir, "embeddings")
    return sim.lsh_bucketed_topk(emb, emb.filter(F.col("vec_id") < 10), k=5, n_bits=8)


@register(
    "sim3_multiprobe_topk",
    _cosine_sql(
        "WHERE vec_id < 10",
        "AND bit_count(xor(CAST(" + _BUCKET_SQL.format(v="q.qv") + " AS BIGINT), CAST("
        + _BUCKET_SQL.format(v="c.cv") + " AS BIGINT))) <= 1",
    ),
)
def sim3_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe sign-bit LSH top-5: each query probes its bucket + all
    Hamming-distance-1 buckets — the recall fix over sim2, still an
    equi-join (probes generated query-side, corpus never exploded). The
    oracle states the equivalent predicate bit_count(xor) <= 1."""
    emb = _t(spark, sf_dir, "embeddings")
    return sim.multiprobe_lsh_topk(emb, emb.filter(F.col("vec_id") < 10), k=5, n_bits=8)


_SIM13_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, label, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, label, embedding::DOUBLE[] AS cv
      FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         round({_FOLD_DOT.format(a="q.qv", b="c.cv")}
               / (sqrt({_FOLD_DOT.format(a="q.qv", b="q.qv")})
                  * sqrt({_FOLD_DOT.format(a="c.cv", b="c.cv")})), 6)
           AS cos_sim
  FROM q JOIN c ON q.label = c.label AND query_id <> neighbor_id)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored)
WHERE rank <= 5
"""


@register("sim13_filtered_topk", _SIM13_SQL)
def sim13_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered exact top-5 (operators/similarity.py
    `filtered_topk`): each query vector retrieves only among corpus
    vectors sharing its label — tenant/language-scoped retrieval, where
    post-filtering an unfiltered ANN result under-fills k and
    pre-filtering IS an equi-join on the metadata key. The filter is the
    join key, so the candidate set per query is its own label partition,
    never the corpus."""
    emb = _t(spark, sf_dir, "embeddings")
    return sim.filtered_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5, filter_col="label"
    )


_SIM15_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, label, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, label, embedding::DOUBLE[] AS cv
      FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         round({_FOLD_DOT.format(a="q.qv", b="c.cv")}
               / (sqrt({_FOLD_DOT.format(a="q.qv", b="q.qv")})
                  * sqrt({_FOLD_DOT.format(a="c.cv", b="c.cv")})), 6)
           AS cos_sim
  FROM q JOIN c ON q.label = c.label AND query_id <> neighbor_id
   AND bit_count(xor(CAST({_BUCKET_SQL.format(v="q.qv")} AS BIGINT),
                     CAST({_BUCKET_SQL.format(v="c.cv")} AS BIGINT))) <= 1)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored)
WHERE rank <= 5
"""


@register("sim15_filtered_lsh_topk", _SIM15_SQL)
def sim15_filtered_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-label multi-probe LSH top-5 (operators/similarity.py
    `filtered_multiprobe_topk`): sim13's documented dense-label escape —
    when one label owns a corpus-scale share of rows, exact in-label
    retrieval degenerates to per-label brute force, so candidates are
    additionally restricted to Hamming-distance-≤1 sign-bit buckets
    WITHIN the label, a composite (label, bucket) equi-join. The oracle
    states the equivalent bit_count(xor) <= 1 predicate. Recall of this
    escape on CLUSTERED data is measured by tools/bench_sim13_clustered.py
    (BASELINE.md r13)."""
    emb = _t(spark, sf_dir, "embeddings")
    return sim.filtered_multiprobe_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5,
        filter_col="label", n_bits=8,
    )


# MMR score in exact INTEGER micro-units (the sim9 recipe): a float
# "0.7*cos - 0.3*ms" is NOT cross-engine-safe even on identical inputs —
# DuckDB fuses the multiply-subtract (FMA) into a differently-rounded
# double (1 ulp off on 4/30 rows), and re-rounding to 6dp lands on exact
# half-microunit ties the engines break differently. cos_sim/ms are
# 6dp-quantized, so round(x*1e6) recovers exact integers on any engine;
# the score is then pure BIGINT arithmetic, and the emitted double is
# one exact division of identical ints (< 2^53) by 1e12.
_MMR_POOL = 10
_MMR_SCORE = (
    "(700000 * CAST(round(cos_sim * 1000000.0) AS BIGINT)"
    " - 300000 * CAST(round(coalesce(ms, 0.0) * 1000000.0) AS BIGINT))"
)

_SIM14_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
      FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         round({_FOLD_DOT.format(a="q.qv", b="c.cv")}
               / (sqrt({_FOLD_DOT.format(a="q.qv", b="q.qv")})
                  * sqrt({_FOLD_DOT.format(a="c.cv", b="c.cv")})), 6)
           AS cos_sim
  FROM q JOIN c ON query_id <> neighbor_id),
pool AS (
  SELECT query_id, neighbor_id, cos_sim FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, neighbor_id) AS rnk
    FROM scored) WHERE rnk <= {_MMR_POOL}),
pv AS (SELECT p.query_id, p.neighbor_id, p.cos_sim,
              e.embedding::DOUBLE[] AS v
       FROM pool p JOIN embeddings e ON e.vec_id = p.neighbor_id),
pp AS (SELECT a.query_id, a.neighbor_id AS pa, b.neighbor_id AS pb,
              round({_FOLD_DOT.format(a="a.v", b="b.v")}
                    / (sqrt({_FOLD_DOT.format(a="a.v", b="a.v")})
                       * sqrt({_FOLD_DOT.format(a="b.v", b="b.v")})), 6)
                AS sab
       FROM pv a JOIN pv b ON a.query_id = b.query_id
                          AND a.neighbor_id <> b.neighbor_id),
st1 AS (SELECT query_id, neighbor_id, cos_sim,
               CAST(NULL AS DOUBLE) AS ms FROM pool),
s1 AS (SELECT query_id, neighbor_id, sc FROM (
         SELECT query_id, neighbor_id, {_MMR_SCORE} AS sc,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY {_MMR_SCORE} DESC, neighbor_id)
                  AS rn
         FROM st1) WHERE rn = 1),
st2 AS (SELECT p.query_id, p.neighbor_id, p.cos_sim, pp.sab AS ms
        FROM pool p
        JOIN s1 ON p.query_id = s1.query_id
               AND p.neighbor_id <> s1.neighbor_id
        LEFT JOIN pp ON pp.query_id = p.query_id
                    AND pp.pa = p.neighbor_id AND pp.pb = s1.neighbor_id),
s2 AS (SELECT query_id, neighbor_id, sc FROM (
         SELECT query_id, neighbor_id, {_MMR_SCORE} AS sc,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY {_MMR_SCORE} DESC, neighbor_id)
                  AS rn
         FROM st2) WHERE rn = 1),
st3 AS (SELECT u.query_id, u.neighbor_id, u.cos_sim,
               greatest(u.ms, pp.sab) AS ms
        FROM st2 u
        JOIN s2 ON u.query_id = s2.query_id
               AND u.neighbor_id <> s2.neighbor_id
        LEFT JOIN pp ON pp.query_id = u.query_id
                    AND pp.pa = u.neighbor_id AND pp.pb = s2.neighbor_id),
s3 AS (SELECT query_id, neighbor_id, sc FROM (
         SELECT query_id, neighbor_id, {_MMR_SCORE} AS sc,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY {_MMR_SCORE} DESC, neighbor_id)
                  AS rn
         FROM st3) WHERE rn = 1)
SELECT query_id, neighbor_id, 1 AS mmr_rank,
       sc::DOUBLE / 1000000000000.0 AS mmr_score FROM s1
UNION ALL
SELECT query_id, neighbor_id, 2 AS mmr_rank,
       sc::DOUBLE / 1000000000000.0 AS mmr_score FROM s2
UNION ALL
SELECT query_id, neighbor_id, 3 AS mmr_rank,
       sc::DOUBLE / 1000000000000.0 AS mmr_score FROM s3
"""


@register("sim14_mmr_rerank", _SIM14_SQL)
def sim14_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversified rerank (operators/similarity.py `mmr_rerank`):
    greedy top-3 from each query's exact top-10 pool maximizing
    0.7·cos(q,c) − 0.3·max cos(c, selected) — the anti-redundancy tail
    that stops a RAG context filling with near-duplicates of one
    passage. Corpus-scale work is only the candidate pool; the greedy
    tail runs FUSED — one Arrow applyInPandas per query-pool (integer
    micro-unit arithmetic, equivalence-pinned against the unrolled
    dataframe-steps form) — after the r13 k-curve measured the unrolled
    job-barrier tax: 1.09 vs 0.83 s at this k=3/pool=10 shape, 39.4 vs
    1.14 s at k=20/pool=40 (BASELINE.md r13). The oracle states the
    greedy steps as CTEs."""
    emb = _t(spark, sf_dir, "embeddings")
    return sim.mmr_rerank(
        emb, emb.filter(F.col("vec_id") < 10), k=3, pool=_MMR_POOL, lam=0.7,
        strategy="fused",
    )


_IVF_CELLS = 16  # deterministic coarse quantizer: first 16 vectors as centroids


def _ivf_sql(n_cells: int = _IVF_CELLS) -> str:
    dot_ec = _FOLD_DOT.format(a="v.e", b="c.cv")
    n_e = _FOLD_DOT.format(a="v.e", b="v.e")
    n_c = _FOLD_DOT.format(a="c.cv", b="c.cv")
    dot_qn = _FOLD_DOT.format(a="q.qv", b="n.nv")
    n_q = _FOLD_DOT.format(a="q.qv", b="q.qv")
    n_n = _FOLD_DOT.format(a="n.nv", b="n.nv")
    return f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    cent AS (SELECT vec_id AS cent_id, embedding::DOUBLE[] AS cv
             FROM embeddings WHERE vec_id < {n_cells}),
    assign AS (
      SELECT vec_id, cent_id,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY sim DESC, cent_id) AS rk
      FROM (SELECT v.vec_id, c.cent_id,
                   {dot_ec} / (sqrt({n_e}) * sqrt({n_c})) AS sim
            FROM v CROSS JOIN cent c)),
    cells AS (SELECT vec_id, cent_id AS cell FROM assign WHERE rk = 1),
    q AS (SELECT v.vec_id AS query_id, v.e AS qv, cells.cell
          FROM v JOIN cells USING (vec_id) WHERE v.vec_id < 10),
    n AS (SELECT v.vec_id AS neighbor_id, v.e AS nv, cells.cell
          FROM v JOIN cells USING (vec_id)),
    scored AS (
      SELECT query_id, neighbor_id,
             round({dot_qn} / (sqrt({n_q}) * sqrt({n_n})), 6) AS cos_sim
      FROM q JOIN n USING (cell) WHERE query_id <> neighbor_id)
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored)
    WHERE rank <= 5
    """


def _ivf_filtered_sql(n_cells: int = _IVF_CELLS) -> str:
    dot_ec = _FOLD_DOT.format(a="v.e", b="c.cv")
    n_e = _FOLD_DOT.format(a="v.e", b="v.e")
    n_c = _FOLD_DOT.format(a="c.cv", b="c.cv")
    dot_qn = _FOLD_DOT.format(a="q.qv", b="n.nv")
    n_q = _FOLD_DOT.format(a="q.qv", b="q.qv")
    n_n = _FOLD_DOT.format(a="n.nv", b="n.nv")
    return f"""
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
    cent AS (SELECT vec_id AS cent_id, embedding::DOUBLE[] AS cv
             FROM embeddings WHERE vec_id < {n_cells}),
    assign AS (
      SELECT vec_id, cent_id,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY sim DESC, cent_id) AS rk
      FROM (SELECT v.vec_id, c.cent_id,
                   {dot_ec} / (sqrt({n_e}) * sqrt({n_c})) AS sim
            FROM v CROSS JOIN cent c)),
    cells AS (SELECT vec_id, cent_id AS cell FROM assign WHERE rk = 1),
    q AS (SELECT v.vec_id AS query_id, v.label, v.e AS qv, cells.cell
          FROM v JOIN cells USING (vec_id) WHERE v.vec_id < 10),
    n AS (SELECT v.vec_id AS neighbor_id, v.label, v.e AS nv, cells.cell
          FROM v JOIN cells USING (vec_id)),
    scored AS (
      SELECT query_id, neighbor_id,
             round({dot_qn} / (sqrt({n_q}) * sqrt({n_n})), 6) AS cos_sim
      FROM q JOIN n ON q.cell = n.cell AND q.label = n.label
      WHERE query_id <> neighbor_id)
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored)
    WHERE rank <= 5
    """


@register("sim16_filtered_ivf_topk", _ivf_filtered_sql())
def sim16_filtered_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-label IVF(nprobe=1) top-5 — the IVF arm of the dense-label
    escape family (sim15 is the LSH arm): candidates must share the
    query's label AND its coarse-quantizer cell, a composite
    (label, cell) equi-join, so one tenant owning a corpus-scale share
    of rows still retrieves against |tenant|/C-sized inverted lists.
    The filter is enforced before retrieval (post-filtering an
    unfiltered ANN result under-fills k). Same deterministic centroid
    contract as sim4."""
    emb = _t(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < _IVF_CELLS)
    return sim.ivf_topk(
        emb, None, cent, k=5,
        query_filter=F.col("vec_id") < 10, filter_col="label",
    )


@register("sim4_ivf_topk", _ivf_sql())
def sim4_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF(nprobe=1) top-5: corpus + queries coarse-quantized to their
    nearest of 16 deterministic centroids (first 16 vectors standing in for
    an offline-trained k-means codebook); candidates = the query's cell
    only. Equi-join on the cell id — the inverted-file ANN scale path.
    Queries are corpus rows, so the query_filter fast path assigns cells
    in ONE pass over the materialized index."""
    emb = _t(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < _IVF_CELLS)
    return sim.ivf_topk(
        emb, None, cent, k=5, query_filter=F.col("vec_id") < 10
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "txt1_token_stats",
    f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           length(text) AS n_chars_calc,
           len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
           round(CAST(list_reduce(list_prepend(0, list_transform(string_split(text, ' '),
                                                                 t -> length(t))),
                                  (a, b) -> a + b) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS avg_token_len,
           len(regexp_extract_all(text, '{tx.BPE_SPLIT_RE}')) AS n_bpe_pieces,
           list_reduce(list_prepend(0::BIGINT,
                                    list_transform(regexp_extract_all(text, '{tx.BPE_SPLIT_RE}'),
                                                   p -> CAST(ceil(length(p) / 4.0) AS BIGINT))),
                       (a, b) -> a + b) AS n_bpe_tokens_est
    FROM documents
    """,
)
def txt1_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.token_stats(_t(spark, sf_dir, "documents"))


def _hits_sql(markers: tuple[str, ...]) -> str:
    in_list = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter(string_split(text, ' '), t -> t IN ({in_list})))"


@register(
    "txt2_quality_score",
    f"""
    WITH feat AS (
      SELECT doc_id,
             CAST({_hits_sql(LANG_MARKERS["en"])} AS DOUBLE)
               / len(string_split(text, ' ')) AS stop_ratio,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) AS distinct_ratio,
             CAST(list_reduce(list_prepend(0, list_transform(string_split(text, ' '),
                                                             t -> length(t))),
                              (a, b) -> a + b) AS DOUBLE)
               / len(string_split(text, ' ')) AS avg_len
      FROM documents)
    SELECT doc_id,
           round(stop_ratio, 6) AS stopword_ratio,
           round(distinct_ratio, 6) AS distinct_ratio,
           round(avg_len, 6) AS avg_token_len,
           round(stop_ratio * 0.3 + distinct_ratio * 0.5
                 + least(avg_len / 10.0, 1.0) * 0.2, 6) AS quality
    FROM feat
    """,
)
def txt2_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.quality_score(_t(spark, sf_dir, "documents"))


def _langid_sql() -> str:
    langs = sorted(LANG_MARKERS)
    scores = ",\n             ".join(
        f"{_hits_sql(LANG_MARKERS[lang])} AS s_{lang}" for lang in langs
    )
    cases = []
    for lang in langs:
        conds = " AND ".join(f"s_{lang} >= s_{o}" for o in langs if o != lang)
        cases.append(f"WHEN {conds} THEN '{lang}'")
    case_sql = " ".join(cases)
    return f"""
    WITH scored AS (
      SELECT doc_id, lang AS lang_actual,
             {scores}
      FROM documents)
    SELECT doc_id, lang_actual, CASE {case_sql} END AS lang_pred FROM scored
    """


@register("txt3_langid", _langid_sql())
def txt3_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language ID with deterministic alphabetical-argmax."""
    return tx.detect_language(_t(spark, sf_dir, "documents"))


def _rolling_sql() -> str:
    """DuckDB twin of text._window_hashes: same Horner steps, same window
    positions (range() end-exclusive = sequence() end-inclusive + 1)."""
    h = "CAST(ascii(substring(text, i, 1)) AS BIGINT)"
    for j in range(1, tx.ROLL_W):
        h = f"(({h}) * {tx.ROLL_B} + ascii(substring(text, i+{j}, 1))) % {tx.ROLL_M}"
    wh = f"list_transform(range(1, length(text) - {tx.ROLL_W - 2}), i -> {h})"
    return f"""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
             AS fingerprint,
           CASE WHEN length(text) >= {tx.ROLL_W}
                THEN list_min({wh}) END AS rolling_min_hash,
           CASE WHEN length(text) >= {tx.ROLL_W}
                THEN len(list_distinct({wh})) END AS n_distinct_windows
    FROM documents
    """


@register("txt4_fingerprint", _rolling_sql())
def txt4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical (sorted-distinct-token) fingerprint for reorder-resistant
    dedup + Rabin-Karp rolling-window content sketch (min window hash,
    distinct-window count)."""
    return tx.fingerprint(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------


@register(
    "mm1_binary_metadata",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS sha256_hex
    FROM documents
    """,
)
def mm1_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-side metadata (length + SHA-256) over binary payload columns."""
    return mm.binary_metadata(_t(spark, sf_dir, "documents"))


# The decode stub is deterministic byte arithmetic, so it IS oracle-able:
# DuckDB recomputes the same features over hex(encode(text)). The registered
# query projects the feature vector to scalar doubles (f0..f3) because the
# driver's canonicalizer can't sort an array<double> column; the Arrow
# mapInPandas path underneath is unchanged.
_MM2_SQL = """
    WITH d AS (SELECT doc_id, hex(encode(text)) AS hx,
                      octet_length(encode(text)) AS n
               FROM documents)
    SELECT doc_id, n AS n_bytes,
           CAST(n AS DOUBLE) AS f0,
           CAST(CASE WHEN n = 0 THEN 0
                     ELSE ('0x' || substring(hx, 1, 2))::INT END AS DOUBLE) AS f1,
           CAST(CASE WHEN n = 0 THEN 0
                     ELSE ('0x' || substring(hx, 2 * n - 1, 2))::INT END AS DOUBLE) AS f2,
           CAST(CASE WHEN n = 0 THEN 0
                     ELSE list_reduce(
                            list_prepend(0, list_transform(
                              range(1, least(n, 64) + 1),
                              i -> ('0x' || substring(hx, 2 * i - 1, 2))::INT)),
                            (a, b) -> a + b) % 997 END AS DOUBLE) AS f3
    FROM d
"""


@register("mm2_decode_features", _MM2_SQL)
def mm2_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode/feature-extract via mapInPandas. The decoder is
    a documented deterministic stub (no media libs in the image); the
    plumbing — schema, batching, UDF signature — is the real contract."""
    feats = mm.extract_features(_t(spark, sf_dir, "documents"))
    return feats.select(
        "doc_id",
        "n_bytes",
        *[F.col("features")[i].alias(f"f{i}") for i in range(mm.FEATURE_DIM)],
    )


# Frame slicing is byte substring — DuckDB mirrors it by slicing the hex
# payload over a stepped frame-index range. Both sides emit the frame as a
# HEX STRING: Spark hands binary columns to pandas as bytearray, which the
# driver's hash canonicalizer can't factorize (unhashable), so raw-binary
# output columns must never cross the registry boundary.
_MM3_SQL = """
    WITH d AS (SELECT doc_id, hex(encode(text)) AS hx,
                      octet_length(encode(text)) AS n
               FROM documents),
    f AS (SELECT doc_id, hx, greatest(1, n // 32) AS n_frames FROM d)
    SELECT doc_id, CAST(u.i AS INTEGER) AS frame_idx,
           substring(hx, CAST(u.i * 64 + 1 AS INTEGER), 64) AS frame_hex
    FROM f, UNNEST(range(0, n_frames, 2)) AS u(i)
"""


@register("mm3_frame_sample", _MM3_SQL)
def mm3_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling over binary payloads (every 2nd 32-byte
    frame): the 1:N mapInPandas fanout shape for media pipelines."""
    frames = mm.frame_sample(_t(spark, sf_dir, "documents"), frame_bytes=32, every_n=2)
    return frames.select("doc_id", "frame_idx", F.hex("frame").alias("frame_hex"))


# ---------------------------------------------------------------------------
# Composed training-data funnel
# ---------------------------------------------------------------------------


def _clean_corpus_sql() -> str:
    en = _hits_sql(LANG_MARKERS["en"])
    return f"""
    WITH lang AS ({_langid_sql()}),
    qual AS (
      SELECT doc_id,
             round(CAST({en} AS DOUBLE) / len(string_split(text, ' ')) * 0.3
                   + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                     / len(string_split(text, ' ')) * 0.5
                   + least(CAST(list_reduce(list_prepend(0, list_transform(
                                  string_split(text, ' '), t -> length(t))),
                                (a, b) -> a + b) AS DOUBLE)
                           / len(string_split(text, ' ')) / 10.0, 1.0) * 0.2,
                   6) AS quality
      FROM documents),
    keep AS (SELECT min(doc_id) AS keeper_id FROM documents GROUP BY md5(text))
    SELECT d.doc_id, d.source, d.n_chars, lang.lang_pred, qual.quality
    FROM documents d
    JOIN lang USING (doc_id)
    JOIN qual USING (doc_id)
    WHERE d.doc_id IN (SELECT keeper_id FROM keep)
      AND lang.lang_pred = 'en' AND qual.quality >= 0.5
    """


@register("llm1_clean_corpus", _clean_corpus_sql())
def llm1_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data preprocessing funnel — language filter ∘
    quality threshold ∘ exact-dedup keeper — as ONE declarative plan, the
    shape a 100 TB corpus actually runs nightly. The langid and quality
    stages are pure per-row expressions, so they are FUSED into the scan
    projection (`language_pred_col`/`quality_col`) rather than computed
    as separate frames and joined back on the id — two whole join
    shuffles gone. The dedup digest is fused into the SAME projection
    and the text-free base is materialized once (lazy checkpoint), so
    the corpus text is read and hashed in a SINGLE pass feeding both
    the keeper aggregate and the semi-join (the two-reference fork
    otherwise re-runs the scan per reference; measured −20% at sf0.1,
    identical results). Remaining shuffles: the digest groupBy and the
    keeper semi-join, both keyed on uniformly-distributed hashes. Each
    stage is individually verified by txt3 / txt2 / dd1
    (`exact_dedup_groups` stays the standalone dd1 operator); this
    query verifies their composition."""
    from com_danliris_service_etl_spark.operators.dedup import _spread

    # _spread: langid+quality+digest is the funnel's hot projection and a
    # one-file corpus would run it on ONE partition (the sim1 lesson, r11)
    docs = _spread(_t(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        "source",
        "n_chars",
        tx.language_pred_col().alias("lang_pred"),
        tx.quality_col().alias("quality"),
        F.md5(F.col("text")).alias("__digest"),
    ).localCheckpoint(eager=False)
    keep = (
        base.groupBy("__digest")
        .agg(F.min("doc_id").alias("keeper_id"))
        .select("keeper_id")
    )
    return (
        base.join(keep, F.col("doc_id") == F.col("keeper_id"), "left_semi")
        .filter((F.col("lang_pred") == "en") & (F.col("quality") >= 0.5))
        .select("doc_id", "source", "n_chars", "lang_pred", "quality")
    )


# ---------------------------------------------------------------------------
# Deterministic corpus sampling
# ---------------------------------------------------------------------------


@register(
    "llm2_hash_split",
    """
    SELECT doc_id,
           ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bucket,
           CASE WHEN ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 90
                  THEN 'train'
                WHEN ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 95
                  THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def llm2_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by id-hash bucket: shuffle-free
    per-row projection, stable under corpus growth, verified (not sampled)
    — the reproducible-split primitive a training pipeline needs."""
    from com_danliris_service_etl_spark.operators.sampling import hash_split

    return hash_split(_t(spark, sf_dir, "documents"))


@register(
    "llm3_quota_sample",
    """
    SELECT doc_id, lang, source, sample_rank FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY lang, source
                                ORDER BY md5(doc_id::VARCHAR), doc_id)
               AS sample_rank
      FROM documents)
    WHERE sample_rank <= 50
    """,
)
def llm3_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-(lang, source) quota downsampling (hash-ranked,
    cap 50): the anti-domination lever for mixed corpora, with a kept set
    that is stable across partitionings and reruns."""
    from com_danliris_service_etl_spark.operators.sampling import quota_per_group

    return quota_per_group(_t(spark, sf_dir, "documents"), cap=50)


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------


def _decontamination_sql(k: int = 3, bench_max_id: int = 20) -> str:
    shingle = " || ' ' || ".join(f"t[i+{j}]" for j in range(k))
    return f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT DISTINCT doc_id, {shingle} AS s
           FROM toks, UNNEST(range(1, len(t) - {k - 2})) AS u(i)
           WHERE len(t) >= {k}),
    bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < {bench_max_id}),
    corpus AS (SELECT doc_id, s FROM sh WHERE doc_id >= {bench_max_id}),
    tot AS (SELECT doc_id, count(*)::BIGINT AS n_shingles FROM corpus GROUP BY doc_id),
    hit AS (SELECT c.doc_id, count(*)::BIGINT AS n_hit
            FROM corpus c JOIN bench b ON c.s = b.s GROUP BY c.doc_id)
    SELECT t.doc_id, t.n_shingles,
           coalesce(h.n_hit, 0)::BIGINT AS n_hit,
           coalesce(h.n_hit, 0)::DOUBLE / t.n_shingles::DOUBLE AS contamination
    FROM tot t LEFT JOIN hit h USING (doc_id)
    """


@register("llm5_decontamination", _decontamination_sql())
def llm5_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-corpus hygiene: per-document fraction of distinct
    3-shingles that appear in a held-out benchmark set (docs 0..19 stand
    in for the eval set). The corpus side is scored per-row against the
    broadcast benchmark shingle array
    (`operators/dedup.py::contamination_scores`) — zero corpus shuffle;
    the oracle computes the same overlap via an exploded semi-join. The
    downstream decontamination filter is `contamination < threshold`."""
    from com_danliris_service_etl_spark.operators.dedup import contamination_scores

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 20)
    corpus = docs.filter(F.col("doc_id") >= 20)
    return contamination_scores(corpus, bench)


@register(
    "txt5_tfidf_top_terms",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    tf AS (
      SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term),
    dfreq AS (
      SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks GROUP BY term),
    n AS (SELECT count(*)::DOUBLE AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf,
             round(tf.tf * ln(n.n / dfreq.df), 6) AS tfidf
      FROM tf JOIN dfreq USING (term), n),
    ranked AS (
      SELECT doc_id, term, tf, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rank
      FROM scored)
    SELECT doc_id, term, tf, tfidf, rank::BIGINT AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def txt5_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document
    (`operators/text.py::tfidf_top_terms`): tf and df each one
    map-side-combinable shuffle, vocabulary-sized df table broadcast
    back, ranks computed over the ROUNDED score so ln() ulp differences
    can't flip cross-engine order."""
    from com_danliris_service_etl_spark.operators.text import tfidf_top_terms

    return tfidf_top_terms(_t(spark, sf_dir, "documents"))


@register(
    "llm6_weighted_sample",
    """
    WITH keyed AS (
      SELECT doc_id, lang, n_chars AS weight,
             round(pow((('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                          ::DOUBLE + 1.0) / 4294967297.0,
                       1.0 / n_chars::DOUBLE), 12) AS k
      FROM documents WHERE n_chars > 0),
    ranked AS (
      SELECT doc_id, lang, weight,
             row_number() OVER (PARTITION BY lang ORDER BY k DESC, doc_id)
               AS sample_rank
      FROM keyed)
    SELECT doc_id, lang, weight, sample_rank
    FROM ranked WHERE sample_rank <= 50
    """,
)
def llm6_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (A-ES
    exponential keys, `operators/sampling.py::weighted_sample_per_group`)
    — longer documents proportionally likelier, per-lang top-50,
    reproducible from the id hash alone. Ranked on the rounded key with
    id tiebreak so pow() ulp differences can't flip cross-engine order."""
    from com_danliris_service_etl_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    return weighted_sample_per_group(
        _t(spark, sf_dir, "documents"), weight_col="n_chars"
    )


@register(
    "dd6_dedup_clusters",
    """
    WITH RECURSIVE pairs AS (
      SELECT doc_a, doc_b FROM ({minhash}) mh
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, lbl) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.a, r.lbl FROM edges e JOIN reach r ON e.b = r.node
    )
    SELECT node AS doc_id, min(lbl)::BIGINT AS cluster_id
    FROM reach GROUP BY node
    """.format(minhash=_minhash_sql()),
)
def dd6_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → dedup CLUSTERS: connected components over the
    dd2 candidate graph via iterative min-label propagation
    (`operators/dedup.py::dedup_clusters`); cluster_id = min doc id
    reachable = the cluster's keeper. The oracle computes the same
    components with a recursive transitive-closure CTE — feasible on the
    oracle's pair counts, while the Spark side's per-round join +
    min-aggregate is the 100 TB formulation. This is the registry's
    iterative-algorithm representative: the loop runs driver-side with
    one convergence count per round and localCheckpoint lineage
    truncation."""
    from com_danliris_service_etl_spark.operators.dedup import (
        dedup_clusters,
        minhash_lsh_pairs,
    )

    return dedup_clusters(minhash_lsh_pairs(_t(spark, sf_dir, "documents")))
