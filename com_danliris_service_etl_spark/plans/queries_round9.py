"""Round-9 registry queries.

a23_returned_items closes the last distinct decision-support shape the
driver fixture supports (VERDICT r8 task 6): the TPC-H Q10 returned-item
report — one quarter's orders x customers whose lineitems came back
(`l_returnflag = 'R'`), revenue-ranked top 20. Q14 reduces to a20's
CASE-in-sum, and Q2/Q9/Q16 need a partsupp table the fixture does not
carry (COVERAGE.md records that closure).

Reference provenance: the reference's sales dashboards rank customers by
returned/credited value over a period (the SC-family facts,
`Connection/Sales/*`); this is that panel as one set-at-a-time plan.

Determinism notes (cross-engine hash gate):
- revenue = sum(l_extendedprice * (1 - l_discount)) is rounded 2dp on
  both sides BEFORE the rank; the top-20 cut is totally ordered by
  (revenue_2dp DESC, c_custkey) so the boundary row is engine-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from com_danliris_service_etl_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# A23 — returned-item revenue report (TPC-H Q10 shape)
# ---------------------------------------------------------------------------

_A23_SQL = """
WITH rev AS (
  SELECT o_custkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         count(*)::BIGINT AS n_items
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
  GROUP BY o_custkey)
SELECT c_custkey, c_name, n_name, revenue,
       round(c_acctbal, 2) AS acctbal, n_items
FROM rev
JOIN customer ON c_custkey = o_custkey
JOIN nation   ON n_nationkey = c_nationkey
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("a23_returned_items", _A23_SQL)
def a23_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue lost to returned items in one quarter
    (TPC-H Q10 shape) — the returned-items report panel.

    Scale shape: the returnflag filter and the 4-column projection push
    to the lineitem scan; the quarter band pushes to the orders scan.
    ONE fact-fact shuffle join (lineitem ⋈ orders on orderkey), then the
    aggregate collapses to per-customer grain BEFORE any dimension
    joins — the customer join probes with |active customers in the
    quarter| rows, not the fact. Customer is the fact-sized-dimension
    class (a20 discipline): no explicit broadcast hint — AQE broadcasts
    it at fixture scale and shuffles at 100 TB; nation broadcasts
    unconditionally. The top-20 is TakeOrderedAndProject (bounded
    driver-side), totally ordered by (revenue 2dp DESC, c_custkey)."""
    band_lo = F.lit("1995-10-01 00:00:00").cast("timestamp")
    band_hi = F.lit("1996-01-01 00:00:00").cast("timestamp")
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= band_lo) & (F.col("o_orderdate") < band_hi))
        .select("o_orderkey", "o_custkey")
    )
    rev = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        rev.join(c, rev["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_items",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# DD11 — per-document top-k similar neighbors (LSH candidates + window)
# ---------------------------------------------------------------------------


def _dd11_sql(k: int = 3) -> str:
    from com_danliris_service_etl_spark.plans.queries_llm import _minhash_sql

    return f"""
WITH cand AS (SELECT * FROM ({_minhash_sql()}) c),
sym AS (
  SELECT doc_a AS doc_id, doc_b AS neighbor_id, est_jaccard FROM cand
  UNION ALL
  SELECT doc_b AS doc_id, doc_a AS neighbor_id, est_jaccard FROM cand
),
r AS (
  SELECT doc_id, neighbor_id, est_jaccard,
         row_number() OVER (
           PARTITION BY doc_id
           ORDER BY est_jaccard DESC, neighbor_id
         ) AS rank
  FROM sym
)
SELECT doc_id, neighbor_id, est_jaccard, CAST(rank AS INT) AS rank
FROM r WHERE rank <= {k}
"""


@register("dd11_topk_similar", _dd11_sql())
def dd11_topk_similar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 most-similar neighbors
    (operators/dedup.py::topk_similar_docs): the banded-LSH candidate
    set symmetrized (narrow union, no extra shuffle of the candidate
    build) and cut by a per-doc window totally ordered on
    (est_jaccard DESC, neighbor_id) — the curation-UI / canonical-keeper
    primitive. Candidate work stays the LSH bound (never |D|²); window
    state is the doc's own candidate count."""
    from com_danliris_service_etl_spark.operators.dedup import topk_similar_docs

    out = topk_similar_docs(_t(spark, sf_dir, "documents"), k=3)
    return out.withColumn("rank", F.col("rank").cast("int"))


# ---------------------------------------------------------------------------
# TXT17 — bigram-LM quality scoring (the CCNet-style perplexity filter)
# ---------------------------------------------------------------------------

_TXT17_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
big AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM toks, unnest(range(1, len(t))) AS u(i)
  WHERE len(t) >= 2
),
bc AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM big GROUP BY 1, 2),
ctx AS (SELECT w1, sum(c12)::BIGINT AS c1 FROM bc GROUP BY 1),
v AS (SELECT count(DISTINCT tok)::DOUBLE AS v
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)),
model AS (
  SELECT bc.w1, bc.w2,
         (c12 + 0.5) / (c1 + 0.5 * v.v) AS p
  FROM bc JOIN ctx USING (w1) CROSS JOIN v
)
SELECT big.doc_id, count(*)::BIGINT AS n_bigrams,
       round(avg(-ln(p)), 4) AS avg_nll
FROM big JOIN model ON big.w1 = model.w1 AND big.w2 = model.w2
GROUP BY 1
"""


@register("txt17_bigram_lm_score", _TXT17_SQL)
def txt17_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-k-smoothed bigram LM trained on the corpus, every document
    scored by mean −ln p(w2|w1) (operators/text.py::bigram_lm_scores) —
    the CCNet-style perplexity filter for pretraining curation. One
    bigram explode feeds both the model aggregates and the scoring
    probe (lazy checkpoint at the fork); the model joins back on the
    bigram key as a SHUFFLE join by design — at 100 TB the model is
    vocabulary-scale and must not be hinted broadcast."""
    from com_danliris_service_etl_spark.operators.text import bigram_lm_scores

    return bigram_lm_scores(_t(spark, sf_dir, "documents"), add_k=0.5)


# ---------------------------------------------------------------------------
# LLM17 — cross-source near-dup overlap matrix
# ---------------------------------------------------------------------------


def _llm17_sql() -> str:
    from com_danliris_service_etl_spark.plans.queries_llm import _minhash_sql

    return f"""
WITH cand AS (SELECT * FROM ({_minhash_sql()}) c),
src AS (SELECT doc_id, source FROM documents),
tagged AS (
  SELECT least(sa.source, sb.source) AS source_a,
         greatest(sa.source, sb.source) AS source_b,
         c.est_jaccard
  FROM cand c
  JOIN src sa ON sa.doc_id = c.doc_a
  JOIN src sb ON sb.doc_id = c.doc_b
)
SELECT source_a, source_b, count(*)::BIGINT AS n_pairs,
       round(avg(est_jaccard), 4) AS avg_est_jaccard
FROM tagged GROUP BY 1, 2
"""


@register("llm17_source_overlap", _llm17_sql())
def llm17_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source near-duplicate overlap matrix: LSH candidate pairs
    tagged with their documents' source labels (canonical cell =
    lexicographic (least, greatest) so the matrix is upper-triangular),
    counted per source pair — the corpus-curation report that tells you
    WHICH feeds duplicate each other before you buy/dedup them.

    Scale shape: the doc→source map is fact-sized, so the two tag joins
    are UNHINTED equi-joins (AQE broadcasts at fixture scale, shuffles
    at 100 TB); the matrix itself is |sources|² — bounded output."""
    from com_danliris_service_etl_spark.operators.dedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs)
    src = docs.select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("__sa"))
    sb = src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("__sb"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            F.least("__sa", "__sb").alias("source_a"),
            F.greatest("__sa", "__sb").alias("source_b"),
            "est_jaccard",
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("est_jaccard"), 4).alias("avg_est_jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# SIM10 — IVF+PQ two-stage ANN (the FAISS "IVF,PQ" production shape)
# ---------------------------------------------------------------------------

_S10_M = 8
_S10_SUB = 8  # 64-dim / 8 subspaces
_S10_CELLS = 16  # coarse centroids AND PQ codebook: vec_id < 16


def _sim10_sql(k: int = 5) -> str:
    from com_danliris_service_etl_spark.operators.similarity import PQ_SCALE
    from com_danliris_service_etl_spark.plans.queries_llm import _FOLD_DOT

    dot_ec = _FOLD_DOT.format(a="v.e", b="c.cv")
    n_e = _FOLD_DOT.format(a="v.e", b="v.e")
    n_c = _FOLD_DOT.format(a="c.cv", b="c.cv")
    subdist = (
        "CAST(round(list_reduce(list_prepend(0.0,"
        f" list_transform(range(1, {_S10_SUB + 1}),"
        f"  i -> ({{v}}[mi * {_S10_SUB} + i] - cb.cvec[mi * {_S10_SUB} + i])"
        f"     * ({{v}}[mi * {_S10_SUB} + i] - cb.cvec[mi * {_S10_SUB} + i]))),"
        f" (acc, x) -> acc + x) * {PQ_SCALE}) AS BIGINT)"
    )
    return f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    cent AS (SELECT vec_id AS cent_id, embedding::DOUBLE[] AS cv
             FROM embeddings WHERE vec_id < {_S10_CELLS}),
    assign AS (
      SELECT vec_id, cent_id,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY sim DESC, cent_id) AS rk
      FROM (SELECT v.vec_id, c.cent_id,
                   {dot_ec} / (sqrt({n_e}) * sqrt({n_c})) AS sim
            FROM v CROSS JOIN cent c)),
    cells AS (SELECT vec_id, cent_id AS cell FROM assign WHERE rk = 1),
    cb AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec
           FROM embeddings WHERE vec_id < {_S10_CELLS}),
    cdist AS (SELECT v.vec_id, r.mi, cb.cid, {subdist.format(v="v.e")} AS sd
              FROM v, range(0, {_S10_M}) AS r(mi), cb),
    codes AS (SELECT vec_id, mi, cid AS code FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id, mi
                                             ORDER BY sd, cid) AS rk
                FROM cdist) WHERE rk = 1),
    qs AS (SELECT v.vec_id AS query_id, v.e AS qv, cells.cell
           FROM v JOIN cells USING (vec_id) WHERE v.vec_id < 10),
    dtab AS (SELECT q.query_id, r.mi, cb.cid AS code, {subdist.format(v="q.qv")} AS sd
             FROM qs q, range(0, {_S10_M}) AS r(mi), cb),
    nc AS (SELECT v.vec_id AS neighbor_id, cells.cell
           FROM v JOIN cells USING (vec_id)),
    adc AS (SELECT q.query_id, nc.neighbor_id, CAST(sum(d.sd) AS BIGINT) AS ds
            FROM qs q
            JOIN nc ON nc.cell = q.cell AND nc.neighbor_id <> q.query_id
            JOIN codes c ON c.vec_id = nc.neighbor_id
            JOIN dtab d ON d.query_id = q.query_id
                       AND d.mi = c.mi AND d.code = c.code
            GROUP BY 1, 2)
    SELECT query_id, neighbor_id,
           round(ds / {float(PQ_SCALE)}, 6) AS approx_l2sq, rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY ds, neighbor_id) AS rank
          FROM adc)
    WHERE rank <= {k}
    """


@register("sim10_ivf_pq_topk", _sim10_sql())
def sim10_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ two-stage top-5 (operators/similarity.py::ivf_pq_topk):
    a 16-cell inverted file routes every vector (broadcast centroid
    fold, zero corpus shuffle), candidates come only from the query's
    cell (equi-join on the cell id), and in-cell scoring is exact
    scaled-BIGINT PQ table lookups over the code matrix — the
    billion-vector serving shape (FAISS "IVF,PQ") where the index is
    (id, cell, m codes) and raw floats are never touched after
    encoding. Completes the ANN family as the combined production
    variant of sim4 (IVF) and sim8 (PQ). Codes are positions into the
    cid-sorted codebook; cids are contiguous here so position == cid,
    matching the oracle's cid-keyed lookup (the sim8 convention)."""
    from com_danliris_service_etl_spark.operators import similarity as sim

    emb = _t(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < _S10_CELLS)
    return sim.ivf_pq_topk(
        emb,
        cent,
        cent,
        k=5,
        m=_S10_M,
        dim=64,
        query_filter=F.col("vec_id") < 10,
    )


# ---------------------------------------------------------------------------
# O8 — rendezvous-hash shard routing (consistent placement)
# ---------------------------------------------------------------------------

_O8_N = 8

_O8_SQL = f"""
WITH w AS (
  SELECT doc_id, s,
         md5(doc_id::VARCHAR || ':' || s::VARCHAR) AS h
  FROM documents, range(0, {_O8_N}) AS r(s)
),
a AS (
  SELECT doc_id, s AS shard, h,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY h DESC, s DESC) AS rk
  FROM w
),
cur AS (SELECT doc_id, shard, h FROM a WHERE rk = 1)
SELECT shard, count(*)::BIGINT AS n_docs,
       sum(CASE WHEN md5(doc_id::VARCHAR || ':{_O8_N}') > h
                THEN 1 ELSE 0 END)::BIGINT AS n_moved_to_{_O8_N + 1}
FROM cur GROUP BY 1
"""


@register("o8_rendezvous_routing", _O8_SQL)
def o8_rendezvous_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous-hash shard map (operators/packing.py::rendezvous_assign)
    with the consistency property demonstrated IN-QUERY: per-shard doc
    counts for an 8-shard ring, plus how many of each shard's keys would
    move if a 9th shard joined — exactly the keys the new shard's weight
    now wins, ~1/9 of the corpus, where mod-N hashing would move ~8/9.
    The assignment is one per-row array fold (zero shuffle); the report
    aggregate is bounded by the shard count."""
    from com_danliris_service_etl_spark.operators.packing import rendezvous_assign

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    assigned = rendezvous_assign(docs, _O8_N)
    new_w = F.expr(f"md5(concat(cast(doc_id AS STRING), ':', '{_O8_N}'))")
    return (
        assigned.withColumn("__moves", (new_w > F.col("__w")).cast("int"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__moves").cast("long").alias(f"n_moved_to_{_O8_N + 1}"),
        )
    )


# ---------------------------------------------------------------------------
# PV6 — per-source PII redaction report (the governance rollup of pv2)
# ---------------------------------------------------------------------------


def _pv6_sql() -> str:
    from com_danliris_service_etl_spark.operators.privacy import (
        PII_EMAIL,
        PII_PHONE,
    )

    return (
        """
    WITH aug AS (
      SELECT doc_id, source,
             text
             || CASE WHEN doc_id % 3 = 0
                     THEN ' contact user' || doc_id::VARCHAR || '@example.com'
                     ELSE '' END
             || CASE WHEN doc_id % 5 = 0
                     THEN ' call +62 812-3456789'
                     ELSE '' END AS text
      FROM documents),
    per_doc AS (
      SELECT source,
             len(regexp_extract_all(text, '__EMAIL__')) AS n_emails,
             len(regexp_extract_all(text, '__PHONE__')) AS n_phones
      FROM aug)
    SELECT source,
           count(*)::BIGINT AS n_docs,
           sum(n_emails)::BIGINT AS total_emails,
           sum(n_phones)::BIGINT AS total_phones,
           sum(CASE WHEN n_emails + n_phones > 0 THEN 1 ELSE 0 END)::BIGINT
             AS n_docs_with_pii,
           round(sum(CASE WHEN n_emails + n_phones > 0 THEN 1 ELSE 0 END)
                   * 1.0 / count(*), 6) AS pii_rate
    FROM per_doc GROUP BY source
    """
        .replace("__EMAIL__", PII_EMAIL)
        .replace("__PHONE__", PII_PHONE)
    )


@register("pv6_redaction_report", _pv6_sql())
def pv6_redaction_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII incidence report over the pv2 relation (same
    deterministic injection so there are real positives): doc counts,
    email/phone match totals, and the per-source PII rate — the
    governance rollup a curation pipeline publishes BEFORE redaction so
    feed owners see what leaks where. Per-row regex work pipelines into
    the scan; the report aggregate is map-side-combinable and bounded by
    the source alphabet."""
    from com_danliris_service_etl_spark.operators import privacy as pv

    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0, F.lit(" call +62 812-3456789")).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    t = F.col("text")
    n_emails = F.size(F.regexp_extract_all(t, F.lit(pv.PII_EMAIL), F.lit(0)))
    n_phones = F.size(F.regexp_extract_all(t, F.lit(pv.PII_PHONE), F.lit(0)))
    per_doc = aug.select(
        "source", n_emails.alias("__e"), n_phones.alias("__p")
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__e").cast("long").alias("total_emails"),
        F.sum("__p").cast("long").alias("total_phones"),
        F.sum(((F.col("__e") + F.col("__p")) > 0).cast("int"))
        .cast("long")
        .alias("n_docs_with_pii"),
        F.round(
            F.sum(((F.col("__e") + F.col("__p")) > 0).cast("int"))
            / F.count(F.lit(1)),
            6,
        ).alias("pii_rate"),
    )
