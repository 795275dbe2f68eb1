"""Round-10 additions: Gopher-style repetition quality stats and
reciprocal-rank-fusion hybrid retrieval — two canonical LLM-corpus
operators (Rae et al. 2021 §A1.1 repetition filters; Cormack et al. 2009
RRF) the registry did not yet cover.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from com_danliris_service_etl_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# LLM21 — per-document repetition stats (Gopher quality rules)
# ---------------------------------------------------------------------------

# Thresholds in exact integer micro-shares (value * 1e6, floor division):
# chosen to SPLIT the fixture distribution (dup_token_frac spans 0–0.72,
# top-bigram share 0.01–0.17 at sf0.01) so both flag outcomes occur —
# an all-true/all-false detector can hide a broken comparison.
_DUP_MICRO = 550_000
_BG_MICRO = 80_000
_TG_MICRO = 60_000

_LLM21_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
s AS (
  SELECT doc_id,
         len(tk)::BIGINT AS n_tokens,
         len(list_distinct(tk))::BIGINT AS nd,
         list_max(list_transform(
           list_distinct(list_transform(range(1, len(tk)),
                                        i -> tk[i] || ' ' || tk[i+1])),
           x -> len(list_filter(
                  list_transform(range(1, len(tk)),
                                 i -> tk[i] || ' ' || tk[i+1]),
                  y -> y = x))))::BIGINT AS bg_cnt,
         list_max(list_transform(
           list_distinct(list_transform(range(1, len(tk) - 1),
                                        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])),
           x -> len(list_filter(
                  list_transform(range(1, len(tk) - 1),
                                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]),
                  y -> y = x))))::BIGINT AS tg_cnt
  FROM t WHERE len(tk) >= 3)
SELECT doc_id, n_tokens,
       ((n_tokens - nd) * 1000000) // n_tokens AS dup_token_micro,
       (bg_cnt * 1000000) // (n_tokens - 1) AS top_bigram_micro,
       (tg_cnt * 1000000) // (n_tokens - 2) AS top_trigram_micro,
       (((n_tokens - nd) * 1000000) // n_tokens > {_DUP_MICRO}
        OR (bg_cnt * 1000000) // (n_tokens - 1) > {_BG_MICRO}
        OR (tg_cnt * 1000000) // (n_tokens - 2) > {_TG_MICRO}) AS is_repetitive
FROM s
"""


@register("llm21_repetition_stats", _LLM21_SQL)
def llm21_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition filter (Rae et al. 2021,
    arXiv:2112.11446 §A1.1 — the MassiveText quality rules): per doc, the
    duplicate-token fraction and the share of the single most frequent
    bigram/trigram, plus the keep/drop flag. Repetition is the classic
    LLM-corpus failure mode (boilerplate loops, template spam) that
    doc-level dedup cannot catch because the duplication is INSIDE one
    document.

    Scale shape (r14 rewrite — the honest-estimator find): the
    top-gram counts were a row-local `array_max(transform(
    array_distinct(g), x -> size(filter(g, y -> y = x))))` fold —
    O(distinct × n) per doc, and every one of those lambda evaluations
    ran INTERPRETED (higher-order functions are CodegenFallback), with
    the gram array itself rebuilt per distinct element: 13.8 s at
    sf0.1 once the noop estimator actually evaluated the projection
    (the prior "ZERO shuffles" claim was measured under count(), which
    pruned the whole fold). Now the bigram/trigram arrays are built
    ONCE per row (zip_with over slices of the projected token array —
    a single cheap-lambda pass), tagged, exploded, and the max
    frequency comes from two map-side-combinable hash aggregates
    ((doc, w, gram) count → per-doc conditional max): codegen end to
    end, 0.5 s at the same scale. The duplicate-token fraction stays
    row-local (native array_distinct). Per-doc-grain output does not
    make row-local folds free — what matters is whether the per-row
    expression interprets.

    Exactness: all three shares are integer micro-units via floor
    division of exact longs ((cnt * 1e6) div denom, numerators
    non-negative so div == floor in both engines) — no float compare
    anywhere, flags included."""
    from com_danliris_service_etl_spark.operators.dedup import _spread

    docs = _spread(_t(spark, sf_dir, "documents"))
    tk = (
        docs.select("doc_id", F.split("text", " ").alias("tk"))
        .filter(F.size("tk") >= 3)
    )
    base = tk.select(
        "doc_id",
        F.size("tk").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("tk")).cast("bigint").alias("nd"),
    )
    bg = (
        "zip_with(slice(tk, 1, size(tk) - 1), slice(tk, 2, size(tk) - 1),"
        " (x, y) -> concat(x, ' ', y))"
    )
    tg = (
        f"zip_with({bg.replace('size(tk) - 1', 'size(tk) - 2')},"
        " slice(tk, 3, size(tk) - 2), (x, y) -> concat(x, ' ', y))"
    )
    grams = tk.select(
        "doc_id",
        F.explode(
            F.expr(
                f"concat(transform({bg}, g -> struct(2 AS w, g)),"
                f" transform({tg}, g -> struct(3 AS w, g)))"
            )
        ).alias("__g"),
    ).select("doc_id", "__g.w", "__g.g")
    tops = (
        grams.groupBy("doc_id", "w", "g")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy("doc_id")
        .agg(
            F.max(F.when(F.col("w") == 2, F.col("__c"))).cast("bigint")
            .alias("bg_cnt"),
            F.max(F.when(F.col("w") == 3, F.col("__c"))).cast("bigint")
            .alias("tg_cnt"),
        )
    )
    s = base.join(tops, "doc_id")
    dup = F.expr("((n_tokens - nd) * 1000000) div n_tokens")
    bgm = F.expr("(bg_cnt * 1000000) div (n_tokens - 1)")
    tgm = F.expr("(tg_cnt * 1000000) div (n_tokens - 2)")
    return s.select(
        "doc_id",
        "n_tokens",
        dup.alias("dup_token_micro"),
        bgm.alias("top_bigram_micro"),
        tgm.alias("top_trigram_micro"),
        (
            (dup > _DUP_MICRO) | (bgm > _BG_MICRO) | (tgm > _TG_MICRO)
        ).alias("is_repetitive"),
    )


# ---------------------------------------------------------------------------
# SIM11 — reciprocal-rank-fusion hybrid retrieval (dense ∪ lexical)
# ---------------------------------------------------------------------------

_RRF_K = 60
_RETR_K = 5
_N_QUERIES = 10

_FOLD_DOT = (
    "list_reduce(list_prepend(0.0, list_transform(range(1, 65), i -> {a}[i] * {b}[i])),"
    " (acc, v) -> acc + v)"
)


def _sim11_sql() -> str:
    dot_qc = _FOLD_DOT.format(a="q.e", b="c.e")
    n_q = _FOLD_DOT.format(a="q.e", b="q.e")
    n_c = _FOLD_DOT.format(a="c.e", b="c.e")
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
dense AS (
  SELECT query_id, neighbor_id, rd FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY round({dot_qc} / (sqrt({n_q}) * sqrt({n_c})), 6) DESC,
                                       c.vec_id) AS rd
    FROM v q JOIN v c ON q.vec_id < {_N_QUERIES} AND q.vec_id <> c.vec_id)
  WHERE rd <= {_RETR_K}),
arrs AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(tk) - 1),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS arr
  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
  WHERE len(tk) >= 3),
lex AS (
  SELECT query_id, neighbor_id, rl FROM (
    SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.doc_id
                              ORDER BY round(
                                len(list_intersect(q.arr, c.arr))::DOUBLE
                                / (len(q.arr) + len(c.arr)
                                   - len(list_intersect(q.arr, c.arr))), 6) DESC,
                                       c.doc_id) AS rl
    FROM arrs q JOIN arrs c ON q.doc_id < {_N_QUERIES} AND q.doc_id <> c.doc_id)
  WHERE rl <= {_RETR_K}),
fused AS (
  SELECT query_id, neighbor_id, rd AS rank_dense, rl AS rank_lex,
         round(coalesce(1.0::DOUBLE / ({_RRF_K} + rd), 0.0)
               + coalesce(1.0::DOUBLE / ({_RRF_K} + rl), 0.0), 6) AS rrf_score
  FROM dense FULL JOIN lex USING (query_id, neighbor_id))
SELECT query_id, neighbor_id, rank_dense, rank_lex, rrf_score,
       fused_rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf_score DESC, neighbor_id)
               AS fused_rank
      FROM fused)
WHERE fused_rank <= {_RETR_K}
"""


@register("sim11_rrf_hybrid", _sim11_sql())
def sim11_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion (Cormack, Clarke &
    Büttcher 2009): fuse a DENSE ranking (embedding cosine top-k,
    ops/similarity.py::brute_force_topk — the aligned embeddings table)
    with a LEXICAL ranking (exact 3-shingle Jaccard top-k over the same
    documents) by rrf = Σ 1/(60 + rank), the standard hybrid-search
    combiner that needs no score calibration between systems.

    Scale shape: the query set is bounded (the sim-family convention),
    so BOTH rankers broadcast the queries and stream the corpus once —
    no corpus shuffle; per-query top-k is a window partitioned by query.
    The fusion itself touches only |Q|·2k rank rows (a full outer join
    on (query, candidate) + coalesce — missing side contributes 0). At
    real scale each ranker swaps in its candidate-generation variant
    (LSH/IVF for dense — sim2/sim4; prefix-filter or LSH for lexical —
    dd10/dd11) and the fusion tail is UNCHANGED — rank lists are the
    interface, which is RRF's whole point.

    Exactness: both rankings order by 6dp-rounded scores with candidate
    id as total-order tiebreak; rrf adds two IEEE doubles in a fixed
    order then rounds 6dp — engine-identical."""
    from pyspark.sql import Window

    from com_danliris_service_etl_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    dense = brute_force_topk(
        emb, emb.filter(F.col("vec_id") < _N_QUERIES), k=_RETR_K
    ).select(
        "query_id",
        "neighbor_id",
        F.col("rank").cast("bigint").alias("rank_dense"),
    )

    from com_danliris_service_etl_spark.operators.dedup import _spread

    docs = _t(spark, sf_dir, "documents")
    arrs = (
        docs.select("doc_id", F.split("text", " ").alias("tk"))
        .filter(F.size("tk") >= 3)
        .select(
            "doc_id",
            F.array_distinct(
                F.expr(
                    "transform(sequence(0, size(tk) - 3),"
                    " i -> concat(tk[i], ' ', tk[i+1], ' ', tk[i+2]))"
                )
            ).alias("arr"),
        )
    )
    q = arrs.filter(F.col("doc_id") < _N_QUERIES).select(
        F.col("doc_id").alias("query_id"), F.col("arr").alias("q_arr")
    )
    inter = F.size(F.array_intersect("q_arr", "arr"))
    jac = F.round(
        inter.cast("double")
        / (F.size("q_arr") + F.size("arr") - inter),
        6,
    )
    w_lex = Window.partitionBy("query_id").orderBy(
        F.col("__jac").desc(), F.col("neighbor_id")
    )
    # _spread on the CORPUS-side consumer only: the lexical ranker pays a
    # shingle build + |Q| array intersects PER DOC in this projection
    # (the heavy-fold class where spreading wins, r14) and a one-row-
    # group fixture scans as ONE partition; the dense side's
    # brute_force_topk already spreads, and the bounded query side
    # (broadcast) would re-run the spread exchange for nothing.
    lex = (
        _spread(arrs).crossJoin(F.broadcast(q))
        .filter(F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("doc_id").alias("neighbor_id"),
            jac.alias("__jac"),
        )
        .withColumn("rank_lex", F.row_number().over(w_lex).cast("bigint"))
        .filter(F.col("rank_lex") <= _RETR_K)
        .select("query_id", "neighbor_id", "rank_lex")
    )

    fused = dense.join(lex, ["query_id", "neighbor_id"], "full").select(
        "query_id",
        "neighbor_id",
        "rank_dense",
        "rank_lex",
        F.round(
            F.coalesce(
                F.lit(1.0) / (F.lit(_RRF_K) + F.col("rank_dense")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(_RRF_K) + F.col("rank_lex")), F.lit(0.0)
            ),
            6,
        ).alias("rrf_score"),
    )
    w_f = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("neighbor_id")
    )
    return (
        fused.withColumn(
            "fused_rank", F.row_number().over(w_f).cast("bigint")
        )
        .filter(F.col("fused_rank") <= _RETR_K)
    )


# ---------------------------------------------------------------------------
# TXT20 — BPE corpus encoding (apply the learned merges to every document)
# ---------------------------------------------------------------------------


def _txt20_sql(iterations: int = 3) -> str:
    from com_danliris_service_etl_spark.plans.queries_round9b import (
        _bpe_cte_prefix,
    )

    applied = "'  ' || regexp_replace(word, '(.)', '\\1  ', 'g')"
    for k in range(1, iterations + 1):
        applied = (
            f"replace({applied},"
            f" ' ' || (SELECT a FROM m{k}) || '  ' || (SELECT b FROM m{k}) || ' ',"
            f" ' ' || (SELECT a FROM m{k}) || (SELECT b FROM m{k}) || ' ')"
        )
    return f"""{_bpe_cte_prefix(iterations)},
docw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
enc AS (SELECT doc_id,
               length(word)::BIGINT AS chars,
               len(list_filter(string_split({applied}, '  '),
                               x -> x <> ''))::BIGINT AS toks
        FROM docw WHERE word <> '')
SELECT doc_id,
       count(*)::BIGINT AS n_words,
       CAST(sum(chars) AS BIGINT) AS n_chars,
       CAST(sum(toks) AS BIGINT) AS n_tokens,
       (CAST(sum(toks) AS BIGINT) * 1000000) // CAST(sum(chars) AS BIGINT)
         AS compression_micro
FROM enc GROUP BY doc_id HAVING sum(chars) > 0
"""


@register("txt20_bpe_encode", _txt20_sql())
def txt20_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE corpus ENCODING (ops/text.py::bpe_encode) — the apply half of
    the tokenizer pipeline txt19 trains: every document tokenized with
    the 3 learned merges, reporting per-doc words, pre-merge symbols
    (characters), post-merge tokens, and the exact integer compression
    micro-ratio. Train→apply is the operation an LLM data pipeline runs
    on the whole corpus once the tokenizer is fixed.

    Scale shape: training collects one bounded argmax row per step; the
    encode itself is a ZERO-shuffle row-local scan projection — the
    merges are string literals folded into a chained replace() inside a
    per-word fold, so tokenizing 100 TB is embarrassingly parallel. The
    oracle re-derives the same merges as training CTEs (shared with
    txt19 via _bpe_cte_prefix) and applies the same chained replace —
    greedy merge application is exact in both engines via the
    double-space symbol representation (see bpe_train)."""
    from com_danliris_service_etl_spark.operators.text import bpe_encode

    return bpe_encode(_t(spark, sf_dir, "documents"), iterations=3)


# ---------------------------------------------------------------------------
# SIM12 — embedding-truncation recall (MRL-style dimension ablation)
# ---------------------------------------------------------------------------

_TRUNC_DIMS = (32, 16)


def _sim12_sql() -> str:
    def topk_cte(alias: str, d: int | None) -> str:
        e_q = "q.e" if d is None else f"q.e[1:{d}]"
        e_c = "c.e" if d is None else f"c.e[1:{d}]"
        n = 64 if d is None else d
        fold = (
            "list_reduce(list_prepend(0.0, list_transform(range(1, {n} + 1),"
            " i -> {a}[i] * {b}[i])), (acc, v) -> acc + v)"
        )
        dot = fold.format(n=n, a=e_q, b=e_c)
        nq = fold.format(n=n, a=e_q, b=e_q)
        nc = fold.format(n=n, a=e_c, b=e_c)
        return f"""
{alias} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY round({dot} / (sqrt({nq}) * sqrt({nc})), 6) DESC,
                                       c.vec_id) AS rk
    FROM v q JOIN v c ON q.vec_id < {_N_QUERIES} AND q.vec_id <> c.vec_id)
  WHERE rk <= {_RETR_K})"""

    trunc_ctes = ",".join(topk_cte(f"t{d}", d) for d in _TRUNC_DIMS)
    sels = "\nUNION ALL".join(
        f"""
SELECT {d} AS dim, f.query_id,
       CAST(count(t{d}.neighbor_id) AS BIGINT) AS n_hits,
       round(count(t{d}.neighbor_id) / {float(_RETR_K)}, 6) AS recall
FROM fulltk f LEFT JOIN t{d}
  ON f.query_id = t{d}.query_id AND f.neighbor_id = t{d}.neighbor_id
GROUP BY f.query_id"""
        for d in _TRUNC_DIMS
    )
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
{topk_cte("fulltk", None).lstrip()},
{trunc_ctes}
{sels}
"""


@register("sim12_truncated_recall", _sim12_sql())
def sim12_truncated_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-truncation ablation (the Matryoshka-representation
    deployment question): recall@k of brute-force search over the FIRST
    d dimensions against full-dimension search, per query, for d in
    {32, 16} — the measurement that decides whether an index can store
    truncated vectors (2–4× memory/bandwidth saved) without silent
    quality loss. Output (dim, query_id, n_hits, recall) — exact
    integers plus one rounded division.

    Scale shape (fused, VERDICT r10 task 6): ONE corpus pass scores all
    three similarity spaces per (corpus row, query) pair — each space's
    dot is its own left fold over the slice, bit-identical to the
    per-space form — then ONE top-k window keyed (dim, query_id) and a
    join-free recall: group top-k rows by (query, neighbor) collecting
    which spaces retrieved the pair, count per query the pairs both the
    full space and d retrieved. 10 shuffles -> 3 + the conditional
    one-file-corpus spread (two of the three on
    |Q|·k-bounded relations); the corpus is streamed once, never
    shuffled (queries ride a broadcast). The unfused composition
    (brute_force_topk per space + recall_at_k per dim) is
    equivalence-pinned in tests/test_round10_ops.py."""
    from com_danliris_service_etl_spark.operators.similarity import (
        truncated_recall_ablation,
    )

    return truncated_recall_ablation(
        _t(spark, sf_dir, "embeddings"),
        n_queries=_N_QUERIES,
        dims=_TRUNC_DIMS,
        k=_RETR_K,
    )


# ---------------------------------------------------------------------------
# G16 — bounded k-core peeling trajectory
# ---------------------------------------------------------------------------

_KCORE_K = 110
_KCORE_ROUNDS = 4


def _g16_sql(k: int = _KCORE_K, rounds: int = _KCORE_ROUNDS) -> str:
    ctes = ["""
d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e0 AS MATERIALIZED (SELECT a.l_partkey AS src, b.l_partkey AS dst
       FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                        AND a.l_partkey < b.l_partkey
       GROUP BY 1, 2)"""]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(f"""
n{p} AS MATERIALIZED (SELECT node, count(*) AS deg
         FROM (SELECT src AS node FROM e{p}
               UNION ALL SELECT dst FROM e{p}) GROUP BY 1),
s{r} AS (SELECT node FROM n{p} WHERE deg >= {k}),
e{r} AS MATERIALIZED (SELECT e.src, e.dst FROM e{p} e
         JOIN s{r} x ON e.src = x.node
         JOIN s{r} y ON e.dst = y.node)""")
    sels = "\nUNION ALL ".join(
        f"""SELECT {r} AS round,
       (SELECT count(DISTINCT node) FROM
          (SELECT src AS node FROM e{r} UNION ALL SELECT dst FROM e{r}))::BIGINT
         AS n_nodes,
       (SELECT count(*) FROM e{r})::BIGINT AS n_edges"""
        for r in range(0, rounds + 1)
    )
    return f"WITH {','.join(ctes)}\n{sels}"


@register("g16_kcore_peel", _g16_sql())
def g16_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core peeling (ops/graph.py::kcore_peel) over the part
    co-purchase graph: 4 peel rounds at k=110, emitting the trajectory
    (round, surviving nodes, surviving edges). The cascade is the
    signal — on the fixture round 1 drops ~40% of nodes and round 2
    drops ~94% of the remainder, which no one-shot degree filter can
    express (a k-core member needs k neighbors who THEMSELVES survive).
    Community-density / spam-subgraph primitive; bounded rounds keep the
    oracle expressible as an unrolled CTE chain (the txt19 discipline) —
    production loops the same superstep to fixpoint on the survivor
    scalar."""
    from com_danliris_service_etl_spark.operators.bucketing import (
        ensure_bucketed_fact,
    )
    from com_danliris_service_etl_spark.operators.graph import kcore_peel

    # shared canonical layout (g9/g11/g13/g17 fingerprint): the edge
    # build's per-order collect_set plans zero exchanges (r12 task 4)
    li = ensure_bucketed_fact(
        spark, sf_dir, "lineitem", ["l_orderkey"],
        columns=["l_orderkey", "l_partkey"],
    )
    return kcore_peel(
        li, "l_orderkey", "l_partkey", k=_KCORE_K, rounds=_KCORE_ROUNDS
    )


# ---------------------------------------------------------------------------
# DD12 — LSH banding-parameter ablation (precision/recall vs exact truth)
# ---------------------------------------------------------------------------

_DD12_CONFIGS = (2, 4, 8)


def _dd12_sql(
    band_configs: tuple[int, ...] = _DD12_CONFIGS, n_perms: int = 16
) -> str:
    from com_danliris_service_etl_spark.operators.dedup import (
        MINHASH_PRIME,
        _perm_consts,
    )

    mins = ",\n             ".join(
        f"min(({a} * h + {b}) % {MINHASH_PRIME}) AS mh{p}"
        for p, (a, b) in enumerate(_perm_consts(n_perms))
    )

    def band_select(bands: int) -> str:
        rpb = n_perms // bands
        cases = " ".join(
            "WHEN {b} THEN md5({parts})".format(
                b=b,
                parts=" || ':' || ".join(
                    f"mh{p}::VARCHAR" for p in range(b * rpb, (b + 1) * rpb)
                ),
            )
            for b in range(bands)
        )
        return (
            f"SELECT {bands} AS bands, doc_id, b.b AS band_idx,"
            f" CASE b.b {cases} END AS band_hash"
            f" FROM mh, (SELECT unnest(range({bands})) AS b) b"
        )

    bands_union = "\n  UNION ALL ".join(band_select(b) for b in band_configs)
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
       FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i) WHERE len(t) >= 3),
shh AS (SELECT doc_id, ('0x' || substring(md5(s), 1, 8))::BIGINT AS h FROM sh),
mh AS (SELECT doc_id, {mins} FROM shh GROUP BY doc_id),
allbands AS ({bands_union}),
cand AS (SELECT DISTINCT x.bands, x.doc_id AS doc_a, y.doc_id AS doc_b
         FROM allbands x JOIN allbands y
           ON x.bands = y.bands AND x.band_idx = y.band_idx
              AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id),
sz AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS i
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
truth AS (SELECT doc_a, doc_b FROM inter
          JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
          WHERE 5 * i >= 3 * (sa.sz + sb.sz - i)),
tn AS (SELECT count(*)::BIGINT AS n_true FROM truth),
per AS (SELECT c.bands, count(*)::BIGINT AS n_candidates,
               sum(CASE WHEN t.doc_a IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                 AS n_hit
        FROM cand c
        LEFT JOIN truth t ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
        GROUP BY c.bands)
SELECT bands::BIGINT AS bands, {n_perms}::BIGINT AS n_perms,
       n_candidates, tn.n_true, n_hit,
       CASE WHEN n_candidates = 0 THEN NULL
            ELSE (n_hit * 1000000) // n_candidates END AS precision_micro,
       CASE WHEN tn.n_true = 0 THEN NULL
            ELSE (n_hit * 1000000) // tn.n_true END AS recall_micro
FROM per CROSS JOIN tn
"""


@register("dd12_lsh_ablation", _dd12_sql())
def dd12_lsh_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding ablation (ops/dedup.py::lsh_band_ablation): exact
    precision/recall of each (bands, rows) configuration's candidate
    pairs — 16 MinHash permutations split as 2×8 / 4×4 / 8×2 — against
    the TRUE Jaccard >= 0.6 pair set from the lossless prefix-filter
    join (dd10's machinery). The 'measure, don't guess' step before a
    corpus-scale dedup run: on this fixture 2 bands trades ~8% recall
    for perfect precision, 4 bands reaches full recall at ~84%
    precision, 8 bands buys no recall over 4 but a 4–5× candidate
    blow-up — the s-curve made empirical. Signatures are computed once for all configs; the truth
    side is candidates-only (never |D|²); the oracle recomputes truth
    the exhaustive shared-shingle way, pinning that prefix filtering
    dropped nothing."""
    from com_danliris_service_etl_spark.operators.dedup import lsh_band_ablation

    return lsh_band_ablation(
        _t(spark, sf_dir, "documents"), band_configs=_DD12_CONFIGS
    )


# ---------------------------------------------------------------------------
# TXT21 — tokenizer fertility per corpus slice
# ---------------------------------------------------------------------------


def _txt21_sql(iterations: int = 3) -> str:
    from com_danliris_service_etl_spark.plans.queries_round9b import (
        _bpe_cte_prefix,
    )

    applied = "'  ' || regexp_replace(word, '(.)', '\\1  ', 'g')"
    for k in range(1, iterations + 1):
        applied = (
            f"replace({applied},"
            f" ' ' || (SELECT a FROM m{k}) || '  ' || (SELECT b FROM m{k}) || ' ',"
            f" ' ' || (SELECT a FROM m{k}) || (SELECT b FROM m{k}) || ' ')"
        )
    return f"""{_bpe_cte_prefix(iterations)},
docw AS (SELECT lang, source, doc_id,
                unnest(string_split(text, ' ')) AS word
         FROM documents),
enc AS (SELECT lang, source, doc_id,
               length(word)::BIGINT AS chars,
               len(list_filter(string_split({applied}, '  '),
                               x -> x <> ''))::BIGINT AS toks
        FROM docw WHERE word <> ''),
per AS (SELECT lang, source, doc_id,
               count(*)::BIGINT AS w,
               CAST(sum(chars) AS BIGINT) AS c,
               CAST(sum(toks) AS BIGINT) AS t
        FROM enc GROUP BY 1, 2, 3 HAVING sum(chars) > 0)
SELECT lang, source,
       count(*)::BIGINT AS n_docs,
       CAST(sum(w) AS BIGINT) AS n_words,
       CAST(sum(c) AS BIGINT) AS n_chars,
       CAST(sum(t) AS BIGINT) AS n_tokens,
       (CAST(sum(t) AS BIGINT) * 1000000) // CAST(sum(w) AS BIGINT)
         AS fertility_micro,
       (CAST(sum(t) AS BIGINT) * 1000000) // CAST(sum(c) AS BIGINT)
         AS compression_micro
FROM per GROUP BY lang, source
"""


@register("txt21_tokenizer_fertility", _txt21_sql())
def txt21_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) tokenizer fertility report (ops/text.py::
    bpe_fertility): subword tokens per word and per character under the
    corpus-trained 3-merge BPE tokenizer — the slice-level evaluation
    table (Rust et al. 2021) that decides per-language token budgets
    and flags slices the tokenizer fits poorly. Shares the encode
    kernel with txt20; the only exchange is one map-side-combined
    aggregate on the slice key, so the report is one fact pass at any
    scale. The oracle re-derives the merges as CTEs (txt19's
    discipline) and aggregates doc-grain accounting the same way."""
    from com_danliris_service_etl_spark.operators.text import bpe_fertility

    return bpe_fertility(_t(spark, sf_dir, "documents"), iterations=3)


# ---------------------------------------------------------------------------
# G17 — synchronous label-propagation communities (bounded rounds)
# ---------------------------------------------------------------------------

_LPA_ROUNDS = 3


def _g17_sql(rounds: int = _LPA_ROUNDS) -> str:
    ctes = ["""
d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS MATERIALIZED (SELECT a.l_partkey AS src, b.l_partkey AS dst
       FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                        AND a.l_partkey < b.l_partkey
       GROUP BY 1, 2),
adj AS MATERIALIZED (SELECT src AS node, dst AS nbr FROM e
       UNION ALL SELECT dst, src FROM e),
l0 AS (SELECT DISTINCT node, node AS label FROM adj)"""]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(f"""
c{r} AS (SELECT a.node, l.label, count(*)::BIGINT AS cnt
         FROM adj a JOIN l{p} l ON l.node = a.nbr
         GROUP BY 1, 2),
l{r} AS MATERIALIZED (
  SELECT node, min(label) AS label
  FROM (SELECT node, label, cnt,
               max(cnt) OVER (PARTITION BY node) AS mc
        FROM c{r})
  WHERE cnt = mc GROUP BY node)""")
    return f"WITH {','.join(ctes)}\nSELECT node, label FROM l{rounds}"


@register("g17_label_propagation", _g17_sql())
def g17_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous LPA communities (ops/graph.py::label_propagation)
    over the part co-purchase graph, 3 bounded supersteps with the
    deterministic min-label tiebreak — the frequency-vote community
    detector, distinct from connected components (llm12/dd6 merge
    everything reachable; LPA finds denser-than-connectivity groups).
    Iterative superstep family: the oracle unrolls as MATERIALIZED CTEs
    (the g16 discipline) and, like the rest of that family, the
    recursive single-node formulation grows super-linearly with scale
    while the checkpointed superstep loop stays near-linear."""
    from com_danliris_service_etl_spark.operators.bucketing import (
        ensure_bucketed_fact,
    )
    from com_danliris_service_etl_spark.operators.graph import label_propagation

    # shared canonical layout (g9/g11/g13/g16 fingerprint): the edge
    # build's per-order collect_set plans zero exchanges (r12 task 4)
    li = ensure_bucketed_fact(
        spark, sf_dir, "lineitem", ["l_orderkey"],
        columns=["l_orderkey", "l_partkey"],
    )
    return label_propagation(li, "l_orderkey", "l_partkey", rounds=_LPA_ROUNDS)
