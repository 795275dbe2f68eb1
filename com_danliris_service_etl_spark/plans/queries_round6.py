"""Round-6 registry queries: the iterative-graph, frequency-sketch,
rank-profile, and nearest-asof capabilities.

- g8_pagerank — weighted PageRank (operators/graph.py) over the
  bidirected supplier↔customer fulfillment graph; the oracle unrolls the
  three power iterations as chained CTEs.
- sk3_countmin_heavy_hitters — count-min sketch (operators/sketches.py)
  with the sk1-style in-query accuracy contract on integer counts.
- w6_decile_profile — ntile/percent_rank/cume_dist rank profiling, the
  window-family rows (W-family) not yet covered by w1/w2/w4/w5.
- j12_asof_nearest — nearest-direction as-of join (operators/joins.py
  `asof_nearest`): single-shuffle single-sort two-frame window plan vs
  the oracle's quadratic per-key candidate ranking.

Each query pairs an idiomatic Spark plan with a DuckDB oracle over the
driver's parquet tables (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from com_danliris_service_etl_spark.operators.clustering import kmeans_fit
from com_danliris_service_etl_spark.operators.graph import pagerank
from com_danliris_service_etl_spark.operators.joins import asof_nearest
from com_danliris_service_etl_spark.operators.sketches import (
    countmin_estimate,
    countmin_sketch,
    tokens_of,
)
from com_danliris_service_etl_spark.plans.registry import _events, _t, register

# ---------------------------------------------------------------------------
# G8 — PageRank over the supplier↔customer fulfillment graph
# ---------------------------------------------------------------------------

# Three power iterations unrolled as CTEs; arithmetic is written to hit
# the SAME IEEE operations as the Spark side ((1.0 - 0.85) computed, not
# the literal 0.15 — a different double), and ranks round to 8dp so
# summation-order noise (~1e-15 relative) can never flip a digit.
_G8_SQL = """
WITH pairs AS (
  SELECT 's' || l_suppkey AS s, 'c' || o_custkey AS c, count(*) AS cnt
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
edges AS (
  SELECT s AS src, c AS dst, cnt FROM pairs
  UNION ALL
  SELECT c AS src, s AS dst, cnt FROM pairs
),
norm AS (
  SELECT src, dst, cnt * 1.0 / sum(cnt) OVER (PARTITION BY src) AS w
  FROM edges
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
r0 AS (SELECT node, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn),
c1 AS (SELECT norm.dst AS node, sum(r0.r * norm.w) AS c
       FROM norm JOIN r0 ON r0.node = norm.src GROUP BY norm.dst),
r1 AS (SELECT v.node, (1.0 - 0.85) / nn.n + 0.85 * coalesce(c1.c, 0) AS r
       FROM nodes v CROSS JOIN nn LEFT JOIN c1 ON c1.node = v.node),
c2 AS (SELECT norm.dst AS node, sum(r1.r * norm.w) AS c
       FROM norm JOIN r1 ON r1.node = norm.src GROUP BY norm.dst),
r2 AS (SELECT v.node, (1.0 - 0.85) / nn.n + 0.85 * coalesce(c2.c, 0) AS r
       FROM nodes v CROSS JOIN nn LEFT JOIN c2 ON c2.node = v.node),
c3 AS (SELECT norm.dst AS node, sum(r2.r * norm.w) AS c
       FROM norm JOIN r2 ON r2.node = norm.src GROUP BY norm.dst),
r3 AS (SELECT v.node, (1.0 - 0.85) / nn.n + 0.85 * coalesce(c3.c, 0) AS r
       FROM nodes v CROSS JOIN nn LEFT JOIN c3 ON c3.node = v.node)
SELECT node, round(r, 8) AS rank FROM r3
"""


@register("g8_pagerank", _G8_SQL)
def g8_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank, 3 iterations, d=0.85, over the bidirected
    supplier↔customer graph (edge weight = fulfilled line items). The
    bidirection guarantees out-degree ≥ 1 everywhere (no dangling-mass
    term), which keeps both engines' formulations identical — and lets
    the node set ride the out-degree aggregate (`sources_cover_nodes`).
    The Spark side is the scale path: per-superstep equi-join +
    partial-aggregated groupBy on stable shuffle keys (operators/
    graph.py). The iteration runs on BIGINT node ids (supplier 2k,
    customer 2k+1) — integer shuffle keys measured ~15% faster than
    's'/'c'-prefixed strings at sf0.1 — and projects the display string
    only on the final |V|-row result. The |V|-scale rank/degree tables
    are dimension-sized here, so they are broadcast (every superstep
    join map-side; one groupBy shuffle per superstep remains)."""
    from com_danliris_service_etl_spark.operators.dedup import _spread

    # _spread the probe side (r15): the one-file lineitem fixture scans
    # as 3 partitions, so the broadcast-join probe + the (s, c) partial
    # aggregation ran at 3-way parallelism (guide §2.5 input-skew class;
    # measured ~1.3 s of the query's 2.5 s in the iterations=0 profile).
    # Conditional pass-through keeps real well-split inputs untouched.
    li = _spread(_t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey"))
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # no broadcast hint on orders (r13): it is a FACT side — at sf0.1 the
    # auto threshold broadcasts it anyway; at scale AQE picks the shuffled
    # join instead of an OOM-bound forced build (the d9 lesson)
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            (F.col("l_suppkey") * 2).alias("s"),
            (F.col("o_custkey") * 2 + 1).alias("c"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        # pairs feeds BOTH directions of the edge union — checkpoint the
        # fork so the join+aggregate runs once (the dd8/txt5 lesson).
        .localCheckpoint(eager=False)
    )
    edges = pairs.select(
        F.col("s").alias("src"), F.col("c").alias("dst"), "cnt"
    ).unionByName(pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"), "cnt"))
    pr = pagerank(
        edges,
        weight="cnt",
        iterations=3,
        damping=0.85,
        sources_cover_nodes=True,
        broadcast_ranks=True,
    )
    node_str = F.when(
        F.col("node") % 2 == 0, F.concat(F.lit("s"), (F.col("node") / 2).cast("long"))
    ).otherwise(F.concat(F.lit("c"), ((F.col("node") - 1) / 2).cast("long")))
    return pr.select(node_str.alias("node"), F.round("rank", 8).alias("rank"))


# ---------------------------------------------------------------------------
# SK3 — count-min heavy hitters with the in-query accuracy contract
# ---------------------------------------------------------------------------

_SK3_SQL = """
WITH tok AS (
  SELECT t.token
  FROM documents, unnest(string_split(text, ' ')) AS t(token)
  WHERE text IS NOT NULL AND t.token <> ''
),
exact AS (SELECT token, count(*)::BIGINT AS exact_cnt FROM tok GROUP BY token),
top AS (SELECT token, exact_cnt FROM exact ORDER BY exact_cnt DESC, token LIMIT 20),
rows_ AS (SELECT unnest([0, 1]) AS r),
cells AS (
  SELECT r,
         ('0x' || substring(md5(r::VARCHAR || ':' || token), 1, 8))::BIGINT % 256 AS bucket
  FROM tok CROSS JOIN rows_
),
sketch AS (SELECT r, bucket, count(*)::BIGINT AS cnt FROM cells GROUP BY r, bucket),
cand AS (
  SELECT token, r,
         ('0x' || substring(md5(r::VARCHAR || ':' || token), 1, 8))::BIGINT % 256 AS bucket
  FROM top CROSS JOIN rows_
),
est AS (SELECT c.token, min(s.cnt) AS est_cnt
        FROM cand c JOIN sketch s USING (r, bucket) GROUP BY c.token)
SELECT t.token, t.exact_cnt, e.est_cnt, e.est_cnt >= t.exact_cnt AS cms_ok
FROM top t JOIN est e USING (token)
"""


@register("sk3_countmin_heavy_hitters", _SK3_SQL)
def sk3_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (2×256, shared md5 hashing) over document tokens;
    the top-20 exact heavy hitters are point-estimated from the sketch
    and the CMS one-sided bound (estimate ≥ exact) is emitted as a
    boolean the oracle pins TRUE. Integer counts — bit-exact across
    engines. The query needs the exact per-token counts anyway (the
    verification side), so the sketch is built in ROLLUP form from them
    (`counts_col` — cell sums identical by associativity): the cell hash
    runs over the vocabulary, not the corpus, and the token stream is
    aggregated exactly once. Estimation broadcasts the bounded sketch
    (operators/sketches.py)."""
    docs = _t(spark, sf_dir, "documents")
    toks = tokens_of(docs)
    # exact feeds the top-20, the sketch build, and the output join —
    # checkpoint the vocabulary-sized fork, not the token stream.
    exact = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .localCheckpoint(eager=False)
    )
    top = (
        exact.orderBy(F.col("exact_cnt").desc(), F.col("token").asc())
        .limit(20)
        .localCheckpoint(eager=False)  # referenced by estimate + output join
    )
    sketch = countmin_sketch(exact, width=256, depth=2, counts_col="exact_cnt")
    est = countmin_estimate(top.select("token"), sketch, width=256, depth=2)
    return top.join(F.broadcast(est), "token").select(
        "token",
        "exact_cnt",
        "est_cnt",
        (F.col("est_cnt") >= F.col("exact_cnt")).alias("cms_ok"),
    )


# ---------------------------------------------------------------------------
# ST8 — the count-min grid itself (batch twin of the streaming fold)
# ---------------------------------------------------------------------------

_ST8_SQL = """
WITH tok AS (
  SELECT t.token
  FROM documents, unnest(string_split(text, ' ')) AS t(token)
  WHERE text IS NOT NULL AND t.token <> ''
),
cells AS (
  SELECT r,
         ('0x' || substring(md5(r::VARCHAR || ':' || token), 1, 8))::BIGINT % 256 AS bucket
  FROM tok CROSS JOIN (SELECT unnest([0, 1]) AS r) rows_
)
SELECT r AS "row", bucket, count(*)::BIGINT AS cnt
FROM cells GROUP BY r, bucket
"""


@register("st8_countmin_sketch", _ST8_SQL)
def st8_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The count-min grid over the document token stream — the BATCH
    twin of `streaming/jobs.py::run_streaming_countmin`, which maintains
    the same grid as Structured Streaming state (at most depth×width
    rows, constant in the corpus — the bounded-state property that makes
    a live heavy-hitter monitor viable where exact counts grow with the
    vocabulary). Cell sums are associative, so micro-batch folding lands
    on this identical grid; tests/test_streaming.py pins stream ≡
    batch, and integer counts make the oracle bit-exact.

    Built in ROLLUP form (the sk3 lesson, promoted here in r10 after the
    events-decade measurement caught the raw form at 9.8x the oracle):
    aggregate exact per-token counts first — ONE map-side-combined fact
    exchange that reduces the corpus to vocabulary grain — then md5-hash
    only the vocabulary into cells. Identical grid by associativity of
    cell sums; the corpus-scale double-md5 projection (2·|tokens| digest
    calls, the measured bottleneck) becomes 2·|vocab|."""
    docs = _t(spark, sf_dir, "documents")
    tf = tokens_of(docs).groupBy("token").agg(F.count(F.lit(1)).alias("__tf"))
    return countmin_sketch(tf, width=256, depth=2, counts_col="__tf")


# ---------------------------------------------------------------------------
# W6 — rank-profile windows (ntile / percent_rank / cume_dist)
# ---------------------------------------------------------------------------

_W6_SQL = """
WITH ranked AS (
  SELECT event_type, value, event_id,
         ntile(10) OVER w AS decile,
         percent_rank() OVER w AS pr,
         cume_dist() OVER w AS cd
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
)
SELECT event_type, decile,
       count(*)::BIGINT AS n,
       round(sum(value), 2) AS sum_value,
       round(min(pr), 6) AS pr_min,
       round(max(cd), 6) AS cd_max
FROM ranked
GROUP BY event_type, decile
"""


@register("w6_decile_profile", _W6_SQL)
def w6_decile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W-family completion: ntile(10) + percent_rank + cume_dist over a
    TOTAL order (value, event_id — the tiebreak rule the verify gotchas
    pin for cross-engine determinism), aggregated to a per-(type, decile)
    profile. Scale note: WindowExec buffers one event_type per task; at
    100 TB with few types, the same deciles come from approx_percentile
    cut-points (sk1's sketch path) or a repartitionByRange two-pass — the
    exact-NTILE window form is the reference semantics being pinned."""
    ev = _events(spark, sf_dir).select("event_type", "event_id", "value")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    ranked = ev.select(
        "event_type",
        "value",
        F.ntile(10).over(w).alias("decile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return ranked.groupBy("event_type", "decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.round(F.min("pr"), 6).alias("pr_min"),
        F.round(F.max("cd"), 6).alias("cd_max"),
    )


# ---------------------------------------------------------------------------
# A7 — exact multi-quantile group profile
# ---------------------------------------------------------------------------

_A7_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.25), 6) AS p25,
       round(quantile_cont(value, 0.50), 6) AS p50,
       round(quantile_cont(value, 0.75), 6) AS p75,
       round(quantile_cont(value, 0.95), 6) AS p95,
       count(*)::BIGINT AS n
FROM events GROUP BY event_type
"""


@register("a7_group_quantiles", _A7_SQL)
def a7_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group quantile profile (p25/p50/p75/p95) — Spark's
    `percentile` and DuckDB's `quantile_cont` share the linear
    interpolation definition, so the values match exactly at 6dp. Scale
    note: the exact aggregate buffers each group's value multiset; at
    100 TB the same profile comes from `approx_percentile` (t-digest —
    the sk1 accuracy-contract path). This query pins the EXACT
    semantics that sketch is graded against."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        *[
            F.round(F.expr(f"percentile(value, {q})"), 6).alias(f"p{int(q * 100)}")
            for q in (0.25, 0.5, 0.75, 0.95)
        ],
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# LLM12 — centrality-based keeper selection over the near-dup graph
# ---------------------------------------------------------------------------

# Shared 64-dim DuckDB dot-product fold (the cross-engine scheme sim1/dd5
# established); referenced by both the llm12 and sim6 oracles.
_DOT64 = (
    "list_reduce(list_prepend(0.0, list_transform(range(1, 65), i -> {a}[i] * {b}[i])),"
    " (acc, x) -> acc + x)"
)
_L12_BUCKET = " + ".join(
    f"(CASE WHEN embedding[{d + 1}] > 0 THEN {1 << d} ELSE 0 END)" for d in range(8)
)

_LLM12_SQL = f"""
WITH RECURSIVE v AS (SELECT vec_id, embedding::DOUBLE[] AS e,
                            ({_L12_BUCKET}) AS blk
                     FROM embeddings),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round({_DOT64.format(a="a.e", b="b.e")}
               / (sqrt({_DOT64.format(a="a.e", b="a.e")})
                  * sqrt({_DOT64.format(a="b.e", b="b.e")})), 6) AS cos_sim
  FROM v a JOIN v b ON a.vec_id < b.vec_id AND a.blk = b.blk),
good AS (SELECT * FROM pairs WHERE cos_sim >= 0.3),
edges AS (
  SELECT id_a AS src, id_b AS dst, cos_sim AS w FROM good
  UNION ALL
  SELECT id_b AS src, id_a AS dst, cos_sim AS w FROM good),
norm AS (SELECT src, dst, w / sum(w) OVER (PARTITION BY src) AS nw FROM edges),
nodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
r0 AS (SELECT node, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn),
c1 AS (SELECT norm.dst AS node, sum(r0.r * norm.nw) AS c
       FROM norm JOIN r0 ON r0.node = norm.src GROUP BY norm.dst),
r1 AS (SELECT x.node, (1.0 - 0.85) / nn.n + 0.85 * coalesce(c1.c, 0) AS r
       FROM nodes x CROSS JOIN nn LEFT JOIN c1 ON c1.node = x.node),
c2 AS (SELECT norm.dst AS node, sum(r1.r * norm.nw) AS c
       FROM norm JOIN r1 ON r1.node = norm.src GROUP BY norm.dst),
r2 AS (SELECT x.node, (1.0 - 0.85) / nn.n + 0.85 * coalesce(c2.c, 0) AS r
       FROM nodes x CROSS JOIN nn LEFT JOIN c2 ON c2.node = x.node),
reach(node, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.node),
comp AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node)
SELECT comp.node AS vec_id,
       CAST(comp.cluster_id AS BIGINT) AS cluster_id,
       round(r2.r, 8) AS rank,
       (row_number() OVER (PARTITION BY comp.cluster_id
                           ORDER BY round(r2.r, 8) DESC, comp.node) = 1
       ) AS is_centrality_keeper
FROM comp JOIN r2 ON r2.node = comp.node
"""


@register("llm12_centrality_keeper", _LLM12_SQL)
def llm12_centrality_keeper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representative-document selection, composed end-to-end: embedding
    near-dup pairs (dd5, sign-bit LSH blocked) → similarity-weighted
    PageRank over the bidirected dup graph (g8's operator) → connected
    components (dd6's operator) → per-cluster keeper = the most CENTRAL
    member (highest rank), not merely the lowest id — the data-curation
    upgrade over llm7's min-id keeper: the kept document is the one most
    representative of its duplicate cluster. Keeper comparison uses the
    8dp-ROUNDED rank on both engines, so a structurally-symmetric
    cluster (exactly tied centrality) resolves by the id tiebreak
    identically everywhere; every stage reuses an individually
    oracle-verified operator."""
    from com_danliris_service_etl_spark.operators import dedup as dd

    emb = _t(spark, sf_dir, "embeddings")
    pairs = dd.embedding_neardup_pairs(
        emb, threshold=0.3, lsh_bits=8, materialize_prepped=True
    ).localCheckpoint(eager=False)  # feeds both edge directions + CC
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst"), "cos_sim"
    ).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"), "cos_sim")
    )
    pr = pagerank(
        edges,
        weight="cos_sim",
        iterations=2,
        damping=0.85,
        sources_cover_nodes=True,  # bidirected by construction
        broadcast_ranks=True,  # |V| = clustered vectors — dimension-scale
    )
    clusters = dd.dedup_clusters(pairs, id_a="id_a", id_b="id_b")
    ranked = clusters.join(
        pr, clusters["doc_id"] == pr["node"]
    ).select(
        F.col("doc_id").alias("vec_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
        F.round("rank", 8).alias("rank"),
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("rank").desc(), F.col("vec_id").asc()
    )
    return ranked.select(
        "vec_id",
        "cluster_id",
        "rank",
        (F.row_number().over(w) == 1).alias("is_centrality_keeper"),
    )


# ---------------------------------------------------------------------------
# SIM6 — k-means centroid training (Lloyd's, in-engine)
# ---------------------------------------------------------------------------

_KM_K = 8
_KM_DIMS = 64


def _kmeans_sql() -> str:
    dot_vc = _DOT64.format(a="v.e", b="c.cv")
    n_v = _DOT64.format(a="v.e", b="v.e")
    n_c = _DOT64.format(a="c.cv", b="c.cv")
    assign = f"""
      SELECT vec_id, cid AS cell FROM (
        SELECT v.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY {dot_vc} / (sqrt({n_v}) * sqrt({n_c})) DESC, c.cid
               ) AS rk
        FROM v CROSS JOIN {{cents}} c) WHERE rk = 1
    """
    return f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    dims AS (SELECT unnest(range(1, {_KM_DIMS + 1})) AS dim),
    c0 AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
           FROM embeddings WHERE vec_id < {_KM_K}),
    a1 AS ({assign.format(cents="c0")}),
    m1 AS (SELECT a1.cell, dims.dim, avg(v.e[dims.dim]) AS m
           FROM v JOIN a1 USING (vec_id) CROSS JOIN dims
           GROUP BY a1.cell, dims.dim),
    c1 AS (SELECT cell AS cid, list(m ORDER BY dim) AS cv FROM m1 GROUP BY cell),
    a2 AS ({assign.format(cents="c1")})
    SELECT a2.cell AS cid, dims.dim,
           round(avg(v.e[dims.dim]), 6) AS centroid_val,
           count(*)::BIGINT AS n_members
    FROM v JOIN a2 USING (vec_id) CROSS JOIN dims
    GROUP BY a2.cell, dims.dim
    """


@register("sim6_kmeans_fit", _kmeans_sql())
def sim6_kmeans_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine Lloyd's k-means (k=8, 2 iterations, cosine assignment,
    lowest-id seeds) — the centroid TRAINING step sim4's IVF quantizer
    previously stood in for with raw seed vectors (operators/
    clustering.py closes that loop with the same assignment kernel the
    IVF search path uses). Output is the trained codebook flattened to
    (cid, dim, value) rows with per-cell member counts; the oracle
    unrolls both Lloyd iterations as CTEs. Assignment folds are
    bit-identical across engines (the sim4-proven dot-fold parity);
    per-dimension means are rounded at the output boundary."""
    emb = _t(spark, sf_dir, "embeddings")
    cent = kmeans_fit(emb, k=_KM_K, iterations=2)
    return cent.select(
        "cid",
        F.posexplode("centroid").alias("dim0", "val"),
        "n_members",
    ).select(
        "cid",
        (F.col("dim0") + 1).alias("dim"),
        F.round("val", 6).alias("centroid_val"),
        "n_members",
    )


# ---------------------------------------------------------------------------
# J12 — nearest-direction as-of join
# ---------------------------------------------------------------------------

_J12_SQL = """
WITH l AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
  FROM events WHERE event_type = 'purchase'
),
r AS (
  SELECT user_id, event_id AS r_id, epoch_us(ts) AS r_ts, value AS r_value
  FROM events WHERE event_type = 'click'
),
c AS (
  SELECT l.event_id, r.r_id, r.r_ts, r.r_value,
         row_number() OVER (
           PARTITION BY l.event_id
           ORDER BY abs(l.ts_us - r.r_ts),
                    CASE WHEN r.r_ts <= l.ts_us THEN 0 ELSE 1 END,
                    r.r_id DESC
         ) AS rn
  FROM l JOIN r ON r.user_id = l.user_id
)
SELECT l.event_id, l.user_id, l.ts_us, l.value,
       c.r_id AS nearest_click_id,
       c.r_ts AS nearest_click_ts_us,
       c.r_value AS nearest_click_value,
       l.ts_us - c.r_ts AS gap_us
FROM l LEFT JOIN (SELECT * FROM c WHERE rn = 1) c ON c.event_id = l.event_id
"""


@register("j12_asof_nearest", _J12_SQL)
def j12_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the user's click nearest in time (either
    direction; exact/backward wins ties, highest event_id among equal
    timestamps). The oracle ranks every (purchase × same-user click)
    candidate — quadratic per hot user; `asof_nearest` is the linear
    shape: tag + union + ONE shuffle + ONE sort, both direction scans as
    two frames of a single WindowExec (operators/joins.py)."""
    ev = _events(spark, sf_dir)
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us", "value"
    )
    right = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("r_user"),
        F.col("event_id").alias("nearest_click_id"),
        F.col("ts_us").alias("nearest_click_ts_us"),
        F.col("value").alias("nearest_click_value"),
    )
    out = asof_nearest(
        left,
        right,
        left_on="ts_us",
        right_on="nearest_click_ts_us",
        by=[("user_id", "r_user")],
        tiebreak="nearest_click_id",
    )
    return out.withColumn(
        "gap_us", F.col("ts_us") - F.col("nearest_click_ts_us")
    )
