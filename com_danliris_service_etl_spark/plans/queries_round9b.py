"""Round-9b registry queries — training-pipeline curation extensions.

Shapes a 100 TB corpus/clickstream pipeline needs that the registry did
not yet cover (see also llm19 SemDeDup, llm20 DSIR, and txt19 iterative
BPE training further down):

- ``g15_last_touch_attribution`` / ``st14_stream_attribution``:
  marketing-style last-touch conversion attribution over the event
  stream — the as-of join (J7 union-sort strategy, ops/joins.py) applied
  to purchases x prior same-user touches with a bounded lookback window;
  st14 is the per-purchase grain and the batch twin of the third custom
  stateful streaming operator (streaming/jobs.py::_attribution_fn,
  O(|users|) keyed state).
- ``txt18_source_divergence``: per-source unigram-distribution drift vs
  the whole corpus as an EXACT total-variation distance — the
  data-mixture monitoring panel. Sufficient statistics are integer counts
  combined in DECIMAL(38,0) (the sim9 exact-fixed-point discipline), so
  both engines sum identical exact values in any order; one double
  division at finalize.
- ``llm18_quality_gate``: FineWeb-style per-source quality-percentile
  gate — drop each source's bottom-20% documents by the shared txt2
  quality score. The threshold is an ORDER STATISTIC (smallest score with
  cumulative count >= ceil(n/5)) computed on the (source, score)
  histogram, so the gate needs no fact-scale window and no interpolated
  percentile (exact integer comparisons only).

Reference provenance: the reference's fact-build pattern of enriching a
stream with its latest preceding dimension state (`GarmentTotalHutang/
run.js:122-124` latest-rate-as-of) is g15's join; the per-source counts
panels (`MigrationLog` row-count telemetry) are the report grain of
txt18/llm18.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from com_danliris_service_etl_spark.operators.joins import asof_join
from com_danliris_service_etl_spark.operators.text import LANG_MARKERS, quality_col
from com_danliris_service_etl_spark.plans.registry import _events, _t, register

# ---------------------------------------------------------------------------
# G15 / ST14 — last-touch attribution (as-of join over the event stream)
# ---------------------------------------------------------------------------

# Single source of truth for the lookback lives with the streaming twin.
from com_danliris_service_etl_spark.streaming.jobs import (  # noqa: E402
    ATTR_LOOKBACK_US as _LOOKBACK_US,
)

# Per-purchase attribution grain, shared by the g15 rollup and the st14
# streaming batch twin.
_ATTR_SQL = f"""
WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
           FROM events WHERE event_type = 'purchase'),
t AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
      FROM events WHERE event_type <> 'purchase'),
cand AS (
  SELECT p.event_id AS pid, p.ts_us AS pts, p.value,
         t.event_type AS channel, t.ts_us AS tts,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY t.ts_us DESC, t.event_id DESC) AS rn
  FROM p LEFT JOIN t ON t.user_id = p.user_id AND t.ts_us <= p.ts_us)
SELECT pid AS event_id, pts AS ts_us, value,
       CASE WHEN channel IS NOT NULL
                 AND tts >= pts - {_LOOKBACK_US}::BIGINT
            THEN channel ELSE 'unattributed' END AS channel
FROM cand WHERE rn = 1
"""

_G15_SQL = f"""
WITH attr AS ({_ATTR_SQL})
SELECT channel,
       count(*)::BIGINT AS conversions,
       round(sum(value), 2) AS revenue
FROM attr GROUP BY channel
"""


def attributed_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-purchase attribution grain: each purchase credited to the same
    user's LATEST preceding non-purchase event within a 7-day lookback
    (ties on timestamp: highest event_id — the J7 tiebreak contract),
    else 'unattributed'.

    Scale shape: the union-sort as-of strategy (ops/joins.py:186) — tag,
    union, ONE window over (user_id, ts) carrying the latest touch
    forward — is linear in |purchases|+|touches| with a single shuffle on
    user_id. The naive per-purchase candidate join (the oracle's
    row_number form) materializes |touches before each purchase| rows per
    user and dies on hot users at clickstream scale; the running-last
    form never widens. The lookback bound is applied AFTER the argmax
    (equivalent: if the latest touch is out of window, all are), keeping
    the window state one row — which is also exactly the keyed state of
    the streaming twin (streaming/jobs.py::_attribution_fn)."""
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us", "value"
    )
    touches = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("ts_us").alias("touch_ts_us"),
        F.col("event_type").alias("touch_channel"),
        F.col("event_id").alias("touch_event_id"),
    )
    matched = asof_join(
        purchases,
        touches,
        left_on="ts_us",
        right_on="touch_ts_us",
        by=[("user_id", "user_id")],
        direction="backward",
        tiebreak="touch_event_id",
        allow_exact_match=True,
        strategy="sort",
    )
    in_window = F.col("touch_channel").isNotNull() & (
        F.col("touch_ts_us") >= F.col("ts_us") - F.lit(_LOOKBACK_US)
    )
    return matched.select(
        "event_id",
        "ts_us",
        "value",
        F.when(in_window, F.col("touch_channel"))
        .otherwise("unattributed")
        .alias("channel"),
    )


@register("g15_last_touch_attribution", _G15_SQL)
def g15_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Channel rollup of `attributed_purchases` (conversions + revenue per
    attributed channel) — see that helper for the attribution semantics
    and the linear as-of scale shape."""
    return (
        attributed_purchases(spark, sf_dir)
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("conversions"),
            F.round(F.sum("value"), 2).alias("revenue"),
        )
    )


@register("st14_stream_attribution", _ATTR_SQL)
def st14_stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming last-touch attribution operator
    (streaming/jobs.py::_attribution_fn / run_streaming_attribution — the
    third custom applyInPandasWithState op): one row per purchase with
    its credited channel. The streaming form keeps ONE row of keyed
    state per user (the latest touch), so its memory is O(|users|) on an
    unbounded clickstream; the batch form pays the bounded-relation
    union-sort window instead. Stream ≡ batch is pinned in
    tests/test_round9b_ops.py."""
    return attributed_purchases(spark, sf_dir)


# ---------------------------------------------------------------------------
# TXT18 — per-source unigram-distribution drift (exact TV distance)
# ---------------------------------------------------------------------------

# TV(source, corpus) = 1/2 * sum_t |cnt_s(t)/tot_s - cnt_c(t)/tot_c|
#   = [ sum_{t in source} |cnt_s*tot_c - cnt_c*tot_s|          (observed)
#     + tot_s * (tot_c - sum_{t in source} cnt_c) ]            (missing mass)
#     / (2 * tot_s * tot_c)
# Numerator terms are exact integers (DECIMAL(38,0) accumulation); the one
# double division at finalize is correctly rounded from exact inputs, so
# the 6dp round is engine-invariant.
_TXT18_SQL = """
WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS term
              FROM documents),
st AS (SELECT source, term, count(*)::BIGINT AS cnt_s FROM toks GROUP BY 1, 2),
ct AS (SELECT term, CAST(sum(cnt_s) AS BIGINT) AS cnt_c FROM st GROUP BY 1),
tot AS (SELECT source, CAST(sum(cnt_s) AS BIGINT) AS tot_s FROM st GROUP BY 1),
g AS (SELECT CAST(sum(cnt_c) AS BIGINT) AS tot_c FROM ct),
n AS (
  SELECT st.source,
         sum(abs(st.cnt_s::DECIMAL(38,0) * g.tot_c
                 - ct.cnt_c::DECIMAL(38,0) * tot.tot_s)) AS num_obs,
         CAST(sum(ct.cnt_c) AS BIGINT) AS cover_c
  FROM st JOIN ct USING (term) JOIN tot USING (source) CROSS JOIN g
  GROUP BY 1)
SELECT n.source, tot.tot_s,
       round((n.num_obs::DOUBLE + tot.tot_s::DOUBLE * (g.tot_c - n.cover_c)::DOUBLE)
             / (2.0 * tot.tot_s::DOUBLE * g.tot_c::DOUBLE), 6) AS tv_distance
FROM n JOIN tot USING (source) CROSS JOIN g
"""


@register("txt18_source_divergence", _TXT18_SQL)
def txt18_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture drift report: exact total-variation distance between
    each source's unigram token distribution and the whole corpus's.

    Scale shape: ONE fact shuffle (explode -> partial-aggregated
    groupBy(source, term)); everything downstream runs on the vocab-sized
    (source, term) relation — corpus term counts via a second hash
    aggregate, a shuffle join back on term (vocab can exceed broadcast at
    100 TB), |sources|-row and 1-row aggregates broadcast back. The
    (source, term) relation forks three ways (ct, tot, the joined sum), so
    it is lazily localCheckpoint-ed once — without it the explode pipeline
    re-runs per reference (the dd8/txt5 ReuseExchange gap).

    Exactness: integer sufficient statistics combined in DECIMAL(38,0) —
    summation order cannot matter (the sim9 discipline) — and the single
    double division at finalize is correctly rounded from exact operands
    in both engines before the 6dp round. The finalize tail
    (ops/text.py::tv_distance_from_counts) is shared with the streaming
    monitor, which maintains the same (source, term) counts as keyed
    streaming state (streaming/jobs.py::run_streaming_source_divergence,
    stream ≡ batch pinned in tests)."""
    from com_danliris_service_etl_spark.operators.text import tv_distance_from_counts

    docs = _t(spark, sf_dir, "documents")
    # NOT _spread: the explode+count fact pass is this whole query, and
    # an up-front repartition of the fat text column measured strictly
    # slower in the fresh-plan protocol (sf10 decade: 2.06 -> 2.73 s) —
    # the wire cost of moving the corpus exceeds the map-parallelism
    # gain; the 15-split scan keeps the cores busy enough.
    toks = docs.select("source", F.explode(F.split("text", " ")).alias("term"))
    st = toks.groupBy("source", "term").agg(F.count(F.lit(1)).alias("cnt_s"))
    return tv_distance_from_counts(st)


# ---------------------------------------------------------------------------
# LLM18 — per-source quality-percentile gate (FineWeb-style curation)
# ---------------------------------------------------------------------------


def _hits_sql(markers: tuple[str, ...]) -> str:
    in_list = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter(string_split(text, ' '), t -> t IN ({in_list})))"


_LLM18_SQL = f"""
WITH feat AS (
  SELECT source,
         len(string_split(text, ' '))::BIGINT AS n_tokens,
         round(CAST({_hits_sql(LANG_MARKERS["en"])} AS DOUBLE)
                 / len(string_split(text, ' ')) * 0.3
               + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')) * 0.5
               + least(CAST(list_reduce(list_prepend(0,
                     list_transform(string_split(text, ' '), t -> length(t))),
                     (a, b) -> a + b) AS DOUBLE)
                 / len(string_split(text, ' ')) / 10.0, 1.0) * 0.2, 6) AS quality
  FROM documents),
hist AS (SELECT source, quality, count(*)::BIGINT AS c,
                CAST(sum(n_tokens) AS BIGINT) AS tok
         FROM feat GROUP BY 1, 2),
cum AS (SELECT source, quality, c, tok,
               sum(c) OVER (PARTITION BY source ORDER BY quality) AS cum_c,
               sum(c) OVER (PARTITION BY source) AS n
        FROM hist),
thr AS (SELECT source, min(quality) AS q_thr FROM cum
        WHERE cum_c * 5 >= n GROUP BY source)
SELECT h.source,
       CAST(sum(h.c) AS BIGINT) AS n_total,
       CAST(COALESCE(sum(h.c) FILTER (WHERE h.quality >= t.q_thr), 0) AS BIGINT)
         AS n_kept,
       CAST(COALESCE(sum(h.tok) FILTER (WHERE h.quality >= t.q_thr), 0) AS BIGINT)
         AS tokens_kept,
       min(t.q_thr) AS q_threshold
FROM hist h JOIN thr t USING (source)
GROUP BY h.source
"""


@register("llm18_quality_gate", _LLM18_SQL)
def llm18_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality gate: drop each source's bottom-20% documents by
    the shared txt2 quality score; report per source the kept doc count,
    kept token mass, and the gate threshold.

    The threshold is the 20th-percentile ORDER STATISTIC — the smallest
    score v with count(quality <= v) * 5 >= n — so the comparison is
    exact integer arithmetic on counts (no interpolated percentile whose
    ulp could flip a boundary doc cross-engine), and docs AT the
    threshold value are kept.

    Scale shape: ONE fact shuffle — the per-doc (quality 6dp, token count)
    projection is fused into the scan and partial-aggregates into the
    (source, quality) histogram; the cumulative window, threshold pick,
    and final report all run on that histogram (bounded by |sources| x
    |distinct rounded scores|, ~1e6 rows at any corpus size). The fact is
    scanned ONCE: kept counts/token mass are conditional sums over the
    histogram, not a second pass over documents."""
    from com_danliris_service_etl_spark.operators.dedup import _spread

    # _spread: the quality featurization is the hot projection and a
    # one-file corpus would run it on ONE partition (the sim1 lesson, r11)
    docs = _spread(_t(spark, sf_dir, "documents"))
    feat = docs.select(
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        quality_col("text").alias("quality"),
    )
    hist = feat.groupBy("source", "quality").agg(
        F.count(F.lit(1)).alias("c"), F.sum("n_tokens").alias("tok")
    )
    w_cum = (
        Window.partitionBy("source")
        .orderBy("quality")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("source")
    cum = hist.select(
        "source",
        "quality",
        "c",
        "tok",
        F.sum("c").over(w_cum).alias("cum_c"),
        F.sum("c").over(w_all).alias("n"),
    )
    thr = (
        cum.filter(F.col("cum_c") * 5 >= F.col("n"))
        .groupBy("source")
        .agg(F.min("quality").alias("q_thr"))
    )
    kept = F.col("quality") >= F.col("q_thr")
    return (
        hist.join(F.broadcast(thr), "source")
        .groupBy("source")
        .agg(
            F.sum("c").alias("n_total"),
            F.coalesce(F.sum(F.when(kept, F.col("c"))), F.lit(0)).alias("n_kept"),
            F.coalesce(F.sum(F.when(kept, F.col("tok"))), F.lit(0)).alias(
                "tokens_kept"
            ),
            F.min("q_thr").alias("q_threshold"),
        )
    )


# ---------------------------------------------------------------------------
# LLM19 — SemDeDup: cluster-then-prune semantic deduplication
# ---------------------------------------------------------------------------

_SEMDEDUP_CELLS = 16
_SEMDEDUP_TAU = 0.35

_FOLD_DOT = (
    "list_reduce(list_prepend(0.0, list_transform(range(1, 65), i -> {a}[i] * {b}[i])),"
    " (acc, v) -> acc + v)"
)


def _llm19_sql(n_cells: int = _SEMDEDUP_CELLS, tau: float = _SEMDEDUP_TAU) -> str:
    dot_vc = _FOLD_DOT.format(a="v.e", b="c.cv")
    n_v = _FOLD_DOT.format(a="v.e", b="v.e")
    n_c = _FOLD_DOT.format(a="c.cv", b="c.cv")
    dot_xy = _FOLD_DOT.format(a="x.e", b="y.e")
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
cent AS (SELECT vec_id AS cent_id, embedding::DOUBLE[] AS cv
         FROM embeddings ORDER BY vec_id LIMIT {n_cells}),
assign AS (
  SELECT vec_id, cent_id, sim,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY sim DESC, cent_id) AS rk
  FROM (SELECT v.vec_id, c.cent_id,
               {dot_vc} / (sqrt({n_v}) * sqrt({n_c})) AS sim
        FROM v CROSS JOIN cent c)),
cells AS (SELECT a.vec_id, a.cent_id AS cell, round(a.sim, 6) AS centroid_sim,
                 v.e, sqrt({n_v}) AS nrm
          FROM assign a JOIN v USING (vec_id) WHERE rk = 1),
dropped AS (
  SELECT DISTINCT x.vec_id
  FROM cells x JOIN cells y ON x.cell = y.cell
   AND ((y.centroid_sim < x.centroid_sim) OR
        (y.centroid_sim = x.centroid_sim AND y.vec_id < x.vec_id))
  WHERE round({dot_xy} / (x.nrm * y.nrm), 6) > {tau!r})
SELECT c.vec_id, c.cell, c.centroid_sim,
       d.vec_id IS NULL AS is_kept
FROM cells c LEFT JOIN dropped d USING (vec_id)
"""


@register("llm19_semdedup", _llm19_sql())
def llm19_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings into cells, then pruning
    within-cell near-duplicates, keeping each duplicate neighborhood's
    LOWEST-centroid-similarity member (the paper's diversity-preserving
    keeper rule). A vector is dropped iff some same-cell vector with
    strictly lower keep-priority — (centroid_sim 6dp, vec_id) ascending —
    has pairwise cosine > tau with it; the rule needs no iteration
    (priority is a total order), so it is one set-at-a-time self-join,
    unlike the connected-components funnel (llm7) it complements: llm7
    deletes whole duplicate CLUSTERS to one canonical doc, SemDeDup thins
    DENSE REGIONS while keeping their most diverse member.

    Scale shape: cell assignment is the broadcast-centroid HOF argmax
    (ops/similarity.py::ivf_assign_cells — zero corpus shuffle); the
    pairwise stage is quadratic ONLY within a cell, which is the
    SemDeDup design point — k grows with the corpus (n/expected-cell-
    size, 50k cells in the paper) so cells stay bounded and the self-join
    on cell is embarrassingly parallel across them. Norms are
    precomputed per row (O(n*d), not O(pairs*d)). The exists-check is a
    left-semi join (each vector emitted once, no distinct shuffle);
    fixture cells (16) understate the parallelism, not the plan.

    Determinism: pairwise and centroid cosines are rounded 6dp before
    any comparison in BOTH engines; both folds run in array order, so
    the doubles are bit-identical cross-engine. Core:
    ops/similarity.py::semdedup_prune (parameterized in n_cells/tau —
    the sf1 pairing in tools/bench_llm19_sf1.py scales cells with the
    corpus, the algorithm's own contract)."""
    from com_danliris_service_etl_spark.operators.similarity import semdedup_prune

    return semdedup_prune(
        _t(spark, sf_dir, "embeddings"),
        n_cells=_SEMDEDUP_CELLS,
        tau=_SEMDEDUP_TAU,
    )


# ---------------------------------------------------------------------------
# LLM20 — DSIR: data selection via importance resampling
# ---------------------------------------------------------------------------

_DSIR_TARGET_LANG = "en"
_DSIR_BUCKET = 1000  # threshold grain, micro-log units

_LLM20_SQL = f"""
WITH toks AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
              FROM documents),
tf AS (SELECT doc_id, max(lang) AS lang, term, count(*)::BIGINT AS tf
       FROM toks GROUP BY doc_id, term),
feat AS (SELECT term,
                CAST(COALESCE(sum(tf) FILTER (WHERE lang = '{_DSIR_TARGET_LANG}'), 0)
                     AS BIGINT) AS cnt_t,
                CAST(sum(tf) AS BIGINT) AS cnt_s
         FROM tf GROUP BY term),
tot AS (SELECT count(*)::BIGINT AS v,
               CAST(sum(cnt_t) AS BIGINT) AS tot_t,
               CAST(sum(cnt_s) AS BIGINT) AS tot_s FROM feat),
lr AS (SELECT term,
              CAST(round(ln( ((cnt_t + 1)::DOUBLE / (tot_t + v)) /
                             ((cnt_s + 1)::DOUBLE / (tot_s + v)) ) * 1e6, 0)
                   AS BIGINT) AS lr_micro
       FROM feat CROSS JOIN tot),
doc AS (SELECT tf.doc_id, max(tf.lang) AS lang,
               CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
               CAST(sum(tf.tf * lr.lr_micro) AS BIGINT) AS lw_micro
        FROM tf JOIN lr USING (term) GROUP BY tf.doc_id),
hist AS (SELECT (CASE WHEN lw_micro >= 0 THEN lw_micro
                      ELSE lw_micro - {_DSIR_BUCKET - 1} END // {_DSIR_BUCKET}) AS b,
                count(*)::BIGINT AS c FROM doc GROUP BY 1),
cum AS (SELECT b, sum(c) OVER (ORDER BY b DESC) AS cum_c,
               sum(c) OVER () AS n FROM hist),
thr AS (SELECT max(b) * {_DSIR_BUCKET} AS lw_star FROM cum WHERE cum_c * 5 >= n)
SELECT d.doc_id, d.lang, d.n_tokens, d.lw_micro,
       d.lw_micro >= t.lw_star AS selected
FROM doc d CROSS JOIN thr t
"""


@register("llm20_dsir_selection", _LLM20_SQL)
def llm20_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023, arXiv:2302.03169): data selection via
    importance resampling — score every document by the log importance
    weight of a target distribution (here the 'en' slice) over the raw
    corpus under an add-1-smoothed unigram feature model, then keep the
    top ~20% by weight. Selects raw docs that LOOK like the target
    domain without training a classifier.

    Exactness: the per-feature log-ratio is rounded ONCE into integer
    micro-log units (the txt9 rounded-ln discipline — both engines round
    the same double); per-doc weights are then exact BIGINT sums of
    (tf x lr_micro), summation-order-proof.

    Scale shape (r10 rewrite — VERDICT r9 task 3, from 16 shuffles / 6
    document scans / 3 SinglePartition down to 4 / 2 / 2): the
    intermediate (doc, term) tf relation is GONE — per-term feature
    counts aggregate raw token rows directly (cnt = Σ tf by
    definition), and per-doc weights are raw-token sums of the term's
    lr_micro (Σ_tokens lr ≡ Σ_terms tf·lr), so the fork that previously
    re-ran the whole scan+explode+shuffle pipeline per reference (6
    scans — ReuseExchange cannot fire across a fork whose branches prune
    different ReadSchemas into the scan; checkpointing tf was measured
    SLOWER at derived sf1, 4.6 vs 3.7 s, the materialization costing
    more than the recompute) now forks only the cheap scan+explode, 2
    scans total. Fact exchanges: ONE — the doc-weight aggregate
    (map-side combined to doc grain). The feature exchange carries
    vocab-grain partials; the lr table joins back to tokens as an
    EXPLICIT broadcast — DSIR's feature space is bounded by design (the
    paper hashes n-gram features into a FIXED bucket space, 10k buckets,
    independent of corpus size), so the importance-weight table is the
    broadcast-able dimension here, and the unhinted form measured 2x
    slower at derived sf1 (3.4 vs 1.6 s: AQE's runtime conversion lands
    after the probe-side exchange is already scheduled). Smoothing totals
    are a 1-row scalar off the vocab-grain feature table (allowlisted
    SinglePartition — bounded by |vocab|, not |docs|). The doc relation
    is lazily checkpointed at its histogram/output fork (doc-grain,
    output-sized). The selection threshold is deliberately BUCKET-grain
    (div 1000 micro-units): the cut histogram is bounded by the WEIGHT
    RANGE / bucket width, never by |docs| — an exact per-value top-20%
    would need a fact-scale global sort; both cumulative frames share
    one window spec and run in ONE WindowExec over that bounded
    histogram. DSIR's selection is itself a sampling step, so a
    value-threshold with <=1-bucket slack is the faithful scale-honest
    form (fixture: 101/500 vs the exact 100). Measured at derived sf1:
    2.0 s vs 3.7 s (old 16-shuffle form) vs DuckDB 0.78 s."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("term")
    )
    feat = toks.groupBy("term").agg(
        F.coalesce(
            F.sum(F.when(F.col("lang") == _DSIR_TARGET_LANG, F.lit(1))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("cnt_t"),
        F.count(F.lit(1)).alias("cnt_s"),
    )
    tot = feat.agg(
        F.count(F.lit(1)).alias("v"),
        F.sum("cnt_t").alias("tot_t"),
        F.sum("cnt_s").alias("tot_s"),
    )
    lr = feat.crossJoin(F.broadcast(tot)).select(
        "term",
        F.round(
            F.log(
                ((F.col("cnt_t") + 1).cast("double") / (F.col("tot_t") + F.col("v")))
                / ((F.col("cnt_s") + 1).cast("double") / (F.col("tot_s") + F.col("v")))
            )
            * F.lit(1e6),
            0,
        )
        .cast("bigint")
        .alias("lr_micro"),
    )
    doc = (
        toks.join(F.broadcast(lr), "term")
        .groupBy("doc_id")
        .agg(
            F.max("lang").alias("lang"),
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lr_micro").alias("lw_micro"),
        )
        # doc forks (histogram/threshold branch, final projection) — same
        # pruning-defeats-ReuseExchange story; doc-grain, output-sized.
        .localCheckpoint(eager=False)
    )
    b = F.expr(
        f"CASE WHEN lw_micro >= 0 THEN lw_micro"
        f" ELSE lw_micro - {_DSIR_BUCKET - 1} END div {_DSIR_BUCKET}"
    )
    hist = doc.select(b.alias("b")).groupBy("b").agg(F.count(F.lit(1)).alias("c"))
    # Both cumulative frames share one window spec (same partitioning +
    # ordering, different frames) so they compile into a SINGLE WindowExec
    # over the bounded histogram — one SinglePartition exchange instead of
    # the former three (two windows + the threshold aggregate, which now
    # rides the already-single-partition window output exchange-free).
    w_base = Window.orderBy(F.col("b").desc())
    w_desc = w_base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = w_base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = hist.select(
        "b",
        F.sum("c").over(w_desc).alias("cum_c"),
        F.sum("c").over(w_all).alias("n"),
    )
    thr = (
        cum.filter(F.col("cum_c") * 5 >= F.col("n"))
        .agg((F.max("b") * _DSIR_BUCKET).alias("lw_star"))
    )
    return doc.crossJoin(F.broadcast(thr)).select(
        "doc_id",
        "lang",
        "n_tokens",
        "lw_micro",
        (F.col("lw_micro") >= F.col("lw_star")).alias("selected"),
    )


# ---------------------------------------------------------------------------
# TXT19 — iterative BPE tokenizer training (3 merge steps)
# ---------------------------------------------------------------------------


def _bpe_cte_prefix(iterations: int = 3) -> str:
    """The words/vocab/s0 + (p_k, m_k, s_k) training CTE chain shared by
    txt19 (training trajectory) and txt20 (corpus encode) oracles — m_k
    holds step k's merged (a, b) pair, s_k the post-merge vocab state."""
    pair_cte = """
p{k} AS (SELECT t.syms[i] AS a, t.syms[i + 1] AS b,
                CAST(sum(t.freq) AS BIGINT) AS cnt
         FROM (SELECT freq, list_filter(string_split(w, '  '), x -> x <> '') AS syms
               FROM s{prev}) t,
              unnest(range(1, len(t.syms))) r(i)
         GROUP BY 1, 2),
m{k} AS (SELECT a, b, cnt FROM p{k} ORDER BY cnt DESC, a, b LIMIT 1),
s{k} AS (SELECT replace(w, ' ' || (SELECT a FROM m{k}) || '  ' || (SELECT b FROM m{k}) || ' ',
                           ' ' || (SELECT a FROM m{k}) || (SELECT b FROM m{k}) || ' ') AS w,
                freq
         FROM s{prev})"""
    ctes = "".join(
        "," + pair_cte.format(k=k, prev=k - 1) for k in range(1, iterations + 1)
    )
    return f"""
WITH words AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
vocab AS (SELECT word, count(*)::BIGINT AS freq FROM words
          WHERE length(word) >= 2 GROUP BY word),
s0 AS (SELECT '  ' || regexp_replace(word, '(.)', '\\1  ', 'g') AS w, freq
       FROM vocab){ctes}"""


def _llm_bpe_sql(iterations: int = 3) -> str:
    out_sel = """
SELECT {k} AS step, (SELECT a || b FROM m{k}) AS merged,
       (SELECT cnt FROM m{k}) AS pair_count,
       (SELECT CAST(sum(freq * len(list_filter(string_split(w, '  '), x -> x <> '')))
               AS BIGINT) FROM s{k}) AS symbols_after"""
    sels = "\nUNION ALL".join(out_sel.format(k=k) for k in range(1, iterations + 1))
    return f"""{_bpe_cte_prefix(iterations)}
{sels}
"""


@register("txt19_bpe_train", _llm_bpe_sql())
def txt19_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three BPE merge steps trained on the corpus vocabulary
    (ops/text.py::bpe_train — the iterative driver-loop extension of
    txt16's single-step pair counts): per step, the merged pair, its
    selection-time corpus-weighted count, and the corpus symbol total
    after applying the merge. See the operator docstring for the
    double-space symbol-string representation that makes greedy merge
    application one literal replace() in both engines."""
    from com_danliris_service_etl_spark.operators.text import bpe_train

    return bpe_train(_t(spark, sf_dir, "documents"), iterations=3)
