"""Sequence packing and chunking operators for LLM training-data prep.

Packing (concat-and-chunk): order documents within a stream, take a
running token total, and assign each document to the fixed-size context
window ("pack") its first token lands in — the standard way training
examples are packed so no context-window capacity is wasted. One window
function over (stream, order). The stream key is COMPOSITE by default:
(`lang`, shard), with shard a deterministic md5 bucket of the doc id —
`lang` alone gives only ~dozens of streams at 100 TB, i.e. a dozens-way
parallelism ceiling and one giant window partition per language; the
shard dimension multiplies the stream count so the cumulative windows
spread across the cluster. Pack ids are unique per stream, and each
stream's assignment depends only on its own members (pinned by
`test_pack_sharding_preserves_per_stream_assignment`).

Chunking: RAG-style fixed-size token windows with overlap, generated as
a per-row ``sequence()`` + ``explode`` — a narrow 1:N fanout pipelined
straight into the parquet scan; no shuffle at any scale.

Reference parity note: the reference ETL (danliris/com-danliris-service-etl)
has no packing/chunking — these extend the engine for training-data
pipelines per BASELINE.json's north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


DEFAULT_PACK_SHARDS = 4


def pack_shard(id_col: str, n_shards: int) -> F.Column:
    """Deterministic stream shard in [0, n_shards): first 8 md5 hex chars
    of the stringified id — same hash-bucket recipe as sampling.hash_split,
    stable across engines (DuckDB mirror: ('0x' || substring(md5(id::
    VARCHAR), 1, 8))::BIGINT % n_shards) and under append."""
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
    return (h.cast("long") % n_shards).alias("shard")


def pack_assignments(
    docs: DataFrame,
    budget: int = 256,
    stream_col: str = "lang",
    order_col: str = "doc_id",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = DEFAULT_PACK_SHARDS,
) -> DataFrame:
    """Per-document pack assignment: cumulative whitespace-token count
    within the (stream, shard) stream, then ``pack_id =
    floor(tokens_before / budget)``.

    A document straddling a pack boundary is attributed to the pack its
    first token lands in (concat-and-chunk semantics: the tokenizer-side
    writer later splits the byte stream exactly at budget boundaries; the
    assignment here decides ordering and locality).

    ``n_shards`` multiplies the parallelism: the cumulative window
    partitions on (stream_col, shard), so the stream count — and with it
    the cluster-wide parallelism ceiling — scales with the shard count
    instead of saturating at the number of languages. ``n_shards=1``
    recovers the single-stream-per-language form (shard column constant
    0)."""
    n_tok = F.size(F.split(F.col(text_col), " ")).cast("long")
    shard = (
        pack_shard(id_col, n_shards) if n_shards > 1 else F.lit(0).cast("long").alias("shard")
    )
    prev = (
        Window.partitionBy(stream_col, "shard")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # keep order_col through the projection when it isn't the id — the
    # window below orders by it and would otherwise fail to resolve
    cols = [F.col(stream_col), shard, F.col(id_col), n_tok.alias("n_tokens")]
    if order_col not in (id_col, stream_col):
        cols.append(F.col(order_col))
    return (
        docs.select(*cols)
        .withColumn(
            "tokens_before",
            F.coalesce(F.sum("n_tokens").over(prev), F.lit(0).cast("long")),
        )
        .withColumn(
            "pack_id", F.floor(F.col("tokens_before") / F.lit(float(budget))).cast("long")
        )
    )


def pack_summary(
    assignments: DataFrame,
    budget: int = 256,
    stream_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Aggregate pack manifest: docs per pack, token total, doc-id span,
    fill ratio vs the budget. Map-side-combinable single shuffle on
    (stream, shard, pack_id) — the same key the window stage already
    partitioned by, so AQE coalesces rather than re-shuffles."""
    return assignments.groupBy(stream_col, "shard", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
        F.round(F.sum("n_tokens") / F.lit(float(budget)), 6).alias("fill_ratio"),
    )


def chunk_documents(
    docs: DataFrame,
    window: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping fixed-size chunks (RAG indexing shape): one chunk per
    ``stride`` tokens, each ``window`` tokens long (shorter at the tail).

    Pure per-row fanout — ``sequence(0, n-1, stride)`` exploded, then an
    array ``slice`` per start. No shuffle; at 100 TB this pipelines into
    the scan and the output is written partition-local. The chunk text is
    emitted as an md5 so downstream exact-dedup of chunks is a plain
    digest groupBy (and the driver's canonicalizer never sees arrays)."""
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    toks = F.split(F.col(text_col), " ")
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(stride)
    )
    chunked = docs.select(
        F.col(id_col), toks.alias("_toks"), F.explode(starts).alias("_start")
    )
    piece = F.slice(F.col("_toks"), F.col("_start") + 1, window)
    return chunked.select(
        F.col(id_col),
        F.floor(F.col("_start") / F.lit(float(stride))).cast("long").alias("chunk_idx"),
        F.size(piece).cast("long").alias("chunk_tokens"),
        F.md5(F.array_join(piece, " ")).alias("chunk_md5"),
    )


def token_balanced_shards(
    docs: DataFrame,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-balanced output sharding: assign every document to one of
    ``n_shards`` output shards so shard TOKEN totals stay balanced even
    under heavy doc-length skew — the property a training job needs from
    its input files (equal-token shards ⇒ equal step counts per reader;
    hash-sharding balances doc COUNTS, which skewed lengths break).

    Deterministic sorted round-robin (longest-first): global rank by
    (n_tokens DESC, id) — each consecutive group of ``n_shards`` ranks
    drops exactly one doc per shard, so after every round the totals
    differ by at most that round's intra-round spread, and sorting makes
    later rounds' spreads monotonically small (the classic LPT-style
    bound). Assignment is a pure function of the corpus content: same
    input ⇒ same shards, on any engine and any partitioning.

    Scale shape: the global rank is `surrogate_key_distributed` — a range
    shuffle materialized once + per-partition parallel row_number with
    driver-side offsets (tiny per-partition count rows), NEVER a global
    single-partition window. The per-shard manifest is one map-side-
    combinable aggregation on the n_shards-valued key."""
    sized = docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )
    from com_danliris_service_etl_spark.operators.windows import (
        surrogate_key_distributed,
    )

    ranked = surrogate_key_distributed(
        sized,
        [F.col("n_tokens").desc(), F.col(id_col)],
        out_col="__rank",
    )
    return (
        ranked.withColumn("shard", ((F.col("__rank") - 1) % n_shards).cast("long"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("shard_tokens"),
            F.max("n_tokens").alias("max_doc_tokens"),
            F.min("n_tokens").alias("min_doc_tokens"),
        )
    )


def rendezvous_assign(
    df,
    n_shards: int,
    key_col: str = "doc_id",
    shard_col: str = "shard",
):
    """Rendezvous (highest-random-weight) shard routing: every key goes to
    the shard with the largest md5(key ':' shard) — the consistent-
    placement primitive behind shard maps, cache rings, and incremental
    dataset repartitioning. Its defining property over mod-N hashing:
    growing the ring from N to N+1 moves only ~1/(N+1) of the keys (the
    ones the NEW shard now wins), where mod-N reshuffles nearly all.

    Entirely per-row codegen (one array fold over the shard list, md5 is
    the shared deterministic hash — verify-skill gotcha: there is no
    cross-engine xxhash); zero shuffle. Ties on the hex weight break to
    the HIGHEST shard id on both engines (struct max semantics) —
    unreachable in practice for distinct inputs, pinned for determinism.
    """
    from pyspark.sql import functions as F

    best = F.expr(
        f"array_max(transform(sequence(0, {n_shards - 1}), s -> struct("
        f"  md5(concat(cast({key_col} AS STRING), ':', cast(s AS STRING))) AS h,"
        "   s AS s)))"
    )
    return df.withColumn("__best", best).withColumn(
        shard_col, F.col("__best.s").cast("long")
    ).withColumn("__w", F.col("__best.h")).drop("__best")
