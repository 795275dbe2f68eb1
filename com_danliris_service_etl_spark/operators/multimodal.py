"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The contract for image/audio/video at 100 TB: payloads are `binary` columns
(or object-store URIs) with typed metadata columns; decode/feature-extract
runs as Arrow-batched Pandas UDFs via `mapInPandas`, so Python touches each
batch once and the surrounding plan (partitioning, pruning, joins on
metadata) stays JVM-side.

The decode step itself is STUBBED here — the test image has no image/audio
libraries — behind `decode_stub`, which produces deterministic fake features
from the bytes. The Spark-side plumbing (schema, batch iteration, UDF
signature, partition behavior) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 4

# HONEST-LABELING CONTRACT: the decode/resize steps in this module are
# deterministic byte-arithmetic STUBS (the image has no PIL/librosa/
# ffmpeg). Any wiring of a real decoder MUST flip this flag — tests pin
# both the flag and the stubs' exact byte arithmetic, so fake features
# can never silently be mistaken for real decode output downstream.
DECODE_IS_STUB = True

FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, features array<double>"
)


def _id_field(d: DataFrame, id_col: str) -> str:
    """Schema fragment for the caller's id column, by NAME AND TYPE — a
    hardcoded `doc_id long` would rename custom id columns (breaking
    downstream joins) and crash Arrow conversion for string ids."""
    return f"`{id_col}` {dict(d.dtypes)[id_col]}"


def _nbytes(b) -> int | None:
    """Null-safe byte length: media payloads CAN be NULL (missing asset,
    failed fetch) and `len(None)` would kill the Python worker task."""
    return len(b) if b is not None else None


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a binary payload column (UTF-8 bytes of the text stand in for
    a real media payload) plus typed metadata."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "payload_len", F.octet_length("payload")
    )


def binary_metadata(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """JVM-side metadata over binary payloads: byte length + SHA-256 digest.
    No Python in the loop — this is the fast path for dedup/indexing over
    media columns."""
    d = with_binary_payload(docs)
    return d.select(
        id_col,
        F.col("payload_len").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("sha256_hex"),
    )


def decode_stub(payload: bytes) -> list[float]:
    """STUB for the real media decoder (PIL/librosa/ffmpeg are not in this
    container). Deterministic fake features derived from the bytes; replace
    with a real decoder in production.

    Raise-on-real-media guard: a real deployment would dispatch on magic
    bytes; anything non-UTF8 lands here as well, by design.
    """
    if not payload:
        return [0.0] * FEATURE_DIM
    n = len(payload)
    return [
        float(n),
        float(payload[0]),
        float(payload[-1]),
        float(sum(payload[:64]) % 997),
    ]


def extract_features(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    `mapInPandas`: the real plumbing for decode/resize/frame-sample ops.

    Batch shape: each pandas batch holds `spark.sql.execution.arrow
    .maxRecordsPerBatch` rows; the UDF is stateless so partitioning is
    irrelevant to correctness and elastic at scale."""
    d = with_binary_payload(docs).select(id_col, "payload")
    # One-file corpora = one partition = one Python worker; spread first so
    # the Arrow batches decode in parallel.
    d = d.repartition(d.sparkSession.sparkContext.defaultParallelism)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": pdf["payload"].map(_nbytes),
                    "features": pdf["payload"].map(decode_stub),
                }
            )
            yield out

    return d.mapInPandas(
        run, schema=f"{_id_field(d, id_col)}, n_bytes long, features array<double>"
    )


def resize_stub(payload: bytes, target_bytes: int) -> bytes:
    """STUB for a real image resize (no PIL in this container): deterministic
    truncate-or-cycle to the target size. The contract being exercised is
    binary-in/binary-out through Arrow batches."""
    if not payload:  # None (missing asset) or empty both yield zero bytes
        return b"\x00" * target_bytes
    reps = (target_bytes // len(payload)) + 1
    return (payload * reps)[:target_bytes]


def resize_payloads(
    docs: DataFrame, target_bytes: int = 64, id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched binary→binary transform (the resize/transcode shape):
    payload in, fixed-size payload out, metadata preserved. 1:1 row mapping,
    so the operator pipelines with no shuffle."""
    d = with_binary_payload(docs).select(id_col, "payload")
    d = d.repartition(d.sparkSession.sparkContext.defaultParallelism)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "resized": pdf["payload"].map(
                        lambda p: resize_stub(p, target_bytes)
                    ),
                    "n_bytes_in": pdf["payload"].map(_nbytes),
                }
            )

    return d.mapInPandas(
        run, schema=f"{_id_field(d, id_col)}, resized binary, n_bytes_in long"
    )


def frame_sample(
    docs: DataFrame, frame_bytes: int = 32, every_n: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """Video-style frame sampling as a 1:N Arrow-batched flatMap: the
    payload is treated as a sequence of fixed-size frames and every Nth
    frame is emitted as its own row (doc_id, frame_idx, frame). The fanout
    happens inside mapInPandas — the engine-side contract (schema, row
    multiplication, downstream partitioning) is exactly a real frame
    sampler's."""
    d = with_binary_payload(docs).select(id_col, "payload")
    d = d.repartition(d.sparkSession.sparkContext.defaultParallelism)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                payload = payload if payload is not None else b""
                n_frames = max(1, len(payload) // frame_bytes)
                for i in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(bytes(payload[i * frame_bytes:(i + 1) * frame_bytes]))
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return d.mapInPandas(
        run, schema=f"{_id_field(d, id_col)}, frame_idx int, frame binary"
    )
