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

FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, features array<double>"
)


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
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf["payload"].map(len),
                    "features": pdf["payload"].map(decode_stub),
                }
            )
            yield out

    return d.mapInPandas(run, schema=FEATURES_SCHEMA)
