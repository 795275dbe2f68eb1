"""Structured Streaming jobs over the events table.

Pattern: file source → event-time watermark → windowed aggregation →
sink. Locally the parquet fixture drives the stream to completion with
`availableNow` + `processAllAvailable()` (the Trigger.AvailableNow shape a
nightly incremental job uses in production — SURVEY.md §2.12); on a real
cluster the same plan runs against Kafka/Delta CDC unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # TIMESTAMP(NANOS) read as nanos long
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def streaming_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events fixture with event-time restored from the
    nanos long (see session.py nanosAsLong note)."""
    # The file stream source requires a directory: stream the sf dir with a
    # glob filter selecting the events table.
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts_utc", F.timestamp_micros(F.expr("ts div 1000")))


def windowed_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts+sums with a late-data watermark: the canonical
    streaming aggregation. State store holds one row per (window, type);
    the watermark bounds state age, which is what makes this viable on an
    unbounded 100 TB/day stream."""
    return (
        events.withWatermark("ts_utc", watermark)
        .groupBy(F.window("ts_utc", window), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            F.unix_micros(F.col("window.end")).alias("window_end_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def run_streaming_windowed_counts(
    spark: SparkSession, sf_dir: str, query_name: str = "stream_out"
) -> DataFrame:
    """Drive the streaming aggregation to completion over the fixture via
    the in-memory sink; returns the result as a (batch) DataFrame."""
    agg = windowed_counts(streaming_events(spark, sf_dir))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
