"""Windowed event-time queries (engine extensions over the `events` fixture
— SURVEY.md §2.12 notes the reference has no streaming runtime; these are
the standard tumbling/sliding/session operators, in batch mode for the
oracle gate. streaming/jobs.py runs the same tumbling aggregation as a real
Structured Streaming query; tests assert stream ≡ batch."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from com_danliris_service_etl_spark.plans.registry import _events, _t, register


@register(
    "st1_tumbling_window",
    """
    SELECT epoch_us(bucket) AS window_start_us,
           epoch_us(bucket + INTERVAL 1 HOUR) AS window_end_us,
           event_type, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM (SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket, event_type, value FROM events)
    GROUP BY bucket, event_type
    """,
)
def st1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows: count + sum per (window, event_type)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts_utc", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            F.unix_micros(F.col("window.end")).alias("window_end_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "st2_sliding_window",
    """
    WITH offsets AS (SELECT * FROM (VALUES (0), (1)) o(off)),
    bucketed AS (
      SELECT time_bucket(INTERVAL 2 HOUR, ts,
                         TIMESTAMP '2000-01-01' + to_hours(off)) AS w_start,
             event_type, value
      FROM events, offsets)
    SELECT epoch_us(w_start) AS window_start_us,
           epoch_us(w_start + INTERVAL 2 HOUR) AS window_end_us,
           event_type, count(*) AS n
    FROM bucketed GROUP BY w_start, event_type
    """,
)
def st2_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2h length, 1h slide): each event lands in 2 windows.
    The oracle reproduces Spark's window set as 2 offset tumbling bucketings."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts_utc", "2 hours", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            F.unix_micros(F.col("window.end")).alias("window_end_us"),
            "event_type",
            "n",
        )
    )


@register(
    "st3_sessionize",
    """
    WITH gaps AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800000000
                       OR lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events),
    sessions AS (
      SELECT user_id, event_id, ts_us,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM gaps)
    SELECT user_id, session_id, count(*) AS n_events,
           min(ts_us) AS session_start_us, max(ts_us) AS session_end_us
    FROM sessions GROUP BY user_id, session_id
    """,
)
def st3_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via lag + cumulative sum —
    the batch twin of streaming session_window. One shuffle on user_id;
    both windows share the same partitioning so Catalyst plans a single
    exchange."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    is_new = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    return (
        ev.select("user_id", "event_id", "ts_us")
        .withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(wcum))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
        )
    )


@register(
    "st4_session_window_native",
    """
    WITH gaps AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800000000
                       OR lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events),
    sessions AS (
      SELECT user_id, ts_us,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      FROM gaps)
    SELECT user_id,
           min(ts_us) AS session_start_us,
           max(ts_us) + 1800000000 AS session_end_us,
           count(*) AS n_events
    FROM sessions GROUP BY user_id, sid
    """,
)
def st4_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's NATIVE `session_window` aggregation (the
    operator a Structured Streaming job uses verbatim, vs st3's
    lag+cumsum batch formulation): Spark merges per-user gap-windows
    inside one aggregation — a single shuffle on the session-window
    key — and defines session end = last event + gap, which the oracle
    mirrors as max(ts)+30min over the same lag-derived sessions. Two
    independent formulations of one semantics, both green, is the
    strongest pin that the session boundaries are right."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.session_window(F.col("ts_utc"), "30 minutes"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
            "n_events",
        )
    )


@register(
    "st12_stream_static_enrich",
    """
    SELECT c_mktsegment, event_type,
           count(*)::BIGINT AS n,
           round(sum(value), 2) AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment, event_type
    """,
)
def st12_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment — the deployment shape where an
    unbounded event stream joins a slowly-changing dimension snapshot
    (here: events → customer segment) before aggregating. This batch
    twin IS the per-microbatch plan Structured Streaming executes for a
    stream-static inner join (stateless — no watermark, no join state;
    the static side is re-resolvable per microbatch, which is how dim
    updates become visible mid-stream). streaming/jobs.py
    `run_streaming_static_enrich` runs the same plan as a real
    readStream; tests assert stream ≡ batch ≡ oracle.

    Scale shape: the dimension broadcasts under every microbatch (one
    build, reused across the batch's tasks); the aggregate is bounded by
    |segments| × |event types|. Events' raw `ts` is never touched — the
    join key and payload are timestamp-free, so the query is immune to
    the fixture's ts physical-type drift."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "value")
    dim = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        ev.join(F.broadcast(dim), ev["user_id"] == dim["c_custkey"])
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "st13_stateful_topk",
    """
    SELECT event_type, CAST(rank AS INT) AS rank, user_id, n_events
    FROM (
      SELECT event_type, user_id, count(*)::BIGINT AS n_events,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY count(*) DESC, user_id) AS rank
      FROM events GROUP BY event_type, user_id)
    WHERE rank <= 3
    """,
)
def st13_stateful_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the exact running top-3 heavy users per event type
    (streaming/jobs.py::run_streaming_topk, the second custom
    applyInPandasWithState operator): one map-side-combinable
    (type, user) count shuffle, then a bounded per-type window. The
    streaming form keeps the full (type, user) count map as keyed state
    — exact top-k is not mergeable, so the exact operator pays state
    proportional to the distinct-pair set, while st8's count-min sketch
    is the bounded-memory approximate dual. Total-order tiebreak
    (count desc, user_id) keeps both engines and both forms aligned."""
    ev = _t(spark, sf_dir, "events").select("event_type", "user_id")
    from pyspark.sql import Window as W

    counts = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = W.partitionBy("event_type").orderBy(
        F.col("n_events").desc(), "user_id"
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("event_type", "rank", "user_id", "n_events")
    )
