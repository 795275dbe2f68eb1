"""Structured Streaming ≡ batch equivalence for the windowed aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from com_danliris_service_etl_spark.plans.registry import load_all
from com_danliris_service_etl_spark.streaming.jobs import run_streaming_windowed_counts
from tests.conftest import SF_DIR, assert_frames_match

load_all()


def test_streaming_matches_batch(spark):
    from com_danliris_service_etl_spark.plans.queries_streaming import st1_tumbling_window

    stream_out = run_streaming_windowed_counts(spark, SF_DIR, "st_eq_test").toPandas()
    batch_out = st1_tumbling_window(spark, SF_DIR).toPandas()
    assert_frames_match(stream_out, batch_out, "streaming_vs_batch")


def test_stateful_sessionize_matches_batch(spark):
    """applyInPandasWithState sessionizer ≡ the batch lag+cumsum sessionizer
    (single availableNow batch drains the fixture, so open sessions close)."""
    from com_danliris_service_etl_spark.plans.queries_streaming import st3_sessionize
    from com_danliris_service_etl_spark.streaming.jobs import run_streaming_sessionize

    stream_out = run_streaming_sessionize(spark, SF_DIR, "st_sessions_test").toPandas()
    batch_out = st3_sessionize(spark, SF_DIR).toPandas()
    assert_frames_match(stream_out, batch_out, "stateful_sessionize_vs_batch")


def test_incremental_merge_idempotent(spark, tmp_path):
    """Streaming foreachBatch MERGE: first drain loads every event; a fresh
    checkpoint re-delivering the same data leaves the fact unchanged (S6)."""
    from com_danliris_service_etl_spark.streaming.jobs import run_incremental_merge

    target = str(tmp_path / "fact_events")
    run_incremental_merge(spark, SF_DIR, target, str(tmp_path / "cp1"))
    first = spark.read.parquet(target)
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert first.count() == n_events
    # Re-deliver everything with a NEW checkpoint: MERGE keeps keys unique.
    run_incremental_merge(spark, SF_DIR, target, str(tmp_path / "cp2"))
    assert spark.read.parquet(target).count() == n_events


def test_streaming_rollup_matches_batch(spark, tmp_path):
    """The stream-maintained continuous aggregate must equal the one-pass
    batch rollup of the same events once the stream drains."""
    from com_danliris_service_etl_spark.operators.rollup import bucket_aggregate
    from com_danliris_service_etl_spark.streaming.jobs import run_streaming_rollup

    sf = "/root/testdata/sf0.001"
    state = str(tmp_path / "rollup_state")
    run_streaming_rollup(
        spark, sf, state, checkpoint_dir=str(tmp_path / "ckpt")
    )

    from com_danliris_service_etl_spark.plans.registry import _events

    ev = _events(spark, sf).select("event_type", "value", "ts_us")
    want = {
        (r.bucket_us, r.event_type): (r.n, round(r.sum_v, 6), r.min_v, r.max_v)
        for r in bucket_aggregate(
            ev, "ts_us", 3600 * 1_000_000, ["event_type"], "value"
        ).collect()
    }
    got = {
        (r.bucket_us, r.event_type): (r.n, round(r.sum_v, 6), r.min_v, r.max_v)
        for r in spark.read.parquet(state).collect()
    }
    assert got == want


def test_streaming_incremental_lsh_folds_to_full(spark, tmp_path):
    """Driving two batches through the production fold must reproduce the
    full-corpus pair set exactly: batch-1 pairs come from its internal
    dedup, every pair involving a batch-2 document from the incremental
    check against the persisted signature store."""
    from com_danliris_service_etl_spark.operators.dedup import minhash_lsh_pairs
    from com_danliris_service_etl_spark.streaming.jobs import fold_incremental_lsh

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    store = str(tmp_path / "sig_store")
    out = str(tmp_path / "pairs_out")

    from pyspark.sql import functions as F

    fold_incremental_lsh(docs.filter(F.col("doc_id") < 250), store, out)
    fold_incremental_lsh(docs.filter(F.col("doc_id") >= 250), store, out)

    got = {
        (r.doc_a, r.doc_b, r.est_jaccard)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.doc_a, r.doc_b, r.est_jaccard)
        for r in minhash_lsh_pairs(docs).collect()
    }
    assert got == want
    # the store advanced to one signature row per document
    assert spark.read.parquet(store).count() == docs.count()


def test_streaming_incremental_lsh_redelivery_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: redelivering a micro-batch (same
    batch_id) must not double pairs or store signatures — a committed
    batch no-ops, and the per-batch_id overwrite partition makes a
    partial retry safe. The fold's output must still equal the
    full-corpus pair set."""
    from com_danliris_service_etl_spark.operators.dedup import minhash_lsh_pairs
    from com_danliris_service_etl_spark.streaming.jobs import fold_incremental_lsh

    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    store = str(tmp_path / "sig_store")
    out = str(tmp_path / "pairs_out")

    b1 = docs.filter(F.col("doc_id") < 250)
    b2 = docs.filter(F.col("doc_id") >= 250)
    fold_incremental_lsh(b1, store, out, batch_id=0)
    fold_incremental_lsh(b1, store, out, batch_id=0)  # redelivered
    fold_incremental_lsh(b2, store, out, batch_id=1)
    fold_incremental_lsh(b2, store, out, batch_id=1)  # redelivered

    got = {
        (r.doc_a, r.doc_b, r.est_jaccard)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.doc_a, r.doc_b, r.est_jaccard)
        for r in minhash_lsh_pairs(docs).collect()
    }
    assert got == want
    # duplicates would show up as extra rows, not just extra set members
    assert spark.read.parquet(out).count() == len(want)
    assert spark.read.parquet(store).count() == docs.count()


def test_streaming_incremental_lsh_job_runs(spark, tmp_path):
    """readStream wiring: the availableNow drain over the fixture emits the
    same pair set as the batch operator (single micro-batch here)."""
    from com_danliris_service_etl_spark.operators.dedup import minhash_lsh_pairs
    from com_danliris_service_etl_spark.streaming.jobs import (
        run_streaming_incremental_lsh,
    )

    out = str(tmp_path / "pairs")
    run_streaming_incremental_lsh(
        spark,
        SF_DIR,
        sig_store_path=str(tmp_path / "sigs"),
        pairs_out_path=out,
        checkpoint_dir=str(tmp_path / "cp"),
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert spark.read.parquet(out).count() == minhash_lsh_pairs(docs).count()


def test_stream_stream_interval_join_matches_batch(spark):
    from com_danliris_service_etl_spark.plans.registry import load_all
    from com_danliris_service_etl_spark.streaming.jobs import (
        run_streaming_interval_join,
    )

    sf_dir = "/root/testdata/sf0.001"
    batch = {
        tuple(r)
        for r in load_all()["st6_interval_join"][0](spark, sf_dir).collect()
    }
    stream = {
        tuple(r)
        for r in run_streaming_interval_join(
            spark, sf_dir, query_name="t_interval_join"
        ).collect()
    }
    assert stream == batch and len(batch) > 0
