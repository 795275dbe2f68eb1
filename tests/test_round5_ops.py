"""Round-5 hardening tests: positive sort-order introspection in
first_match_join, the Hadoop-FS storage helpers, the flat-codebook PQ
path, and the sparse fuzzy-join regime."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from com_danliris_service_etl_spark.operators.joins import (
    _is_plain_unsorted_column,
    first_match_join,
)
from com_danliris_service_etl_spark.sources import fsutil


# ---------------------------------------------------------------------------
# first_match_join: sort-order detection must be POSITIVE (ADVICE r4)
# ---------------------------------------------------------------------------


def test_sort_order_probe_classifies_columns(spark):
    """The min_by fast path may engage ONLY for plain columns; every
    explicit sort order (and anything unclassifiable) must be detected —
    a DESC order misrouted to the plain-ascending min_by would silently
    return the wrong first-match row (the exact bug the r4 repr-regex
    probe had on Spark 4's node() wrapper)."""
    assert _is_plain_unsorted_column(F.col("x"))
    assert _is_plain_unsorted_column(F.col("x") + 1)
    assert not _is_plain_unsorted_column(F.col("x").desc())
    assert not _is_plain_unsorted_column(F.col("x").asc())
    assert not _is_plain_unsorted_column(F.col("x").desc_nulls_last())
    assert not _is_plain_unsorted_column(F.col("x").asc_nulls_first())


def test_first_match_join_desc_order(spark):
    left = spark.createDataFrame([(1,), (2,)], "k long")
    right = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 30), (1, "c", 20), (2, "z", 5)],
        "k long, v string, ts long",
    )
    got = {
        r.k: r.v
        for r in first_match_join(
            left, right, on="k", order_by=F.col("ts").desc()
        ).collect()
    }
    assert got == {1: "b", 2: "z"}  # HIGHEST ts wins under desc


def test_first_match_join_plain_asc_uses_min_by_not_window(spark):
    """Plain columns keep the map-side-combinable min_by plan (no Window
    in the optimized plan); an explicit sort order falls back to the
    window path — both pinned so a probe regression is visible."""
    left = spark.createDataFrame([(1,)], "k long")
    right = spark.createDataFrame([(1, "a", 1), (1, "b", 2)], "k long, v string, ts long")
    plain = first_match_join(left, right, on="k", order_by=F.col("ts"))
    assert "min_by" in plain._jdf.queryExecution().optimizedPlan().toString()
    desc = first_match_join(left, right, on="k", order_by=F.col("ts").desc())
    assert "row_number" in desc._jdf.queryExecution().optimizedPlan().toString()
    assert {r.v for r in plain.collect()} == {"a"}
    assert {r.v for r in desc.collect()} == {"b"}


# ---------------------------------------------------------------------------
# fsutil: Hadoop-FS probes and swaps (ADVICE r4 medium)
# ---------------------------------------------------------------------------


def test_fsutil_roundtrip(spark, tmp_path):
    base = str(tmp_path / "store")
    assert not fsutil.exists(spark, base)
    assert fsutil.child_names(spark, base) == []
    assert not fsutil.has_committed_parquet(spark, base)
    spark.range(5).write.parquet(base)
    assert fsutil.exists(spark, base)
    assert fsutil.is_dir(spark, base)
    assert fsutil.has_committed_parquet(spark, base)
    assert fsutil.parquet_file_sizes(spark, base) != []
    fsutil.touch(spark, f"{base}/_applied_3")
    assert "_applied_3" in fsutil.child_names(spark, base)
    moved = str(tmp_path / "store2")
    fsutil.rename(spark, base, moved)
    assert fsutil.exists(spark, moved) and not fsutil.exists(spark, base)
    # rename onto a missing source raises instead of Hadoop's silent False
    with pytest.raises(OSError):
        fsutil.rename(spark, base, str(tmp_path / "nowhere"))
    fsutil.delete(spark, moved)
    assert not fsutil.exists(spark, moved)
    fsutil.delete(spark, moved)  # delete of absent path is a no-op


def test_fsutil_ignores_temporary_output(spark, tmp_path):
    """A crash mid-write leaves only _temporary content — the committed-
    parquet probe must not mistake it for a live store (the wedged-stream
    scenario fold_incremental_lsh documents)."""
    base = tmp_path / "torn"
    (base / "_temporary" / "0").mkdir(parents=True)
    (base / "_temporary" / "0" / "part-0000.parquet").write_bytes(b"xx")
    assert not fsutil.has_committed_parquet(spark, str(base))
    assert fsutil.parquet_file_sizes(spark, str(base)) == []


# ---------------------------------------------------------------------------
# PQ flat codebook: big-codebook broadcast path ≡ literal path
# ---------------------------------------------------------------------------


def test_pq_topk_literal_and_broadcast_paths_agree(spark, monkeypatch):
    """pq_topk inlines small codebooks as a constant-folded literal and
    ships large ones as a one-row broadcast join; both paths must rank
    identically (the threshold between them is a perf knob, never a
    semantics knob)."""
    import com_danliris_service_etl_spark.operators.similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    codebook = emb.filter(F.col("vec_id") < 16)
    rows_lit = sorted(
        tuple(r) for r in sim.pq_topk(emb, queries, codebook, k=3).collect()
    )
    monkeypatch.setattr(sim, "PQ_LITERAL_MAX_DOUBLES", 0)  # force broadcast path
    rows_bc = sorted(
        tuple(r) for r in sim.pq_topk(emb, queries, codebook, k=3).collect()
    )
    assert rows_lit == rows_bc and len(rows_lit) == 5 * 3


# ---------------------------------------------------------------------------
# sparse fuzzy join: the residual evaluates the banded DP once
# ---------------------------------------------------------------------------


def test_fuzzy_blocked_join_threshold_contract(spark):
    """The 3-arg levenshtein returns -1 beyond the band and the true
    distance (<= max_dist) otherwise — so `>= 0` alone is the residual.
    Pin the contract the single-comparison filter rests on."""
    from com_danliris_service_etl_spark.operators.joins import fuzzy_blocked_join

    l = spark.createDataFrame([(1, "abcdef"), (2, "zzzzzz")], "lk long, nm string")
    r = spark.createDataFrame([(10, "abcdxf"), (11, "abQQQf")], "rk long, nm string")
    got = {
        (row.lk, row.rk): row.edit_dist
        for row in fuzzy_blocked_join(l, r, "nm", max_dist=2, block_chars=2).collect()
    }
    # abcdef↔abcdxf = 1 edit (kept); abcdef↔abQQQf = 3 edits (dropped:
    # threshold form yields -1, filtered); zzzzzz blocks apart entirely
    assert got == {(1, 10): 1}


# ---------------------------------------------------------------------------
# degenerate inputs for the round-5 surfaces
# ---------------------------------------------------------------------------


def test_surrogate_key_distributed_empty_and_duplicates(spark):
    from com_danliris_service_etl_spark.operators.windows import (
        surrogate_key_distributed,
    )

    empty = spark.createDataFrame([], "v long")
    assert surrogate_key_distributed(empty, F.col("v")).count() == 0
    # heavy duplication: the order is made total by the caller's contract,
    # but even a NON-total order must still emit dense unique 1..N
    dup = spark.createDataFrame([(7,)] * 50 + [(3,)] * 50, "v long")
    got = surrogate_key_distributed(dup, F.col("v"), out_col="sk").collect()
    sks = sorted(r.sk for r in got)
    assert sks == list(range(1, 101))
    assert all(r.sk <= 50 for r in got if r.v == 3)  # range order respected


def test_pq_topk_empty_queries_and_corpus(spark):
    from com_danliris_service_etl_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cb = emb.filter(F.col("vec_id") < 16)
    none = emb.filter(F.col("vec_id") < 0)
    assert sim.pq_topk(emb, none, cb, k=3).count() == 0
    assert sim.pq_topk(none, emb.limit(3), cb, k=3).count() == 0


def test_fuzzy_blocked_join_null_text_no_match_no_crash(spark):
    from com_danliris_service_etl_spark.operators.joins import fuzzy_blocked_join

    l = spark.createDataFrame([(1, None), (2, "abcd")], "lk long, nm string")
    r = spark.createDataFrame([(9, "abce"), (8, None)], "rk long, nm string")
    got = fuzzy_blocked_join(l, r, "nm", max_dist=2, block_chars=2).collect()
    # NULL names produce NULL blocks — equi-join drops them; only the
    # real pair survives
    assert [(row.lk, row.rk) for row in got] == [(2, 9)]


def test_contamination_passages_null_and_empty_text(spark):
    from com_danliris_service_etl_spark.operators.dedup import (
        contamination_passages,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
    got = {r.doc_id: r for r in contamination_passages(docs, bench, k_pass=3).collect()}
    assert 2 not in got  # NULL text filtered, not a nonsense 2-passage row
    assert got[1].n_passages == 2 and got[1].n_contaminated == 1
    assert got[1].first_hit_pos == 0
    # empty string -> one 1-token passage, shorter than the shingle: clean
    assert got[3].n_passages == 1 and got[3].n_contaminated == 0


def test_pq_topk_empty_codebook_raises_clearly(spark):
    from com_danliris_service_etl_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="codebook is empty"):
        sim.pq_topk(emb, emb.limit(2), emb.filter(F.col("vec_id") < 0), k=3)
