"""Semantics tests for the round-2 pipeline operators: sequence packing,
chunking, k-anonymity, repetition stats, inverted index."""

from __future__ import annotations

from pyspark.sql import functions as F

from com_danliris_service_etl_spark.operators.packing import (
    chunk_documents,
    pack_assignments,
    pack_summary,
)
from com_danliris_service_etl_spark.operators.privacy import pseudonymize_k_anon
from com_danliris_service_etl_spark.operators.text import (
    inverted_index,
    repetition_stats,
)

_DOC_SCHEMA = "doc_id long, text string, lang string"


def test_pack_assignment_straddles_to_first_token_pack(spark):
    # budget 10; docs of 4/4/4 tokens: third doc starts at token 8 → pack 0
    # (attributed to the pack its FIRST token lands in), fourth at 12 → pack 1.
    docs = spark.createDataFrame(
        [(i, "a b c d", "en") for i in range(4)], _DOC_SCHEMA
    )
    rows = {
        r.doc_id: (r.tokens_before, r.pack_id)
        for r in pack_assignments(
            docs, budget=10, stream_col="lang", n_shards=1
        ).collect()
    }
    assert rows == {0: (0, 0), 1: (4, 0), 2: (8, 0), 3: (12, 1)}


def test_pack_streams_are_independent(spark):
    docs = spark.createDataFrame(
        [(1, "a b c", "en"), (2, "d e f", "id"), (3, "g h i", "en")], _DOC_SCHEMA
    )
    out = pack_assignments(docs, budget=4, stream_col="lang", n_shards=1).collect()
    by_id = {r.doc_id: r.tokens_before for r in out}
    # id-stream doc 2 is unaffected by en-stream cumulative count
    assert by_id == {1: 0, 2: 0, 3: 3}


def test_pack_sharding_scales_stream_count(spark):
    # default composite (lang, shard) key: stream count grows past the
    # number of languages — the 100 TB parallelism lever.
    docs = spark.createDataFrame(
        [(i, "a b c", "en" if i % 2 else "id") for i in range(40)], _DOC_SCHEMA
    )
    out = pack_assignments(docs, budget=4)
    n_streams = out.select("lang", "shard").distinct().count()
    n_langs = out.select("lang").distinct().count()
    assert n_langs == 2
    assert n_streams > n_langs  # sharding multiplied the streams
    assert out.select("shard").distinct().count() > 1


def test_pack_sharding_preserves_per_stream_assignment(spark):
    # Each (lang, shard) stream's assignment equals running the
    # single-stream packer over just that stream's documents: sharding
    # adds parallelism without changing any stream's internal packing.
    docs = spark.createDataFrame(
        [(i, " ".join(["t"] * (1 + i % 5)), "en" if i % 3 else "id") for i in range(30)],
        _DOC_SCHEMA,
    )
    sharded = pack_assignments(docs, budget=6, n_shards=4)
    got = {
        (r.lang, r.shard, r.doc_id): (r.tokens_before, r.pack_id)
        for r in sharded.collect()
    }
    from com_danliris_service_etl_spark.operators.packing import pack_shard

    member = docs.withColumn("shard", pack_shard("doc_id", 4))
    for lang, shard in {(k[0], k[1]) for k in got}:
        sub = member.filter((F.col("lang") == lang) & (F.col("shard") == shard)).drop(
            "shard"
        )
        solo = {
            (lang, shard, r.doc_id): (r.tokens_before, r.pack_id)
            for r in pack_assignments(sub, budget=6, n_shards=1).collect()
        }
        for key, val in solo.items():
            assert got[key] == val


def test_pack_summary_single_pack_totals(spark):
    docs = spark.createDataFrame([(1, "a b c d", "en"), (2, "e f", "en")], _DOC_SCHEMA)
    rows = pack_summary(pack_assignments(docs, budget=6, n_shards=1), budget=6).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.pack_id, r.n_docs, r.pack_tokens, r.first_doc, r.last_doc) == (0, 2, 6, 1, 2)
    assert abs(r.fill_ratio - 1.0) < 1e-9


def test_chunk_windows_and_tail(spark):
    # 10 tokens, window 4, stride 3 → starts 0,3,6,9; last chunk is 1 token
    docs = spark.createDataFrame([(1, " ".join("abcdefghij"), "en")], _DOC_SCHEMA)
    rows = sorted(
        chunk_documents(docs, window=4, stride=3).collect(), key=lambda r: r.chunk_idx
    )
    assert [r.chunk_idx for r in rows] == [0, 1, 2, 3]
    assert [r.chunk_tokens for r in rows] == [4, 4, 4, 1]


def test_chunk_digest_matches_slice(spark):
    docs = spark.createDataFrame([(1, "a b c d e", "en")], _DOC_SCHEMA)
    rows = {r.chunk_idx: r.chunk_md5 for r in chunk_documents(docs, window=2, stride=2).collect()}
    expect = {
        0: "a b", 1: "c d", 2: "e",
    }
    import hashlib

    for idx, txt in expect.items():
        assert rows[idx] == hashlib.md5(txt.encode()).hexdigest()


def test_k_anonymity_suppresses_small_groups(spark):
    # group (band=0, q=1) has 5 members → kept; (band=0, q=2) has 2 → '*'
    data = [(i, f"name{i}", 100.0, 1, "SEG_A") for i in range(5)]
    data += [(10, "n10", 150.0, 2, "SEG_B"), (11, "n11", 160.0, 2, "SEG_B")]
    df = spark.createDataFrame(data, "id long, name string, bal double, q int, seg string")
    out = pseudonymize_k_anon(
        df, key_col="id", hash_cols=["name"], band_col="bal", band_width=1000.0,
        quasi_cols=["q"], sensitive_col="seg", k=5,
    )
    got = {r.id: (r.seg, r.k_anon) for r in out.collect()}
    assert got[0] == ("SEG_A", 5)
    assert got[10] == ("*", 2)
    # the pseudo column IS the md5 of the identifier (deterministic, so
    # joins across pseudonymized tables still line up) — checked against
    # an independently computed digest for a known row
    import hashlib

    pseudo = {r.id: r.name_pseudo for r in out.select("id", "name_pseudo").collect()}
    assert pseudo[0] == hashlib.md5(b"name0").hexdigest()
    assert pseudo[10] == hashlib.md5(b"n10").hexdigest()


def test_repetition_flags_degenerate_doc(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam", "en"),
            # 10 distinct tokens → top fraction 0.1, below the 0.2 flag line
            (2, "the quick brown fox jumps over a lazy dog today", "en"),
        ],
        _DOC_SCHEMA,
    )
    got = {r.doc_id: r for r in repetition_stats(docs).collect()}
    # 3 bigrams, all "spam spam" → dup fraction 1 - 1/3
    assert got[1].is_repetitive and abs(got[1].dup_bigram_frac - 0.666667) < 1e-6
    assert got[1].top_token_frac == 1.0
    assert not got[2].is_repetitive and got[2].dup_token_frac == 0.0


def test_inverted_index_counts(spark):
    docs = spark.createDataFrame([(1, "a b a", "en"), (2, "b c", "en")], _DOC_SCHEMA)
    got = {r.term: (r.doc_freq, r.coll_freq) for r in inverted_index(docs).collect()}
    assert got == {"a": (1, 2), "b": (2, 2), "c": (1, 1)}
