"""Unit tests for the round-3 registered operators: BM25, int8 top-k,
PII redaction, and the multimodal stub honesty contract."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from com_danliris_service_etl_spark.operators import multimodal as mm
from com_danliris_service_etl_spark.operators.privacy import pii_redact
from com_danliris_service_etl_spark.operators.similarity import int8_topk
from com_danliris_service_etl_spark.operators.text import bm25_topk

_DOC_SCHEMA = "doc_id long, text string"


def test_bm25_hand_computed_scores(spark):
    # cf: x=3, y=5, z=1 → top-1 term is y (df=2, N=3, avgdl=3)
    docs = spark.createDataFrame(
        [(1, "x x y"), (2, "x z"), (3, "y y y y")], _DOC_SCHEMA
    )
    rows = {r.doc: r for r in bm25_topk(docs, n_terms=1, k=10).collect()}
    assert set(rows) == {1, 3}
    idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0)
    # doc 1: tf=1, dl=3 → 2.2/(1+1.2*(0.25+0.75)) = 1.0 → score = idf
    assert rows[1].bm25 == round(idf * 1.0, 4)
    # doc 3: tf=4, dl=4 → 4*2.2/(4+1.2*(0.25+0.75*4/3)) = 1.6
    assert rows[3].bm25 == round(idf * (4 * 2.2 / (4 + 1.2 * (0.25 + 0.75 * 4 / 3))), 4)
    assert (rows[3].rank, rows[1].rank) == (1, 2)  # higher score ranks first
    assert all(r.term == "y" for r in rows.values())


def test_bm25_null_text_doc_does_not_inflate_stats(spark):
    """r12 advice: a NULL-text doc yields no tokens (split(NULL)→NULL,
    explode drops it) so it must not count toward n_docs/avgdl — the
    oracle derives stats from the tokenized relation. Scores with the
    NULL doc present must equal scores computed without it."""
    base = [(1, "x x y"), (2, "x z"), (3, "y y y y")]
    clean = bm25_topk(
        spark.createDataFrame(base, _DOC_SCHEMA), n_terms=1, k=10
    ).collect()
    with_null = bm25_topk(
        spark.createDataFrame(base + [(4, None)], _DOC_SCHEMA),
        n_terms=1, k=10,
    ).collect()
    key = lambda r: (r.term, r.doc)  # noqa: E731
    assert sorted(map(tuple, clean)) == sorted(map(tuple, with_null))
    assert {r.doc for r in with_null} == {1, 3}


def test_bm25_rank_ties_break_on_doc_id(spark):
    # identical docs → identical rounded scores → rank follows doc id
    docs = spark.createDataFrame([(i, "a b") for i in range(4)], _DOC_SCHEMA)
    rows = sorted(
        bm25_topk(docs, n_terms=1, k=10).collect(), key=lambda r: r.rank
    )
    assert [r.doc for r in rows] == [0, 1, 2, 3]


_VEC_SCHEMA = "vec_id long, embedding array<float>"


def test_int8_exact_for_representable_vectors(spark):
    # values are exact multiples of scale → quantization error is 0
    emb = spark.createDataFrame(
        [
            (0, [127.0, 0.0, 0.0]),
            (1, [127.0, 127.0, 0.0]),
            (2, [0.0, 127.0, 127.0]),
        ],
        _VEC_SCHEMA,
    )
    out = int8_topk(emb, emb.filter(F.col("vec_id") == 0), k=2).collect()
    by_rank = {r.rank: r for r in out}
    # scale = 127/127 = 1.0 per vector; dots are exact integers
    assert by_rank[1].neighbor_id == 1 and by_rank[1].q_dot == 16129.0
    assert by_rank[2].neighbor_id == 2 and by_rank[2].q_dot == 0.0
    assert all(r.score_err == 0.0 for r in out)
    assert all(r.q_dot == r.exact_dot for r in out)


def test_int8_zero_vector_total_scale(spark):
    # an all-zero vector must not divide by zero (scale falls back to 1.0)
    emb = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 2.0])], _VEC_SCHEMA
    )
    out = int8_topk(emb, emb.filter(F.col("vec_id") == 0), k=1).collect()
    assert len(out) == 1
    assert out[0].q_dot == 0.0 and out[0].exact_dot == 0.0


def test_pii_redact_known_rows(spark):
    clean = "no identifiers here"
    dirty = "reach me at jane.doe+x@mail.example.org or +62 812-3456789 ok"
    docs = spark.createDataFrame([(1, clean), (2, dirty)], _DOC_SCHEMA)
    got = {r.doc_id: r for r in pii_redact(docs).collect()}
    assert (got[1].n_emails, got[1].n_phones, got[1].has_pii) == (0, 0, False)
    assert got[1].redacted_md5 == hashlib.md5(clean.encode()).hexdigest()
    assert (got[2].n_emails, got[2].n_phones, got[2].has_pii) == (1, 1, True)
    expect = "reach me at <EMAIL> or <PHONE> ok"
    assert got[2].redacted_md5 == hashlib.md5(expect.encode()).hexdigest()


def test_decode_stub_honest_labeling_contract():
    # Pin the stub flag AND the exact fake-feature arithmetic: wiring a
    # real decoder must consciously flip DECODE_IS_STUB, and stub output
    # can never drift into looking like real decode features.
    assert mm.DECODE_IS_STUB is True
    assert mm.decode_stub(b"") == [0.0] * mm.FEATURE_DIM
    payload = b"abc"
    assert mm.decode_stub(payload) == [
        3.0,
        float(payload[0]),
        float(payload[-1]),
        float(sum(payload) % 997),
    ]
    # resize stub: cycle-and-truncate, deterministic
    assert mm.resize_stub(b"ab", 5) == b"ababa"
    assert mm.resize_stub(b"", 3) == b"\x00\x00\x00"
    assert mm.resize_stub(b"abcdef", 4) == b"abcd"


def test_mixture_sample_monotone_in_rate(spark):
    # raising a group's rate keeps a SUPERSET of the previously kept rows —
    # the property that makes mixture iteration an incremental delta
    from com_danliris_service_etl_spark.operators.sampling import mixture_sample

    docs = spark.createDataFrame(
        [(i, f"doc {i}", "web") for i in range(200)],
        "doc_id long, text string, source string",
    )
    low = {r.doc_id for r in mixture_sample(docs, {"web": 0.3}).collect() if r.kept}
    high = {r.doc_id for r in mixture_sample(docs, {"web": 0.7}).collect() if r.kept}
    assert low <= high
    assert len(low) < len(high) <= 200
    # rate 0 drops everything; rate 1 keeps everything
    none = [r.kept for r in mixture_sample(docs, {"web": 0.0}).collect()]
    assert not any(none)
    full = [r.kept for r in mixture_sample(docs, {"web": 1.0}).collect()]
    assert all(full)


def test_mixture_sample_default_rate_for_unlisted_groups(spark):
    from com_danliris_service_etl_spark.operators.sampling import mixture_sample

    docs = spark.createDataFrame(
        [(1, "a", "web"), (2, "b", "books")],
        "doc_id long, text string, source string",
    )
    got = {r.source: r.rate for r in mixture_sample(docs, {"web": 0.2}, default_rate=0.9).collect()}
    assert got == {"web": 0.2, "books": 0.9}
