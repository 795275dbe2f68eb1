"""Round-11 operator unit pins."""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# DD13 — duplicate spans (sliding k-gram, gaps-and-islands runs)
# ---------------------------------------------------------------------------


def test_duplicate_spans_hand_computed(spark):
    """Tiny corpus, k=2, every statistic verified by hand:
    - doc 0 'a b c a b' → windows [ab, bc, ca, ab]: ab repeats within
      the doc, bc and ca also live in doc 2 → ALL four duplicated, one
      run of 4.
    - doc 1 'x y z w'   → windows [xy, yz, zw] share nothing → all zero.
    - doc 2 'b c a b c' → [bc, ca, ab, bc]: every window duplicated
      (bc twice here, ca/ab shared with doc 0) → run of 4.
    - doc 3 'q'         → shorter than k, NOT emitted."""
    from com_danliris_service_etl_spark.operators.dedup import duplicate_spans

    docs = spark.createDataFrame(
        [(0, "a b c a b"), (1, "x y z w"), (2, "b c a b c"), (3, "q")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in duplicate_spans(docs, k=2).collect()}
    assert set(rows) == {0, 1, 2}
    r0 = rows[0]
    assert (r0.n_windows, r0.n_dup, r0.longest_run) == (4, 4, 4)
    assert r0.dup_micro == 1_000_000
    r1 = rows[1]
    assert (r1.n_windows, r1.n_dup, r1.longest_run, r1.dup_micro) == (3, 0, 0, 0)
    r2 = rows[2]
    assert (r2.n_windows, r2.n_dup, r2.longest_run) == (4, 4, 4)


def test_duplicate_spans_self_repetition_counts(spark):
    """A single document repeating its own k-gram is duplicated fuel too
    (memorization does not care which document the copy lives in)."""
    from com_danliris_service_etl_spark.operators.dedup import duplicate_spans

    docs = spark.createDataFrame(
        [(7, "p q r s p q")], "doc_id long, text string"
    )
    r = duplicate_spans(docs, k=2).collect()[0]
    # windows: pq, qr, rs, sp, pq → pq twice (positions 0, 4): two runs of 1
    assert (r.n_windows, r.n_dup, r.longest_run) == (5, 2, 1)


@_SETTINGS
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcd"), min_size=1, max_size=9),
        min_size=1,
        max_size=5,
    )
)
def test_duplicate_spans_matches_python_recompute(spark, docs):
    """Random small corpora vs an independent pure-Python recompute of
    windows / dup flags / longest run, k=2."""
    from collections import Counter

    from com_danliris_service_etl_spark.operators.dedup import duplicate_spans

    k = 2
    grams = Counter()
    per_doc = {}
    for i, toks in enumerate(docs):
        ws = [" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)]
        per_doc[i] = ws
        grams.update(ws)
    expect = {}
    for i, ws in per_doc.items():
        if not ws:
            continue
        flags = [grams[w] >= 2 for w in ws]
        n_dup = sum(flags)
        longest = run = 0
        for f in flags:
            run = run + 1 if f else 0
            longest = max(longest, run)
        expect[i] = (len(ws), n_dup, longest, n_dup * 1_000_000 // len(ws))

    sdf = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_windows, r.n_dup, r.longest_run, r.dup_micro)
        for r in duplicate_spans(sdf, k=k).collect()
    }
    assert got == expect, docs
