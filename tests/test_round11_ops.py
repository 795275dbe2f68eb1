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


# ---------------------------------------------------------------------------
# DD14 — longest duplicated substring (sorted-suffix / seed-bucket form)
# ---------------------------------------------------------------------------


def _lrs_brute(rows, min_len, max_depth):
    """All-pairs suffix LCP model (capped at max_depth): per doc the
    (len, min pos, md5) of the longest substring duplicated anywhere."""
    import hashlib
    import itertools

    toks = {d: t.split(" ") for d, t in rows}
    best: dict = {}
    sufs = [(d, i) for d, t in toks.items() for i in range(len(t))]
    for (d1, i1), (d2, i2) in itertools.combinations(sufs, 2):
        a = toks[d1][i1:i1 + max_depth]
        b = toks[d2][i2:i2 + max_depth]
        l = 0
        while l < min(len(a), len(b)) and a[l] == b[l]:
            l += 1
        if l >= min_len:
            for d, i in ((d1, i1), (d2, i2)):
                cur = best.get(d)
                if cur is None or (l, -i) > (cur[0], -cur[1]):
                    best[d] = (l, i)
    return {
        d: (l, i, hashlib.md5(" ".join(toks[d][i:i + l]).encode()).hexdigest())
        for d, (l, i) in best.items()
    }


def _lrs_run(spark, rows, **kw):
    from com_danliris_service_etl_spark.operators.dedup import (
        longest_duplicate_substring,
    )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r.doc_id: (r.lrs_len, r.lrs_pos, r.lrs_md5)
        for r in longest_duplicate_substring(df, **kw).collect()
    }


def test_lrs_hand_computed_cases(spark):
    """Overlap / containment / boundary pins, each hand-checkable:
    - within-doc OVERLAPPING occurrences: 'a a a a a a' repeats its
      own 5-token prefix at offsets 0 and 1 → len 5 at pos 0.
    - CONTAINMENT: the 8-token shared run p..w contains the shorter
      5-token run shared with doc 2; the longest wins, and doc 2's own
      answer is its 5-token slice.
    - a dup of EXACTLY min_len qualifies; min_len-1 does not.
    - a doc with no >=min_len dup is absent from the output.
    - length ties break to the SMALLEST offset."""
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731

    # overlap (doc 1) + absent doc (doc 2)
    got = _lrs_run(spark, [(1, "a a a a a a"), (2, "x y z w v u")],
                   min_len=5, max_depth=64)
    assert got == {1: (5, 0, md5("a a a a a"))}

    # containment: 8-token run ⊃ 5-token run
    got = _lrs_run(
        spark,
        [(1, "p q r s t u v w"), (2, "p q r s t zz"),
         (3, "zz0 p q r s t u v w zz2")],
        min_len=5, max_depth=64,
    )
    assert got == {
        1: (8, 0, md5("p q r s t u v w")),
        2: (5, 0, md5("p q r s t")),
        3: (8, 1, md5("p q r s t u v w")),
    }

    # exactly min_len qualifies...
    got = _lrs_run(spark, [(1, "m1 m2 m3 m4 m5 xx"), (2, "yy m1 m2 m3 m4 m5")],
                   min_len=5, max_depth=64)
    assert got == {1: (5, 0, md5("m1 m2 m3 m4 m5")),
                   2: (5, 1, md5("m1 m2 m3 m4 m5"))}
    # ...min_len-1 does not
    got = _lrs_run(spark, [(1, "m1 m2 m3 m4 xx"), (2, "yy m1 m2 m3 m4")],
                   min_len=5, max_depth=64)
    assert got == {}

    # tie on length → smallest offset (both 5-token runs duplicated)
    got = _lrs_run(
        spark,
        [(1, "s1 s2 s3 s4 s5 q1 t1 t2 t3 t4 t5"),
         (2, "s1 s2 s3 s4 s5 q2 t1 t2 t3 t4 t5")],
        min_len=5, max_depth=64,
    )
    assert got[1] == (5, 0, md5("s1 s2 s3 s4 s5"))
    assert got[2] == (5, 0, md5("s1 s2 s3 s4 s5"))


def test_lrs_depth_cap_reports_max_depth(spark):
    """A duplicated substring LONGER than max_depth reports exactly
    max_depth (the truncated-sort-key bound), with the md5 of the
    capped prefix — including the min_len == max_depth edge where the
    extension window is empty."""
    import hashlib

    body = " ".join(f"t{i}" for i in range(30))
    rows = [(1, body + " end1"), (2, body + " end2")]
    got = _lrs_run(spark, rows, min_len=5, max_depth=8)
    capped = " ".join(f"t{i}" for i in range(8))
    assert got[1] == (8, 0, hashlib.md5(capped.encode()).hexdigest())
    assert got[2] == got[1]
    got = _lrs_run(spark, rows, min_len=8, max_depth=8)
    assert got[1] == (8, 0, hashlib.md5(capped.encode()).hexdigest())


def test_lrs_rejects_bad_params(spark):
    import pytest

    from com_danliris_service_etl_spark.operators.dedup import (
        longest_duplicate_substring,
    )

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        longest_duplicate_substring(df, min_len=0)
    with pytest.raises(ValueError):
        longest_duplicate_substring(df, min_len=9, max_depth=8)


@_SETTINGS
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1,
                 max_size=18).map(" ".join),
        min_size=1,
        max_size=5,
    ),
    min_len=st.integers(2, 4),
)
def test_lrs_matches_bruteforce(spark, docs, min_len):
    """Property: seed-bucket + in-bucket sorted-suffix extension equals
    the all-pairs capped-LCP model on arbitrary tiny-vocab corpora
    (tiny vocab forces dense repeats, overlaps and containments)."""
    rows = [(i, t) for i, t in enumerate(docs)]
    got = _lrs_run(spark, rows, min_len=min_len, max_depth=8)
    assert got == _lrs_brute(rows, min_len, 8)


# ---------------------------------------------------------------------------
# DD15 — exact-substring dedup rewrite (span removal, first-owner keeps)
# ---------------------------------------------------------------------------


def _rewrite_model(rows, k, max_pos=100_000):
    """Python recompute of the pinned semantics: sliding k-gram windows,
    min(doc*max_pos+pos) ownership, non-first windows' [pos, pos+k)
    spans unioned, covered tokens cut, md5 of the rest."""
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    toks = {d: t.split(" ") for d, t in rows}
    owner: dict = {}
    for d in sorted(toks):
        for p in range(len(toks[d]) - k + 1):
            g = " ".join(toks[d][p:p + k])
            owner.setdefault(g, d * max_pos + p)
    out = {}
    for d, t in toks.items():
        removed = set()
        for p in range(len(t) - k + 1):
            g = " ".join(t[p:p + k])
            if owner[g] != d * max_pos + p:
                removed.update(range(p, p + k))
        kept = [tok for i, tok in enumerate(t) if i not in removed]
        out[d] = (len(t), len(removed), md5(" ".join(kept)))
    return out


def _rewrite_run(spark, rows, **kw):
    from com_danliris_service_etl_spark.operators.dedup import (
        substring_dedup_rewrite,
    )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_md5)
        for r in substring_dedup_rewrite(df, **kw).collect()
    }


def test_substring_rewrite_hand_cases(spark):
    """Pinned outcomes, hand-checkable at k=3:
    - cross-doc copy: the first doc keeps its text untouched, the
      second loses exactly the copied span;
    - a doc shorter than k passes through unchanged (n_removed 0);
    - self-overlapping repeat 'a a a a a' collapses to the tokens
      before the first dup start (the documented degenerate outcome);
    - a doc with NO duplicated window is identical in and out."""
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731

    rows = [
        (1, "p q r s t end1"),      # owner of p..t windows
        (2, "x1 p q r s t x2"),     # loses [1, 6) = 'p q r s t'
        (3, "aa bb"),               # shorter than k: untouched
        (4, "u v w zz"),            # no dups: untouched
    ]
    got = _rewrite_run(spark, rows, k=3)
    assert got == _rewrite_model(rows, 3)
    assert got[1] == (6, 0, md5("p q r s t end1"))
    assert got[2] == (7, 5, md5("x1 x2"))
    assert got[3] == (2, 0, md5("aa bb"))
    assert got[4] == (4, 0, md5("u v w zz"))

    # self-overlap: windows at 0..2; 1 and 2 are dups → remove [1, 5)
    got = _rewrite_run(spark, [(1, "a a a a a"), (2, "m n o p q")], k=3)
    assert got[1] == (5, 4, md5("a"))

    # all-removed doc: clean_md5 must be md5('') (empty concat contract)
    rows = [(1, "s1 s2 s3 s4"), (2, "s1 s2 s3 s4")]
    got = _rewrite_run(spark, rows, k=2)
    assert got[2] == (4, 4, md5(""))
    assert got == _rewrite_model(rows, 2)


def test_substring_rewrite_rejects_string_ids(spark):
    import pytest

    from com_danliris_service_etl_spark.operators.dedup import (
        substring_dedup_rewrite,
    )

    df = spark.createDataFrame([("a", "x y z")], "doc_id string, text string")
    with pytest.raises(TypeError, match="integral"):
        substring_dedup_rewrite(df)


@_SETTINGS
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=1,
                 max_size=16).map(" ".join),
        min_size=1,
        max_size=5,
    ),
    k=st.integers(2, 4),
)
def test_substring_rewrite_matches_model(spark, docs, k):
    """Property: the relational rewrite equals the python recompute on
    tiny-vocab corpora (dense overlaps, self-repeats, whole-doc
    removals)."""
    rows = [(i, t) for i, t in enumerate(docs)]
    assert _rewrite_run(spark, rows, k=k) == _rewrite_model(rows, k)
