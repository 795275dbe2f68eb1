"""Round-7c operators: vocabulary growth, corpus report, ratio-to-report,
unpivot, null-safe join, Benford digits — pure-Python reference models and
semantic properties (the test_round7b_ops.py strategy)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# vocab_growth_stats
# ---------------------------------------------------------------------------


def test_vocab_growth_matches_counter_model(spark):
    from com_danliris_service_etl_spark.operators.text import vocab_growth_stats

    docs = {
        "a": ["x y x z", "x q"],
        "b": ["solo"],
    }
    rows = [(src, t) for src, texts in docs.items() for t in texts]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {r.source: r for r in vocab_growth_stats(df).collect()}
    for src, texts in docs.items():
        freq = Counter(w for t in texts for w in t.split(" "))
        n_tokens = sum(freq.values())
        n_types = len(freq)
        n_hapax = sum(1 for c in freq.values() if c == 1)
        r = got[src]
        assert (r.n_tokens, r.n_types, r.n_hapax) == (n_tokens, n_types, n_hapax)
        assert r.type_token_ratio == round(n_types / n_tokens, 6)
        assert r.hapax_ratio == round(n_hapax / n_types, 6)


# ---------------------------------------------------------------------------
# llm14 corpus report
# ---------------------------------------------------------------------------


def test_corpus_report_counts_dup_docs_not_dup_groups(spark):
    """Three identical docs = 3 dup docs (every member of a >1 group),
    not 1 dup group; uniques contribute zero."""
    from com_danliris_service_etl_spark.plans.registry import load_all

    fn, _ = load_all()["llm14_corpus_report"]
    import tempfile, os

    rows = [
        (1, "same text", "en", "web", 9),
        (2, "same text", "en", "web", 9),
        (3, "same text", "en", "web", 9),
        (4, "unique one", "en", "web", 10),
        (5, "other lang", "fr", "web", 10),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(os.path.join(tmp, "documents.parquet"))
        out = {(r.source, r.lang): r for r in fn(spark, tmp).collect()}
    en = out[("web", "en")]
    assert en.n_docs == 4 and en.n_dup_docs == 3
    assert en.total_tokens == 2 * 4  # every text is 2 whitespace tokens
    assert en.dup_ratio == round(3 / 4, 6)
    fr = out[("web", "fr")]
    assert fr.n_docs == 1 and fr.n_dup_docs == 0 and fr.dup_ratio == 0.0


# ---------------------------------------------------------------------------
# ratio-to-report
# ---------------------------------------------------------------------------


def test_ratio_to_report_shares_sum_to_one(spark):
    from com_danliris_service_etl_spark.plans.registry import load_all
    from tests.conftest import SF_DIR

    fn, _ = load_all()["a13_ratio_to_report"]
    rows = fn(spark, SF_DIR).collect()
    by_flag: dict[str, float] = {}
    for r in rows:
        by_flag[r.l_returnflag] = by_flag.get(r.l_returnflag, 0.0) + r.rev_share
        assert 0.0 < r.rev_share <= 1.0
    for flag, s in by_flag.items():
        assert abs(s - 1.0) < 1e-5, (flag, s)


# ---------------------------------------------------------------------------
# unpivot
# ---------------------------------------------------------------------------


def test_unpivot_totals_match_wide_aggregates(spark):
    from com_danliris_service_etl_spark.plans.registry import load_all
    from tests.conftest import SF_DIR

    fn, _ = load_all()["u4_unpivot"]
    long_tot = {
        (r.l_returnflag, r.measure): r.total for r in fn(spark, SF_DIR).collect()
    }
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    wide = li.groupBy("l_returnflag").agg(
        *[
            F.round(F.sum(c), 2).alias(c)
            for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        ]
    )
    for r in wide.collect():
        for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"):
            assert long_tot[(r.l_returnflag, c)] == r[c]


# ---------------------------------------------------------------------------
# null-safe join
# ---------------------------------------------------------------------------


def test_null_safe_join_matches_null_keys(spark):
    left = spark.createDataFrame(
        [(None, 1.0), (None, 2.0), ("a", 3.0), ("b", 4.0)], "k string, v double"
    )
    dim = spark.createDataFrame(
        [(None, "NULL_KEY"), ("a", "a")], "k string, label string"
    )
    joined = left.join(F.broadcast(dim), left["k"].eqNullSafe(dim["k"]))
    got = {
        r.label: r.n
        for r in joined.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == {"NULL_KEY": 2, "a": 1}  # plain `=` would drop the NULLs
    plain = left.join(F.broadcast(dim), left["k"] == dim["k"]).count()
    assert plain == 1


def test_j17_covers_all_event_rows(spark):
    """Null-safe join against the complete synthesized dim must be
    lossless: joined row count == events row count."""
    from com_danliris_service_etl_spark.plans.registry import load_all
    from tests.conftest import SF_DIR

    fn, _ = load_all()["j17_null_safe_join"]
    n_out = fn(spark, SF_DIR).agg(F.sum("n")).collect()[0][0]
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert n_out == n_events


# ---------------------------------------------------------------------------
# Benford digits
# ---------------------------------------------------------------------------


def test_benford_digit_extraction_is_exact(spark):
    df = spark.createDataFrame(
        [(1.0,), (9.99,), (10.0,), (99.5,), (100.0,), (123456.78,), (900000.01,)],
        "x double",
    )
    digit = F.substring(F.floor("x").cast("bigint").cast("string"), 1, 1).cast("int")
    got = [r.d for r in df.select(digit.alias("d")).collect()]
    assert got == [1, 9, 1, 9, 1, 1, 9]


def test_benford_freqs_are_a_distribution(spark):
    from com_danliris_service_etl_spark.plans.registry import load_all
    from tests.conftest import SF_DIR

    fn, _ = load_all()["q4_benford_digits"]
    rows = fn(spark, SF_DIR).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.obs_freq for r in rows) - 1.0) < 1e-4
    import math

    for r in rows:
        assert r.benford_freq == round(math.log10(1.0 + 1.0 / r.digit), 6)
