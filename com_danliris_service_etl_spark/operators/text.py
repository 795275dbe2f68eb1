"""Text-analysis operators for training-data pipelines: token statistics,
quality scoring, heuristic language ID, and canonical fingerprinting.

All native Spark SQL expressions (whole-stage codegen; no UDFs) — at
100 TB these are narrow per-row transforms pipelined into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Per-language marker tokens for the n-gram/stopword language heuristic.
# Deliberately tiny: the operator contract is "deterministic scoring +
# argmax with alphabetical tiebreak", not linguistic accuracy.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist"),
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "les", "et", "des"),
    "zh": ("的", "是", "了", "在", "we"),
}


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count, char count, distinct-token count, and mean
    token length."""
    toks = F.split(F.col(text_col), " ")
    total_len = F.expr(
        f"aggregate(split({text_col}, ' '), 0L, (acc, t) -> acc + length(t))"
    )
    return docs.select(
        id_col,
        F.size(toks).alias("n_tokens"),
        F.length(text_col).alias("n_chars_calc"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(total_len.cast("double") / F.size(toks), 6).alias("avg_token_len"),
    )


def _marker_hits(text_col: str, markers: tuple[str, ...]) -> Column:
    in_list = ", ".join(f"'{m}'" for m in markers)
    return F.expr(f"size(filter(split({text_col}, ' '), t -> t IN ({in_list})))")


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + aggregate score:
    stopword ratio (fluency proxy), distinct-token ratio (repetition
    penalty), and mean token length (gibberish guard)."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks).cast("double")
    stop_ratio = _marker_hits(text_col, LANG_MARKERS["en"]).cast("double") / n
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n
    avg_len = (
        F.expr(f"aggregate(split({text_col}, ' '), 0L, (acc, t) -> acc + length(t))").cast(
            "double"
        )
        / n
    )
    score = stop_ratio * 0.3 + distinct_ratio * 0.5 + F.least(avg_len / 10.0, F.lit(1.0)) * 0.2
    return docs.select(
        id_col,
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(avg_len, 6).alias("avg_token_len"),
        F.round(score, 6).alias("quality"),
    )


def detect_language(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-token language ID: score = hits per language; argmax with
    alphabetical tiebreak (deterministic)."""
    out = docs.select(
        id_col,
        F.col("lang").alias("lang_actual"),
        *[
            _marker_hits(text_col, LANG_MARKERS[lang]).alias(f"s_{lang}")
            for lang in sorted(LANG_MARKERS)
        ],
    )
    langs = sorted(LANG_MARKERS)
    pred = None
    for lang in langs:  # first maximum in alphabetical order wins
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = F.col(f"s_{lang}") >= F.col(f"s_{other}")
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    return out.select(id_col, "lang_actual", pred.alias("lang_pred"))


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonical collection fingerprint (sorted distinct tokens → md5) —
    catches token-reordering duplicates that exact hashing misses."""
    canon = F.concat_ws(
        " ", F.array_sort(F.array_distinct(F.split(F.col(text_col), " ")))
    )
    return docs.select(id_col, F.md5(canon).alias("fingerprint"))
