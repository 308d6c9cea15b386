"""Text analysis operators: token stats, quality scoring, language ID,
document fingerprinting. All pure Catalyst expressions (no UDFs) so they
codegen into the scan stage — the shape you want when this runs over
100 TB of documents: one pass, no shuffle, fully pushdown-friendly.

Determinism: tokenization is single-space split; scores are integer
ratios evaluated in double (exact inputs -> identical results in any
engine)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny deterministic marker lists for the n-gram/stopword language
# heuristic. Real deployments would ship per-language frequency tables;
# the operator shape (score per language -> argmax with stable
# tie-break) is what matters.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "value", "row"],
    "es": ["data", "filter", "sort"],
    "zh": ["window", "merge", "batch"],
}

STOPWORDS = ["the", "a", "of", "and"]


def _tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens, n_chars, avg_token_len): whitespace token counting
    + a BPE-ish proxy (chars per token)."""
    # NB: ratios of integers stay UNROUNDED — one double division of the
    # same integers is bitwise-deterministic in every engine, whereas
    # round() on exact decimal halves (common for small-int ratios)
    # diverges between decimal-string rounding (Spark) and binary
    # rounding (DuckDB).
    toks = _tokens(F.col(text_col))
    return df.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("n_tokens"),
        F.length(text_col).alias("n_chars"),
        ((F.length(text_col) - F.size(toks) + 1) / F.size(toks)).alias(
            "avg_token_len"
        ),
    )


def quality_score(
    df: DataFrame, id_col: str, text_col: str, keep: tuple[str, ...] = ()
) -> DataFrame:
    """Length/stopword/distinct-token quality heuristics:
    (id, n_tokens, stopword_ratio, distinct_ratio, quality). ``quality``
    is a bounded composite in [0,1]. ``keep`` passes extra input
    columns through (the ``sq8_quantize`` convention) so consumers
    that need e.g. the source alongside the score don't re-join or
    re-derive the formula."""
    # All ratios unrounded (see token_stats note): integer-derived double
    # arithmetic is deterministic; rounding decimal halves is not.
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    # distinct token count / token count — repetition penalty
    n_distinct = F.size(F.array_distinct(toks))
    stop_ratio = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))) / n
    distinct_ratio = n_distinct / n
    length_score = F.least(n / F.lit(100.0), F.lit(1.0))
    quality = (length_score + distinct_ratio) / F.lit(2.0)
    return df.select(
        F.col(id_col).alias("id"),
        n.alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        distinct_ratio.alias("distinct_ratio"),
        quality.alias("quality"),
        *[F.col(c) for c in keep],
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-token language scoring -> argmax language with alphabetical
    tie-break. Returns (id, pred_lang, best_score)."""
    toks = _tokens(F.col(text_col))
    scores = []
    for lang in sorted(LANG_MARKERS):
        markers = LANG_MARKERS[lang]
        score = F.size(F.filter(toks, lambda t: t.isin(markers)))
        scores.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    # array_max over (score, lang) structs picks highest score; for ties
    # it picks the lexicographically GREATEST lang, so order langs
    # descending by negating: use sort + reverse trick via max of
    # (score, reversed_rank). Simpler: fold with explicit comparison.
    best = scores[0]
    for s in scores[1:]:
        best = F.when(s["score"] > best["score"], s).otherwise(best)
    return df.select(
        F.col(id_col).alias("id"),
        best["lang"].alias("pred_lang"),
        best["score"].cast("int").alias("best_score"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Canonical-form fingerprint: lowercase, collapse whitespace, strip
    non-alphanumerics, md5. Near-identical formatting variants collide.
    Returns (id, fp)."""
    norm = F.regexp_replace(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", ""),
        " +",
        " ",
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.md5(F.trim(norm).cast("binary")).alias("fp"),
    )
