"""Text-analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, fingerprinting.

All pure JVM-side column expressions (no Python UDFs — SURVEY's "UDFs are
the slow path" rule): at 100 TB these run inside whole-stage codegen
directly over the parquet scan, no Arrow boundary.

Each builder has a ``sql_*`` twin emitting the equivalent DuckDB text so
the operators are oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram/stopword heuristic language
# classifier. Scores = occurrence counts of ' <marker> ' in the text.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "de"],
    "de": ["der", "und", "das"],
    "fr": ["le", "et", "les"],
}

STOPWORDS_EN = ["the", "a", "of", "and", "to"]

# BPE-ish tokenizer regex: runs of letters, runs of digits, or single
# non-alphanumeric-non-space symbols.
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def normalize_text(col: Column) -> Column:
    """Canonical form for hashing: lowercase, collapsed whitespace."""
    return F.lower(F.trim(F.regexp_replace(col, "\\s+", " ")))


def sql_normalize_text(expr: str) -> str:
    return f"lower(trim(regexp_replace({expr}, '\\s+', ' ', 'g')))"


def occurrence_count(col: Column, needle: str) -> Column:
    """Occurrences of a literal substring, via length arithmetic (portable,
    codegen-friendly): (len(x) - len(replace(x, n, ''))) / len(n)."""
    n = len(needle)
    return (F.length(col) - F.length(F.replace(col, F.lit(needle)))) / F.lit(n)


def sql_occurrence_count(expr: str, needle: str) -> str:
    lit = needle.replace("'", "''")
    return f"((length({expr}) - length(replace({expr}, '{lit}', ''))) / {len(needle)})"


def word_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(col), "\\s+")).cast("bigint")


def sql_word_count(expr: str) -> str:
    return f"CAST(len(string_split_regex(trim({expr}), '\\s+')) AS BIGINT)"


def bpe_token_count(col: Column) -> Column:
    """BPE-ish token count: letter runs + digit runs + symbols."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_REGEX), F.lit(0))).cast("bigint")


def sql_bpe_token_count(expr: str) -> str:
    return f"CAST(len(regexp_extract_all({expr}, '{TOKEN_REGEX}')) AS BIGINT)"


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language marker-hit counts over ' <text> ' (padded so boundary
    words count)."""
    padded = F.concat(F.lit(" "), normalize_text(col), F.lit(" "))
    return {
        lang: sum(
            (occurrence_count(padded, f" {m} ") for m in markers), start=F.lit(0.0)
        )
        for lang, markers in LANG_MARKERS.items()
    }


def sql_lang_scores(expr: str) -> dict[str, str]:
    padded = f"(' ' || {sql_normalize_text(expr)} || ' ')"
    out = {}
    for lang, markers in LANG_MARKERS.items():
        terms = " + ".join(sql_occurrence_count(padded, f" {m} ") for m in markers)
        out[lang] = f"(0.0 + {terms})"
    return out


def predicted_lang(col: Column) -> Column:
    """Argmax over language scores; ties resolve by the fixed ordering of
    LANG_MARKERS, 'und' (undetermined) when all scores are zero."""
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(list(scores)):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best <= 0, F.lit("und")).otherwise(expr)


def sql_predicted_lang(expr: str) -> str:
    scores = sql_lang_scores(expr)
    best = f"GREATEST({', '.join(scores.values())})"
    out = "'und'"
    for lang in reversed(list(scores)):
        out = f"CASE WHEN {scores[lang]} = {best} THEN '{lang}' ELSE {out} END"
    return f"CASE WHEN {best} <= 0 THEN 'und' ELSE {out} END"


def quality_features(col: Column) -> dict[str, Column]:
    """Length/punctuation/stopword quality signals (all double math with
    the same expression tree as the SQL twin)."""
    norm = normalize_text(col)
    n_chars = F.length(norm).cast("double")
    n_words = word_count(norm).cast("double")
    n_punct = (F.length(norm) - F.length(F.regexp_replace(norm, "[.,;:!?]", ""))).cast("double")
    padded = F.concat(F.lit(" "), norm, F.lit(" "))
    stop_hits = sum(
        (occurrence_count(padded, f" {w} ") for w in STOPWORDS_EN), start=F.lit(0.0)
    )
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "avg_word_len": n_chars / F.greatest(n_words, F.lit(1.0)),
        "punct_ratio": n_punct / F.greatest(n_chars, F.lit(1.0)),
        "stopword_ratio": stop_hits / F.greatest(n_words, F.lit(1.0)),
    }


def sql_quality_features(expr: str) -> dict[str, str]:
    norm = sql_normalize_text(expr)
    n_chars = f"CAST(length({norm}) AS DOUBLE)"
    n_words = f"CAST({sql_word_count(norm)} AS DOUBLE)"
    n_punct = f"CAST(length({norm}) - length(regexp_replace({norm}, '[.,;:!?]', '', 'g')) AS DOUBLE)"
    padded = f"(' ' || {norm} || ' ')"
    stop_hits = "(0.0 + " + " + ".join(
        sql_occurrence_count(padded, f" {w} ") for w in STOPWORDS_EN
    ) + ")"
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "avg_word_len": f"({n_chars} / GREATEST({n_words}, 1.0))",
        "punct_ratio": f"({n_punct} / GREATEST({n_chars}, 1.0))",
        "stopword_ratio": f"({stop_hits} / GREATEST({n_words}, 1.0))",
    }


def quality_score(col: Column) -> Column:
    """Composite 0-1 quality score: reward length (saturating at 200
    words), reward stopword presence, penalize punctuation density."""
    f = quality_features(col)
    return (
        F.lit(0.5) * F.least(f["n_words"] / F.lit(200.0), F.lit(1.0))
        + F.lit(0.3) * F.least(f["stopword_ratio"] * F.lit(5.0), F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - F.least(f["punct_ratio"] * F.lit(10.0), F.lit(1.0)))
    )


def sql_quality_score(expr: str) -> str:
    f = sql_quality_features(expr)
    return (
        f"(0.5 * LEAST({f['n_words']} / 200.0, 1.0)"
        f" + 0.3 * LEAST({f['stopword_ratio']} * 5.0, 1.0)"
        f" + 0.2 * (1.0 - LEAST({f['punct_ratio']} * 10.0, 1.0)))"
    )


def fingerprint_md5(col: Column) -> Column:
    """Document fingerprint: md5 of the normalized text (exact-dup key)."""
    return F.md5(normalize_text(col).cast("binary"))


def sql_fingerprint_md5(expr: str) -> str:
    return f"md5({sql_normalize_text(expr)})"
