"""Text-analysis column expressions for large-scale document pipelines:
token counting, quality scoring, language-ID scoring, fingerprinting.

All pure Column expressions (JVM regex/string kernels, codegen'd): they
compose into any select/groupBy and cost one narrow pass over the data.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Tiny per-language stopword marker lists for the n-gram/stopword
# language-ID heuristic. Deliberately small + deterministic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is"],
    "de": ["der", "und", "die", "ist"],
    "fr": ["le", "et", "la", "est"],
    "es": ["el", "los", "de", "es"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(text), r"\s+"))
    )


def char_classes(text: Column) -> dict[str, Column]:
    """Counts of character classes, via length-of-stripped — the same
    formulation is expressible in any SQL dialect (oracle-friendly)."""
    return {
        "n_alpha": F.length(F.regexp_replace(text, "[^A-Za-z]", "")),
        "n_digit": F.length(F.regexp_replace(text, "[^0-9]", "")),
        "n_punct": F.length(F.regexp_replace(text, r"[^.!?,;:]", "")),
        "n_space": F.length(F.regexp_replace(text, r"[^ \t\n]", "")),
        "n_upper": F.length(F.regexp_replace(text, "[^A-Z]", "")),
    }


def quality_score(text: Column) -> Column:
    """Heuristic quality score in [0,1]: rewards moderate length, word
    diversity and low punctuation density. Integer-ratio arithmetic ⇒
    bit-deterministic across engines."""
    toks = token_count(text)
    n_chars = F.length(text)
    cc = char_classes(text)
    punct_ratio = cc["n_punct"] / F.greatest(n_chars, F.lit(1))
    len_ok = F.when((toks >= 20) & (toks <= 1000), F.lit(1.0)).otherwise(F.lit(0.5))
    return len_ok * (1 - punct_ratio)


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-marker hit counts (word-boundary regex)."""
    lowered = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    out = {}
    for lang, words in LANG_MARKERS.items():
        score = None
        for wrd in words:
            # count of ' word ' occurrences via split-length
            c = F.size(F.split(lowered, rf"\s{wrd}\s")) - 1
            score = c if score is None else score + c
        out[lang] = score
    return out


def fingerprint(text: Column) -> Column:
    """Normalization fingerprint: sha256 of lower-cased, punct-stripped,
    whitespace-collapsed text — the canonical key for fuzzy-exact dedup
    (case/spacing/punctuation-insensitive)."""
    norm = F.regexp_replace(
        F.trim(F.regexp_replace(F.lower(text), r"[^a-z0-9\s]", "")), r"\s+", " "
    )
    return F.sha2(norm, 256)
