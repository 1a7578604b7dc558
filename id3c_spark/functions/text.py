"""Text-analysis functions for the training-data pipeline (north star).

All built from JVM-side expressions (regexp_count / split / transform /
aggregate) so they vectorize inside whole-stage codegen over billions of
documents — no Python in the hot path. Each has an exact ANSI-SQL mirror
for the DuckDB oracle (see plans/queries.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic
# language ID. Word-boundary regexes keep counts integral (hash-stable).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "that"],
    "es": ["el", "la", "los", "que", "es", "una"],
    "fr": ["le", "les", "des", "est", "dans", "une"],
    "de": ["der", "die", "und", "ist", "nicht", "das"],
}

TOKEN_REGEX = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"  # BPE-ish: words, digits, punct


def _marker_count(text: Column, words: list[str]) -> Column:
    pattern = "(?i)\\b(" + "|".join(words) + ")\\b"
    return F.regexp_count(text, F.lit(pattern))


def language_id(text: Column) -> Column:
    """Heuristic language ID: argmax of stopword-marker hits, 'und' if none.

    Ties break by language-code order (deterministic for oracle parity).
    """
    counts = {lang: _marker_count(text, words) for lang, words in LANG_MARKERS.items()}
    best = F.greatest(*counts.values())
    result = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):
        result = F.when((counts[lang] == best) & (best > 0), F.lit(lang)).otherwise(result)
    return result


def token_count(text: Column) -> Column:
    """BPE-ish token count: alpha runs + single digits + punct marks."""
    return F.regexp_count(text, F.lit(TOKEN_REGEX))


def word_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(text), "\\s+")) - F.when(F.trim(text) == "", 1).otherwise(0)


def quality_score(text: Column) -> Column:
    """Document quality in [0, 1]: length, alpha ratio, stopword presence.

    Components are computed as exact integer ratios then rounded once, so
    the DuckDB mirror hashes identically.
    """
    n = F.length(text)
    alpha = F.regexp_count(text, F.lit("[A-Za-z]"))
    stop = _marker_count(text, LANG_MARKERS["en"])
    len_component = F.least(n.cast("double") / 1000.0, F.lit(1.0))
    alpha_ratio = F.when(n > 0, alpha.cast("double") / n.cast("double")).otherwise(0.0)
    stop_component = F.least(stop.cast("double") / 10.0, F.lit(1.0))
    return F.round((len_component + alpha_ratio + stop_component) / 3.0, 6)


def words_array(text: Column) -> Column:
    """Lowercased alpha words (the shingling alphabet)."""
    return F.filter(F.split(F.lower(text), "[^a-z]+"), lambda w: w != "")


def word_shingles(text: Column, k: int = 3) -> Column:
    """k-word shingles as strings; empty array when doc has < k words.

    Shape note: an index-lambda (`transform(sequence(1, n-k+1),
    i -> array_join(slice(words, i, k)))`) inlines the `words` split INTO
    the lambda, re-splitting the text once per shingle — O(words²) regex
    work per row (measured 3.5 s → this shape is ~5× cheaper on the
    fingerprint query). zip_with's array arguments are direct children,
    evaluated once per row; shingle i = words[i] ++ words[i+1] ++ … via a
    k-1-step zip chain, null-padded past n-k+1 (concat propagates null),
    then filtered."""
    words = words_array(text)
    n = F.size(words)
    acc = words
    for j in range(1, k):
        acc = F.zip_with(
            acc,
            F.slice(words, j + 1, F.greatest(n - j, F.lit(1))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(
        n >= k, F.filter(acc, lambda x: x.isNotNull())
    ).otherwise(F.array().cast("array<string>"))


def doc_fingerprint(text: Column, k: int = 5) -> Column:
    """Winnowing-style fingerprint: min md5 over k-word shingles.

    Documents sharing any minimal shingle hash collide — the blocking key
    for near-dup candidate generation. Falls back to md5(full text) for
    short docs.
    """
    hashes = F.transform(word_shingles(text, k), F.md5)
    return F.coalesce(F.array_min(hashes), F.md5(text))
