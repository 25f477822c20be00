"""Text-analysis column builders (SURVEY.md §7 M5 / north-star ops).

Everything is built from JVM-side ``pyspark.sql.functions`` (whole-stage
codegen, no Python in the hot path). Ratios are computed as exact
integer/integer divisions so they hash identically across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deterministic toy lists — the operator shape (argmax of
# set-overlap scores) is what matters; swap lists for real ones in prod.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "und", "die", "das", "ist"],
    "es": ["el", "la", "de", "que", "y"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}
STOPWORDS = LANG_MARKERS["en"]


def words(text: Column) -> Column:
    """Whitespace tokenization of lowercased text."""
    return F.split(F.lower(text), r"\s+")


def word_shingles(words_col: str, n: int = 3) -> Column:
    """Distinct word n-grams (the MinHash/Jaccard unit) over a named
    array<string> column. Docs shorter than n words fall back to one
    shingle holding the whole token list, so short documents still get
    signatures (and identical short docs still collide)."""
    # Guard: Spark's sequence(0, negative) is a DESCENDING sequence, so
    # short docs must short-circuit explicitly.
    return F.expr(
        f"CASE WHEN size({words_col}) = 0 THEN array() "
        f"WHEN size({words_col}) < {n} THEN array(concat_ws(' ', {words_col})) "
        f"ELSE array_distinct(transform(sequence(0, size({words_col}) - {n}), "
        f"i -> concat_ws(' ', slice({words_col}, i + 1, {n})))) END"
    )


def word_ngrams_all(words_col: str, n: int = 3) -> Column:
    """ALL word n-grams in order (repeats kept) — the repetition-metric
    unit, vs ``word_shingles``' distinct set. Short docs yield one
    whole-list gram (empty docs: none)."""
    return F.expr(
        f"CASE WHEN size({words_col}) = 0 THEN array() "
        f"WHEN size({words_col}) < {n} THEN array(concat_ws(' ', {words_col})) "
        f"ELSE transform(sequence(0, size({words_col}) - {n}), "
        f"i -> concat_ws(' ', slice({words_col}, i + 1, {n}))) END"
    )


def ngrams_all_sql(words_expr: str, n: int = 3) -> str:
    """DuckDB rendering of ``word_ngrams_all``."""
    joined = " || ' ' || ".join(f"{words_expr}[i + {k}]" for k in range(n))
    return (
        f"CASE WHEN len({words_expr}) = 0 THEN [] "
        f"WHEN len({words_expr}) < {n} THEN [array_to_string({words_expr}, ' ')] "
        f"ELSE list_transform(range(1, len({words_expr}) - {n - 2}), "
        f"i -> {joined}) END"
    )


def shingles_sql(words_expr: str, n: int = 3) -> str:
    """DuckDB rendering of ``word_shingles``: 1-based list slicing, || joins."""
    joined = " || ' ' || ".join(f"{words_expr}[i + {k}]" for k in range(n))
    return (
        f"CASE WHEN len({words_expr}) = 0 THEN [] "
        f"WHEN len({words_expr}) < {n} THEN [array_to_string({words_expr}, ' ')] "
        f"ELSE list_distinct(list_transform(range(1, len({words_expr}) - {n - 2}), "
        f"i -> {joined})) END"
    )
