"""Text column builders shared by the LLM-data operators.

Every helper returns a pure Column built from pyspark.sql.functions
(whole-stage-codegen'd, no Python in the hot path) and has a DuckDB SQL
twin string so operators can assemble matching oracles.

Tokenization contract (identical in both engines):
  words(text)    = lowercase, split on \\s+, empty strings removed
  shingles(text) = all word 3-grams joined with single spaces
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def words(text: Column | str = "text") -> Column:
    """Lowercased whitespace tokens, empties removed.

    For a plain column name the expression is built as ONE parsed SQL
    string: the Column-API form costs ~10 py4j driver roundtrips per
    call and this helper is invoked on every text operator build (the
    round-11 build profile showed DataFrame *construction* — not
    execution — dominated by those socket hops). Identical Catalyst
    expression either way."""
    if isinstance(text, str):
        return F.expr(words_expr(text))
    return F.filter(F.split(F.lower(text), r"\s+"), lambda x: x != "")


def words_expr(text: str) -> str:
    """Spark-SQL text of :func:`words` for single-string builds."""
    return f"filter(split(lower({text}), '\\\\s+'), x -> x != '')"


def marker_hits_expr(word_col: str, markers: tuple[str, ...]) -> str:
    """Spark-SQL text of :func:`marker_hits` for single-string builds."""
    in_list = ", ".join(f"'{m}'" for m in markers)
    return f"size(filter({word_col}, x -> x IN ({in_list})))"


#: DuckDB twin of :func:`words`
WORDS_SQL = r"list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"


def shingles(word_col: Column | str, n: int = 3) -> Column:
    """Word n-grams (default 3) as space-joined strings; empty array when
    the doc has fewer than n words (guard needed: Spark's sequence(1,0)
    counts DOWN, unlike DuckDB's empty generate_series).

    Implementation: zip n shifted copies of the word array and join each
    struct — NOT transform(sequence(1, L), i -> slice(word_col, i, n)).
    The naive indexed form re-evaluates `word_col` (usually the whole
    split/filter pipeline, inlined by CollapseProject) once per ELEMENT
    inside the lambda, turning shingling into O(L^2) string work per
    row; the shifted-zip form evaluates every input array once per ROW
    (measured 2.5x on the span detector, worse on longer docs).

    Fast path (round 11): a plain column NAME means the word array is a
    materialized attribute, so per-element indexing inside the lambda is
    O(1) array access (no pipeline re-evaluation — the trap above only
    bites when word_col is an inlined expression) and the whole shingle
    expression parses as ONE SQL string instead of ~60 py4j roundtrips.
    The size()>=n guard stays: Spark's sequence(1, 0) counts DOWN."""
    if isinstance(word_col, str):
        w = word_col
        terms = ", ".join(f"{w}[i + {j} - 1]" for j in range(n))
        return F.expr(
            f"CASE WHEN size({w}) >= {n} THEN "
            f"transform(sequence(1, size({w}) - {n - 1}), "
            f"i -> concat_ws(' ', {terms})) "
            f"ELSE CAST(array() AS ARRAY<STRING>) END"
        )
    k = n - 1
    shifted = [word_col.alias("s0")] + [
        F.slice(word_col, i + 1, F.size(word_col)).alias(f"s{i}")
        for i in range(1, n)
    ]
    joined = F.transform(
        F.slice(F.arrays_zip(*shifted), 1, F.size(word_col) - k),
        lambda s: F.concat_ws(" ", *[s[f"s{i}"] for i in range(n)]),
    )
    return F.when(F.size(word_col) >= n, joined).otherwise(
        F.array().cast("array<string>")
    )


def shingles_sql(words_sql: str = WORDS_SQL, n: int = 3) -> str:
    """DuckDB twin of :func:`shingles` over a words-list SQL fragment."""
    k = n - 1
    return (
        f"list_transform(generate_series(1, greatest(len({words_sql}) - {k}, 0)), "
        f"i -> array_to_string(list_slice({words_sql}, i, i + {k}), ' '))"
    )


# Stopword marker lists for the n-gram/stopword language heuristic.
# Fixed small lists so the scoring formula is identical in both engines.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans"),
    "es": ("el", "los", "las", "y", "es", "una", "que"),
}


def marker_hits(word_col: Column, markers: tuple[str, ...]) -> Column:
    """Number of tokens that are language-marker stopwords."""
    return F.size(F.filter(word_col, lambda x: x.isin(*markers)))


def marker_hits_sql(words_sql: str, markers: tuple[str, ...]) -> str:
    in_list = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter({words_sql}, x -> x IN ({in_list})))"
