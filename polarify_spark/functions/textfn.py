"""Whitespace tokenization and n-gram helpers (built-in functions only).

DuckDB equivalents used by the oracles:
    tokens : string_split_regex(trim(text), '\\s+')
    ngrams : list_transform(range(1, len(w) - (n-2)), i -> w[i] || ' ' || ...)
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import Column


def normalize_ws(col: "Column | str") -> "Column":
    """Trim + collapse internal whitespace runs to single spaces."""
    from pyspark.sql import functions as F

    return F.regexp_replace(F.trim(col), r"\s+", " ")


def whitespace_tokens(col: "Column | str") -> "Column":
    """Split on whitespace runs after trimming -> array<string>."""
    from pyspark.sql import functions as F

    return F.split(F.trim(col), r"\s+")


def word_ngrams(tokens: "Column", n: int) -> "Column":
    """Space-joined word n-grams of a token array (array<string>).

    Expressed as a ``transform`` over an index ``sequence`` so everything
    stays in codegen; empty when the document has fewer than ``n`` tokens.
    """
    from pyspark.sql import functions as F

    if n < 1:
        raise ValueError("n must be >= 1")
    if n == 1:
        return tokens

    def gram(i: "Column") -> "Column":
        return F.concat_ws(" ", *[F.element_at(tokens, i + k) for k in range(n)])

    count = F.size(tokens) - (n - 1)
    return F.when(
        count > 0,
        F.transform(F.sequence(F.lit(1), count), gram),
    ).otherwise(F.array().cast("array<string>"))
