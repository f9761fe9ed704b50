"""Text primitives shared by dedup and text-analysis operators.

All pure Catalyst expressions (split/lower/transform/slice — JVM-side,
codegen'd). The tokenization contract is load-bearing for oracle parity:
``tokens`` = lowercase, split on runs of whitespace, empties dropped —
DuckDB twin: ``list_filter(string_split_regex(lower(trim(text)), '\\s+'),
t -> t <> '')``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: str | Column) -> Column:
    """Lowercased whitespace tokens, empty strings dropped."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(F.trim(c)), r"\s+"), lambda t: t != "")


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


def shingles(tokens_col: Column, n: int = 3, sep: str = " ") -> Column:
    """Word n-gram shingles of a token array (the unit for Jaccard /
    MinHash near-dup). Documents shorter than ``n`` tokens produce an
    empty array (explicit guard: Spark's ``sequence(1, 0)`` counts DOWN,
    it does not produce an empty range)."""
    return F.when(
        F.size(tokens_col) < n, F.array().cast("array<string>")
    ).otherwise(F.transform(
        F.sequence(F.lit(1), F.size(tokens_col) - (n - 1)),
        lambda i: F.concat_ws(sep, F.slice(tokens_col, i, n))))


def char_ngrams(col: str | Column, n: int = 5) -> Column:
    """Character n-grams of the lowercased text (SimHash features)."""
    c = F.col(col) if isinstance(col, str) else col
    low = F.lower(c)
    return F.when(
        F.length(low) < n, F.array().cast("array<string>")
    ).otherwise(F.transform(
        F.sequence(F.lit(1), F.length(low) - (n - 1)),
        lambda i: F.substring(low, i, n)))
