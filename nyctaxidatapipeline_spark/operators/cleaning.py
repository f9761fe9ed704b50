"""Cleaning: the reference's null-scrub ETL (F1).

Reference: ``cleaning.py:10-18`` — drop any row with a NULL in any of the 19
trip columns, i.e. ``WHERE c1 IS NOT NULL AND ... AND cN IS NOT NULL``.
``dropna`` compiles to exactly those IsNotNull filters, which Catalyst pushes
into the parquet scan (SURVEY.md §4) — at 100 TB the row-group statistics
skip fully-null chunks without decoding them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def drop_null_rows(df: DataFrame,
                   subset: Sequence[str] | None = None) -> DataFrame:
    """Rows non-null in every column of ``subset`` (default: all columns)."""
    return df.dropna(how="any", subset=list(subset) if subset else None)
