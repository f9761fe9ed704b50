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
from pyspark.sql import functions as F


def drop_null_rows(df: DataFrame,
                   subset: Sequence[str] | None = None) -> DataFrame:
    """Rows non-null in every column of ``subset`` (default: all columns)."""
    return df.dropna(how="any", subset=list(subset) if subset else None)


def quantile_bounds(df: DataFrame, col: str,
                    lo: float = 0.01, hi: float = 0.99) -> DataFrame:
    """1-row frame (_lo, _hi): EXACT interpolated quantiles of ``col``
    (``F.percentile`` — same continuous definition as DuckDB's
    ``quantile_cont`` and numpy's linear method). One global aggregate;
    the single-row result is meant to be broadcast."""
    return df.agg(F.percentile(col, lo).alias("_lo"),
                  F.percentile(col, hi).alias("_hi"))


def winsorize(df: DataFrame, col: str, lo: float = 0.01, hi: float = 0.99,
              out_col: str | None = None) -> DataFrame:
    """Clip ``col`` to its [lo, hi] exact quantiles — the standard
    robust-scaling guard against fat-tailed outliers before features
    enter a model (NULLs pass through unclipped).

    100 TB shape: ONE exact-percentile aggregate produces a 1-row
    bounds frame, broadcast back as a scalar cross join (the engine's
    established runtime-scalar pattern, cf. ``fare_anomalies``'s
    threshold and ``reshape.histogram``'s bin bounds); the clip itself
    is a shuffle-free narrow projection. Exact percentile sorts per
    group at scale — swap ``quantile_bounds`` for
    ``approx_percentile`` when a bounded-error clip is acceptable.
    """
    out = out_col or col
    b = quantile_bounds(df, col, lo, hi)
    # least/greatest SKIP nulls (greatest(NULL, lo) = lo), so the NULL
    # passthrough needs an explicit guard.
    clipped = F.when(
        F.col(col).isNotNull(),
        F.least(F.greatest(F.col(col), F.col("_lo")), F.col("_hi")))
    return (df.crossJoin(F.broadcast(b))
              .withColumn(out, clipped)
              .drop("_lo", "_hi"))
