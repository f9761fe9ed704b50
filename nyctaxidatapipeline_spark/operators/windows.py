"""Window functions — absent from the reference (SURVEY.md §2.6) but the
natural upgrade of its sort+HAVING pattern (O1+F3), and required surface
for top-k-per-group analytics.

Scale notes:
  * ``top_k_per_group`` shuffles once on the partition keys and keeps a
    bounded heap per key under AQE — no global sort.
  * ``top_k_global`` plans TakeOrderedAndProject: each task keeps k rows,
    the driver merges — O(k) memory, never a full range-shuffle sort.
    Prefer it over the reference's full ``orderBy`` + head pattern.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_cols(order_by: Sequence[str | Column],
                desc: bool) -> list[Column]:
    """Strings get the ``desc`` flag applied; Column expressions are passed
    through untouched (callers may mix .desc()/.asc() per column)."""
    cols = []
    for c in order_by:
        if isinstance(c, str):
            cols.append(F.col(c).desc() if desc else F.col(c).asc())
        else:
            cols.append(c)
    return cols


def top_k_per_group(df: DataFrame, partition_by: Sequence[str],
                    order_by: Sequence[str | Column], k: int,
                    desc: bool = True,
                    rank_col: str = "rn") -> DataFrame:
    """row_number ≤ k per group. ``order_by`` should end with a unique
    tiebreak column for deterministic output (oracle-comparable)."""
    w = Window.partitionBy(*partition_by).orderBy(*_order_cols(order_by, desc))
    return (df.withColumn(rank_col, F.row_number().over(w))
              .filter(F.col(rank_col) <= k))


def top_k_global(df: DataFrame, order_by: Sequence[str | Column], k: int,
                 desc: bool = True) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (O2 upgrade, SURVEY.md §2.7)."""
    return df.orderBy(*_order_cols(order_by, desc)).limit(k)


def with_lag(df: DataFrame, partition_by: Sequence[str], order_by: str,
             col: str, alias: str | None = None, offset: int = 1) -> DataFrame:
    """lag(col) per group — building block for sessionization / deltas."""
    w = Window.partitionBy(*partition_by).orderBy(order_by)
    return df.withColumn(alias or f"{col}_lag", F.lag(col, offset).over(w))


def running_sum(df: DataFrame, partition_by: Sequence[str], order_by: str,
                col: str, alias: str | None = None) -> DataFrame:
    """Cumulative sum per group (rows unbounded-preceding..current)."""
    w = (Window.partitionBy(*partition_by).orderBy(order_by)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn(alias or f"{col}_running", F.sum(col).over(w))


def moving_avg(df: DataFrame, partition_by: Sequence[str], order_by: str,
               col: str, window_rows: int = 3,
               alias: str | None = None) -> DataFrame:
    """Trailing moving average over the last ``window_rows`` rows per
    group (rows-frame, so ragged timestamps don't change the window
    population — use ``temporal.resample`` first for a time-based
    frame). Partial windows at the head average what exists."""
    w = (Window.partitionBy(*partition_by).orderBy(order_by)
         .rowsBetween(-(window_rows - 1), Window.currentRow))
    return df.withColumn(alias or f"{col}_ma{window_rows}",
                         F.round(F.avg(col).over(w), 6) + F.lit(0.0))


def time_range_agg(df: DataFrame, partition_by: Sequence[str],
                   ts_col: str, value_col: str,
                   window_seconds: int = 3600,
                   prefix: str | None = None) -> DataFrame:
    """Trailing TIME-based window per group: count + mean of
    ``value_col`` over [t - window_seconds, t] — a RANGE frame on epoch
    seconds, the complement of ``moving_avg``'s rows-frame (here ragged
    timestamps DO change the window population, which is the point:
    "events in the last hour" is a time predicate, not a row count).

    RANGE frames include all peer rows of the current ordering value,
    so same-second events see each other symmetrically — deterministic
    without a unique ordering key (unlike rows-frames). One hash
    exchange on the group key; per-task frame state is bounded by the
    densest window, not the partition.

    Epoch-second truncation follows the engine's X2 convention
    (``unix_timestamp`` == DuckDB ``floor(epoch(ts))``).
    """
    p = prefix or f"{value_col}_{window_seconds}s"
    ep = F.unix_timestamp(ts_col)
    w = (Window.partitionBy(*partition_by).orderBy(ep.cast("long"))
         .rangeBetween(-window_seconds, 0))
    return (df.withColumn(f"{p}_n", F.count(value_col).over(w))
              .withColumn(f"{p}_avg",
                          F.round(F.avg(value_col).over(w), 6)))
