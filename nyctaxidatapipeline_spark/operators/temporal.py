"""Temporal operators: sessionization and as-of joins.

Both are classic "Spark lacks a native operator" cases (SURVEY.md §7 /
pyspark guide's common-OLAP list) solved as compositions of built-ins —
one shuffle each, no UDFs:

  * **sessionize** — lag + gap flag + running sum over a (key, ts) window.
  * **asof_join** — union both sides tagged, one (key, ts) window pass
    carrying the right side's columns forward with ``last(ignorenulls)``.
    Equivalent to ``pd.merge_asof`` / DuckDB ``ASOF JOIN`` (backward,
    inclusive ``right_ts <= left_ts``); at equal timestamps the right row
    sorts first so it is visible to the left row.

Scale: both plans shuffle once on the partition key and sort within
partitions — the same cost as any windowed analytic; no broadcast, no
quadratic candidate sets. Skewed keys (one user = half the events) are the
failure mode; mitigate by salting the session key with a coarse time
bucket before the window when a key exceeds task memory.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(df: DataFrame, key_cols: Sequence[str], ts_col: str,
               gap_seconds: int = 1800) -> DataFrame:
    """Assign session ids per key: a new session starts when the gap from
    the previous event exceeds ``gap_seconds`` (second granularity — epoch
    truncation, matching X2 semantics)."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    epoch = F.unix_timestamp(F.col(ts_col))
    prev = F.lag(epoch).over(w)
    new_sess = F.when(prev.isNull() | ((epoch - prev) > gap_seconds), 1) \
                .otherwise(0)
    run = Window.partitionBy(*key_cols).orderBy(ts_col) \
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_id", F.sum(new_sess).over(run))


def session_stats(df: DataFrame, key_cols: Sequence[str], ts_col: str,
                  gap_seconds: int = 1800) -> DataFrame:
    """Sessionize + per-session aggregate (start/end/count)."""
    s = sessionize(df, key_cols, ts_col, gap_seconds)
    return (s.groupBy(*key_cols, "session_id")
             .agg(F.min(ts_col).alias("session_start"),
                  F.max(ts_col).alias("session_end"),
                  F.count("*").alias("n_events")))


def asof_join(left: DataFrame, right: DataFrame, key_cols: Sequence[str],
              left_ts: str, right_ts: str,
              right_value_cols: Sequence[str],
              prefix: str = "asof_") -> DataFrame:
    """Backward as-of join: each left row gets the most recent right row
    with ``right_ts <= left_ts`` on the same key (or NULLs if none).

    Output: all left columns + ``{prefix}{right_ts}`` + prefixed value
    columns. Single shuffle on (key, ts) — scales like any window query.
    ``key_cols`` must carry the same names on both sides (rename first).
    """
    lcols = left.columns
    non_key_lcols = [c for c in lcols if c not in key_cols]
    carried = [right_ts, *right_value_cols]
    l_tagged = left.select(
        *lcols,
        F.col(left_ts).alias("_ts"), F.lit(1).alias("_tag"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{prefix}{c}")
          for c in carried])
    r_tagged = right.select(
        *key_cols,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in non_key_lcols],
        F.col(right_ts).alias("_ts"), F.lit(0).alias("_tag"),
        *[F.col(c).alias(f"{prefix}{c}") for c in carried])
    u = l_tagged.unionByName(r_tagged)
    w = (Window.partitionBy(*key_cols).orderBy("_ts", "_tag")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    for c in carried:
        u = u.withColumn(f"{prefix}{c}",
                         F.last(f"{prefix}{c}", ignorenulls=True).over(w))
    return u.filter(F.col("_tag") == 1).drop("_ts", "_tag")
