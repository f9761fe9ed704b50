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


def forward_fill(df: DataFrame, key_cols: Sequence[str], order_col: str,
                 cols: Sequence[str], suffix: str = "_ffill") -> DataFrame:
    """Carry the last non-null value forward per key in ``order_col``
    order (``last(ignorenulls)`` over a running window — one shuffle on
    the key, the standard series-repair move)."""
    w = (Window.partitionBy(*key_cols).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = df
    for c in cols:
        out = out.withColumn(c + suffix,
                             F.last(F.col(c), ignorenulls=True).over(w))
    return out


_UNIT_INTERVAL = {"hour": "INTERVAL 1 HOUR", "day": "INTERVAL 1 DAY",
                  "minute": "INTERVAL 1 MINUTE", "week": "INTERVAL 1 WEEK"}


def resample(df: DataFrame, ts_col: str, key_col: str,
             unit: str = "hour", value_col: str | None = None) -> DataFrame:
    """Dense time-series resampling: one row per (key, time bucket) over
    the corpus's full [min, max] span — buckets with no events appear
    with ``n_events = 0`` (and a NULL sum, which ``forward_fill``
    repairs downstream). The gap-fill every dashboard/feature pipeline
    needs and plain ``groupBy(date_trunc)`` silently doesn't do.

    Plan shape: the aggregate runs on the raw events (one shuffle); the
    dense grid is a 1-row (min, max) aggregate exploded through
    ``sequence`` and cross-joined with the distinct keys — |keys| ×
    |buckets| rows, independent of event volume, broadcast against the
    aggregated counts. Output: (key, bucket, n_events[, sum_<value>]).
    """
    if unit not in _UNIT_INTERVAL:
        raise ValueError(f"unsupported unit {unit!r}")
    b = F.date_trunc(unit, F.col(ts_col)).cast("timestamp_ntz")
    aggs = [F.count("*").alias("n_events")]
    if value_col:
        aggs.append(F.round(F.sum(value_col), 6)
                    .alias(f"sum_{value_col}"))
    counts = (df.groupBy(F.col(key_col).alias("key"), b.alias("bucket"))
                .agg(*aggs))
    bounds = df.agg(F.min(b).alias("_lo"), F.max(b).alias("_hi"))
    grid = bounds.select(F.explode(F.sequence(
        "_lo", "_hi", F.expr(_UNIT_INTERVAL[unit]))).alias("bucket"))
    keys = df.select(F.col(key_col).alias("key")).distinct()
    dense = keys.crossJoin(F.broadcast(grid))
    return (dense.join(counts, ["key", "bucket"], "left")
            .select(F.col("key").alias(key_col), "bucket",
                    F.coalesce("n_events", F.lit(0)).alias("n_events"),
                    *([f"sum_{value_col}"] if value_col else [])))


def funnel_counts(df: DataFrame, user_col: str, type_col: str,
                  ts_col: str, steps: Sequence[str]) -> DataFrame:
    """Ordered-funnel analysis: how many users complete each prefix of
    ``steps`` with strictly increasing timestamps (first qualifying
    occurrence per step — the standard product-analytics funnel).

    Stage k is one filtered aggregate joined to stage k-1's (user,
    first-completion-ts) frame — k-1 shuffle joins on the user key
    total, each operating on only the step's events (the type filter is
    pushed to the scan). Output: (step_index, step, n_users) — counts
    are monotonically non-increasing by construction.
    """
    rows = []
    prev = None
    for i, step in enumerate(steps):
        ev = df.filter(F.col(type_col) == step)
        if prev is None:
            cur = (ev.groupBy(F.col(user_col).alias("_u"))
                     .agg(F.min(ts_col).alias("_t")))
        else:
            cur = (ev.join(prev, ev[user_col] == prev["_u"])
                     .filter(F.col(ts_col) > F.col("_t"))
                     .groupBy(F.col("_u"))
                     .agg(F.min(ts_col).alias("_t2"))
                     .withColumnRenamed("_t2", "_t"))
        prev = cur
        rows.append(cur.agg(
            F.lit(i + 1).cast("int").alias("step_index"),
            F.lit(step).alias("step"),
            F.count("*").alias("n_users")))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def cohort_retention(df: DataFrame, user_col: str, ts_col: str,
                     unit: str = "week") -> DataFrame:
    """Cohort retention matrix: users grouped by their first-activity
    period, counted in each later period they return — the standard
    product-analytics retention triangle.

    Two aggregates and one join: (1) per-user first activity (the
    cohort assignment — one shuffle on the user key), (2) distinct
    (user, period) activity joined back to the cohort (second shuffle),
    (3) count per (cohort, offset). Period math uses ``date_trunc`` and
    an exact day-difference divided by the period length, so the offset
    is integral by construction. n_active at offset 0 is the cohort
    size (every user is active in their first period).

    Output: (cohort, period_offset int, n_active long).
    """
    if unit not in ("week", "day", "month"):
        raise ValueError(f"unsupported unit {unit!r}")
    days = {"week": 7, "day": 1}.get(unit)
    # timestamp_ntz keeps the arrow schema engine-neutral (same cast
    # convention as resample — date_trunc re-attaches session-tz
    # semantics otherwise)
    period = F.date_trunc(unit, F.col(ts_col)).cast("timestamp_ntz")
    cohorts = (df.groupBy(F.col(user_col).alias("_u"))
                 .agg(F.min(period).alias("_cohort")))
    activity = (df.select(F.col(user_col).alias("_u"),
                          period.alias("_period"))
                  .distinct())
    if unit == "month":
        offset = F.months_between(F.col("_period"), F.col("_cohort"))
    else:
        offset = (F.datediff(F.col("_period"), F.col("_cohort")) / days)
    return (activity.join(cohorts, "_u")
            .select(F.col("_cohort").alias("cohort"),
                    offset.cast("int").alias("period_offset"))
            .groupBy("cohort", "period_offset")
            .agg(F.count("*").alias("n_active")))


def ewma(df: DataFrame, value_col: str, order_col: str,
         key_cols: Sequence[str], window: int = 8,
         out_col: str = "ewma") -> DataFrame:
    """Bounded-window exponential moving average per key — the
    forecasting/smoothing primitive next to ``moving_avg``'s flat
    window. Decay alpha is FIXED at 1/2 so every weight is a power of
    two: ``x * 2^-j`` is exact IEEE scaling, which kills the
    cross-engine pow/exp drift an arbitrary alpha would reintroduce
    (the signed-zero lesson, applied up front). Head-of-series rows
    renormalize over the lags that exist (pandas ``ewm(adjust=True)``
    semantics), so the first row equals its own value.

    Shape: ``window`` explicit ``lag`` terms over ONE (key, order)
    window — a single shuffle+sort, no collect_list array per row, and
    the oracle mirrors the identical lag expressions. O(window) state
    per row; ``window`` defaults to 8 because 2^-8 contributions are
    below the 6-dp output rounding anyway.
    """
    if window < 1 or window > 30:
        raise ValueError(f"window must be in [1, 30], got {window}")
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    num = F.lit(0.0)
    den = F.lit(0.0)
    for j in range(window):
        x = F.lag(F.col(value_col), j).over(w) if j else F.col(value_col)
        wt = F.lit(float(2.0 ** -j))
        num = num + F.coalesce(x * wt, F.lit(0.0))
        den = den + F.when(x.isNotNull(), wt).otherwise(F.lit(0.0))
    return df.withColumn(
        out_col,
        F.when(den > 0, F.round(num / den, 6) + F.lit(0.0)))
