"""Feature engineering: the reference's derived-column operators (P1, X1-X4).

Reference: ``yellow_taxi_etl.py:68-95`` (7 withColumn features; subset at
``new_etl.py:35-51``). The NULL semantics are load-bearing (SURVEY.md §1):
guarded ratios produce NULL — not 0 — when the denominator is not strictly
positive, so downstream ``avg`` skips those rows; bucketing uses strict
``<`` upper edges with an ``otherwise`` label.

Everything here is a pure Column expression — JVM-side, codegen'd, no UDFs —
so Catalyst can constant-fold, push filters through, and prune unused
features at the scan.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def guarded_ratio(num: str | Column, denom: str | Column) -> Column:
    """``CASE WHEN denom > 0 THEN num/denom END`` — implicit-NULL else arm.

    Reference: ``tip_pct`` / ``avg_speed_mph`` / ``revenue_per_mile``
    (``yellow_taxi_etl.py:75-86``): no ``.otherwise`` on purpose, so zero /
    negative denominators yield NULL and ``avg()`` skips them.
    """
    num_c = F.col(num) if isinstance(num, str) else num
    den_c = F.col(denom) if isinstance(denom, str) else denom
    return F.when(den_c > 0, num_c / den_c)


def duration_minutes(start: str | Column, end: str | Column) -> Column:
    """Duration in minutes at *second* granularity.

    Reference: ``yellow_taxi_etl.py:70-74`` — ``(unix_timestamp(end) -
    unix_timestamp(start)) / 60.0``. ``unix_timestamp`` truncates to whole
    seconds, which is part of the observable semantics (SURVEY.md §7 hard
    part d) — do not "fix" it with sub-second arithmetic.
    """
    s = F.col(start) if isinstance(start, str) else start
    e = F.col(end) if isinstance(end, str) else end
    return (F.unix_timestamp(e) - F.unix_timestamp(s)) / 60.0


def bucketize(col: str | Column, edges: Sequence[float],
              labels: Sequence[str], last_label: str) -> Column:
    """Ordered strict-``<`` bucketing (reference ``distance_category``,
    ``yellow_taxi_etl.py:87-94``): value < edges[i] → labels[i], else
    ``last_label``. A value exactly equal to an edge falls in the *next*
    bucket (``< 1`` is strict: 1.0 → "Short").
    """
    if len(edges) != len(labels):
        raise ValueError("edges and labels must be the same length")
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for edge, label in zip(edges, labels):
        expr = F.when(c < edge, label) if expr is None else expr.when(c < edge, label)
    return expr.otherwise(last_label)


def decode_map(col: str | Column, mapping: Mapping[object, str],
               default: str = "Unknown") -> Column:
    """CASE decode of a code column to labels (reference ``payment_method``,
    ``yellow_taxi_etl.py:178-185``), with an explicit default arm."""
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for code, label in mapping.items():
        expr = F.when(c == code, label) if expr is None else expr.when(c == code, label)
    return expr.otherwise(default)


def with_time_features(df: DataFrame, ts_col: str,
                       hour_col: str = "pickup_hour",
                       dow_col: str = "pickup_dow") -> DataFrame:
    """X1: ``hour(ts)`` (0-23) and ``dayofweek(ts)`` (1=Sunday .. 7=Saturday,
    Spark convention — DuckDB oracles must add 1 to their 0-based dayofweek).
    Reference: ``yellow_taxi_etl.py:68-69``.
    """
    return (df
            .withColumn(hour_col, F.hour(ts_col))
            .withColumn(dow_col, F.dayofweek(ts_col)))


def with_trip_features(df: DataFrame, *,
                       pickup_ts: str = "tpep_pickup_datetime",
                       dropoff_ts: str = "tpep_dropoff_datetime",
                       fare: str = "fare_amount",
                       tip: str = "tip_amount",
                       distance: str = "trip_distance") -> DataFrame:
    """The full 7-column reference feature set (``yellow_taxi_etl.py:68-95``),
    parameterized by column name so it applies to any trip-shaped table.

    Derived: pickup_hour, pickup_dow, trip_minutes, tip_pct, avg_speed_mph,
    revenue_per_mile, distance_category — exact reference semantics
    including NULL arms and strict bucket edges.
    """
    df = with_time_features(df, pickup_ts)
    df = df.withColumn("trip_minutes", duration_minutes(pickup_ts, dropoff_ts))
    df = df.withColumn("tip_pct", guarded_ratio(tip, fare))
    df = df.withColumn(
        "avg_speed_mph",
        F.when(F.col("trip_minutes") > 0,
               F.col(distance) / (F.col("trip_minutes") / 60.0)))
    df = df.withColumn("revenue_per_mile", guarded_ratio(fare, distance))
    df = df.withColumn(
        "distance_category",
        bucketize(distance, [1.0, 3.0, 5.0, 10.0],
                  ["Very Short", "Short", "Medium", "Long"], "Very Long"))
    return df
