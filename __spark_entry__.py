"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine: ``nyctaxidatapipeline_spark`` (see SURVEY.md §2 for the operator
inventory each query instantiates; FIXTURES.md §C for the column mapping
from the reference's taxi schema onto the driver fixture tables).

Float parity: computed double columns are rounded to 6 dp on BOTH sides
(Spark ``F.round`` / oracle ``ROUND``) because float aggregation is
order-sensitive — see ``plans.util.round_doubles``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyctaxidatapipeline_spark.functions import bucketize, guarded_ratio
from nyctaxidatapipeline_spark.operators import (
    demand_heatmap,
    distance_distribution,
    drop_null_rows,
    payment_analysis,
    popular_routes,
    threshold_anomalies,
    tip_trends,
    trip_performance,
)
from nyctaxidatapipeline_spark.plans import round_doubles
from nyctaxidatapipeline_spark.sources import load_table


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: demand heatmap (A1) on sf0.001 events."""
    return _q_demand_heatmap(spark, "/root/testdata/sf0.001")


# --------------------------------------------------------------------------
# Reference surface (SURVEY.md §2 A1-A7, F1-F4, X1-X4, P1-P3, O1)
# --------------------------------------------------------------------------

def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem")


def _q_demand_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 (`yellow_taxi_etl.py:101-105`): counts per (zone, hour)."""
    ev = _events(spark, sf_dir).withColumn("event_hour", F.hour("ts"))
    return demand_heatmap(ev, "user_id", "event_hour")


def _q_tip_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 (`yellow_taxi_etl.py:110-116`): avg guarded ratio per group —
    NULL ratios (zero denominator) skipped by avg."""
    li = _lineitem(spark, sf_dir).withColumn(
        "tip_pct", guarded_ratio("l_discount", "l_tax"))
    return round_doubles(tip_trends(li, "l_suppkey", "l_returnflag", "tip_pct"))


def _q_trip_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 (`yellow_taxi_etl.py:134-148`): wide grouped agg + is_weekend."""
    li = _lineitem(spark, sf_dir).withColumn(
        "ship_dow", F.dayofweek("l_shipdate"))
    out = trip_performance(
        li, ["l_returnflag", "l_linestatus", "ship_dow"],
        avg_cols=["l_quantity", "l_extendedprice", "l_discount"],
        sum_cols=["l_extendedprice"], dow_col="ship_dow")
    return round_doubles(out)


def _q_popular_routes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4+F3+O1 (`yellow_taxi_etl.py:153-164`): agg + HAVING + sort desc."""
    out = popular_routes(
        _lineitem(spark, sf_dir), ["l_partkey", "l_returnflag"],
        avg_cols=["l_quantity", "l_extendedprice", "l_discount"],
        min_trips=10)
    return round_doubles(out)


def _q_payment_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 (`yellow_taxi_etl.py:169-186`): payment agg + CASE decode."""
    li = _lineitem(spark, sf_dir).withColumn(
        "tip_pct", guarded_ratio("l_discount", "l_tax"))
    out = payment_analysis(
        li, ["l_returnflag", "l_linestatus"],
        pay_col="l_returnflag", fare_col="l_extendedprice",
        tip_col="l_discount", ratio_col="tip_pct",
        decode={"R": "Returned", "A": "Accepted", "N": "Neutral"})
    return round_doubles(out)


def _q_distance_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 (`yellow_taxi_etl.py:191-200`): agg over strict-`<` buckets."""
    li = _lineitem(spark, sf_dir).withColumn(
        "qty_category",
        bucketize("l_quantity", [10.0, 20.0, 30.0, 40.0],
                  ["Very Short", "Short", "Medium", "Long"], "Very Long"))
    out = distance_distribution(
        li, ["l_returnflag", "qty_category"],
        fare_col="l_extendedprice", minutes_col="l_quantity",
        tip_col="l_discount")
    return round_doubles(out)


def _q_fare_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7+F2+P3 (`yellow_taxi_etl.py:121-129`): rows >= exact p99.

    Exact-percentile mode for oracle parity (SURVEY.md §5 caveat 4); the
    reference's approx sketch mode is `quantile_threshold(..., 'approx')`.
    """
    return threshold_anomalies(
        _lineitem(spark, sf_dir), "l_extendedprice",
        ["l_orderkey", "l_linenumber", "l_partkey",
         "l_extendedprice", "l_quantity"],
        q=0.99, mode="exact")


def _q_cleaning_dropna(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 (`cleaning.py:10-18`): drop rows with NULL in any column."""
    return drop_null_rows(_events(spark, sf_dir))


def _q_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch equivalent of the streaming tumbling-window count (SURVEY §2.9
    extension): per-hour event counts + value sums."""
    ev = _events(spark, sf_dir)
    out = (ev.groupBy(F.date_trunc("hour", F.col("ts"))
                       .cast("timestamp_ntz").alias("window_start"))
             .agg(F.count("*").alias("n_events"),
                  F.sum("value").alias("sum_value")))
    return round_doubles(out)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {
        "demand_heatmap": _q_demand_heatmap,
        "tip_trends": _q_tip_trends,
        "trip_performance": _q_trip_performance,
        "popular_routes": _q_popular_routes,
        "payment_analysis": _q_payment_analysis,
        "distance_distribution": _q_distance_distribution,
        "fare_anomalies": _q_fare_anomalies,
        "cleaning_dropna": _q_cleaning_dropna,
        "hourly_window": _q_hourly_window,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins of each query.

    Dialect notes: DuckDB ``dayofweek`` is 0=Sunday — Spark's is 1=Sunday,
    so oracles add 1; ``hour()`` returns BIGINT in DuckDB — cast to INTEGER
    to match Spark's int; computed doubles ROUND(...,6) on both sides.
    """
    return {
        "demand_heatmap": """
            SELECT user_id,
                   CAST(hour(ts) AS INTEGER) AS event_hour,
                   COUNT(*) AS n_trips
            FROM events
            GROUP BY user_id, hour(ts)
        """,
        "tip_trends": """
            SELECT l_suppkey, l_returnflag,
                   ROUND(AVG(CASE WHEN l_tax > 0 THEN l_discount / l_tax END), 6)
                       AS avg_tip_pct,
                   COUNT(*) AS n_trips
            FROM lineitem
            GROUP BY l_suppkey, l_returnflag
        """,
        "trip_performance": """
            SELECT l_returnflag, l_linestatus,
                   CAST(dayofweek(l_shipdate) + 1 AS INTEGER) AS ship_dow,
                   ROUND(AVG(l_quantity), 6) AS avg_l_quantity,
                   ROUND(AVG(l_extendedprice), 6) AS avg_l_extendedprice,
                   ROUND(AVG(l_discount), 6) AS avg_l_discount,
                   ROUND(SUM(l_extendedprice), 6) AS sum_l_extendedprice,
                   COUNT(*) AS n_trips,
                   (dayofweek(l_shipdate) + 1) IN (1, 7) AS is_weekend
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus, dayofweek(l_shipdate)
        """,
        "popular_routes": """
            SELECT l_partkey, l_returnflag,
                   COUNT(*) AS n_trips,
                   ROUND(AVG(l_quantity), 6) AS avg_l_quantity,
                   ROUND(AVG(l_extendedprice), 6) AS avg_l_extendedprice,
                   ROUND(AVG(l_discount), 6) AS avg_l_discount
            FROM lineitem
            GROUP BY l_partkey, l_returnflag
            HAVING COUNT(*) >= 10
        """,
        "payment_analysis": """
            SELECT l_returnflag, l_linestatus,
                   COUNT(*) AS n_trips,
                   ROUND(AVG(l_extendedprice), 6) AS avg_fare,
                   ROUND(AVG(l_discount), 6) AS avg_tip,
                   ROUND(AVG(CASE WHEN l_tax > 0 THEN l_discount / l_tax END), 6)
                       AS avg_tip_pct,
                   ROUND(SUM(l_extendedprice), 6) AS total_revenue,
                   CASE l_returnflag
                        WHEN 'R' THEN 'Returned'
                        WHEN 'A' THEN 'Accepted'
                        WHEN 'N' THEN 'Neutral'
                        ELSE 'Unknown' END AS payment_method
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
        """,
        "distance_distribution": """
            SELECT l_returnflag,
                   CASE WHEN l_quantity < 10 THEN 'Very Short'
                        WHEN l_quantity < 20 THEN 'Short'
                        WHEN l_quantity < 30 THEN 'Medium'
                        WHEN l_quantity < 40 THEN 'Long'
                        ELSE 'Very Long' END AS qty_category,
                   COUNT(*) AS n_trips,
                   ROUND(AVG(l_extendedprice), 6) AS avg_fare,
                   ROUND(AVG(l_quantity), 6) AS avg_duration,
                   ROUND(AVG(l_discount), 6) AS avg_tip,
                   ROUND(SUM(l_extendedprice), 6) AS total_revenue
            FROM lineitem
            GROUP BY 1, 2
        """,
        "fare_anomalies": """
            SELECT l_orderkey, l_linenumber, l_partkey,
                   l_extendedprice, l_quantity
            FROM lineitem
            WHERE l_extendedprice >=
                  (SELECT quantile_cont(l_extendedprice, 0.99) FROM lineitem)
        """,
        "cleaning_dropna": """
            SELECT event_id, ts, user_id, event_type, value, props
            FROM events
            WHERE event_id IS NOT NULL AND ts IS NOT NULL
              AND user_id IS NOT NULL AND event_type IS NOT NULL
              AND value IS NOT NULL AND props IS NOT NULL
        """,
        "hourly_window": """
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
                   COUNT(*) AS n_events,
                   ROUND(SUM(value), 6) AS sum_value
            FROM events
            GROUP BY 1
        """,
    }
