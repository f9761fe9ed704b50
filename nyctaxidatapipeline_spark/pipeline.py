"""End-to-end taxi pipeline — the reference's two entry points, composed
from the engine's operators so a user of the reference can switch 1:1.

EP2 (``cleaning.py``): ``clean_trips`` — raw glob scan → 19-column null
scrub → parquet.  EP1 (``yellow_taxi_etl.py``): ``taxi_analytics`` — feature
engineering → cached shared input → seven aggregate tables; ``run_pipeline``
writes them through the sink abstraction with the reference's write-mode
semantics (``--append`` flips analytics tables to append, ``fare_anomalies``
stays overwrite — ``yellow_taxi_etl.py:205-211``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nyctaxidatapipeline_spark import sinks
from nyctaxidatapipeline_spark.functions.features import with_trip_features
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
from nyctaxidatapipeline_spark.sources import read_parquet

#: The 19 TLC trip columns (reference ``cleaning.py:10-15``).
TRIP_COLUMNS = (
    "VendorID", "tpep_pickup_datetime", "tpep_dropoff_datetime",
    "passenger_count", "trip_distance", "RatecodeID", "store_and_fwd_flag",
    "PULocationID", "DOLocationID", "payment_type", "fare_amount", "extra",
    "mta_tax", "tip_amount", "tolls_amount", "improvement_surcharge",
    "total_amount", "congestion_surcharge", "Airport_fee",
)

#: Payment-type decode (reference ``yellow_taxi_etl.py:179-185``).
PAYMENT_DECODE = {1: "Credit Card", 2: "Cash", 3: "No Charge", 4: "Dispute"}


def clean_trips(spark: SparkSession, in_path: str,
                out_path: str | None = None) -> DataFrame:
    """EP2: scan raw monthly parquet, drop rows null in any trip column,
    optionally write the cleaned dataset (reference ``cleaning.py``)."""
    cleaned = drop_null_rows(read_parquet(spark, in_path),
                             subset=TRIP_COLUMNS)
    if out_path:
        sinks.write_parquet(cleaned, out_path)
    return cleaned


def taxi_analytics(trips: DataFrame,
                   threshold_mode: str = "approx") -> dict[str, DataFrame]:
    """EP1: the seven aggregate tables over a trip-shaped DataFrame.

    The featurized input is cached — the reference's one explicit physical
    decision (``yellow_taxi_etl.py:95``): six analytics plus the quantile
    scan share a single materialization. At 100 TB swap ``.cache()`` for a
    parquet checkpoint of the featurized columns (MEMORY_AND_DISK of a
    100 TB working set evicts constantly; a columnar on-disk checkpoint
    with column pruning is strictly better there).
    """
    df = with_trip_features(trips).cache()
    return {
        "demand_heatmap": demand_heatmap(df, "PULocationID", "pickup_hour"),
        "tip_trends": tip_trends(df, "PULocationID", "payment_type",
                                 "tip_pct"),
        "trip_performance": trip_performance(
            df, ["PULocationID", "pickup_hour", "pickup_dow"],
            avg_cols=["trip_minutes", "avg_speed_mph", "revenue_per_mile",
                      "fare_amount", "trip_distance", "tip_amount",
                      "tip_pct"],
            sum_cols=["fare_amount"], dow_col="pickup_dow"),
        "popular_routes": popular_routes(
            df, ["PULocationID", "DOLocationID", "pickup_hour"],
            avg_cols=["trip_minutes", "fare_amount", "trip_distance",
                      "tip_amount"],
            min_trips=10),
        "payment_analysis": payment_analysis(
            df, ["PULocationID", "pickup_hour", "payment_type"],
            pay_col="payment_type", fare_col="fare_amount",
            tip_col="tip_amount", ratio_col="tip_pct",
            decode=PAYMENT_DECODE),
        "distance_distribution": distance_distribution(
            df, ["PULocationID", "pickup_hour", "distance_category"],
            fare_col="fare_amount", minutes_col="trip_minutes",
            tip_col="tip_amount"),
        "fare_anomalies": threshold_anomalies(
            df, "fare_amount",
            ["VendorID", "tpep_pickup_datetime", "PULocationID",
             "DOLocationID", "fare_amount", "trip_distance", "tip_amount"],
            q=0.99, mode=threshold_mode),
    }


def run_pipeline(trips: DataFrame, sink: str = "parquet",
                 append: bool = False, **sink_kwargs) -> dict[str, DataFrame]:
    """Write all seven tables. ``append=True`` mirrors the reference's
    ``--append`` flag; ``fare_anomalies`` is always overwritten
    (``yellow_taxi_etl.py:207``)."""
    tables = taxi_analytics(trips)
    mode = "append" if append else "overwrite"
    for name, df in tables.items():
        table_mode = "overwrite" if name == "fare_anomalies" else mode
        if sink == "parquet":
            path = sink_kwargs["base_path"].rstrip("/") + "/" + name
            sinks.write_parquet(df, path, mode=table_mode)
        elif sink == "jdbc":
            sinks.write_jdbc(df, name, sink_kwargs["cfg"], mode=table_mode)
        elif sink == "noop":
            sinks.write_output(df, "noop")
        elif sink == "console":
            sinks.write_console(df)
        else:
            raise ValueError(f"unknown sink {sink!r}")
    return tables
