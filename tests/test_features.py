"""Unit tests: feature-engineering NULL/edge semantics (SURVEY.md §1).

Edge rows per FIXTURES.md §A: zero/negative denominators → NULL ratio arms,
zero-duration trips, strict bucket edges (exactly 1.0 → next bucket),
unknown decode codes → default label, second-truncated durations.
"""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from nyctaxidatapipeline_spark.functions import (
    bucketize,
    decode_map,
    duration_minutes,
    guarded_ratio,
    with_time_features,
    with_trip_features,
)


def test_guarded_ratio_null_arms(spark):
    df = spark.createDataFrame(
        [Row(num=5.0, den=2.0), Row(num=5.0, den=0.0),
         Row(num=5.0, den=-1.0), Row(num=None, den=2.0)])
    got = [r[0] for r in df.select(guarded_ratio("num", "den")).collect()]
    assert got == [2.5, None, None, None]


def test_guarded_ratio_avg_skips_nulls(spark):
    # avg over the guarded ratio must average only den>0 rows (A2 semantics).
    df = spark.createDataFrame(
        [Row(num=4.0, den=2.0), Row(num=9.0, den=3.0), Row(num=1.0, den=0.0)])
    got = df.select(F.avg(guarded_ratio("num", "den"))).collect()[0][0]
    assert got == 2.5


def test_bucketize_strict_edges(spark):
    df = spark.createDataFrame(
        [Row(d=0.5), Row(d=1.0), Row(d=2.99), Row(d=3.0), Row(d=5.0),
         Row(d=9.99), Row(d=10.0), Row(d=50.0)])
    got = [r[0] for r in df.select(
        bucketize("d", [1.0, 3.0, 5.0, 10.0],
                  ["Very Short", "Short", "Medium", "Long"],
                  "Very Long")).collect()]
    assert got == ["Very Short", "Short", "Short", "Medium", "Long",
                   "Long", "Very Long", "Very Long"]


def test_decode_map_default(spark):
    df = spark.createDataFrame([Row(p=1), Row(p=4), Row(p=6), Row(p=None)])
    got = [r[0] for r in df.select(decode_map(
        "p", {1: "Credit Card", 2: "Cash", 3: "No Charge", 4: "Dispute"}
    )).collect()]
    assert got == ["Credit Card", "Dispute", "Unknown", "Unknown"]


def test_duration_minutes_second_truncation(spark):
    # unix_timestamp truncates sub-second parts BEFORE subtraction
    # (reference yellow_taxi_etl.py:70-74): 90.9s - 0.5s spans 90 whole secs.
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0, 500000)
    t1 = dt.datetime(2024, 1, 1, 0, 1, 30, 900000)
    df = spark.createDataFrame([Row(a=t0, b=t1)])
    got = df.select(duration_minutes("a", "b")).collect()[0][0]
    assert got == 1.5


def test_with_time_features_dow_convention(spark):
    # 2024-01-07 was a Sunday → Spark dayofweek == 1.
    df = spark.createDataFrame([Row(ts=dt.datetime(2024, 1, 7, 15, 30))])
    row = with_time_features(df, "ts").collect()[0]
    assert row.pickup_hour == 15 and row.pickup_dow == 1


def test_with_trip_features_full_set(spark):
    pick = dt.datetime(2024, 3, 2, 8, 0, 0)  # Saturday
    df = spark.createDataFrame([Row(
        tpep_pickup_datetime=pick,
        tpep_dropoff_datetime=pick + dt.timedelta(minutes=30),
        fare_amount=20.0, tip_amount=5.0, trip_distance=10.0)])
    row = with_trip_features(df).collect()[0]
    assert row.pickup_hour == 8 and row.pickup_dow == 7
    assert row.trip_minutes == 30.0
    assert row.tip_pct == 0.25
    assert row.avg_speed_mph == 20.0
    assert row.revenue_per_mile == 2.0
    assert row.distance_category == "Very Long"


def test_zero_duration_speed_null(spark):
    pick = dt.datetime(2024, 3, 2, 8, 0, 0)
    df = spark.createDataFrame([Row(
        tpep_pickup_datetime=pick, tpep_dropoff_datetime=pick,
        fare_amount=0.0, tip_amount=5.0, trip_distance=0.0)])
    row = with_trip_features(df).collect()[0]
    assert row.trip_minutes == 0.0
    assert row.avg_speed_mph is None      # zero duration
    assert row.tip_pct is None            # zero fare
    assert row.revenue_per_mile is None   # zero distance
