from nyctaxidatapipeline_spark.functions.features import (
    bucketize,
    decode_map,
    duration_minutes,
    guarded_ratio,
    with_time_features,
    with_trip_features,
)

__all__ = [
    "bucketize",
    "decode_map",
    "duration_minutes",
    "guarded_ratio",
    "with_time_features",
    "with_trip_features",
]
