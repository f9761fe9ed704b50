from nyctaxidatapipeline_spark.operators.analytics import (
    demand_heatmap,
    distance_distribution,
    payment_analysis,
    popular_routes,
    quantile_threshold,
    threshold_anomalies,
    tip_trends,
    trip_performance,
)
from nyctaxidatapipeline_spark.operators.cleaning import drop_null_rows

__all__ = [
    "demand_heatmap",
    "distance_distribution",
    "drop_null_rows",
    "payment_analysis",
    "popular_routes",
    "quantile_threshold",
    "threshold_anomalies",
    "tip_trends",
    "trip_performance",
]
