from nyctaxidatapipeline_spark.plans.util import (
    explain_str,
    fan_out,
    round_doubles,
)

__all__ = ["explain_str", "fan_out", "round_doubles"]
