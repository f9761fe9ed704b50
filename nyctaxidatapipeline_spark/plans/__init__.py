from nyctaxidatapipeline_spark.plans.util import (
    data_sized_bnljs,
    explain_str,
    fan_out,
    round_doubles,
)

__all__ = ["data_sized_bnljs", "explain_str", "fan_out", "round_doubles"]
