from nyctaxidatapipeline_spark.plans.util import explain_str, round_doubles

__all__ = ["explain_str", "round_doubles"]
