from semantic_index_spark.plans import explain, tuning

__all__ = ["explain", "tuning"]
