from semantic_index_spark.operators import dedup, multimodal, relational, similarity

__all__ = ["dedup", "multimodal", "relational", "similarity"]
