from semantic_index_spark.operators import (
    dedup,
    multimodal,
    pipeline,
    relational,
    similarity,
)

__all__ = ["dedup", "multimodal", "pipeline", "relational", "similarity"]
