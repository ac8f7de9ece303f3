from semantic_index_spark.sources import io

__all__ = ["io"]
