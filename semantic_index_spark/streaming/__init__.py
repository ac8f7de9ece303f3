from semantic_index_spark.streaming import ingest

__all__ = ["ingest"]
