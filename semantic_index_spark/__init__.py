"""semantic_index_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of chataize/semantic-index.

The reference (`/root/reference/ChatAIze.SemanticIndex/SemanticDatabase.cs`)
is a single-node in-memory vector store: a ``List<SemanticRecord<T>>`` with
brute-force dot-product KNN, 4 duplicate-handling policies, and single-file
JSON persistence. This package re-expresses that surface — plus the
relational / LLM-data-pipeline operators required at 100 TB scale — as
idiomatic Spark DataFrame programs over Parquet.

Design stance (SURVEY.md §7):
  * batch-first DataFrame library; state = Parquet-backed DataFrame
  * no custom Catalyst rules — everything is declarative so pushdown,
    pruning, broadcast selection, and AQE come free
  * Python UDFs only where built-ins can't express semantics, and then
    always Arrow-vectorized (pandas_udf / mapInPandas)
"""

from semantic_index_spark.duplicate_handling import DuplicateHandling
from semantic_index_spark.embedder import DeterministicEmbedder, Embedder
from semantic_index_spark.index import SemanticIndex
from semantic_index_spark.session import get_spark

__all__ = [
    "DeterministicEmbedder",
    "DuplicateHandling",
    "Embedder",
    "SemanticIndex",
    "get_spark",
]

__version__ = "0.1.0"
