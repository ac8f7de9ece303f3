"""Sources & sinks.

The reference persists exactly one way: the whole store to/from a single
JSON file (`SemanticDatabase.cs:484-526`, "single-file" per README.md:2).
Our primary store is partitioned Parquet (columnar, splittable, predicate/
projection pushdown); JSON stays as a reference-compat import/export, and
CSV/JSONL readers round out the ingest surface for text corpora.

Snapshot convention (replaces the reference's ReaderWriterLockSlim,
`SemanticDatabase.cs:19`): writers write to ``<path>.__tmp__`` then rename —
readers referencing the old directory keep a consistent view. On cloud
object stores this maps to versioned prefixes / table-format commits.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """Parquet scan. Schema from footers unless pinned; filters/projections
    applied by callers reach the scan via Catalyst (PushedFilters)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def write_parquet_snapshot(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """Write-then-swap Parquet snapshot: atomic replacement of ``path``.
    ``partition_by`` enables partition pruning for downstream readers
    (e.g. partition the corpus by source/date at 100 TB)."""
    tmp = path + ".__tmp__"
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)


def read_json(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """JSON / JSONL scan (reference-compat ingest: its store file is a JSON
    array — Spark reads it with multiLine when needed)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.json(path)


def read_reference_json_array(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Read the reference's exact persistence format — ONE file containing a
    JSON ARRAY of records (`SemanticDatabase.cs:524-525` serializes
    ``List<SemanticRecord<T>>``): requires multiLine mode."""
    return spark.read.schema(schema).option("multiLine", "true").json(path)


def read_csv(
    spark: SparkSession, path: str, schema: StructType | None = None, header: bool = True
) -> DataFrame:
    """CSV ingest for raw text corpora."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_single_json_file(df: DataFrame, path: str) -> None:
    """Reference-compatible single-file JSONL export (`README.md:2`
    "single-file"). ``coalesce(1)`` serializes the write — an explicit
    export for small results, never the primary store (SURVEY.md §7)."""
    tmp = path + ".__tmpdir__"
    df.coalesce(1).write.mode("overwrite").json(tmp)
    part = next(f for f in os.listdir(tmp) if f.startswith("part-"))
    if os.path.isdir(path):
        shutil.rmtree(path)
    elif os.path.exists(path):
        os.remove(path)
    shutil.move(os.path.join(tmp, part), path)
    shutil.rmtree(tmp)
