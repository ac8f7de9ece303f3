"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API): a
deterministic, partition-parallel synthetic corpus generator.

[absent in reference — north-star extension] The reference reads exactly
one JSON file (`SemanticDatabase.cs:313-329`); this engine's sources are
pluggable, and this module demonstrates the V2-style Python extension
point end to end: a `DataSource` that materializes NOTHING on the driver —
each `InputPartition` carries only (partition_id, seed, row range) and the
executors generate their own rows. That is the 100 TB posture for test
data: a 10-billion-row corpus "source" costs zero storage and zero driver
memory, scales linearly with executors, and is bit-reproducible (content
is a pure function of (seed, row_id) via md5, the same portable primitive
the dedup family hashes with).

Usage::

    register_synthetic_docs(spark)
    df = (spark.read.format("synthetic_docs")
          .option("rows", 100000).option("partitions", 64)
          .option("seed", 7).load())
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_WORDS = (
    "the quick brown fox jumps over lazy dog alpha beta gamma delta data "
    "spark corpus token model train shard merge index query batch stream"
).split()

_LANGS = ["en", "de", "fr", "es", "zh"]


def _doc_row(seed: int, i: int) -> tuple:
    """Row i under seed — pure function, no RNG state: executors can
    generate any slice independently and retries are idempotent."""
    h = hashlib.md5(f"{seed}:{i}".encode()).digest()
    n_words = 8 + h[0] % 25
    words = [
        _WORDS[hashlib.md5(f"{seed}:{i}:{j}".encode()).digest()[0] % len(_WORDS)]
        for j in range(n_words)
    ]
    text = " ".join(words)
    return (i, text, _LANGS[h[1] % len(_LANGS)], f"src{h[2] % 20}", len(text))


class _Range(InputPartition):
    def __init__(self, seed: int, start: int, end: int):
        self.seed, self.start, self.end = seed, start, end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.parts = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 0))

    def partitions(self):
        per = (self.rows + self.parts - 1) // max(1, self.parts)
        return [
            _Range(self.seed, lo, min(lo + per, self.rows))
            for lo in range(0, self.rows, per)
        ]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield _doc_row(partition.seed, i)


class SyntheticDocsDataSource(DataSource):
    """`format("synthetic_docs")` — schema mirrors the documents table."""

    @classmethod
    def name(cls):
        return "synthetic_docs"

    def schema(self):
        return StructType(
            [
                StructField("doc_id", LongType()),
                StructField("text", StringType()),
                StructField("lang", StringType()),
                StructField("source", StringType()),
                StructField("n_chars", LongType()),
            ]
        )

    def reader(self, schema):
        return SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema):
        return SyntheticDocsStreamReader(self.options)


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same source (Spark 4
    ``SimpleDataSourceStreamReader``): each micro-batch advances the
    offset by ``rows_per_batch`` rows of the SAME deterministic corpus,
    so ``readStream.format("synthetic_docs")`` replays exactly the rows
    ``read.format("synthetic_docs")`` would produce — stream/batch parity
    is pytest-locked. Offsets are plain ``{"offset": n}`` dicts; `read`
    returns (rows, next_offset) and `readBetweenOffsets` regenerates a
    replayed range purely from the offsets (content is a pure function of
    (seed, row_id)), which is exactly the exactly-once replay contract
    the simple-reader API asks for. The driver never materializes rows
    outside the requested batch; ``max_rows`` bounds the unbounded
    stream for tests."""

    def __init__(self, options):
        self.seed = int(options.get("seed", 0))
        self.per_batch = int(options.get("rows_per_batch", 100))
        self.max_rows = int(options.get("max_rows", 0))  # 0 = unbounded

    def initialOffset(self):
        return {"offset": 0}

    def read(self, start):
        lo = int(start["offset"])
        hi = lo + self.per_batch
        if self.max_rows:
            hi = min(hi, self.max_rows)
        rows = [_doc_row(self.seed, i) for i in range(lo, hi)]
        return iter(rows), {"offset": hi}

    def readBetweenOffsets(self, start, end):
        return iter(
            _doc_row(self.seed, i)
            for i in range(int(start["offset"]), int(end["offset"]))
        )


def register_synthetic_docs(spark) -> None:
    """Idempotently register the source with the session."""
    spark.dataSource.register(SyntheticDocsDataSource)
