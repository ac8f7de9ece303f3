"""The versioned store as a BATCH DataSource — the SQL front door.

[absent in reference — north-star extension] Every versioned-store verb
so far is Python-API-only; power users live in SQL. This module exposes
any versioned table (plain snapshot, bucketed, hidden-partitioned)
through the Spark 4 Python DataSource API so it is reachable from pure
SQL DDL/DML text::

    register_versioned_table(spark)
    spark.sql(\"\"\"CREATE TEMPORARY VIEW orders_v3
                USING versioned_table
                OPTIONS (table '/path/tbl', version '3')\"\"\")
    spark.sql("SELECT * FROM orders_v3 WHERE id = 42")

``sql_view`` wraps that DDL; ``version`` / ``as_of_ts`` options are the
``VERSION AS OF`` / ``TIMESTAMP AS OF`` equivalents (the literal Delta
syntax needs a JVM DSv2 catalog, which a Python data source cannot
register — the OPTIONS-pinned view is the same contract: a read bound to
one immutable snapshot).

Read semantics match ``read_bucketed``/``read_version`` exactly
(pytest-asserted): the version is resolved ONCE at data-source
construction (a concurrent commit cannot tear a query across versions),
bucketed tables read each bucket's owning-version files under the
manifest's LOGICAL schema (column-mapping rename aliasing, null-fill for
added columns, arrow upcast for type-widened columns), and deletion
vectors apply executor-side as a per-bucket pyarrow anti-join — keys
hash to exactly one bucket, so each file partition needs only its own
bucket's DV files.

Scale shape: planning lists files driver-side from the manifest (the
same O(buckets) walk ``read_bucketed`` does); each file becomes one
``InputPartition`` read executor-parallel with pyarrow. ``pushFilters``
adds MANIFEST-LEVEL BUCKET PRUNING for point lookups: an ``id = k`` /
``id IN (...)`` predicate on a single integral bucket key computes the
key's bucket with a pure-Python XXH64 that bit-matches Spark's
``xxhash64`` expression (seed 42; verified value-for-value in pytest —
the prune MUST agree with the writer's placement or it would silently
drop matching rows) and plans only that bucket's files — the
~n_buckets-fold point-lookup saving of ``read_bucketed(key_values=...)``,
now available to plain SQL. All filters are returned to Spark for
re-evaluation: pruning is pure IO reduction, rows are never trusted to
it.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualNullSafe,
    EqualTo,
    In,
    InputPartition,
)
from pyspark.sql.types import StructType

from semantic_index_spark.sources.versioned_stream import _data_files

# ---- Spark-exact XXH64 (org.apache.spark XxHash64, seed 42) -------------
_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxhash64_long(v: int, seed: int = 42) -> int:
    """Spark ``xxhash64(CAST(v AS BIGINT))``, bit-exact (signed result)."""
    v &= _M64
    h = (seed + _P5 + 8) & _M64
    h ^= (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
    h = (_rotl(h, 27) * _P1 + _P4) & _M64
    h = _fmix(h)
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64_int(v: int, seed: int = 42) -> int:
    """Spark ``xxhash64(CAST(v AS INT))`` — ints hash through the 4-byte
    path, which is why the store refuses to widen key columns."""
    h = (seed + _P5 + 4) & _M64
    h ^= ((v & 0xFFFFFFFF) * _P1) & _M64
    h = (_rotl(h, 23) * _P2 + _P3) & _M64
    h = _fmix(h)
    return h - (1 << 64) if h >= (1 << 63) else h


_KEY_HASH = {"integer": xxhash64_int, "long": xxhash64_long}


def _bucket_of(value: int, dtype: str, n_buckets: int) -> int:
    h = _KEY_HASH[dtype](int(value))
    return ((h % n_buckets) + n_buckets) % n_buckets


# ---- the data source -----------------------------------------------------


def _latest(table: str) -> int:
    with open(os.path.join(table, "_latest.json")) as f:
        return int(json.load(f)["version"])


def _manifest(table: str, version: int) -> "dict | None":
    p = os.path.join(table, f"_manifest_v{version}.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


class _Part(InputPartition):
    def __init__(self, path: str, dv_paths: "tuple[str, ...]" = ()):
        self.path = path
        self.dv_paths = dv_paths


class VersionedTableReader(DataSourceReader):
    def __init__(self, schema: StructType, table: str, version: int):
        self.schema = schema
        self.table = table
        self.version = version
        self.man = _manifest(table, version)
        self._wanted: "set[int] | None" = None  # bucket prune from filters

    def pushFilters(self, filters):
        man = self.man
        if man is not None and len(man["key_cols"]) == 1:
            key = man["key_cols"][0]
            fields = {f["name"]: f for f in json.loads(man["schema"])["fields"]}
            dtype = fields.get(key, {}).get("type")
            if dtype in _KEY_HASH:
                n = int(man["n_buckets"])
                for f in filters:
                    vals = None
                    if (
                        isinstance(f, (EqualTo, EqualNullSafe))
                        and tuple(f.attribute) == (key,)
                        and isinstance(f.value, int)
                        and not isinstance(f.value, bool)
                    ):
                        vals = [f.value]
                    elif isinstance(f, In) and tuple(f.attribute) == (key,):
                        if all(
                            isinstance(v, int) and not isinstance(v, bool)
                            for v in f.value
                        ):
                            vals = list(f.value)
                    if vals is not None:
                        buckets = {_bucket_of(v, dtype, n) for v in vals}
                        self._wanted = (
                            buckets
                            if self._wanted is None
                            else self._wanted & buckets
                        )
        # every filter goes back to Spark: pruning is IO-only, correctness
        # never depends on it (rows are re-filtered post-scan)
        return filters

    def partitions(self):
        man = self.man
        if man is None:  # plain / hidden snapshot: every file under v=<n>
            files = _data_files(os.path.join(self.table, f"v={self.version}"))
            return [_Part(p) for p in files] or [_Part("")]
        parts = []
        dv = man.get("dv", {})
        for b, owner in sorted(man["buckets"].items(), key=lambda kv: int(kv[0])):
            if owner is None:
                continue
            if self._wanted is not None and int(b) not in self._wanted:
                continue
            dv_paths = tuple(
                os.path.join(self.table, f"v={v}", "__dv", f"__bucket={b}")
                for v in dv.get(b, [])
            )
            bdir = os.path.join(self.table, f"v={owner}", f"__bucket={b}")
            parts.extend(_Part(p, dv_paths) for p in _data_files(bdir))
        # Spark requires a non-empty partition list
        return parts or [_Part("")]

    def read(self, partition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_type

        if not partition.path:
            return iter(())
        man = self.man
        colmap = (man.get("colmap") or {}) if man else {}
        # column-pruned read (round 12): decode only the view schema's
        # PHYSICAL columns (+ the key columns the DV anti-join needs),
        # intersected with what the file actually holds (pre-evolution
        # files lack added columns; the null-fill below covers them).
        # Retired (dropped) columns' bytes are never decoded — DROP
        # COLUMN stays zero-IO on the SQL path too.
        wanted = {colmap.get(f.name, f.name) for f in self.schema.fields}
        if man:
            wanted.update(colmap.get(k, k) for k in man["key_cols"])
        avail = [c for c in pq.read_schema(partition.path).names if c in wanted]
        tbl = pq.read_table(partition.path, columns=avail)
        if partition.dv_paths:
            # per-bucket DV anti-join, executor-side: keys hash to exactly
            # one bucket, so this file's bucket's DV files are sufficient
            phys_keys = [colmap.get(k, k) for k in man["key_cols"]]
            dv = pa.concat_tables(
                [pq.read_table(p, columns=phys_keys) for p in partition.dv_paths]
            )
            tbl = tbl.join(dv, keys=phys_keys, join_type="left anti")
        cols, names = [], []
        n = tbl.num_rows
        for f in self.schema.fields:
            t = to_arrow_type(f.dataType)
            phys = colmap.get(f.name, f.name)
            if phys in tbl.column_names:
                col = tbl.column(phys)
                # cast covers column-mapping dtype identity, added-column
                # null-fill (below), AND type-widened columns: narrow
                # int32/float32 files upcast under the widened read schema
                cols.append(col if col.type == t else col.cast(t))
            else:
                cols.append(pa.nulls(n, type=t))
            names.append(f.name)
        return iter(pa.Table.from_arrays(cols, names=names).to_batches())


class VersionedTableDataSource(DataSource):
    """``spark.read.format("versioned_table")`` / ``CREATE TEMPORARY VIEW
    ... USING versioned_table`` — see module docs. Options: ``table``
    (path, required), ``version`` (int) or ``as_of_ts`` (epoch seconds or
    ISO-8601), default committed latest."""

    def __init__(self, options):
        super().__init__(options)
        self.table = options["table"]
        # resolve ONCE: schema() and reader() must describe the same
        # snapshot even if a concurrent commit advances the pointer
        # between planning steps
        if options.get("as_of_ts") is not None:
            if options.get("version") is not None:
                raise ValueError("pass version OR as_of_ts, not both")
            from semantic_index_spark.sources.versioned import resolve_as_of

            self.version = resolve_as_of(self.table, options["as_of_ts"])
        elif options.get("version") is not None:
            self.version = int(options["version"])
        else:
            self.version = _latest(self.table)

    @classmethod
    def name(cls) -> str:
        return "versioned_table"

    def schema(self) -> StructType:
        man = _manifest(self.table, self.version)
        if man is not None:
            return StructType.fromJson(json.loads(man["schema"]))
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        files = _data_files(os.path.join(self.table, f"v={self.version}"))
        if not files:
            raise FileNotFoundError(
                f"version {self.version} of {self.table} has no data files"
            )
        return from_arrow_schema(pq.read_schema(files[0]))

    def reader(self, schema: StructType) -> VersionedTableReader:
        return VersionedTableReader(schema, self.table, self.version)


def register_versioned_table(spark) -> None:
    """Idempotently register the source with the session. Also enables
    ``spark.sql.python.filterPushdown.enabled`` (runtime-settable, off by
    default in Spark 4.1) — without it Spark refuses any Python reader
    that implements ``pushFilters``, and bucket pruning is the point."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(VersionedTableDataSource)


def sql_view(
    spark, view_name: str, table: str, version=None, as_of_ts=None
) -> None:
    """The SQL front door in one call: bind ``view_name`` to a versioned
    table snapshot via ``CREATE OR REPLACE TEMPORARY VIEW ... USING
    versioned_table`` — after this, the table is pure-SQL territory
    (point lookups get manifest-level bucket pruning via pushFilters).
    ``version``/``as_of_ts`` pin a snapshot (``VERSION AS OF`` /
    ``TIMESTAMP AS OF`` equivalents); default = latest at bind time."""
    register_versioned_table(spark)
    # option VALUES are interpolated into DDL text: a single quote in the
    # path or timestamp would break the statement or inject SQL (round 12)
    for label, val in (("table path", table), ("as_of_ts", as_of_ts)):
        if val is not None and "'" in str(val):
            raise ValueError(f"{label} {val!r} must not contain single quotes")
    opts = [f"table '{table}'"]
    if version is not None:
        opts.append(f"version '{int(version)}'")
    if as_of_ts is not None:
        opts.append(f"as_of_ts '{as_of_ts}'")
    # a real identifier: the old isalnum() check let a leading digit through
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", view_name):
        raise ValueError(f"invalid view name {view_name!r}")
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW {view_name} "
        f"USING versioned_table OPTIONS ({', '.join(opts)})"
    )
