"""Versioned table snapshots with time travel — a minimal table format.

[absent in reference — north-star extension] The reference persists one
mutable JSON file (`SemanticDatabase.cs:508-526`); production pipelines
need Iceberg/Delta-style semantics: immutable snapshot versions, an
atomically-committed pointer to the latest, reads of any historical
version, and version-to-version diffs. This module implements the
minimal honest core of that contract on a plain filesystem:

  layout:  <table>/v=<n>/ ...parquet...   (immutable once committed)
           <table>/_latest.json           ({"version": n}, atomic rename)

Scale notes: data files are written ONCE and never rewritten — a commit
is one tiny manifest rename, so writers never block readers and a reader
holding version n is immune to later commits (no read-write races, the
same guarantee real table formats get from their manifest trees). On an
object store, swap the rename for a conditional PUT / DynamoDB-style
pointer — the layout is unchanged. History retention is explicit
(`expire_versions`), mirroring VACUUM/expire-snapshots.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_LATEST = "_latest.json"


def _latest_path(table: str) -> str:
    return os.path.join(table, _LATEST)


def current_version(table: str) -> int | None:
    """Committed latest version, or None for an empty table."""
    try:
        with open(_latest_path(table)) as f:
            return int(json.load(f)["version"])
    except FileNotFoundError:
        return None


def commit_version(df: DataFrame, table: str) -> int:
    """Write the next immutable snapshot version and atomically commit the
    latest-pointer. Returns the new version number. A crash before the
    pointer rename leaves an orphan v-directory that is invisible to
    readers (and reclaimed by ``expire_versions``) — never a torn read."""
    os.makedirs(table, exist_ok=True)
    cur = current_version(table)
    nxt = 0 if cur is None else cur + 1
    df.write.mode("errorifexists").parquet(os.path.join(table, f"v={nxt}"))
    tmp = _latest_path(table) + ".__tmp__"
    with open(tmp, "w") as f:
        json.dump({"version": nxt}, f)
    os.replace(tmp, _latest_path(table))
    return nxt


def read_version(spark: SparkSession, table: str, version: int | None = None) -> DataFrame:
    """Time travel: read the committed latest (default) or any retained
    historical version."""
    v = current_version(table) if version is None else version
    if v is None:
        raise FileNotFoundError(f"versioned table {table} has no commits")
    path = os.path.join(table, f"v={v}")
    if not os.path.isdir(path):
        raise FileNotFoundError(
            f"version {v} of {table} does not exist (expired or never committed)"
        )
    return spark.read.parquet(path)


def list_versions(table: str) -> list[int]:
    """Retained snapshot versions, ascending (committed or orphaned)."""
    if not os.path.isdir(table):
        return []
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(table)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    )


def expire_versions(
    table: str, keep_last: int = 2, orphan_ttl_seconds: float = 24 * 3600.0
) -> list[int]:
    """Retention: drop all but the newest ``keep_last`` committed versions
    (never the committed latest — ``keep_last`` must be >= 1; 0 would
    otherwise slice as ``[-0:]`` and silently keep everything). Returns
    the expired version numbers.

    Orphan versions NEWER than the committed pointer are reclaimed only
    once older than ``orphan_ttl_seconds`` (by directory mtime): a young
    v-directory past the pointer is indistinguishable from a concurrent
    writer's in-flight ``commit_version`` — deleting it eagerly would
    destroy that commit between its parquet write and pointer rename,
    not just clean up crash leftovers. Same contract as Iceberg/Delta
    orphan-file removal, which is likewise age-gated."""
    import time

    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    cur = current_version(table)
    keep = set()
    committed = [v for v in list_versions(table) if cur is not None and v <= cur]
    keep.update(committed[-keep_last:])
    now = time.time()
    expired = []
    for v in list_versions(table):
        if v in keep:
            continue
        path = os.path.join(table, f"v={v}")
        if cur is not None and v > cur:
            try:
                age = now - os.path.getmtime(path)
            except OSError:
                continue  # vanished underneath us — a concurrent committer
            if age < orphan_ttl_seconds:
                continue
        shutil.rmtree(path)
        expired.append(v)
    return expired
