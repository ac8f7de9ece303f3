"""Transactionally co-committed ANN index for bucketed tables.

[absent in reference — north-star extension; design spike for
ARCHITECTURE.md "Index ∘ table atomicity"]. The standalone index
layouts (``operators/hnsw.py``, ``operators/similarity.py``) live
OUTSIDE the versioned store: a MERGE that rewrites buckets and the
index append that should accompany it are two non-atomic operations
with no shared version — no time travel for indexes, no crash
consistency between table and index. This module closes that gap the
way real table formats do: the index becomes a TABLE ARTIFACT that
commits in the same manifest publish as the data.

Design:

  * **Bucket-aligned shards.** The table's key must be a single
    (integral) id column; index shard ``b`` covers exactly table bucket
    ``b`` — both are ``pmod(xxhash64(id), n_buckets)`` (``build_hnsw``'s
    shard hash IS ``_bucket_expr`` for a single key). The rows needed to
    rebuild a shard are therefore exactly the rewritten bucket's rows,
    which the merge has already computed — zero extra table reads — and
    at cluster scale the shard is co-located with its bucket.
  * **One staged directory, one publish.** The merge's rebuilt shard
    graphs are written into the SAME ``_staged_<uuid>`` directory as its
    bucket data (under ``__hnsw/shard=<b>``), and the manifest's
    ``index.shards`` ownership map advances in the SAME manifest write —
    one directory rename + one pointer swap covers both. A crash at ANY
    point therefore leaves the table and the index at the same version:
    a reader can never observe a merged table with a stale index or an
    index containing rows the table commit never published
    (pytest-simulated crashes at both failure points).
  * **Time travel for free.** ``index.shards`` maps each shard to its
    owning version exactly like ``buckets`` does for data, so reading
    the index AS OF version ``n`` is the same manifest walk as reading
    the data — and ``expire_bucketed`` keeps every file a retained
    manifest's index references live.
  * **Deletes stay write-fast.** ``delete_bucketed``'s deletion vectors
    apply to the index as SERVE-TIME tombstones (deleted nodes keep
    routing, never rank — the same waypoint contract as
    ``delete_from_hnsw_index``), read from the manifest the serve
    resolved, so a DV-only commit needs no shard rebuild and time travel
    sees the right deletes.

The full lifecycle maintains the index (round 11, second pass):
OPTIMIZE rebuilds the rewritten buckets' shards from the DV-FOLDED
content in its own commit (when the manifest clears the DV lists, the
deleted nodes are already gone from the graph); RESTORE carries the
target manifest's shard map wholesale (rollback restores the index with
the data, and retention keeps the shard files live); CLONE consolidates
shard graphs under the clone's v=0 exactly like buckets and DVs; DROP /
RENAME COLUMN work on any column except the index's embedding column
(the one name the spec stores — detach/rebuild first), with
column-mapped key names resolved physically on the DV serve path.

Round 12 generalizes the mechanism across index KINDS and COUNT: the
manifest carries ``indexes = {name: {params, shards}}`` — a table holds
any number of NAMED indexes, each spec dispatching on ``params.kind``
through every hook (merge/OPTIMIZE rebuild ALL of them in the one
commit, CLONE consolidates all, RESTORE carries the map wholesale,
drop/rename guards cover every index's embedding column, detach removes
one by name). Shipped kinds: ``hnsw`` (graph shards) and ``ivfsq``
(IVF-partitioned int8 codes with the frozen centroids + quantizer
stored IN the manifest params, so a time-travel serve decodes with
exactly the artifacts its version was encoded under). Artifacts live
under ``__idx_<name>/shard=<b>`` (legacy single-index manifests keep
their kind directory and read as name ``__legacy__``). Serves resolve
by ``name=``, defaulting to the unique index of the requested kind —
ambiguity errors rather than silently picking.

Round 13 opens the STRING-key lane: ``ivfsq`` attaches to a single
string (doc-id) key — its artifact carries ``vec_id`` as an opaque
payload the serve joins back to rows, so the dtype is free — while
``hnsw`` keeps the integral requirement (graph adjacency IS long node
ids) with an error that points string-key users at ivfsq. The remaining
boundary: a single key column (no composite keys).
"""

from __future__ import annotations

import json
import os
import re

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from semantic_index_spark.sources import versioned as VER

_INTEGRAL = {"byte", "short", "integer", "long"}

# index kind → LEGACY artifact directory (pre-multi-index manifests whose
# single anonymous spec reads as name "__legacy__"); partition columns of
# the staged shard write (shard first: shard b ≡ bucket b)
_IDX_DIRS = {"hnsw": "__hnsw", "ivfsq": "__ivfsq"}
_IDX_PARTS = {
    "hnsw": ["shard"],
    "ivfsq": ["shard", "_cell"],
    "ivfpq": ["shard", "_cell"],
}

_NAME_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def _idx_dir(name: str, params: dict) -> str:
    """The index's artifact directory inside each version dir. Named
    indexes (round 12, multi-index tables) get ``__idx_<name>`` so two
    indexes of the same kind never collide; a pre-r12 manifest's
    anonymous spec keeps its kind directory."""
    if name == "__legacy__":
        return _IDX_DIRS[params.get("kind", "hnsw")]
    return f"__idx_{name}"


def _check_attachable(
    man: dict, table: str, emb_col: str, name: str, allow_string: bool = False
) -> str:
    """Shared attach-time guards; returns the single key column. Integral
    keys work for every kind; ``allow_string`` adds the string-key lane
    (round 13) for kinds whose artifact carries ``vec_id`` as an opaque
    payload column (ivfsq — codes join back to rows by id, no arithmetic
    on it). HNSW stays integral: its graph adjacency IS long node ids."""
    if not _NAME_RE.fullmatch(name):
        raise ValueError(f"invalid index name {name!r}")
    if name in VER._indexes(man):
        raise ValueError(
            f"table {table} already carries a co-committed index named "
            f"{name!r} — detach it first or pick another name"
        )
    keys = man["key_cols"]
    if len(keys) != 1:
        raise ValueError(
            f"attach index: bucket-aligned shards need a single key "
            f"column, table has {keys}"
        )
    key = keys[0]
    fields = {f["name"]: f for f in json.loads(man["schema"])["fields"]}
    if emb_col not in fields:
        raise ValueError(f"attach index: no column {emb_col!r} on {table}")
    ktype = fields[key].get("type")
    if ktype not in _INTEGRAL and not (allow_string and ktype == "string"):
        hint = (
            " (string doc-id keys: use attach_ivfsq_index — HNSW graph "
            "node ids are longs)"
            if ktype == "string"
            else ""
        )
        raise ValueError(
            f"attach index: key {key!r} must be integral"
            f"{' or string' if allow_string else ''}, got {ktype}{hint}"
        )
    return key


def _resolve_index(man: dict, name: "str | None", kind: str) -> tuple:
    """(name, spec) of the index a serve should use: by ``name`` when
    given (kind-checked), else the UNIQUE index of ``kind`` — ambiguity
    is an error, never a silent pick."""
    idxs = VER._indexes(man)
    if name is not None:
        spec = idxs.get(name)
        if spec is None:
            raise ValueError(f"no co-committed index named {name!r}")
        if spec["params"].get("kind", "hnsw") != kind:
            raise ValueError(
                f"index {name!r} is kind "
                f"{spec['params'].get('kind', 'hnsw')!r}, not {kind!r}"
            )
        return name, spec
    of_kind = {
        n: s for n, s in idxs.items()
        if s["params"].get("kind", "hnsw") == kind
    }
    if not of_kind:
        raise ValueError(
            f"table has no co-committed {kind} index "
            f"(attach_{kind}_index)"
        )
    if len(of_kind) > 1:
        raise ValueError(
            f"table carries {len(of_kind)} {kind} indexes "
            f"({sorted(of_kind)}) — pass name="
        )
    return next(iter(of_kind.items()))


def _publish_index(
    table: str, man: dict, name: str, params: dict, idx: DataFrame
) -> int:
    """Stage the shard artifact and publish the attach commit: shared by
    every index kind. Conditional on the pointer AND marked as touching
    every bucket, so a concurrent data commit conflicts (an index built
    from pre-commit rows must not publish over it); retryable via
    ``retry_commit``. Other indexes on the table are untouched — their
    specs inherit through the manifest build."""
    staged = VER._staged_path(table)
    idx.write.mode("errorifexists").partitionBy(
        *_IDX_PARTS[params["kind"]]
    ).parquet(os.path.join(staged, _idx_dir(name, params)))

    def build(final: int, base_man: dict, dest: str) -> dict:
        manifest = {k: v for k, v in base_man.items() if k != "version"}
        manifest["version"] = final
        hdir = os.path.join(dest, _idx_dir(name, params))
        written = {
            int(d.split("=", 1)[1])
            for d in (os.listdir(hdir) if os.path.isdir(hdir) else [])
            if d.startswith("shard=")
        }
        indexes = {n: dict(s) for n, s in VER._indexes(base_man).items()}
        indexes[name] = {
            "params": params,
            "shards": {
                str(b): (final if b in written else None)
                for b in range(int(man["n_buckets"]))
            },
        }
        manifest.pop("index", None)  # legacy key re-keys under indexes
        manifest["indexes"] = indexes
        return manifest

    final, _ = VER._publish_bucketed(
        table, staged, man, set(range(int(man["n_buckets"]))), build,
        strict_meta=True,
    )
    return final


def attach_hnsw_index(
    spark: SparkSession,
    table: str,
    emb_col: str = "embedding",
    m: int = 8,
    ef_construction: int = 64,
    seed: int = 7,
    name: str = "hnsw",
) -> int:
    """Build a bucket-aligned HNSW index over the CURRENT table state and
    commit it as table metadata: the shard graphs stage under the commit's
    version directory (``v=<n>/__hnsw/shard=<b>``) and the manifest gains
    ``index = {params, shards}``. Conditional on the pointer AND marked as
    touching every bucket, so a concurrent data commit conflicts (an index
    built from pre-commit rows must not publish over it); retryable via
    ``retry_commit``. From this commit on, every ``merge_into_bucketed``
    rebuilds the affected shards inside its own staged commit — the index
    can never drift from the data."""
    from semantic_index_spark.operators.hnsw import build_hnsw

    man = VER._read_manifest(table)
    key = _check_attachable(man, table, emb_col, name)
    rows = VER.read_bucketed(spark, table).select(
        F.col(key).alias("vec_id"), F.col(emb_col).alias("embedding")
    )
    # shard hash == bucket hash: pmod(xxhash64(key), n_buckets) on the
    # key's manifest dtype, computed by build_hnsw exactly as _bucket_expr
    idx = build_hnsw(
        rows,
        n_shards=int(man["n_buckets"]),
        m=m,
        ef_construction=ef_construction,
        seed=seed,
    )
    params = {
        "kind": "hnsw",
        "emb_col": emb_col,
        "m": int(m),
        "ef_construction": int(ef_construction),
        "seed": int(seed),
    }
    return _publish_index(table, man, name, params, idx)


def _ivfsq_index_df(man: dict, rows: DataFrame, params: dict) -> DataFrame:
    """The IVF-SQ8 shard artifact for a set of table rows: (vec_id, int8
    codes, _cell, shard) — cell assignment and encoding are pure
    functions of (embedding, frozen manifest artifacts), and shard IS the
    row's bucket (``_bucket_expr`` on the key's manifest dtype), so a
    merge's rewritten-bucket rows rebuild exactly their own shards."""
    from semantic_index_spark.operators.similarity import ivf_assign, sq_codes_column

    p = params
    key = man["key_cols"][0]
    src = rows.select(
        F.col(key).alias("vec_id"),
        F.col(p["emb_col"]).alias("embedding"),
        VER._bucket_expr([key], int(man["n_buckets"])).alias("shard"),
    )
    # cell, codes and shard are all pure functions of the row — ONE narrow
    # projection (r13; the former sq_encode ⋈ assigned join re-shuffled the
    # rows by id to reunite them, guide §2.4)
    return ivf_assign(src, p["centroids"]).select(
        "vec_id",
        sq_codes_column(p["model"]).alias("codes"),
        "_cell",
        "shard",
    )


def attach_ivfsq_index(
    spark: SparkSession,
    table: str,
    emb_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 11,
    name: str = "ivfsq",
) -> int:
    """Attach a co-committed IVF-SQ8 index (round 12 — the second index
    kind, FAISS ``IVF,SQ8`` on the table-artifact contract): the current
    table state trains the int8 quantizer (``sq_train``) and fixes
    deterministic centroids; rows land as ``__ivfsq/shard=<b>/_cell=<c>``
    byte-code partitions in the attach commit's staged directory. The
    FROZEN artifacts (centroids + per-dim lo/step) live in the manifest
    params — re-encoding after any merge uses exactly the artifacts the
    rest of the index was encoded under, and a time-travel serve at
    version n decodes with version n's own params. Same crash/OCC
    contract as ``attach_hnsw_index``."""
    from semantic_index_spark.operators.similarity import make_centroids, sq_train

    man = VER._read_manifest(table)
    key = _check_attachable(man, table, emb_col, name, allow_string=True)
    rows = VER.read_bucketed(spark, table).select(
        F.col(key).alias(key), F.col(emb_col).alias(emb_col)
    )
    first = rows.select(F.size(emb_col).alias("d")).limit(1).collect()
    if not first:
        raise ValueError(f"attach_ivfsq_index: table {table} is empty")
    dim = int(first[0]["d"])
    model = sq_train(rows, emb_col=emb_col)
    params = {
        "kind": "ivfsq",
        "emb_col": emb_col,
        "centroids": make_centroids(int(n_cells), dim, seed),
        "model": model,
        "seed": int(seed),
    }
    idx = _ivfsq_index_df(man, rows, params)
    return _publish_index(table, man, name, params, idx)


def _ivfpq_index_df(man: dict, rows: DataFrame, params: dict) -> DataFrame:
    """The IVF-PQ shard artifact for a set of table rows: long-form
    (vec_id, sub, code, _cell, shard) PQ code rows — cell assignment and
    encoding are pure functions of (embedding, frozen manifest
    artifacts), so a merge's rewritten-bucket rows rebuild exactly their
    own shards, identically to the other kinds."""
    from semantic_index_spark.operators.similarity import ivf_assign, pq_codes_array

    p = params
    key = man["key_cols"][0]
    src = rows.select(
        F.col(key).alias("vec_id"),
        F.col(p["emb_col"]).alias("embedding"),
        VER._bucket_expr([key], int(man["n_buckets"])).alias("shard"),
    )
    # cell, codes and shard are all pure functions of the row — ONE narrow
    # projection + posexplode to the long form (r13; the former
    # pq_encode ⋈ assigned join re-shuffled the rows by id, guide §2.4)
    return ivf_assign(src, p["centroids"]).select(
        "vec_id",
        F.posexplode(pq_codes_array(p["codebooks"])).alias("sub", "code"),
        "_cell",
        "shard",
    )


def attach_ivfpq_index(
    spark: SparkSession,
    table: str,
    emb_col: str = "embedding",
    m_sub: int = 3,
    pq_k: int = 16,
    iters: int = 2,
    n_cells: int = 8,
    seed: int = 11,
    name: str = "ivfpq",
) -> int:
    """Attach a co-committed IVF-PQ index (round 13 — the THIRD index
    kind, FAISS ``IVF,PQ`` on the table-artifact contract; VERDICT r12
    task #3): the current table state trains per-subspace PQ codebooks
    (``pq_train_encode``'s Lloyd's loop) and fixes deterministic
    centroids; rows land as ``__idx_<name>/shard=<b>/_cell=<c>``
    long-form (vec_id, sub, code) partitions — ``m_sub`` small codes per
    vector, the best-compression family (16x+ vs floats), previously
    standalone-only (``write_ivfpq_index``) and thus without table
    atomicity or time travel. The FROZEN codebooks + centroids live in
    the manifest params, so every merge re-encodes its rewritten buckets
    against exactly the artifacts the rest of the index was encoded
    under, and a time-travel serve decodes version n with version n's
    own params. String keys ride (codes carry vec_id opaquely). Same
    crash/OCC contract as the other kinds."""
    from semantic_index_spark.operators.similarity import (
        make_centroids,
        pq_train_encode,
    )

    man = VER._read_manifest(table)
    key = _check_attachable(man, table, emb_col, name, allow_string=True)
    # ONE table read feeds both the trainer and the shard-artifact build
    # (r13: the artifact build re-called read_bucketed — a second manifest
    # walk + file listing + DV anti-join lineage for the same snapshot)
    tbl = VER.read_bucketed(spark, table)
    rows = tbl.select(
        F.col(key).alias("vec_id"), F.col(emb_col).alias("embedding")
    )
    first = rows.select(F.size("embedding").alias("d")).limit(1).collect()
    if not first:
        raise ValueError(f"attach_ivfpq_index: table {table} is empty")
    dim = int(first[0]["d"])
    if dim % m_sub != 0:
        raise ValueError(
            f"attach_ivfpq_index: dim {dim} not divisible by m_sub {m_sub}"
        )
    _, codebooks = pq_train_encode(rows, m_sub=m_sub, k=pq_k, iters=iters)
    params = {
        "kind": "ivfpq",
        "emb_col": emb_col,
        "centroids": make_centroids(int(n_cells), dim, seed),
        "codebooks": codebooks,
        "seed": int(seed),
    }
    idx = _ivfpq_index_df(man, tbl, params)
    return _publish_index(table, man, name, params, idx)


def indexed_ivfpq_topk(
    spark: SparkSession,
    table: str,
    query,
    k: int = 10,
    nprobe: int = 2,
    candidates: int = 50,
    version: int | None = None,
    name: str | None = None,
) -> DataFrame:
    """Serve top-k from the table's co-committed IVF-PQ index AT a table
    version (default latest). Two-stage: (1) planning-time ``_cell``
    pruning to ``nprobe`` cells, asymmetric-distance (ADC) scan of the
    PQ codes via a broadcast (sub, code) → distance lookup table into a
    bounded minimum-L2 candidate set — the corpus floats are never read;
    (2) exact dot rescore against THIS VERSION's table rows
    (``read_bucketed``, deletion vectors already applied — a DV-deleted
    candidate drops at the rescore join, the tombstone contract).
    Columns: ``(vec_id, score)``, exact-dot scores — the same serve
    contract as the other kinds (nprobe = n_cells + candidate slack ⇒
    exhaustive-exact). The candidate stage minimizes L2 ADC distance
    while the rescore maximizes dot — consistent for the unit-norm-ish
    embeddings PQ serves; the exhaustive configuration is metric-
    independent."""
    from semantic_index_spark.operators.similarity import (
        _probe_cells,
        pq_topk,
        rerank_exact,
    )

    man = VER._read_manifest(table, version)
    _, spec = _resolve_index(man, name, "ivfpq")
    p = spec["params"]
    key = man["key_cols"][0]
    fields = {f["name"]: f for f in json.loads(man["schema"])["fields"]}
    ktype = fields[key].get("type")
    idx = _read_index_shards(spark, table, man, name=name, kind="ivfpq")
    if idx is None:
        return _empty_serve(
            spark, "string" if ktype == "string" else "long"
        )
    probe = _probe_cells(query, p["centroids"], nprobe)
    codes = idx.filter(F.col("_cell").isin(probe))
    cand = pq_topk(codes, p["codebooks"], query, k_results=candidates).select(
        "vec_id"
    )
    kc = F.col(key)
    if ktype in _INTEGRAL:
        kc = kc.cast("long")
    vectors = VER.read_bucketed(spark, table, version=version).select(
        kc.alias("vec_id"),
        F.col(p["emb_col"]).alias("embedding"),
    )
    return rerank_exact(vectors, cand, query, k=k)


def detach_index(table: str, name: "str | None" = None) -> int:
    """Drop ONE co-committed index (by ``name``; optional while the table
    carries exactly one): a METADATA-ONLY commit whose manifest omits
    that spec — no shard file is touched (retained manifests still
    reference them for time travel; ``expire_bucketed`` reclaims them
    once those manifests age out). After the LAST index detaches, merges
    stop maintaining shards and the embedding column drops/renames
    freely — the verb the drop/rename guards point at. Conflicts with
    ANY concurrent commit (all buckets marked affected + strict
    metadata): a merge that planned index maintenance must not land
    after the spec is gone."""
    man = VER._read_manifest(table)
    idxs = VER._indexes(man)
    if not idxs:
        raise ValueError(f"table {table} has no co-committed index to detach")
    if name is None:
        if len(idxs) > 1:
            raise ValueError(
                f"table {table} carries {len(idxs)} indexes "
                f"({sorted(idxs)}) — pass name="
            )
        name = next(iter(idxs))
    elif name not in idxs:
        raise ValueError(f"table {table} has no co-committed index named {name!r}")
    staged = VER._staged_path(table)
    os.makedirs(staged)

    def build(final: int, base_man: dict, dest: str) -> dict:
        manifest = {
            k: v
            for k, v in base_man.items()
            if k not in ("version", "index", "indexes")
        }
        manifest["version"] = final
        keep = {
            n: dict(s) for n, s in VER._indexes(base_man).items() if n != name
        }
        if keep:
            manifest["indexes"] = keep
        return manifest

    final, _ = VER._publish_bucketed(
        table, staged, man, set(range(int(man["n_buckets"]))), build,
        strict_meta=True,
    )
    return final


# kind-era alias (pre-r12 API): detaches by name like detach_index
detach_hnsw_index = detach_index


def _stage_merge_index(spark, man: dict, result: DataFrame, affected):
    """The merge-side maintenance hook (called by ``merge_into_bucketed``
    when the manifest carries an index): build the affected buckets'
    replacement shard graphs from the merge's OWN rewritten-bucket rows
    and return (stage, finalize) callbacks for ``_commit_bucketed`` —
    stage writes the graphs into the merge's staged directory, finalize
    advances ``index.shards`` for the affected buckets in the same
    manifest (inheriting every other shard's owner from the manifest the
    commit lands on, so a disjoint-bucket rebase keeps both writers'
    shards exactly like it keeps both writers' buckets). Round 12:
    EVERY index the manifest carries rebuilds in the same commit — one
    shard-build per (index, affected bucket), dispatched on each spec's
    ``params.kind`` (hnsw rebuilds shard graphs, ivfsq re-encodes against
    that index's frozen quantizer/centroids)."""
    key = man["key_cols"][0]
    built: dict[str, DataFrame] = {}
    for iname, spec in VER._indexes(man).items():
        p = spec["params"]
        kind = p.get("kind", "hnsw")
        if kind == "hnsw":
            from semantic_index_spark.operators.hnsw import build_hnsw

            built[iname] = build_hnsw(
                result.select(
                    F.col(key).alias("vec_id"),
                    F.col(p["emb_col"]).alias("embedding"),
                ),
                n_shards=int(man["n_buckets"]),
                m=p["m"],
                ef_construction=p["ef_construction"],
                seed=p["seed"],
            )
        elif kind == "ivfpq":
            built[iname] = _ivfpq_index_df(man, result, p)
        else:
            built[iname] = _ivfsq_index_df(man, result, p)

    def stage(staged: str) -> None:
        # the per-index shard writes are independent jobs over the SAME
        # checkpointed merge result into DISJOINT staged subdirectories —
        # submit them concurrently (Spark contexts accept multi-threaded
        # job submission) so a 3-index table pays max(write) not Σ(write)
        # per merge; any failure propagates before the commit publishes
        # (r13, guide §1.2). Sequential fallback for a single index.
        def _write(item):
            iname, idx = item
            p = VER._indexes(man)[iname]["params"]
            idx.write.mode("errorifexists").partitionBy(
                *_IDX_PARTS[p.get("kind", "hnsw")]
            ).parquet(os.path.join(staged, _idx_dir(iname, p)))

        items = list(built.items())
        if len(items) == 1:
            _write(items[0])
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=len(items)) as pool:
                for _ in pool.map(_write, items):
                    pass

    def finalize(manifest: dict, final: int, base_man, dest: str) -> dict:
        base_idxs = VER._indexes(base_man) or VER._indexes(man)
        indexes = {}
        for iname, spec in VER._indexes(man).items():
            p = spec["params"]
            hdir = os.path.join(dest, _idx_dir(iname, p))
            written = {
                int(d.split("=", 1)[1])
                for d in (os.listdir(hdir) if os.path.isdir(hdir) else [])
                if d.startswith("shard=")
            }
            shards = dict((base_idxs.get(iname) or spec)["shards"])
            for b in affected:
                shards[str(b)] = final if b in written else None
            indexes[iname] = {"params": dict(p), "shards": shards}
        manifest.pop("index", None)  # legacy key re-keys under indexes
        manifest["indexes"] = indexes
        return manifest

    return stage, finalize


def indexed_hnsw_topk(
    spark: SparkSession,
    table: str,
    query,
    k: int = 10,
    ef: int | None = 64,
    version: int | None = None,
    max_blocked: int = 10_000_000,
    name: str | None = None,
) -> DataFrame:
    """Serve top-k from the table's co-committed index AT a table version
    (default latest) — the whole point of the design: the manifest the
    read resolves names BOTH the bucket data and the shard graphs of one
    consistent commit, so the serve can never rank a row the table
    version doesn't contain (crash-simulation pytest) and time travel
    serves historical versions from their own shards. Deletion vectors
    recorded at or before the version apply as serve-time tombstones.
    Columns: ``(vec_id, score)`` — the ``hnsw_topk`` contract
    (``ef=None`` = exhaustive/exact)."""
    from semantic_index_spark.operators.hnsw import hnsw_topk

    man = VER._read_manifest(table, version)
    if not VER._indexes(man):
        raise ValueError(
            f"table {table} has no co-committed index (attach_hnsw_index)"
        )
    idx = _read_index_shards(spark, table, man, name=name, kind="hnsw")
    if idx is None:
        return _empty_serve(spark)
    blocked = None
    dv_paths = VER._dv_paths(table, man)
    if dv_paths:
        import pyspark.sql.functions as _F

        from semantic_index_spark.session import collect_bounded

        key = man["key_cols"][0]
        phys = VER._colmap(man).get(key, key)  # DV files store PHYSICAL names
        rows = collect_bounded(
            spark.read.parquet(*dv_paths)
            .select(_F.col(phys).alias(key))
            .distinct(),
            max_blocked,
            "indexed_hnsw_topk DV tombstones",
        )
        blocked = {int(r[key]) for r in rows}
    return hnsw_topk(idx, query, k=k, ef=ef, blocked=blocked)


def _empty_serve(spark: SparkSession, id_type: str = "long") -> DataFrame:
    from pyspark.sql.types import StructType

    return spark.createDataFrame(
        [], StructType.fromDDL(f"vec_id {id_type}, score double")
    )


def _read_index_shards(
    spark: SparkSession, table: str, man: dict, name: "str | None" = None,
    kind: str = "ivfsq",
):
    """Union ONE index's shard partitions ACROSS owning versions — one
    read per owning version with basePath (recovering the partition
    columns), exactly the grouping ``read_bucketed`` does for buckets.
    Returns None when no shard has an owner (empty table)."""
    iname, spec = _resolve_index(man, name, kind)
    idx_dir = _idx_dir(iname, spec["params"])
    by_version: dict = {}
    for b, v in spec["shards"].items():
        if v is not None:
            by_version.setdefault(int(v), []).append(int(b))
    parts = []
    for v, bs in sorted(by_version.items()):
        base = os.path.join(table, f"v={v}", idx_dir)
        parts.append(
            spark.read.option("basePath", base).parquet(
                *[os.path.join(base, f"shard={b}") for b in sorted(bs)]
            )
        )
    if not parts:
        return None
    idx = parts[0]
    for extra in parts[1:]:
        idx = idx.unionByName(extra)
    return idx


def indexed_ivfsq_topk(
    spark: SparkSession,
    table: str,
    query,
    k: int = 10,
    nprobe: int = 2,
    candidates: int = 50,
    version: int | None = None,
    name: str | None = None,
) -> DataFrame:
    """Serve top-k from the table's co-committed IVF-SQ8 index AT a table
    version (default latest): the manifest names both the byte-code
    shards and the bucket data of ONE consistent commit, and the frozen
    centroids/quantizer ride the same manifest, so a time-travel serve
    probes and decodes with its version's own artifacts. Two-stage
    probe: (1) planning-time ``_cell`` partition pruning to ``nprobe``
    cells, asymmetric scan of int8 codes only into a bounded
    top-``candidates`` set; (2) exact rescore against THIS VERSION's
    table rows (``read_bucketed``, deletion vectors already applied — a
    DV-deleted candidate drops at the rescore join, the tombstone
    contract; size ``candidates`` with the usual slack). Columns:
    ``(vec_id, score)``, exact-dot scores. Approximation contract =
    ``ivfsq_topk_indexed``'s (exact within probed cells given enough
    candidates; nprobe = n_cells ⇒ exhaustive-exact)."""
    from semantic_index_spark.operators.similarity import (
        _probe_cells,
        sq_topk_rescore,
    )

    man = VER._read_manifest(table, version)
    if not any(
        s.get("params", {}).get("kind") == "ivfsq"
        for s in VER._indexes(man).values()
    ):
        raise ValueError(
            f"table {table} has no co-committed IVF-SQ8 index "
            "(attach_ivfsq_index)"
        )
    _, spec = _resolve_index(man, name, "ivfsq")
    p = spec["params"]
    key = man["key_cols"][0]
    fields = {f["name"]: f for f in json.loads(man["schema"])["fields"]}
    ktype = fields[key].get("type")
    idx = _read_index_shards(spark, table, man, name=name, kind="ivfsq")
    if idx is None:
        return _empty_serve(
            spark, "string" if ktype == "string" else "long"
        )
    probe = _probe_cells(query, p["centroids"], nprobe)
    codes = idx.filter(F.col("_cell").isin(probe))
    # integral keys serve as longs (the historical vec_id contract);
    # string keys ride through NATURALLY — the r13 string-key lane (a
    # cast-to-long would null every string doc id)
    kc = F.col(key)
    if ktype in _INTEGRAL:
        kc = kc.cast("long")
    vectors = VER.read_bucketed(spark, table, version=version).select(
        kc.alias("vec_id"),
        F.col(p["emb_col"]).alias("embedding"),
    )
    return sq_topk_rescore(
        codes, vectors, p["model"], query, k=k, candidates=candidates
    )
