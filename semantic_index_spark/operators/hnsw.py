"""Sharded HNSW approximate-nearest-neighbor index.

[absent in reference — north-star extension]. The reference's only search
is brute-force exact KNN (`SemanticDatabase.cs:268-308`); this module adds
the one mainstream ANN family the repo did not yet cover (IVF/PQ/SQ8/LSH
live in ``operators/similarity.py``). The design is the standard
distributed-ANN serving shape (Milvus/Vespa segments): the corpus is hash-
sharded, each shard builds an INDEPENDENT small-world graph inside one
``applyInPandas`` task, and a query scatter-gathers — every shard answers
from its own graph in parallel and a bounded global top-k merge
(``TakeOrderedAndProject``) picks the winners. Nothing about a shard's
graph depends on any other shard, so build parallelism, incremental
re-shard, and query fan-out all come for free from Spark's partitioning.

Scale notes (100 TB):
  * build: one graph per shard, each O(n_shard · ef_c · M) — pick
    ``n_shards`` so a shard's vectors + adjacency fit one executor's
    memory (the same sizing rule as IVF ``files_per_cell``). Shards never
    co-reside; ``applyInPandas`` streams one group per task.
  * query: cost is n_shards parallel beam searches of O(ef · M · log n)
    plus a k-row-per-shard merge — per-query latency is flat in corpus
    size at fixed shard size, the property IVF probing cannot offer when
    cells skew.
  * storage: one row per node ``(shard, id, embedding, max_level,
    neighbors[layer][...])`` written ``partitionBy(_shard)`` so a search
    scans shards in parallel and a single-shard rebuild rewrites one
    directory.

Determinism contract (what the oracle + tests rely on):
  * shard assignment ``pmod(xxhash64(id), n_shards)`` — engine-stable;
  * node levels derive from a splitmix64 hash of (id, seed), never RNG
    state, so ANY insertion parallelism yields the same levels;
  * insertion order is ascending id; every neighbor choice breaks distance
    ties by ascending id; float work is numpy float64 dots.
  * the base layer additionally carries a chain edge between id-adjacent
    nodes, which makes layer 0 CONNECTED by construction. Exhaustive mode
    (``ef=None``) therefore provably visits every node of every shard and
    returns the exact global top-k — that is the hash-checked registry
    contract; approximate mode (real ``ef``) is recall-tested in pytest
    (`tests/test_new_operators.py`).
"""

from __future__ import annotations

import heapq
import math
from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_INDEX_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
        StructField("max_level", IntegerType()),
        StructField("neighbors", ArrayType(ArrayType(LongType()))),
    ]
)


def _splitmix64(x: int) -> int:
    """Deterministic 64-bit mix (public splitmix64 constants) — the level
    source. Hashing the id instead of drawing RNG state keeps levels
    independent of insertion parallelism and engine."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _node_level(node_id: int, seed: int, m_l: float) -> int:
    h = _splitmix64((node_id << 1) ^ _splitmix64(seed))
    # map to (0, 1]; 0 is excluded so log() is finite
    u = (h + 1) / 18446744073709551617.0
    return int(-math.log(u) * m_l)


def _search_layer(q, entry, ef, adj, vecs, visited=None):
    """Beam search one layer: returns up to ``ef`` (dist, id) pairs,
    nearest first. ``dist`` = -dot (higher dot = nearer); ties break on
    ascending id everywhere."""
    import numpy as np

    if visited is None:
        visited = set()
    cand = []  # min-heap by (dist, id): best candidate first
    result = []  # max-heap by (-dist, -id): worst kept result first
    for e in entry:
        if e in visited:
            continue
        visited.add(e)
        d = -float(np.dot(q, vecs[e]))
        heapq.heappush(cand, (d, e))
        heapq.heappush(result, (-d, -e))
        if len(result) > ef:
            heapq.heappop(result)
    while cand:
        d, c = heapq.heappop(cand)
        if len(result) >= ef and d > -result[0][0]:
            break
        for nb in adj.get(c, ()):
            if nb in visited:
                continue
            visited.add(nb)
            dn = -float(np.dot(q, vecs[nb]))
            if len(result) < ef or dn < -result[0][0] or (
                dn == -result[0][0] and nb < -result[0][1]
            ):
                heapq.heappush(cand, (dn, nb))
                heapq.heappush(result, (-dn, -nb))
                if len(result) > ef:
                    heapq.heappop(result)
    return sorted(((-nd, -ni) for nd, ni in result))


def _build_shard(ids, vec_mat, m, ef_construction, seed):
    """Insert nodes in ascending-id order with the standard HNSW procedure;
    returns {id: [layer0_neighbors, layer1_neighbors, ...]}."""
    import numpy as np

    m_l = 1.0 / math.log(m)
    order = np.argsort(ids, kind="stable")
    vecs = {int(ids[i]): vec_mat[i] for i in range(len(ids))}
    levels = {int(i): _node_level(int(i), seed, m_l) for i in ids}
    # adj[layer][id] -> list of neighbor ids
    adj: list[dict] = []
    entry_id = None
    entry_level = -1

    def _link(layer, a, b, cap):
        lst = adj[layer].setdefault(a, [])
        if b in lst:
            return
        lst.append(b)
        if len(lst) > cap:
            # keep the ``cap`` nearest by (dist, id)
            va = vecs[a]
            lst.sort(key=lambda x: (-float(np.dot(va, vecs[x])), x))
            del lst[cap:]

    for pos in order:
        nid = int(ids[pos])
        lvl = levels[nid]
        while len(adj) <= lvl:
            adj.append({})
        if entry_id is None:
            adj[0].setdefault(nid, [])
            entry_id, entry_level = nid, lvl
            continue
        q = vecs[nid]
        ep = [entry_id]
        for layer in range(entry_level, lvl, -1):
            if layer >= len(adj):
                continue
            near = _search_layer(q, ep, 1, adj[layer], vecs)
            if near:
                ep = [near[0][1]]
        for layer in range(min(lvl, entry_level), -1, -1):
            cands = _search_layer(q, ep, ef_construction, adj[layer], vecs)
            cap = m if layer > 0 else 2 * m
            chosen = [c for _, c in cands[:m]]
            adj[layer].setdefault(nid, [])
            for c in chosen:
                _link(layer, nid, c, cap)
                _link(layer, c, nid, cap)
            ep = [c for _, c in cands] or ep
        if lvl > entry_level:
            entry_id, entry_level = nid, lvl

    # connectivity guarantee: chain id-adjacent nodes at layer 0 so the
    # base layer is ONE component — exhaustive search is then provably
    # exact. Chain edges are appended, never pruned.
    sorted_ids = sorted(int(i) for i in ids)
    for a, b in zip(sorted_ids, sorted_ids[1:]):
        la = adj[0].setdefault(a, [])
        lb = adj[0].setdefault(b, [])
        if b not in la:
            la.append(b)
        if a not in lb:
            lb.append(a)

    out = {}
    for nid in sorted_ids:
        lvl = levels[nid]
        out[nid] = [list(adj[layer].get(nid, [])) for layer in range(lvl + 1)]
    return out, levels


def build_hnsw(
    df: DataFrame,
    n_shards: int = 4,
    m: int = 8,
    ef_construction: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Build the sharded index: one independent HNSW graph per hash shard,
    each inside a single ``applyInPandas`` task. Output schema:
    ``(shard, id, embedding, max_level, neighbors array<array<long>>)``
    with ``neighbors[l]`` the layer-l adjacency of the node."""

    def _build(pdf):
        import numpy as np
        import pandas as pd

        shard = int(pdf["shard"].iloc[0])
        ids = pdf["id"].to_numpy()
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["emb"]])
        adj, levels = _build_shard(ids, mat, m, ef_construction, seed)
        vecs = {int(ids[i]): pdf["emb"].iloc[i] for i in range(len(ids))}
        rows = sorted(adj)
        return pd.DataFrame(
            {
                "shard": [shard] * len(rows),
                "id": rows,
                "embedding": [list(map(float, vecs[i])) for i in rows],
                "max_level": [levels[i] for i in rows],
                "neighbors": [adj[i] for i in rows],
            }
        )

    prepared = df.select(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int").alias("shard"),
        F.col(id_col).cast("long").alias("id"),
        F.col(emb_col).cast("array<double>").alias("emb"),
    )
    return prepared.groupBy("shard").applyInPandas(_build, _INDEX_SCHEMA)


def write_hnsw_index(index: DataFrame, path: str) -> None:
    """Persist ``partitionBy(shard)`` — a query scans all shard directories
    in parallel; a single-shard rebuild rewrites exactly one directory
    (dynamic partition overwrite, same contract as the IVF layouts)."""
    index.write.mode("overwrite").partitionBy("shard").parquet(path)


def _search_shard_pdf(pdf, q, k, ef):
    """Search ONE shard's graph for one query; returns [(id, score)] of the
    per-shard top-k (exact scores, HALF_UP-rounded to 6)."""
    import numpy as np

    ids = pdf["id"].to_numpy()
    vecs = {
        int(ids[i]): np.asarray(pdf["embedding"].iloc[i], dtype=np.float64)
        for i in range(len(ids))
    }
    levels = pdf["max_level"].to_numpy()
    nbrs = pdf["neighbors"]
    adj_by_layer: list[dict] = [{}]
    for i in range(len(ids)):
        node = int(ids[i])
        for layer, lst in enumerate(nbrs.iloc[i]):
            while len(adj_by_layer) <= layer:
                adj_by_layer.append({})
            adj_by_layer[layer][node] = [int(x) for x in lst]
    # entry point: max level, then min id — derivable, not stored
    top = min(int(levels.max()), len(adj_by_layer) - 1)
    entry_candidates = [int(ids[i]) for i in range(len(ids)) if levels[i] >= top]
    ep = [min(entry_candidates)]
    # ef=None → exhaustive: beam width = shard size never prunes, and the
    # base layer is connected by the builder's chain edges, so the
    # traversal provably visits EVERY node — exact result via the same
    # pointer-chasing code path the approximate mode uses.
    beam = len(ids) if ef is None else max(ef, k)
    for layer in range(top, 0, -1):
        near = _search_layer(q, ep, 1, adj_by_layer[layer], vecs)
        if near:
            ep = [near[0][1]]
    scored = _search_layer(q, ep, beam, adj_by_layer[0], vecs)
    if ef is None and len(scored) != len(ids):  # pragma: no cover
        raise AssertionError(
            f"exhaustive HNSW traversal visited {len(scored)}/{len(ids)} "
            "nodes — base layer not connected (corrupt index?)"
        )
    out = []
    for d, i in scored[:k]:
        s = -d
        out.append((i, math.copysign(math.floor(abs(s) * 1e6 + 0.5) / 1e6, s)))
    return out


def hnsw_topk(
    index: DataFrame,
    query: Sequence[float],
    k: int = 10,
    ef: int | None = 64,
) -> DataFrame:
    """Scatter-gather search: each shard beam-searches its own graph
    (``ef=None`` → exhaustive/exact), emits its local top-k with EXACT
    dot scores, and a global ``orderBy(score desc, id).limit(k)`` merge
    (``TakeOrderedAndProject`` over n_shards·k rows) picks the answer.
    Columns: ``(vec_id, score)`` — same contract as ``similarity.topk``."""
    import numpy as np
    import pandas as pd

    qv = [float(x) for x in query]
    out_schema = StructType(
        [StructField("vec_id", LongType()), StructField("score", DoubleType())]
    )

    def _search(pdf):
        hits = _search_shard_pdf(pdf, np.asarray(qv, dtype=np.float64), k, ef)
        return pd.DataFrame(
            {"vec_id": [i for i, _ in hits], "score": [s for _, s in hits]}
        )

    per_shard = index.groupBy("shard").applyInPandas(_search, out_schema)
    return per_shard.orderBy(F.desc("score"), F.asc("vec_id")).limit(k)


def hnsw_topk_indexed(
    spark: SparkSession,
    path: str,
    query: Sequence[float],
    k: int = 10,
    ef: int | None = 64,
) -> DataFrame:
    """Search a persisted :func:`write_hnsw_index` layout."""
    return hnsw_topk(spark.read.parquet(path), query, k=k, ef=ef)
