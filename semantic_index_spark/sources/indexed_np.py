"""Spark-FREE co-committed index shard builders (round 13 — VERDICT r12
task #4): the SQL front door's ``INSERT INTO`` commits in a Python
worker with no SparkSession, so an indexed table's shard rebuilds must
run on numpy/pyarrow alone. Every encoder here replicates its Spark
expression BIT-FOR-BIT:

- dots and squared distances are SEQUENTIAL per-dimension folds
  (``acc = (acc + x_d * y_d)``), matching ``functions.vector.dot``'s
  ``F.aggregate`` left fold — a BLAS ``matmul`` would reassociate the
  sum and could flip a near-tie cell assignment;
- IVF cell assignment mirrors ``ivf_assign``'s ``method="auto"`` split
  exactly: k ≤ 16 → fold dots + first-max argmax (the ``expr`` path's
  ``array_position(dots, array_max(dots))``), k > 16 → float64
  ``matmul`` + argmax (the ``arrow`` path's own formula);
- SQ8 codes run the identical clamped ``floor((v - lo)/step + 0.5)``
  double arithmetic; PQ codes take the first-minimum (= smallest code,
  ``min_by`` struct tie-break) over sequentially-folded subspace
  distances;
- HNSW shards call the SAME pure-Python ``_build_shard`` the Spark
  path's ``applyInPandas`` task calls — one implementation, zero drift
  (the graph is a function of the id set, not insertion order).

Equivalence is pytest-locked: a SQL INSERT's worker-built shards must
serve identically to a Spark-side ``merge_into_bucketed`` rebuild of
the same rows (``test_r13_sql_insert_indexed_tables``).
"""

from __future__ import annotations

import os


def _fold_dot(mat, vec):
    """Sequential per-dim fold of mat @ vec — bit-exact with
    ``functions.vector.dot``'s aggregate left fold (NOT a BLAS dot)."""
    import numpy as np

    acc = np.zeros(mat.shape[0], dtype=np.float64)
    for d in range(mat.shape[1]):
        acc = acc + mat[:, d] * vec[d]
    return acc


def _fold_sqdist(mat, vec):
    """Sequential fold of sum((x-y)^2) — ``similarity._sq_dist``."""
    import numpy as np

    acc = np.zeros(mat.shape[0], dtype=np.float64)
    for d in range(mat.shape[1]):
        diff = mat[:, d] - vec[d]
        acc = acc + diff * diff
    return acc


def ivf_cells_np(mat, centroids):
    """``ivf_assign(method="auto")`` in numpy: k ≤ 16 mirrors the expr
    path (per-centroid fold dots, first-max argmax == array_position of
    array_max), k > 16 mirrors the arrow path (float64 matmul + argmax
    — that path's OWN formula, so parity holds per k regime)."""
    import numpy as np

    k = len(centroids)
    C = np.asarray([[float(x) for x in c] for c in centroids], dtype=np.float64)
    if k <= 16:
        dots = np.stack([_fold_dot(mat, C[i]) for i in range(k)], axis=1)
    else:
        dots = mat @ C.T
    return np.argmax(dots, axis=1).astype(np.int32)


def sq_codes_np(mat, model):
    """``similarity.sq_encode`` in numpy: code = clamp(floor((v - lo) /
    step + 0.5), 0..255) - 128 as int8; step == 0 dims encode to 0
    (stored -128) — the identical double expression."""
    import numpy as np

    lo = np.asarray(model["lo"], dtype=np.float64)
    step = np.asarray(model["step"], dtype=np.float64)
    safe = np.where(step == 0.0, 1.0, step)
    code = np.floor((mat - lo) / safe + 0.5)
    code = np.clip(code, 0.0, 255.0)
    code = np.where(step == 0.0, 0.0, code)
    return (code - 128.0).astype(np.int8)


def pq_codes_np(mat, codebooks):
    """``similarity.pq_encode`` in numpy: per subspace, the argmin over
    codebook entries of the sequentially-folded squared distance;
    ``np.argmin`` takes the FIRST minimum = the smallest code, the
    ``min_by(struct(d, code))`` tie-break. Returns (n, m_sub) int32."""
    import numpy as np

    m_sub = len(codebooks)
    subdim = len(codebooks[0][0])
    n = mat.shape[0]
    out = np.empty((n, m_sub), dtype=np.int32)
    for s in range(m_sub):
        sub = mat[:, s * subdim : (s + 1) * subdim]
        d = np.stack(
            [
                _fold_sqdist(sub, np.asarray(c, dtype=np.float64))
                for c in codebooks[s]
            ],
            axis=1,
        )
        out[:, s] = np.argmin(d, axis=1)
    return out


def _emb_matrix(tbl, emb_col):
    """(n, d) float64 matrix from an arrow list column — float32 source
    columns widen exactly, matching Spark's ``cast("array<double>")``."""
    import numpy as np

    col = tbl.column(emb_col)
    rows = col.to_pylist()
    return np.asarray(rows, dtype=np.float64)


def write_index_shard_np(
    staged: str,
    idx_dir: str,
    bucket: int,
    params: dict,
    tbl,
    key: str,
) -> None:
    """Build ONE index's shard for ONE rewritten bucket from the merged
    bucket content (arrow table, LOGICAL column names) and write it into
    the staged commit directory with the exact partition layout and file
    schema the Spark-side ``partitionBy`` writers produce — readers
    cannot tell which engine built a shard."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    kind = params.get("kind", "hnsw")
    mat = _emb_matrix(tbl, params["emb_col"])
    ids = tbl.column(key)
    if kind == "hnsw":
        from semantic_index_spark.operators.hnsw import _build_shard

        id64 = ids.to_numpy(zero_copy_only=False).astype("int64")
        adj, levels = _build_shard(
            id64, mat, params["m"], params["ef_construction"], params["seed"]
        )
        order = sorted(adj)
        vecs = {int(id64[i]): mat[i] for i in range(len(id64))}
        out = pa.table(
            {
                "id": pa.array(order, pa.int64()),
                "embedding": pa.array(
                    [[float(x) for x in vecs[i]] for i in order],
                    pa.list_(pa.float64()),
                ),
                "max_level": pa.array(
                    [levels[i] for i in order], pa.int32()
                ),
                "neighbors": pa.array(
                    [adj[i] for i in order], pa.list_(pa.list_(pa.int64()))
                ),
            }
        )
        d = os.path.join(staged, idx_dir, f"shard={int(bucket)}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(out, os.path.join(d, "part-00000.parquet"))
        return
    cells = ivf_cells_np(mat, params["centroids"])
    if kind == "ivfsq":
        codes = sq_codes_np(mat, params["model"])
        for c in np.unique(cells):
            m = cells == c
            out = pa.table(
                {
                    "vec_id": ids.filter(pa.array(m)).combine_chunks(),
                    "codes": pa.array(
                        [row.tolist() for row in codes[m]],
                        pa.list_(pa.int8()),
                    ),
                }
            )
            d = os.path.join(
                staged, idx_dir, f"shard={int(bucket)}", f"_cell={int(c)}"
            )
            os.makedirs(d, exist_ok=True)
            pq.write_table(out, os.path.join(d, "part-00000.parquet"))
        return
    if kind == "ivfpq":
        pqc = pq_codes_np(mat, params["codebooks"])
        m_sub = pqc.shape[1]
        for c in np.unique(cells):
            m = cells == c
            import pyarrow.compute as pc

            sel = ids.filter(pa.array(m)).combine_chunks()
            n_sel = len(sel)
            # long-form (vec_id, sub, code) rows
            idx_take = np.tile(np.arange(n_sel), m_sub)
            vec_long = pc.take(sel, pa.array(idx_take, pa.int64()))
            sub_long = np.repeat(np.arange(m_sub, dtype=np.int32), n_sel)
            code_long = pqc[m].T.reshape(-1).astype(np.int32)
            out = pa.table(
                {
                    "vec_id": vec_long,
                    "sub": pa.array(sub_long, pa.int32()),
                    "code": pa.array(code_long, pa.int32()),
                }
            )
            d = os.path.join(
                staged, idx_dir, f"shard={int(bucket)}", f"_cell={int(c)}"
            )
            os.makedirs(d, exist_ok=True)
            pq.write_table(out, os.path.join(d, "part-00000.parquet"))
        return
    raise ValueError(f"unknown co-committed index kind {kind!r}")
