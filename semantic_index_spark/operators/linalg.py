"""Distributed linear algebra over embedding columns: covariance + PCA.

[absent in reference — north-star extension] The standard embedding
pipeline steps the reference's brute-force scan never needs but a 100 TB
corpus does: estimate the d×d covariance of an `array<float>` column in
ONE pass, take the top-k principal components on the driver (d×d is tiny —
64×64 here, 4096 doubles even at 100 TB of rows), and project the corpus
onto them with pure JVM expressions. Dim-reduced embeddings cut ANN
storage/compute ~d/k× with bounded recall loss — the classic pre-step for
IVF/LSH retrieval (see operators.similarity) and SemDeDup-style clustering.

Scale shape: `mapInPandas` computes per-PARTITION Gram partials (one d×d
numpy matrix per partition, BLAS `X.T @ X` over Arrow batches — never a
per-row explode of d² pairs), so the shuffle carries ≤ partitions·(d²+d+1)
tiny rows into a groupBy over ≤ d²+d+1 keys. Partials are `+`-mergeable —
the same incremental property as the HLL/CMS/histogram sketches, so
per-day covariances fold into a corpus covariance without re-scanning
history. Only the d×d result ever reaches the driver (like k-means'
k·d centroid collect); eigendecomposition is O(d³) driver-side numpy.
Projection is k literal-vector dot products — whole-stage codegen, no
Python, no join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from semantic_index_spark.session import collect_bounded
from pyspark.sql import Column, DataFrame

from semantic_index_spark.functions.vector import dot_literal

_ENTRY_SCHEMA = "i int, j int, v double"


def covariance_entries(df: DataFrame, col: str, dim: int) -> DataFrame:
    """One-pass sufficient statistics for the covariance of ``df[col]``:
    rows ``(i, j, v)`` where (i≥0, j≥0) carries Σ e_i·e_j (upper triangle,
    i ≤ j), (i, -1) carries Σ e_i, and (-1, -1) carries n. Mergeable by
    summing ``v`` per (i, j) — union entries from several epochs and
    groupBy-sum to get the union's statistics exactly. NULL vectors are
    skipped (JVM-side, like every sketch builder); a WRONG-LENGTH vector
    raises a clear ValueError rather than a numpy shape error."""
    if dim < 1:
        raise ValueError(f"covariance_entries: need dim >= 1, got {dim}")

    def _partials(batches):
        import numpy as np
        import pandas as pd

        n = 0
        s = np.zeros(dim, dtype=np.float64)
        gram = np.zeros((dim, dim), dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = list(pdf[col])
            bad = {len(v) for v in vecs if len(v) != dim}
            if bad:
                raise ValueError(
                    f"covariance_entries: expected dim {dim}, got {sorted(bad)}"
                )
            x = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
            n += x.shape[0]
            s += x.sum(axis=0)
            gram += x.T @ x
        iu, ju = [], []
        for a in range(dim):
            for b in range(a, dim):
                iu.append(a)
                ju.append(b)
        out = pd.DataFrame(
            {
                "i": iu + list(range(dim)) + [-1],
                "j": ju + [-1] * dim + [-1],
                "v": [gram[a][b] for a, b in zip(iu, ju)] + list(s) + [float(n)],
            }
        )
        yield out

    entries = (
        df.select(col)
        .where(F.col(col).isNotNull())
        .mapInPandas(_partials, _ENTRY_SCHEMA)
    )
    return entries.groupBy("i", "j").agg(F.sum("v").alias("v"))


def covariance_matrix(df: DataFrame, col: str, dim: int):
    """Assemble (n, mean[d], cov[d][d]) from the one-pass entries.
    cov = Σee'/n − μμ' (population covariance). The collect is ≤ d²+d+1
    rows — the d×d summary, never the data (documented driver edge, same
    contract as the k-means centroid collect)."""
    import numpy as np

    rows = collect_bounded(
        covariance_entries(df, col, dim),
        dim * dim + dim + 1,
        "covariance_matrix entries (d\u00b2+d+1 summary rows)",
    )
    n = 0.0
    s = np.zeros(dim)
    gram = np.zeros((dim, dim))
    for r in rows:
        if r["i"] == -1:
            n = r["v"]
        elif r["j"] == -1:
            s[r["i"]] = r["v"]
        else:
            gram[r["i"]][r["j"]] = r["v"]
            gram[r["j"]][r["i"]] = r["v"]
    if n == 0:
        raise ValueError("covariance_matrix: empty input")
    mean = s / n
    cov = gram / n - np.outer(mean, mean)
    return int(n), mean, cov


def pca_components(df: DataFrame, col: str, dim: int, k: int):
    """Top-k principal components of ``df[col]`` and their explained-
    variance ratios. Deterministic: numpy ``eigh`` on the symmetric d×d
    covariance, eigenvectors sign-fixed so each component's largest-
    magnitude coordinate is positive (eigh's sign is otherwise arbitrary
    and would make downstream projections run-dependent).

    Returns (components: list[k][d], explained_ratio: list[k], mean[d])."""
    import numpy as np

    if not 1 <= k <= dim:
        raise ValueError(f"pca_components: need 1 <= k <= dim, got k={k}")
    _, mean, cov = covariance_matrix(df, col, dim)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for idx in order:
        v = vecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        comps.append([float(x) for x in v])
    total = float(np.sum(np.clip(vals, 0.0, None))) or 1.0
    ratios = [max(float(vals[i]), 0.0) / total for i in order]
    return comps, ratios, [float(x) for x in mean]


def pca_project(
    df: DataFrame,
    col: str,
    components: list[list[float]],
    mean: list[float] | None = None,
    out: str = "pc",
) -> Column | DataFrame:
    """Append the k-dim projection of ``df[col]`` onto ``components``:
    pc_i = (x − mean)·c_i, computed as k literal-vector dot products —
    pure JVM codegen (the components ride the expression tree like the
    flagship query vector), no Python, no join, no shuffle."""
    cols = []
    for c in components:
        p = dot_literal(col, c)
        if mean is not None:
            p = p - F.lit(float(sum(m * ci for m, ci in zip(mean, c))))
        cols.append(p)
    return df.withColumn(out, F.array(*cols))


def random_projection(
    df: DataFrame,
    planes: list[list[float]],
    emb_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """Johnson–Lindenstrauss random projection: map each embedding onto k
    fixed random directions — dimensionality reduction at SCAN speed, no
    training pass, no shuffle, no state. The JL lemma bounds pairwise-
    distance distortion at O(sqrt(ln N / k)), which is why this is the
    standard cheap pre-step when PCA's covariance pass (see
    :func:`covariance_entries`) is not worth a corpus scan: the planes
    are literals baked into the projection expressions, so the whole
    operator is a map-only codegen projection that composes with any
    downstream ANN/clustering operator. Appends rp0..rp{k-1}."""
    from semantic_index_spark.functions import vector as V

    return df.select(
        "*",
        *[
            F.round(V.dot_literal(F.col(emb_col), p), decimals).alias(f"rp{i}")
            for i, p in enumerate(planes)
        ],
    )
