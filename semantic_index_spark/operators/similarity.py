"""Similarity-search operators over embedding columns.

The reference's only search is brute-force exact KNN with a dot-product
score (`SemanticDatabase.cs:268-308`). :func:`topk` reproduces exactly that
(and is what :meth:`SemanticIndex.search_df` uses). The rest is
[absent in reference — north-star extension]: batched multi-query search,
similarity join, and the LSH-bucketed approximate path that survives 100 TB.

Physical-plan notes:
  * ``topk`` compiles to pruned-scan → project → TakeOrderedAndProject:
    per-partition bounded top-k, O(N·d + N log k), zero shuffles.
  * ``topk_multi`` broadcasts the query set (small side) and window-ranks
    per query — ONE pass over the big table for Q queries instead of Q
    passes.
  * ``lsh_topk`` probes only matching hyperplane buckets: candidate set
    shrinks ~2^bits-fold; the equi-join on the signature is
    hash-partitioned, so no cross product ever materializes.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from semantic_index_spark.functions import vector as V


def topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    metric: str = "dot",
) -> DataFrame:
    """Exact brute-force top-k (`SemanticDatabase.cs:268-308`): raw dot
    score (`:279`), descending (`:307`), default k=10 (`:268`);
    deterministic (score DESC, id) tie-break replaces the reference's
    +1e-6 perturbation (SURVEY.md §2.C.3). Columns: (id, score)."""
    score = (
        V.dot_literal(F.col(emb_col), query)
        if metric == "dot"
        else V.cosine(F.col(emb_col), F.lit([float(x) for x in query]).cast("array<double>"))
    )
    return (
        df.select(F.col(id_col), F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def topk_multi(
    big: DataFrame,
    queries: DataFrame,
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    q_emb_col: str = "q_embedding",
    q_id_col: str = "q_id",
) -> DataFrame:
    """Top-k neighbors for EACH query row: broadcast the (small) query set,
    score in one pass over the big table, rank within each query with a
    window. The broadcast-nested-loop join is deliberate — Q is small, so
    work is Q·N scores with no shuffle of the big side; only the window's
    partitionBy(q_id) shuffles the (already k-prunable) scored rows."""
    scored = big.crossJoin(F.broadcast(queries)).select(
        F.col(q_id_col),
        F.col(id_col),
        F.round(V.dot(F.col(emb_col), F.col(q_emb_col)), 6).alias("score"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "score", "rank")
    )


def similarity_join(
    left: DataFrame,
    right: DataFrame,
    threshold: float,
    l_emb: str = "embedding",
    r_emb: str = "q_embedding",
    l_id: str = "vec_id",
    r_id: str = "q_id",
) -> DataFrame:
    """All pairs (l, r) with cosine ≥ threshold. Broadcast the smaller right
    side; the filter prunes pairs before any shuffle. For two HUGE sides,
    use hyperplane bucketing (see lsh_topk / embedding_neardup_pairs)."""
    return (
        left.crossJoin(F.broadcast(right))
        .withColumn("cos", F.round(V.cosine(F.col(l_emb), F.col(r_emb)), 6))
        .filter(F.col("cos") >= threshold)
        .select(F.col(l_id), F.col(r_id), F.col("cos"))
    )


def lsh_topk(
    df: DataFrame,
    query: Sequence[float],
    planes: Sequence[Sequence[float]],
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: score only rows whose random-hyperplane signature
    equals the query's (candidate bucket), then exact dot-product rank inside
    the bucket. Recall is tunable via bits/multi-probe; the scan prunes to a
    ~2^-bits fraction — the IVF-style scale path when brute force over
    100 TB per query is too slow. Deterministic given `planes`."""
    import numpy as np

    qv = np.asarray(query, dtype=np.float64)
    qsig = 0
    for i, p in enumerate(planes):
        if float(np.dot(qv, np.asarray(p, dtype=np.float64))) > 0:
            qsig += 1 << i
    return (
        df.withColumn("bucket", V.hyperplane_signature(emb_col, planes))
        .filter(F.col("bucket") == F.lit(int(qsig)).cast("bigint"))
        .select(F.col(id_col), F.round(V.dot_literal(F.col(emb_col), query), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def make_planes(num_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes shared by Spark, the DuckDB oracle,
    and the driver-side query-signature computation."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return [[float(x) for x in rng.standard_normal(dim)] for _ in range(num_planes)]
