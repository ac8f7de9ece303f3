"""Vector scalar functions + flagship search plan shape."""

import math

import numpy as np
import pyspark.sql.functions as F
import pytest

from semantic_index_spark.functions import vector as V
from semantic_index_spark.operators import similarity as S
from semantic_index_spark.plans import explain as E


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_dot_matches_numpy(emb):
    rows = emb.orderBy("vec_id").limit(2).collect()
    a, b = np.array(rows[0]["embedding"]), np.array(rows[1]["embedding"])
    got = (
        emb.filter(F.col("vec_id") == rows[0]["vec_id"])
        .select(V.dot_literal("embedding", [float(x) for x in b]).alias("d"))
        .collect()[0]["d"]
    )
    assert math.isclose(got, float(a.astype(np.float64) @ b.astype(np.float64)), rel_tol=1e-9)


def test_cosine_and_norm(emb):
    row = emb.limit(1).select(
        V.l2_norm("embedding").alias("n"), V.cosine("embedding", "embedding").alias("c")
    ).collect()[0]
    a = 1.0
    assert math.isclose(row["c"], a, rel_tol=1e-9)
    assert row["n"] > 0


def test_l2_distance_self_zero(emb):
    row = emb.limit(1).select(V.l2_distance("embedding", "embedding").alias("d")).collect()[0]
    assert row["d"] == 0.0


def test_normalize_unit(emb):
    row = emb.limit(1).select(V.l2_norm(V.normalize("embedding")).alias("n")).collect()[0]
    assert math.isclose(row["n"], 1.0, rel_tol=1e-9)


def test_topk_matches_numpy_bruteforce(emb):
    q = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    got = [r["vec_id"] for r in S.topk(emb, q, k=5).collect()]
    pdf = emb.select("vec_id", "embedding").toPandas()
    mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    scores = np.round(mat @ np.asarray(q, dtype=np.float64), 6)
    order = sorted(zip(-scores, pdf["vec_id"]))[:5]
    assert got == [int(v) for _, v in order]


def test_topk_physical_plan_is_bounded(emb):
    """The scale property: top-k must compile to TakeOrderedAndProject
    (per-partition bounded heap), never a global sort."""
    q = [0.1] * 64
    df = S.topk(emb, q, k=10)
    E.assert_top_k(df)


def test_topk_scan_prunes_columns(emb):
    q = [0.1] * 64
    df = S.topk(emb, q, k=10)
    cols = E.scan_read_schema(df)
    assert "label" not in cols  # only (vec_id, embedding) read


def test_star_join_broadcasts_and_filter_pushes_down(spark, sf_dir):
    """Plan-helper coverage on the headline shapes: the q3 star join must
    broadcast the dim side; the predicate query must push IsNotNull/range
    filters into the parquet scan."""
    from semantic_index_spark.operators import relational as R

    E.assert_broadcast_join(R.q3_shipping_priority(spark, sf_dir))
    E.assert_pushed_filter(R.filter_predicates(spark, sf_dir), "IsNotNull(p_size)")


def test_topk_multi_ranks_per_query(emb):
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_embedding")
    )
    out = S.topk_multi(emb, queries, k=3)
    rows = out.collect()
    assert len(rows) == 9  # 3 queries × top-3
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    for q_id, rs in by_q.items():
        best = sorted(rs, key=lambda r: r["rank"])[0]
        assert best["vec_id"] == q_id  # self is nearest under dot of unit-ish vecs
    # scale property: partial top-k runs inside MapInPandas (narrow); the
    # only shuffle is the final merge over <= partitions*Q*k rows — never a
    # join or a full N*Q window shuffle.
    plan = E.formatted_plan(out)
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_lsh_topk_recall_of_self(emb):
    planes = S.make_planes(4, 64, seed=7)
    q = emb.filter(F.col("vec_id") == 42).collect()[0]["embedding"]
    got = S.lsh_topk(emb, q, planes, k=5).collect()
    assert got, "query's own bucket must be non-empty"
    assert got[0]["vec_id"] == 42  # exact self-match survives bucketing


def test_scores_matrix_udf_matches_fold(emb):
    q = np.array(emb.filter(F.col("vec_id") == 1).collect()[0]["embedding"], dtype=np.float64)
    udf_score = V.scores_matrix_udf(64)(q)
    both = emb.select(
        "vec_id",
        F.round(udf_score(F.col("embedding")), 6).alias("fast"),
        F.round(V.dot_literal("embedding", [float(x) for x in q]), 6).alias("ref"),
    ).collect()
    for r in both:
        assert math.isclose(r["fast"], r["ref"], abs_tol=2e-6)
