"""As-of join, range joins, TF-IDF, IVF ANN, percentile sketch parity, and
the embedder config surface."""

import math

import pyspark.sql.functions as F
import pytest

from semantic_index_spark import SemanticIndex
from semantic_index_spark.embedder import DeterministicEmbedder, OpenAIStyleEmbedder
from semantic_index_spark.operators import similarity as S
from semantic_index_spark.operators import text_analysis as TA
from semantic_index_spark.operators import timeseries as TS
from semantic_index_spark.plans import explain as E


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [("a", 10, 1), ("a", 20, 2), ("a", 5, 3), ("b", 7, 4)],
        "k string, ts int, lid int",
    )
    right = spark.createDataFrame(
        [("a", 8, 100.0), ("a", 20, 200.0), ("b", 9, 300.0)],
        "k string, ts int, v double",
    )
    out = {
        r["lid"]: (r["v_asof"], r["ts_asof"])
        for r in TS.asof_join(left, right, on="k", value_cols=["v"]).collect()
    }
    assert out[1] == (100.0, 8)  # latest right at ts<=10
    assert out[2] == (200.0, 20)  # same-instant right row IS visible
    assert out[3] == (None, None)  # nothing at or before ts=5
    assert out[4] == (None, None)  # b's only right row is after ts=7


def test_asof_join_single_shuffle_no_range_join(spark):
    left = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("ts"), F.col("id").alias("lid")
    )
    right = spark.range(50).select(
        (F.col("id") % 5).alias("k"), (F.col("id") * 2).alias("ts"), F.col("id").alias("v")
    )
    plan = E.formatted_plan(TS.asof_join(left, right, on="k", value_cols=["v"]))
    # the scale property: never a nested-loop/cartesian range join
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_bucketed_range_join_matches_broadcast_variant(spark):
    points = spark.range(1000).select((F.col("id") * 1.7).alias("x"))
    intervals = spark.createDataFrame(
        [("lo", 0.0, 300.0), ("mid", 300.0, 900.0), ("hi", 900.0, 1800.0)],
        "tag string, lo double, hi double",
    )
    a = (
        TS.banded_range_join(points, intervals, "x", "lo", "hi")
        .groupBy("tag").count().collect()
    )
    b = (
        TS.bucketed_range_join(points, intervals, "x", "lo", "hi", bucket_width=250.0)
        .groupBy("tag").count().collect()
    )
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_tfidf_rare_term_outranks_common(spark):
    docs = spark.createDataFrame(
        [(0, "common common rare"), (1, "common common common"), (2, "common other")],
        "doc_id long, text string",
    )
    rows = TA.tfidf_top_terms(docs, top_n=1).collect()
    top0 = next(r for r in rows if r["doc_id"] == 0)
    assert top0["tok"] == "rare"  # df=1 term beats the everywhere-term
    # 'common' appears in every doc -> idf = ln(1) = 0
    all_terms = TA.tfidf_top_terms(docs, top_n=10)
    assert all_terms.filter((F.col("tok") == "common") & (F.col("tfidf") > 0)).count() == 0


def test_ivf_topk_recall_and_pruned_plan(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centroids = S.make_centroids(8, 64, seed=11)
    q = emb.filter(F.col("vec_id") == 5).collect()[0]["embedding"]
    got = S.ivf_topk(emb, q, centroids, k=5, nprobe=2).collect()
    assert got and got[0]["vec_id"] == 5  # self lands in its own cell
    # exact top-1 == ivf top-1 here (self-query); candidate set is pruned
    n_cand = S.ivf_assign(emb, centroids).filter(
        F.col("_cell").isin(
            [r["_cell"] for r in S.ivf_assign(
                emb.filter(F.col("vec_id") == 5), centroids
            ).collect()]
        )
    ).count()
    assert n_cand < emb.count()  # genuinely pruned


def test_approx_percentile_within_bound_of_exact(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias("approx"),
    ).collect()[0]
    assert math.isclose(row["approx"], row["exact"], rel_tol=0.05)


def test_ngram_jaccard_max_df_keeps_near_dups(spark):
    """The hot-shingle cutoff must drop join work, not near-dup recall:
    docs sharing rare shingles stay paired; pairs held together only by a
    corpus-wide boilerplate shingle disappear."""
    from semantic_index_spark.operators import dedup as D

    boiler = "copyright acme corp all rights reserved"
    docs = spark.createDataFrame(
        [
            (0, f"alpha beta gamma delta {boiler}"),
            (1, f"alpha beta gamma epsilon {boiler}"),  # near-dup of 0
            (2, f"zeta eta theta iota {boiler}"),       # only boilerplate shared
            (3, f"kappa lambda mu nu {boiler}"),
        ],
        "doc_id long, text string",
    )
    exact = D.ngram_jaccard_pairs(docs, shingle_n=2, threshold=0.05)
    capped = D.ngram_jaccard_pairs(docs, shingle_n=2, threshold=0.05, max_df=3)
    exact_pairs = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    capped_pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (0, 1) in capped_pairs  # real near-dup survives the cutoff
    assert (2, 3) in exact_pairs  # boilerplate-only pair exists in exact...
    assert (2, 3) not in capped_pairs  # ...and is pruned by the df cutoff


def test_embedder_config_surface(spark):
    """ApiKey/EmbeddingModel properties (SemanticDatabase.cs:67-80)."""
    emb = OpenAIStyleEmbedder(api_key="k1")
    idx = SemanticIndex(spark, embedder=emb)
    assert idx.api_key == "k1"
    assert idx.embedding_model == "text-embedding-3-large"  # reference default
    idx.api_key = "k2"
    idx.embedding_model = "text-embedding-3-small"
    assert emb.api_key == "k2" and emb.model == "text-embedding-3-small"
    with pytest.raises(NotImplementedError):
        emb.embed_batch(["x"])  # no network transport in this environment
    # transport injection is the production path
    emb2 = OpenAIStyleEmbedder(dim=4, transport=lambda t, m, k: [[1.0, 0, 0, 0]] * len(t))
    assert emb2.embed_batch(["a"]).shape == (1, 4)
    # deterministic embedder exposes no model config
    det = SemanticIndex(spark, embedder=DeterministicEmbedder(dim=8))
    assert det.embedding_model is None
    with pytest.raises(AttributeError):
        det.api_key = "nope"
