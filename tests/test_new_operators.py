"""As-of join, range joins, TF-IDF, IVF ANN, percentile sketch parity, and
the embedder config surface."""

import math
import os

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


def test_ivf_indexed_serving_path(spark, sf_dir, tmp_path):
    """write_ivf_index + ivf_topk_indexed: the serving path must return the
    SAME rows as ad-hoc ivf_topk, and its cell filter must land on the
    PARTITION column — PartitionFilters in the scan, i.e. the non-probed
    cells are pruned at planning time (never listed/opened at 100 TB)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centroids = S.make_centroids(8, 64, seed=11)
    q = emb.filter(F.col("vec_id") == 5).collect()[0]["embedding"]
    path = str(tmp_path / "ivf_index")
    S.write_ivf_index(emb, centroids, path)
    # one directory per non-empty cell
    cells = {d for d in os.listdir(path) if d.startswith("_cell=")}
    assert 1 < len(cells) <= 8
    served = S.ivf_topk_indexed(spark, path, q, centroids, k=5, nprobe=2)
    adhoc = S.ivf_topk(emb, q, centroids, k=5, nprobe=2)
    assert [tuple(r) for r in served.collect()] == [tuple(r) for r in adhoc.collect()]
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_cell" in plan.split("PartitionFilters", 1)[1][:200]
    # files_per_cell must genuinely SPLIT hot cells across writer tasks —
    # repartition keyed on _cell alone could never do that
    path2 = str(tmp_path / "ivf_index_split")
    S.write_ivf_index(emb, centroids, path2, files_per_cell=2)
    per_cell = [
        len([f for f in os.listdir(os.path.join(path2, d)) if f.endswith(".parquet")])
        for d in os.listdir(path2) if d.startswith("_cell=")
    ]
    assert max(per_cell) >= 2, per_cell


def test_append_ivf_index_equals_rebuild(spark, sf_dir, tmp_path):
    """Incremental index maintenance: building from half the corpus then
    appending the other half must serve IDENTICAL probe results to a
    from-scratch build over everything — cell assignment is a pure
    function of (embedding, centroids), and append-mode parquet adds
    files without touching existing ones."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centroids = S.make_centroids(8, 64, seed=11)
    q = emb.filter(F.col("vec_id") == 5).collect()[0]["embedding"]
    inc_path = str(tmp_path / "ivf_inc")
    S.write_ivf_index(emb.filter(F.col("vec_id") % 2 == 0), centroids, inc_path)
    S.append_ivf_index(emb.filter(F.col("vec_id") % 2 == 1), centroids, inc_path)
    full_path = str(tmp_path / "ivf_full")
    S.write_ivf_index(emb, centroids, full_path)
    inc = S.ivf_topk_indexed(spark, inc_path, q, centroids, k=5, nprobe=2)
    full = S.ivf_topk_indexed(spark, full_path, q, centroids, k=5, nprobe=2)
    assert [tuple(r) for r in inc.collect()] == [tuple(r) for r in full.collect()]


def test_rerank_exact_recovers_true_topk(spark, sf_dir):
    """Two-stage retrieval: exact rerank of a 50-candidate first stage must
    reproduce the TRUE exact top-10 whenever the candidates contain it —
    and with int8 quantization error bounded by scale/2 per dim, a 5x
    candidate margin comfortably does here (asserted, not assumed)."""
    from semantic_index_spark.functions import vector as V

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 3).collect()[0]["embedding"]
    qz = emb.select("vec_id", V.quantize_int8("embedding").alias("qz"))
    cand = (
        qz.select("vec_id", F.round(V.quantized_dot_literal("qz", q), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(50)
    )
    reranked = [tuple(r) for r in S.rerank_exact(emb, cand, q, k=10).collect()]
    exact = [tuple(r) for r in S.topk(emb, q, k=10).collect()]
    assert reranked == exact


def test_approx_count_distinct_within_bound(spark, sf_dir):
    """HLL sketch (mergeable, bounded-memory — the 100 TB form of COUNT
    DISTINCT) stays within its rsd bound of exact. Sketches differ across
    engines, so this is pytest-only; the oracle row (distinct_counts) is
    exact."""
    import pyspark.sql.functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", 0.02).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.06


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


def test_chunk_documents_coverage_and_overlap(spark):
    from semantic_index_spark.operators.text_analysis import chunk_documents

    text = " ".join(f"w{i}" for i in range(95))
    docs = spark.createDataFrame([(0, text), (1, "short doc")], "doc_id long, text string")
    rows = sorted(
        chunk_documents(docs, chunk_tokens=40, overlap=10).collect(),
        key=lambda r: (r["doc_id"], r["chunk_idx"]),
    )
    d0 = [r for r in rows if r["doc_id"] == 0]
    # 95 tokens, step 30 -> ceil((95-10)/30) = 3 chunks
    assert [r["chunk_idx"] for r in d0] == [0, 1, 2]
    assert d0[0]["n_tokens"] == 40 and d0[0]["chunk_text"].startswith("w0 w1 ")
    assert d0[1]["chunk_text"].startswith("w30 ")  # overlap of 10 tokens
    assert d0[2]["n_tokens"] == 95 - 60  # tail chunk truncates
    # every token index is covered by some chunk
    covered = set()
    for r in d0:
        covered.update(r["chunk_text"].split())
    assert covered == {f"w{i}" for i in range(95)}
    d1 = [r for r in rows if r["doc_id"] == 1]
    assert len(d1) == 1 and d1[0]["chunk_text"] == "short doc"


def test_int8_quantization_error_and_recall(spark, sf_dir):
    import pyspark.sql.functions as F

    from semantic_index_spark.functions import vector as V
    from semantic_index_spark.operators.similarity import topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # reconstruction error bounded by scale/2 per element
    err = emb.select(
        F.array_max(
            F.zip_with(
                V.dequantize_int8(V.quantize_int8("embedding")),
                F.col("embedding"),
                lambda a, b: F.abs(a - b.cast("double")),
            )
        ).alias("max_err"),
        (F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double")))) / 127.0).alias("half_ulp"),
    ).collect()
    for r in err:
        assert r["max_err"] <= r["half_ulp"] / 2 + 1e-12
    # quantized top-10 overlaps exact top-10 heavily (unit-norm vectors)
    q = emb.filter(F.col("vec_id") == 3).collect()[0]["embedding"]
    exact = {r["vec_id"] for r in topk(emb, q, k=10).collect()}
    qz = emb.select("vec_id", V.quantize_int8("embedding").alias("qz"))
    approx = {
        r["vec_id"]
        for r in qz.select("vec_id", V.quantized_dot_literal("qz", q).alias("s"))
        .orderBy(F.desc("s"), F.asc("vec_id")).limit(10).collect()
    }
    assert len(exact & approx) >= 8


def test_salted_agg_matches_direct(spark, sf_dir):
    import pyspark.sql.functions as F

    from semantic_index_spark.operators.skew import salted_agg

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    salted = {
        r["l_returnflag"]: (round(r["sq"], 2), r["n"])
        for r in salted_agg(
            li, ["l_returnflag"], sum_cols={"l_quantity": "sq"}, count_alias="n", salt_n=8
        ).collect()
    }
    direct = {
        r["l_returnflag"]: (round(r["sq"], 2), r["n"])
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("sq"), F.count("*").alias("n"))
        .collect()
    }
    assert salted == direct


def test_hash_sample_deterministic_and_consistent(spark, sf_dir):
    from semantic_index_spark.operators.skew import hash_sample, hash_split

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s1 = {r["doc_id"] for r in hash_sample(d, "doc_id", 0.2).select("doc_id").collect()}
    s2 = {r["doc_id"] for r in hash_sample(d, "doc_id", 0.2).select("doc_id").collect()}
    assert s1 == s2  # reproducible
    n = d.count()
    assert 0.05 * n < len(s1) < 0.45 * n  # roughly the asked fraction
    # split is exhaustive + disjoint, and test ⊇ smaller sample of same keys
    split = hash_split(d, "doc_id", test_fraction=0.2)
    test_ids = {r["doc_id"] for r in split.filter("split = 'test'").collect()}
    assert test_ids == s1  # same bucketing → same membership
    assert split.count() == n


def test_index_compact_bounds_lineage(spark):
    """compact() must preserve contents while truncating the mutation
    lineage (plan no longer references joins/unions)."""
    from semantic_index_spark import SemanticIndex
    from semantic_index_spark.embedder import DeterministicEmbedder
    from semantic_index_spark.plans import explain as E

    ix = SemanticIndex(spark, embedder=DeterministicEmbedder(dim=4))
    for batch in (["a", "b"], ["b", "c"], ["d"]):
        ix.add_range(batch)
    ix.remove("a")
    before = sorted(r["item"] for r in ix.records.collect())
    assert "Join" in E.formatted_plan(ix.records)  # mutation lineage present
    ix.compact()
    assert "Join" not in E.formatted_plan(ix.records)  # truncated
    assert sorted(r["item"] for r in ix.records.collect()) == before


def test_winnowing_shared_substring_shares_fingerprint(spark):
    """The winnowing guarantee: documents sharing a substring of length
    >= k + w - 1 share at least one fingerprint; disjoint documents with
    no common k-gram share none."""
    from semantic_index_spark.operators.dedup import winnowing_fingerprints

    common = "the quick brown fox jumps"  # 25 chars >= 8 + 4 - 1
    docs = spark.createDataFrame(
        [
            (0, f"aaaa {common} bbbb"),
            (1, f"cccc {common} dddd"),
            (2, "zzzzzzzz yyyyyyyy xxxxxxxx wwwwwwww"),
        ],
        "doc_id long, text string",
    )
    fps = winnowing_fingerprints(docs, k=8, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert by_doc[0] & by_doc[1]  # shared substring → shared fingerprint
    assert not (by_doc[0] & by_doc[2])  # no common 8-gram → disjoint


def test_connected_components_toy_graph(spark):
    from semantic_index_spark.operators.dedup import connected_components

    verts = spark.createDataFrame([(i,) for i in range(7)], "doc_id long")
    # components: {0,1,2,3} via chain, {4,5}, {6} singleton
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (0, 3), (4, 5)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(verts, pairs).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 6}


def test_kmeans_inertia_decreases_and_deterministic(spark, sf_dir):
    import pyspark.sql.functions as F

    from semantic_index_spark.operators.similarity import kmeans_fit, kmeans_inertia

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    init = [
        [float(x) for x in r["embedding"]]
        for r in emb.orderBy("vec_id").limit(4).collect()
    ]
    i0 = kmeans_inertia(emb, init)
    one = kmeans_fit(emb, k=4, iters=1)
    c1 = [r["centroid"] for r in one.collect()]
    i1 = kmeans_inertia(emb, c1)
    three = kmeans_fit(emb, k=4, iters=3)
    c3 = [r["centroid"] for r in three.collect()]
    i3 = kmeans_inertia(emb, c3)
    assert i1 <= i0 + 1e-6 and i3 <= i1 + 1e-6  # Lloyd's monotonicity
    # deterministic: same input -> same centroids
    again = [r["centroid"] for r in kmeans_fit(emb, k=4, iters=3).collect()]
    assert again == c3
    # every cell non-empty and counts sum to N
    assert three.agg(F.sum("n")).collect()[0][0] == emb.count()


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


def test_incremental_dedup_consistent_with_full_pairs(spark, sf_dir):
    """Batch-vs-corpus screening must agree with the within-corpus pair
    enumeration restricted to cross-split pairs (same bands → same
    collisions), with dup_of = the minimum colliding corpus id."""
    import pyspark.sql.functions as F

    from semantic_index_spark.operators import dedup as D
    from semantic_index_spark.session import load_table

    d = load_table(spark, sf_dir, "documents")
    split = 400
    pairs = D.minhash_lsh_pairs(d, num_hashes=4, bands=4)
    expected = (
        pairs.filter((F.col("id_a") < split) & (F.col("id_b") >= split))
        .groupBy(F.col("id_b").alias("new_id"))
        .agg(F.min("id_a").alias("dup_of"))
    )
    got = D.incremental_lsh_dedup(
        d.filter(F.col("doc_id") < split),
        d.filter(F.col("doc_id") >= split),
        num_hashes=4,
        bands=4,
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))


def test_aqe_splits_skewed_join_partitions(spark):
    """The AQE skew-join lever the 100 TB posture relies on, demonstrated:
    a join keyed 80% onto one hot key re-plans at runtime with the hot
    partition split (skew=true in the final adaptive plan) — no salting
    needed on the JOIN path (salted_agg covers the aggregate path)."""
    import pyspark.sql.functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        # thresholds scaled down so a local-sized input exhibits "skew"
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        big = spark.range(500_000).select(
            F.when(F.col("id") < 400_000, F.lit(0).cast("long"))
            .otherwise(F.col("id") % 100)
            .alias("k"),
            F.col("id").alias("payload"),
        )
        dim = spark.range(100).select(F.col("id").alias("k"), F.col("id").alias("label"))
        j = big.join(dim, "k")
        assert len(j.collect()) == 500_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ---------------------------------------------------------------- scd2


def test_scd2_collapses_and_stitches(spark):
    rows = [
        # user 1: A A B A  -> versions A[1,3) B[3,4) A[4,-)
        (1, 1, "A", 10), (1, 2, "A", 11), (1, 3, "B", 12), (1, 4, "A", 13),
        # user 2: single row -> one current version
        (2, 1, "X", 14),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts int, status string, event_id int")
    h = TS.scd2_history(df, key="user_id", ts="ts", attr="status", tiebreak="event_id")
    got = sorted(map(tuple, h.collect()))
    assert got == [
        (1, "A", 1, 3, False),
        (1, "A", 4, None, True),
        (1, "B", 3, 4, False),
        (2, "X", 1, None, True),
    ]


def test_scd2_null_attr_first_version_kept(spark):
    df = spark.createDataFrame(
        [(1, 1, None), (1, 2, None), (1, 3, "A")], "user_id int, ts int, status string"
    )
    h = TS.scd2_history(df, key="user_id", ts="ts", attr="status")
    got = sorted(h.collect(), key=lambda r: r["valid_from"])
    assert [r["status"] for r in got] == [None, "A"]
    assert got[0]["valid_from"] == 1 and got[0]["valid_to"] == 3


def test_scd2_same_instant_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, 5, "A", 1), (1, 5, "B", 2)], "user_id int, ts int, status string, event_id int"
    )
    h = TS.scd2_history(df, key="user_id", ts="ts", attr="status", tiebreak="event_id")
    got = sorted(map(tuple, h.collect()))
    assert got == [(1, "A", 5, 5, False), (1, "B", 5, None, True)]


# ------------------------------------------------------- pipeline operators


def test_embed_incremental_hits_and_misses(spark):
    from semantic_index_spark.functions import text as T
    from semantic_index_spark.operators import pipeline as P

    emb = DeterministicEmbedder(dim=8)
    docs = spark.createDataFrame(
        [(1, "cat dog"), (2, "fish"), (3, "cat dog")], "doc_id int, text string"
    )
    # cache holds a SENTINEL vector for "cat dog" so reuse is observable
    cache = (
        spark.createDataFrame([("cat dog",)], "text string")
        .select(T.fingerprint("text").alias("fingerprint"))
        .withColumn("embedding", F.array(*[F.lit(9.0)] * 8))
    )
    out = P.embed_incremental(docs, cache, emb).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(out) == 3
    assert by_id[1]["was_cached"] and by_id[3]["was_cached"]
    assert by_id[1]["embedding"] == [9.0] * 8  # cached vector reused verbatim
    assert not by_id[2]["was_cached"]
    import numpy as np

    expect = emb.embed_batch(["fish"])[0]
    assert np.allclose(by_id[2]["embedding"], expect, atol=1e-6)


def test_validate_expectations_rules(spark):
    from semantic_index_spark.operators import pipeline as P

    df = spark.createDataFrame(
        [(1, "a", 5), (2, None, 50), (2, "c", -1), (3, "d", 7)],
        "id int, s string, x int",
    )
    out = P.validate_expectations(
        df,
        [
            P.expect_not_null("s"),
            P.expect_unique("id"),
            P.expect_in_range("x", 0, 10),
            P.expect_in_set("s", ["a", "c", "d"]),
        ],
    ).collect()
    got = {r["rule"]: (r["violations"], r["n_rows"], r["passed"]) for r in out}
    assert got["not_null_s"] == (1, 4, False)
    assert got["unique_id"] == (1, 4, False)   # id=2 twice -> one surplus
    assert got["in_range_x"] == (2, 4, False)  # 50 and -1
    assert got["in_set_s"] == (0, 4, True)     # NULL doesn't violate in_set


def test_validate_expectations_empty_df_and_no_rules(spark):
    from semantic_index_spark.operators import pipeline as P

    empty = spark.createDataFrame([], "id int")
    out = P.validate_expectations(empty, [P.expect_not_null("id")]).collect()
    assert [(r["violations"], r["n_rows"], r["passed"]) for r in out] == [(0, 0, True)]
    with pytest.raises(ValueError):
        P.validate_expectations(empty, [])


# ------------------------------------------------------------ funnel/cohort


def test_funnel_greedy_chain(spark):
    rows = [
        (1, 10, "signup"), (1, 20, "view"), (1, 30, "purchase"),   # full convert
        (2, 10, "view"), (2, 20, "signup"),                        # view BEFORE signup: stops at signup
        (3, 10, "signup"), (3, 10, "view"),                        # same-instant counts for next step
        (4, 5, "purchase"),                                        # never signed up
    ]
    df = spark.createDataFrame(rows, "user_id int, ts int, event_type string")
    got = {r["user_id"]: r for r in TS.funnel(df, ["signup", "view", "purchase"]).collect()}
    assert (got[1]["step0_ts"], got[1]["step1_ts"], got[1]["step2_ts"]) == (10, 20, 30)
    assert (got[2]["step0_ts"], got[2]["step1_ts"]) == (20, None)
    assert (got[3]["step0_ts"], got[3]["step1_ts"], got[3]["step2_ts"]) == (10, 10, None)
    assert 4 not in got or got[4]["step0_ts"] is None
    with pytest.raises(ValueError):
        TS.funnel(df, [])


def test_retention_cohorts_counts(spark):
    import datetime as dt

    def t(day):
        return dt.datetime(2024, 1, day)  # 2024-01-01 is a Monday

    rows = [
        (1, t(1)), (1, t(9)),   # cohort wk0, active wk0 and wk1
        (2, t(2)), (2, t(3)),   # cohort wk0, active wk0 only (same week twice)
        (3, t(8)),              # cohort wk1
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    got = {
        (r["cohort"].day, r["period_offset"]): r["n_users"]
        for r in TS.retention_cohorts(df).collect()
    }
    assert got == {(1, 0): 2, (1, 1): 1, (8, 0): 1}


def test_funnel_ignores_null_users(spark):
    df = spark.createDataFrame(
        [(None, 1, "signup"), (None, 2, "view"), (7, 3, "signup")],
        "user_id int, ts int, event_type string",
    )
    got = TS.funnel(df, ["signup", "view"]).collect()
    assert [r["user_id"] for r in got] == [7]


def test_retention_rejects_unsupported_granularity(spark):
    df = spark.createDataFrame([(1,)], "user_id int").withColumn(
        "ts", F.current_timestamp()
    )
    with pytest.raises(ValueError, match="granularity"):
        TS.retention_cohorts(df, granularity="month")


def test_snapshot_diff_classifies(spark):
    from semantic_index_spark.operators import pipeline as P

    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "will vanish")], "doc_id int, text string"
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed!"), (4, "brand new")], "doc_id int, text string"
    )
    got = {r["doc_id"]: r["change"] for r in P.snapshot_diff(old, new).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}  # doc 1 omitted


# ---------------------------------------------------- runtime bloom filter


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir):
    """fact ⋈ selective-dim as a shuffle join: Catalyst must inject a
    bloom_filter_agg over the dim keys and a might_contain filter on the
    fact side BELOW its exchange — fact rows that can't match are dropped
    before they shuffle (the 100 TB lever; size-gated off at local scale,
    forced on here)."""
    from semantic_index_spark.plans import tuning
    from semantic_index_spark.session import load_table

    def build():
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").filter("o_orderpriority = '1-URGENT'")
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )

    baseline = {r["o_orderpriority"]: r["n"] for r in build().collect()}
    with tuning.session_confs(spark, tuning.runtime_filter_confs(force=True)):
        j = build()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan
        assert "bloom_filter_agg" in plan, plan
        assert {r["o_orderpriority"]: r["n"] for r in j.collect()} == baseline
    # confs restored: broadcast threshold back to default, no leakage
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1"


def test_bm25_semantics_toy(spark):
    """BM25 ranks a doc with more query-term mass higher; docs with no
    query term never appear; scores match a hand-rolled computation."""
    docs = spark.createDataFrame(
        [
            (1, "cat cat dog"),          # tf(cat)=2
            (2, "cat bird bird bird"),   # tf(cat)=1, longer
            (3, "fish fish fish"),       # no query term
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["bm25"] for r in TA.bm25_topk(docs, ["cat"], k=10).collect()}
    assert set(out) == {1, 2}
    assert out[1] > out[2]
    # hand computation: N=3, df(cat)=2, avgdl=10/3
    idf = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))
    k1, b = 1.2, 0.75

    def score(tf, dl):
        return round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / (10 / 3))), 6)

    assert out[1] == pytest.approx(score(2, 3), abs=1e-6)
    assert out[2] == pytest.approx(score(1, 4), abs=1e-6)


def test_bm25_rejects_empty_query(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        TA.bm25_topk(docs, [])


def test_bpe_pair_counts_toy_and_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "solo"), (4, "")],
        "doc_id long, text string",
    )
    out = {r["pair"]: r["n_pairs"] for r in TA.bpe_pair_counts(docs).collect()}
    # doc1: "a b","b a","a b"; doc2: "a b"; doc3/doc4: no pairs
    assert out == {"a b": 3, "b a": 1}


def test_contamination_check_fractions(spark):
    train = spark.createDataFrame(
        [(10, "one two three four")], "doc_id long, text string"
    )
    ev = spark.createDataFrame(
        [
            (1, "one two three four"),     # both shingles in train
            (2, "one two three nine"),     # 1 of 2 shingles in train
            (3, "x y z w"),                # nothing in train
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_shingles"], r["n_matched"], r["contamination"])
        for r in TA.contamination_check(train, ev).collect()
    }
    assert out[1] == (2, 2, 1.0)
    assert out[2] == (2, 1, 0.5)
    assert out[3] == (2, 0, 0.0)


def test_pack_sequences_layout(spark):
    """Documents lay end-to-end: starts are the exclusive prefix sum, the
    boundary-straddling flag fires exactly when a doc crosses a multiple
    of the budget, and every token is accounted for exactly once."""
    from semantic_index_spark.operators import pipeline as P

    # token counts: 3, 4, 2, 5 → starts 0, 3, 7, 9 with budget 4:
    # doc1 seq0 off0; doc2 seq0 off3 (spans into seq1); doc3 seq1 off3
    # (spans); doc4 seq2 off1 (5 tokens: crosses seq2→seq3 boundary at 12)
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c d"), (3, "a b"), (4, "a b c d e")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["seq_id"], r["offset_in_seq"], r["spans_boundary"])
        for r in P.pack_sequences(docs, budget=4).collect()
    }
    assert out[1] == (0, 0, False)
    assert out[2] == (0, 3, True)
    assert out[3] == (1, 3, True)
    assert out[4] == (2, 1, True)


def test_pack_sequences_matches_single_window_at_any_partitioning(spark):
    """The two-phase distributed prefix-sum must equal the naive global
    window regardless of how many range partitions the input lands in."""
    from pyspark.sql import Window

    from semantic_index_spark.operators import pipeline as P

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.array_repeat(F.lit("w"), (F.col("id") % 7 + 1).cast("int"))).alias("text"),
    )
    for parts in (1, 5, 32):
        got = P.pack_sequences(docs, budget=10, partitions=parts)
        w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
        naive = (
            docs.select("doc_id", F.size(F.split("text", r"\s+")).alias("n"))
            .withColumn("s", F.coalesce(F.sum("n").over(w), F.lit(0)))
            .select("doc_id", F.expr("s div 10").alias("seq_id"), (F.col("s") % 10).alias("off"))
        )
        exp = {r["doc_id"]: (r["seq_id"], r["off"]) for r in naive.collect()}
        for r in got.collect():
            assert (r["seq_id"], r["offset_in_seq"]) == exp[r["doc_id"]], (parts, r)


def test_pack_sequences_rejects_bad_budget(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    from semantic_index_spark.operators import pipeline as P

    with pytest.raises(ValueError, match="budget"):
        P.pack_sequences(docs, budget=0)


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Salted equi-join must be row-identical to the plain join, for both
    inner and left, including big-side rows with no match (left)."""
    from semantic_index_spark.operators import skew as SK
    from semantic_index_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    dim = (
        orders.select("o_orderpriority").distinct()
        .filter(F.col("o_orderpriority") > "2")  # leave some unmatched
        .withColumn("prio_class", F.substring("o_orderpriority", 1, 1))
    )
    for how in ("inner", "left"):
        got = SK.salted_join(
            orders, dim, on="o_orderpriority", row_key="o_orderkey", salt_n=8, how=how
        )
        exp = orders.join(dim, "o_orderpriority", how)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect())), how
    with pytest.raises(ValueError, match="inner or left"):
        SK.salted_join(orders, dim, on="o_orderpriority", row_key="o_orderkey", how="full")


def test_zorder_key_interleave_and_locality(spark):
    from semantic_index_spark.sources.io import zorder_key

    df = spark.createDataFrame(
        [(0.0, 0.0), (255.0, 255.0), (1.0, 0.0), (0.0, 1.0), (-5.0, 999.0)],
        "x double, y double",
    )
    # bits=8 over [0,256): cell == floor(value); x is dim 0 (even bit
    # positions), y dim 1 (odd). Out-of-domain clamps to edge cells.
    z = [
        r[0]
        for r in df.select(
            zorder_key([("x", 0, 256), ("y", 0, 256)], bits=8)
        ).collect()
    ]
    def interleave(a, b):
        out = 0
        for j in range(8):
            out |= ((a >> j) & 1) << (2 * j)
            out |= ((b >> j) & 1) << (2 * j + 1)
        return out

    assert z[0] == 0
    assert z[1] == interleave(255, 255) == (1 << 16) - 1
    assert z[2] == 1          # x bit 0 → position 0
    assert z[3] == 2          # y bit 0 → position 1
    assert z[4] == interleave(0, 255)  # clamped both dims
    with pytest.raises(ValueError, match="exceeds 62"):
        zorder_key([("x", 0, 1)] * 9, bits=8)
    with pytest.raises(ValueError, match="hi > lo"):
        zorder_key([("x", 5, 5)])


def test_ann_recall_global_and_per_query(spark):
    from semantic_index_spark.operators import similarity as S2

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21)], "q long, vec_id long"
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 99), (2, 20), (2, 21)], "q long, vec_id long"
    )
    per_q = {
        r["q"]: (r["n_hit"], r["n_exact"], r["recall"])
        for r in S2.ann_recall(exact, approx, by="q").collect()
    }
    assert per_q[1] == (1, 2, 0.5)
    assert per_q[2] == (2, 2, 1.0)
    g = S2.ann_recall(exact, approx).collect()[0]
    assert (g["n_hit"], g["n_exact"], g["recall"]) == (3, 4, 0.75)
    # approx missing a query entirely → recall 0, not a dropped row
    none = S2.ann_recall(exact, approx.filter("q = 2"), by="q").collect()
    assert {r["q"]: r["recall"] for r in none}[1] == 0.0


def test_gopher_rules_flags_each_rule(spark):
    from semantic_index_spark.operators import text_analysis as TA

    good = "the cat and the dog have been to the house of mice with joy " * 3
    docs = spark.createDataFrame(
        [
            (1, good),                          # passes everything
            (2, "tiny doc"),                    # too few words, no stopwords
            (3, "### " + good + " ###"),        # symbol ratio blown
            (4, "- one\n- two\n- three"),       # all bullet lines
            (5, good + "\nwait...\nmore..."),   # ellipsis line fraction
        ],
        "doc_id long, text string",
    )
    r = {
        row["doc_id"]: row.asDict()
        for row in TA.gopher_rules(docs, min_words=10).collect()
    }
    assert r[1]["pass_gopher"]
    assert not r[2]["ok_word_count"] and not r[2]["ok_stops"]
    assert not r[3]["ok_symbol"] and r[3]["ok_stops"]
    assert not r[4]["ok_bullets"] and not r[4]["ok_word_count"]
    assert not r[5]["ok_ellipsis"]
    assert not any(r[d]["pass_gopher"] for d in (2, 3, 4, 5))


def test_ngram_lm_score_hand_computed(spark):
    import math

    from semantic_index_spark.operators import text_analysis as TA

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "solo")],
        "doc_id long, text string",
    )
    got = {
        row["doc_id"]: (row["n_bigrams"], row["avg_nll"])
        for row in TA.ngram_lm_score(docs, k=1.0).collect()
    }
    # unigrams: a:3 b:3 c:1 solo:1, V=4; bigrams: (a,b):3 (b,a):1 (b,c):1
    def lp(c2, c1):
        return math.floor(math.log((c2 + 1.0) / (c1 + 1.0 * 4)) * 1e6 + 0.5)

    def round6(x):  # HALF_UP like Spark/DuckDB round(), not Python's
        return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6

    d1 = -(2 * lp(3, 3) + lp(1, 3)) / 1e6 / 3
    d2 = -(lp(3, 3) + lp(1, 3)) / 1e6 / 2
    assert got[1] == (3, round6(d1))
    assert got[2] == (2, round6(d2))
    assert 3 not in got  # single-token doc has no bigrams


def test_semantic_cluster_dedup_matches_bruteforce(spark):
    """semantic_cluster_dedup must drop exactly the rows a per-cell
    brute-force (keep the min id of every >= threshold pair) would drop,
    and never compare across cells."""
    import math

    from semantic_index_spark.operators.dedup import semantic_cluster_dedup
    from semantic_index_spark.operators.similarity import make_centroids

    cents = make_centroids(4, 8, seed=3)
    rows = [
        (i, [math.sin(i * 0.7 + j) for j in range(8)]) for i in range(40)
    ] + [(100 + i, [math.sin(i * 0.7 + j) + 1e-4 for j in range(8)]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: (r["cell"], r["kept"])
        for r in semantic_cluster_dedup(df, cents, threshold=0.95).collect()
    }
    # python reference
    import numpy as np

    data = {i: np.array(v, dtype=np.float32) for i, v in rows}
    cmat = np.array(cents)
    cell = {i: int(np.argmax(cmat @ v)) for i, v in data.items()}
    dropped = set()
    ids = sorted(data)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            i, j = ids[x], ids[y]
            if cell[i] != cell[j]:
                continue
            a, b = data[i], data[j]
            cos = round(float(np.dot(a.astype(np.float64), b.astype(np.float64)))
                        / (np.linalg.norm(a.astype(np.float64)) * np.linalg.norm(b.astype(np.float64))), 6)
            if cos >= 0.95:
                dropped.add(j)
    for i in ids:
        assert got[i][0] == cell[i], (i, got[i], cell[i])
        assert got[i][1] == (i not in dropped), (i, got[i], i in dropped)
    assert dropped, "test fixture should produce at least one drop"


def test_semantic_cluster_dedup_plan_is_cell_hash_join(spark):
    """The pair generation must plan as a hash/sort-merge equi-join on the
    cell id — never a cartesian product or broadcast nested loop."""
    from semantic_index_spark.operators.dedup import semantic_cluster_dedup
    from semantic_index_spark.operators.similarity import make_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = semantic_cluster_dedup(emb, make_centroids(8, 64, seed=11), threshold=0.3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_epoch_rollup_merge_equals_direct_and_is_incremental(spark, sf_dir):
    """merge_rollups over per-epoch partials must equal the direct
    aggregate over raw rows, and appending a NEW epoch's partials to the
    OLD partials (no raw re-scan) must equal the direct aggregate over the
    union — the maintain-don't-recompute loop."""
    from semantic_index_spark.operators.pipeline import epoch_rollup, merge_rollups
    from semantic_index_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    ep = F.date_format("ts", "yyyyMM").cast("int")

    def direct(df):
        return {
            r["event_type"]: (r["n"], round(r["s"], 6), r["mn"], r["mx"])
            for r in df.groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                F.sum("value").alias("s"),
                F.min("value").alias("mn"),
                F.max("value").alias("mx"),
            )
            .collect()
        }

    merged = {
        r["event_type"]: (r["n"], round(r["sum_v"], 6), r["min_v"], r["max_v"])
        for r in merge_rollups(epoch_rollup(ev, ["event_type"], ep, "value"), ["event_type"]).collect()
    }
    want = direct(ev)
    assert set(merged) == set(want)
    for k in want:
        assert merged[k][0] == want[k][0]
        assert merged[k][2] == want[k][2] and merged[k][3] == want[k][3]
        assert abs(merged[k][1] - want[k][1]) < 1e-6 * max(1.0, abs(want[k][1]))

    # incremental path: old epochs' partials are REUSED, only the new
    # epoch is aggregated from raw
    cut = ev.select(F.max(ep).alias("m")).collect()[0]["m"]
    old, new = ev.where(ep < cut), ev.where(ep == cut)
    inc = merge_rollups(
        epoch_rollup(old, ["event_type"], ep, "value").unionByName(
            epoch_rollup(new, ["event_type"], ep, "value")
        ),
        ["event_type"],
    )
    inc_d = {
        r["event_type"]: (r["n"], round(r["sum_v"], 6))
        for r in inc.collect()
    }
    for k in want:
        assert inc_d[k][0] == want[k][0]
        assert abs(inc_d[k][1] - want[k][1]) < 1e-6 * max(1.0, abs(want[k][1]))


def test_duplicate_spans_flags_shared_block_only(spark):
    """A >= n-token block shared by two docs must mark windows in BOTH docs
    (screening guarantee: any match >= n tokens contains a full n-window);
    a doc with unique text must report zero duplicated windows, and a doc
    shorter than n tokens must be absent."""
    from semantic_index_spark.operators.dedup import duplicate_spans

    block = "one two three four five six seven eight"  # exactly 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {block} gamma delta"),
            (2, f"start {block} finish line here"),
            (3, "completely unrelated words nothing shared at all today"),
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in duplicate_spans(docs, n=8, min_docs=2).collect()}
    assert 4 not in got  # 2 tokens < n → no windows
    assert got[3]["n_dup"] == 0 and got[3]["dup_fraction"] == 0.0
    # the shared block yields exactly one common 8-window hash in each doc
    assert got[1]["n_dup"] >= 1 and got[2]["n_dup"] >= 1
    assert got[1]["n_spans"] == 5  # 12 tokens → 5 windows
    with pytest.raises(ValueError):
        duplicate_spans(docs, n=0)


# ------------------------------------------- per-group quantile filtering


def test_quantile_threshold_filter_one_bin_error_bound(spark):
    """The contract: every row an exact per-group median filter keeps is
    kept (threshold never overshoots the true quantile), and the surplus is
    bounded by ONE bin's worth of rows per group — the histogram threshold
    is the lower edge of the bin where the cumulative count crosses q."""
    from pyspark.sql import Window

    from semantic_index_spark.operators import pipeline as P

    rows = [(g, i / 64.0) for g in ("a", "b") for i in range(64)]
    rows += [("c", (i % 32) / 64.0) for i in range(64)]  # 2 rows per bin
    df = spark.createDataFrame(rows, "g string, v double")
    kept = sorted(map(tuple, P.quantile_threshold_filter(
        df, "v", "g", 0.5, 0.0, 1.0, bins=64
    ).collect()))
    w = Window.partitionBy("g").orderBy("v")
    exact = sorted(map(tuple, (
        df.withColumn("_pr", F.percent_rank().over(w))
        .where(F.col("_pr") >= 0.5)
        .drop("_pr")
    ).collect()))
    assert set(exact) <= set(kept)  # no exact-keeper is ever dropped
    # surplus ≤ one bin per group: groups a,b have 1 row/bin, c has 2
    from collections import Counter

    surplus = Counter(g for g, _ in kept) - Counter(g for g, _ in exact)
    assert surplus["a"] <= 1 and surplus["b"] <= 1 and surplus["c"] <= 2, surplus


def test_quantile_threshold_filter_is_per_group(spark):
    from semantic_index_spark.operators import pipeline as P

    rows = [("low", i / 100) for i in range(50)] + [("high", (50 + i) / 100) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, v double")
    kept = P.quantile_threshold_filter(df, "v", "g", 0.5, 0.0, 1.0, bins=100)
    counts = {r["g"]: r["n"] for r in kept.groupBy("g").agg(F.count("*").alias("n")).collect()}
    # a global median would wipe out group "low" entirely; per-group keeps ~half of each
    assert counts["low"] >= 20 and counts["high"] >= 20


# ------------------------------------------------- directed containment


def test_containment_asymmetric_quote_detection(spark):
    from semantic_index_spark.operators import dedup as D

    quote = "alpha beta gamma delta epsilon zeta"
    host = quote + " " + " ".join(f"filler{i}" for i in range(60))
    other = " ".join(f"unrelated{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, quote), (2, host), (3, other)], "doc_id long, text string"
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in D.containment_pairs(df, threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0  # the quote is fully contained in the host
    assert (2, 1) not in pairs  # host is NOT contained in the quote
    assert not any(3 in p for p in pairs)


def test_containment_vs_jaccard_blind_spot(spark):
    """The motivating case: full containment that Jaccard scores near zero."""
    from semantic_index_spark.operators import dedup as D

    small = " ".join(f"w{i}" for i in range(10))
    big = small + " " + " ".join(f"x{i}" for i in range(500))
    df = spark.createDataFrame([(1, small), (2, big)], "doc_id long, text string")
    cont = D.containment_pairs(df, threshold=0.9).collect()
    jac = D.ngram_jaccard_pairs(df, threshold=0.2).collect()
    assert len(cont) == 1 and cont[0]["id_a"] == 1  # containment finds it
    assert len(jac) == 0  # Jaccard misses it


# --------------------------------------------------- robust MAD outliers


def test_mad_outliers_flags_extreme_not_baseline(spark):
    from semantic_index_spark.operators import timeseries as TS

    rows = [("m", float(v)) for v in [10, 11, 12, 10, 11, 12, 10, 11, 1000]]
    df = spark.createDataFrame(rows, "g string, v double")
    out = TS.mad_outliers(df, "v", "g", k=3.5)
    flagged = [r["v"] for r in out.where("is_outlier").collect()]
    assert flagged == [1000.0]
    # the robust baseline ignores the outlier: median stays in the cluster
    med = out.select("group_median").first()["group_median"]
    assert 10 <= med <= 12


def test_mad_outliers_constant_group_flags_nothing(spark):
    from semantic_index_spark.operators import timeseries as TS

    df = spark.createDataFrame([("c", 5.0)] * 10, "g string, v double")
    out = TS.mad_outliers(df, "v", "g")
    assert out.where("is_outlier").count() == 0  # MAD=0 → z NULL, not inf
    assert out.count() == 10  # no rows lost


def test_mad_outliers_per_group_baselines(spark):
    """Each group gets its own baseline: a value normal for one group is
    anomalous for another."""
    from semantic_index_spark.operators import timeseries as TS

    rows = [("small", float(v)) for v in range(1, 12)]
    rows += [("big", 1000.0 + v) for v in range(1, 12)]
    rows += [("small", 1005.0)]  # huge for "small", normal-sized for "big"
    df = spark.createDataFrame(rows, "g string, v double")
    flagged = {
        (r["g"], r["v"])
        for r in TS.mad_outliers(df, "v", "g").where("is_outlier").collect()
    }
    assert flagged == {("small", 1005.0)}


# ---------------------------------------------------- one-pass profiler


def test_profile_table_stats(spark):
    from semantic_index_spark.operators import pipeline as P

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, None, 30.0), (3, "a", 10.0)],
        "id long, s string, v double",
    )
    prof = {r["column"]: r for r in P.profile_table(df).collect()}
    assert prof["id"]["n_rows"] == 4 and prof["id"]["n_null"] == 0
    assert prof["id"]["n_distinct"] == 3
    assert prof["s"]["n_null"] == 1 and prof["s"]["n_distinct"] == 2
    assert prof["v"]["min_value"] == "10.0" and prof["v"]["max_value"] == "30.0"
    assert prof["v"]["dtype"] == "double"


def test_profile_table_single_job_and_validation(spark):
    from semantic_index_spark.operators import pipeline as P
    from semantic_index_spark.plans import explain as E

    df = spark.range(100).selectExpr("id", "id % 7 AS b", "cast(id as string) AS s")
    plan = E.formatted_plan(P.profile_table(df))
    # one aggregate pass: no joins, no unions of per-column subqueries
    assert "Join" not in plan and "Union" not in plan
    with pytest.raises(ValueError):
        P.profile_table(df, ["nope"])


# ------------------------------------------- interval-interval overlap


def test_interval_overlap_matches_theta_join(spark):
    """Grid-bucketed overlap join must be ROW-IDENTICAL to the naive
    theta join — including pairs whose overlap spans many buckets (the
    designated-bucket dedup must emit each exactly once)."""
    a = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 4.0, 5.0), (3, 20.0, 21.0), (4, 7.0, 7.0)],
        "id_a long, lo_a double, hi_a double",
    )
    b = spark.createDataFrame(
        [(10, 9.5, 30.0), (11, 0.0, 0.5), (12, 4.5, 4.6), (13, 10.0, 11.0)],
        "id_b long, lo_b double, hi_b double",
    )
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in TS.interval_overlap_join(
            a, b, "lo_a", "hi_a", "lo_b", "hi_b", bucket_width=2.0
        ).collect()
    )
    expect = sorted(
        (r["id_a"], r["id_b"])
        for r in a.join(
            b, (F.col("lo_a") < F.col("hi_b")) & (F.col("lo_b") < F.col("hi_a"))
        ).collect()
    )
    assert got == expect
    # half-open: [0,10) does NOT meet [10,11); empty interval id_a=4 matches nothing
    assert (1, 13) not in got and not any(p[0] == 4 for p in got)


def test_interval_overlap_no_cartesian_no_distinct(spark):
    from semantic_index_spark.plans import explain as E

    a = spark.range(100).selectExpr("id AS id_a", "id * 1.0 AS lo_a", "id * 1.0 + 3 AS hi_a")
    b = spark.range(100).selectExpr("id AS id_b", "id * 1.1 AS lo_b", "id * 1.1 + 3 AS hi_b")
    df = TS.interval_overlap_join(a, b, "lo_a", "hi_a", "lo_b", "hi_b", bucket_width=4.0)
    plan = E.formatted_plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # structural dedup: no aggregate/distinct over the joined result
    assert plan.count("HashAggregate") == 0

    with pytest.raises(ValueError, match="column names"):
        TS.interval_overlap_join(
            a.withColumnRenamed("id_a", "x"),
            b.withColumnRenamed("id_b", "x"),
            "lo_a", "hi_a", "lo_b", "hi_b", bucket_width=4.0,
        )


# --------------------------------------------- per-group heavy hitters


def test_heavy_hitters_by_per_group_topn(spark):
    docs = spark.createDataFrame(
        [
            (1, "a", "x x x y z"),
            (2, "a", "x y y q"),
            (3, "b", "m m n"),
            (4, "b", "n n n m"),
        ],
        "doc_id long, source string, text string",
    )
    got = {
        (r["source"], r["tok"]): (r["n"], r["df_docs"])
        for r in TA.heavy_hitters_by(docs, "source", top_n=2).collect()
    }
    # group a: x appears 4x in 2 docs, y 3x in 2 docs; group b: n 4x/2, m 3x/2
    assert got == {
        ("a", "x"): (4, 2),
        ("a", "y"): (3, 2),
        ("b", "n"): (4, 2),
        ("b", "m"): (3, 2),
    }


def test_heavy_hitters_by_matches_direct_window(spark, sf_dir):
    """The skew-safe two-stage cap must be row-identical to the direct
    per-group row_number window on real corpus data."""
    from pyspark.sql import Window

    from semantic_index_spark.functions import text as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        (r["source"], r["tok"], r["n"])
        for r in TA.heavy_hitters_by(docs, "source", top_n=3).collect()
    )
    tok = docs.select("source", "doc_id", F.explode(T.tokens("text")).alias("tok"))
    c = tok.groupBy("source", "tok").agg(F.count("*").alias("n"))
    w = Window.partitionBy("source").orderBy(F.col("n").desc(), F.col("tok").asc())
    want = sorted(
        (r["source"], r["tok"], r["n"])
        for r in c.withColumn("_rn", F.row_number().over(w))
        .where("_rn <= 3")
        .collect()
    )
    assert got == want


# --------------------------------------------- token-budget selection


def test_budget_select_greedy_prefix(spark):
    from semantic_index_spark.operators import pipeline as P

    docs = spark.createDataFrame(
        [
            (1, 0.9, "a b c d"),          # 4 tokens, best
            (2, 0.8, "a b c d e f"),      # 6 tokens
            (3, 0.7, "a b"),              # would fit later, but prefix stops
            (4, 0.7, "a"),                # tie with 3 → doc_id order
        ],
        "doc_id long, q double, text string",
    )
    got = {r["doc_id"]: r["cum_tokens"] for r in P.budget_select(docs, 12, "q").collect()}
    # order: 1 (cum 4), 2 (cum 10), 3 (cum 12), 4 (cum 13 > 12 → out)
    assert got == {1: 4, 2: 10, 3: 12}
    # a tighter budget cuts strictly by prefix, not best-fit: 2 exceeds at 10 > 9
    got9 = {r["doc_id"] for r in P.budget_select(docs, 9, "q").collect()}
    assert got9 == {1}


def test_budget_select_distributed_matches_single_window(spark, sf_dir):
    """The range-partitioned prefix-sum must equal the naive global-window
    cumulative regardless of partition count."""
    from pyspark.sql import Window

    from semantic_index_spark.functions import text as T
    from semantic_index_spark.operators import pipeline as P

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", T.quality_score("text").alias("q"))
    )
    for parts in (3, 8):
        got = sorted(
            map(tuple, P.budget_select(docs, 5000, "q", partitions=parts).collect())
        )
        w = Window.orderBy(F.col("quality").desc(), F.col("doc_id").asc()).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        want = sorted(
            map(
                tuple,
                docs.select(
                    "doc_id",
                    F.col("q").alias("quality"),
                    F.size(T.tokens("text")).alias("n_tokens"),
                )
                .withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("bigint"))
                .where("cum_tokens <= 5000")
                .collect(),
            )
        )
        assert got == want, parts


# ------------------------------------------------ bloom-filtered join


def test_bloom_filtered_join_row_identical_to_plain(spark, sf_dir):
    from semantic_index_spark.operators import skew as SKW

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("okey"), "l_quantity"
    )
    sel = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where("o_totalprice > 300000")
        .select(F.col("o_orderkey").alias("okey"), "o_orderpriority")
    )
    got = sorted(map(tuple, SKW.bloom_filtered_join(li, sel, "okey").collect()))
    want = sorted(map(tuple, li.join(sel, "okey").collect()))
    assert got == want  # no false negatives → identical result


def test_bloom_filtered_join_screens_before_shuffle_and_validates(spark):
    from semantic_index_spark.operators import skew as SKW
    from semantic_index_spark.plans import explain as E

    big = spark.range(10_000).select(F.col("id").alias("k"), F.rand(1).alias("v"))
    small = spark.range(50).select(F.col("id").alias("k"))
    plan = E.formatted_plan(SKW.bloom_filtered_join(big, small, "k"))
    # the bloom bit-set broadcast appears (probe-side screen), and the
    # screen is a broadcast join — the big side never shuffles to be probed
    assert plan.count("BroadcastHashJoin") >= 1
    with pytest.raises(ValueError, match="inner/semi"):
        SKW.bloom_filtered_join(big, small, "k", how="left")


def test_dsir_weights_hand_computed(spark):
    import hashlib
    import math

    from semantic_index_spark.operators import text_analysis as TA

    docs = spark.createDataFrame(
        [
            (1, "a b", "t"),
            (2, "a c", "t"),
            (3, "a b", "r"),
            (4, "x y", "r"),
        ],
        "doc_id long, text string, source string",
    )
    B, a = 8, 1.0
    got = {
        row["doc_id"]: (row["n_feats"], row["logw_micro"])
        for row in TA.dsir_weights(
            docs, target_cond=F.col("source") == "t", buckets=B, alpha=a
        ).collect()
    }

    # independent reference: same md5 spec, pure python
    def bkt(f):
        return int(hashlib.md5(("dsir:" + f).encode()).hexdigest()[:15], 16) % B

    def feats(text):
        t = text.split()
        return t + [f"{w1} {w2}" for w1, w2 in zip(t, t[1:])]

    tgt = feats("a b") + feats("a c")
    raw = feats("a b") + feats("x y")
    ct = {b: sum(1 for f in tgt if bkt(f) == b) for b in range(B)}
    cr = {b: sum(1 for f in raw if bkt(f) == b) for b in range(B)}
    tt, tr = len(tgt), len(raw)

    def logw(text):
        s = 0
        for f in feats(text):
            ratio = ((ct[bkt(f)] + a) * (tr + a * B)) / (
                (cr[bkt(f)] + a) * (tt + a * B)
            )
            s += math.floor(math.log(ratio) * 1e6 + 0.5)
        return s

    assert set(got) == {3, 4}  # target docs are never scored
    assert got[3] == (3, logw("a b"))
    assert got[4] == (3, logw("x y"))
    # the target-like raw doc must outscore the alien one
    assert got[3][1] > got[4][1]


def test_group_minhash_similarity(spark):
    from semantic_index_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [
            # s1 and s2 share most of their unioned shingle sets; s3 is alien
            (1, "the quick brown fox jumps over the lazy dog", "s1"),
            (2, "pack my box with five dozen liquor jugs", "s1"),
            (3, "the quick brown fox jumps over the lazy dog today", "s2"),
            (4, "pack my box with five dozen liquor jugs now", "s2"),
            (5, "completely different words about spark shuffles", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    r = {
        (row["grp_a"], row["grp_b"]): (row["n_agree"], row["est_jaccard"])
        for row in D.group_minhash_similarity(
            docs, by="source", num_hashes=16, shingle_n=3
        ).collect()
    }
    assert set(r) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    for (a, b), (n, est) in r.items():
        assert 0 <= n <= 16 and est == round(n / 16.0, 6)
    # mirrors must estimate as far more similar than unrelated sources
    assert r[("s1", "s2")][0] > r[("s1", "s3")][0]
    assert r[("s1", "s2")][0] > r[("s2", "s3")][0]
    # identical corpora would agree on every hash: sanity-lock the
    # estimator's upper end with a self-mirror
    both = docs.union(
        docs.selectExpr("doc_id + 10 AS doc_id", "text", "'s1x' AS source").filter(
            "doc_id - 10 IN (1, 2)"
        )
    )
    r2 = {
        (row["grp_a"], row["grp_b"]): row["n_agree"]
        for row in D.group_minhash_similarity(
            both, by="source", num_hashes=16, shingle_n=3
        ).collect()
    }
    assert r2[("s1", "s1x")] == 16


def test_epoch_shard_order_properties(spark):
    from semantic_index_spark.operators import pipeline as P

    docs = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    out = P.epoch_shard_order(docs, epochs=2, n_shards=4).collect()
    assert len(out) == 400
    # positions within each (epoch, shard) are exactly 1..|shard|
    from collections import defaultdict

    by_shard = defaultdict(list)
    for r in out:
        by_shard[(r["epoch"], r["shard"])].append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # every doc appears exactly once per epoch
    per_epoch = defaultdict(set)
    for r in out:
        per_epoch[r["epoch"]].add(r["doc_id"])
    assert all(len(s) == 200 for s in per_epoch.values())
    # epochs produce genuinely different orders (salted hash)
    o0 = sorted((r["shard"], r["pos"], r["doc_id"]) for r in out if r["epoch"] == 0)
    o1 = sorted((r["shard"], r["pos"], r["doc_id"]) for r in out if r["epoch"] == 1)
    assert [d for *_, d in o0] != [d for *_, d in o1]
    # bit-reproducible across runs
    again = sorted(
        (r["epoch"], r["shard"], r["pos"], r["doc_id"])
        for r in P.epoch_shard_order(docs, epochs=2, n_shards=4).collect()
    )
    assert again == sorted(
        (r["epoch"], r["shard"], r["pos"], r["doc_id"]) for r in out
    )
    import pytest

    with pytest.raises(ValueError):
        P.epoch_shard_order(docs, epochs=0)


def test_table_checksum_properties(spark):
    from semantic_index_spark.operators import pipeline as P

    schema = "doc_id long, text string, src string"
    a = spark.createDataFrame(
        [(1, "alpha", "s"), (2, "beta", "s"), (3, None, "s")], schema
    )
    # same rows, different order → identical fingerprint
    b = spark.createDataFrame(
        [(3, None, "s"), (1, "alpha", "s"), (2, "beta", "s")], schema
    )
    ck = lambda df: P.table_checksum(df, ["doc_id", "text"]).collect()[0]
    assert ck(a) == ck(b)
    # one mutated value → different checksum, same count
    c = spark.createDataFrame(
        [(1, "alpha", "s"), (2, "BETA", "s"), (3, None, "s")], schema
    )
    assert ck(c)["n_rows"] == ck(a)["n_rows"]
    assert ck(c)["checksum"] != ck(a)["checksum"]
    # NULL is not the empty string and not the literal "null"
    d = spark.createDataFrame(
        [(1, "alpha", "s"), (2, "beta", "s"), (3, "", "s")], schema
    )
    e = spark.createDataFrame(
        [(1, "alpha", "s"), (2, "beta", "s"), (3, "null", "s")], schema
    )
    assert len({ck(x)["checksum"] for x in (a, d, e)}) == 3
    # the documented XOR caveat: even duplication cancels in the checksum
    # but is caught by n_rows
    f = a.union(a)
    assert ck(f)["checksum"] == 0 or ck(f)["checksum"] != ck(a)["checksum"]
    assert ck(f)["n_rows"] == 2 * ck(a)["n_rows"]
    # per-slice grouping keys the fingerprint
    g = P.table_checksum(
        a.withColumn("src", F.when(F.col("doc_id") < 3, "x").otherwise("y")),
        ["doc_id", "text"],
        by="src",
    ).collect()
    assert {r["src"] for r in g} == {"x", "y"}


def test_l_diversity_audit(spark):
    from semantic_index_spark.operators import privacy as PV

    rows = [
        # group (1, 1): 3 rows, all share the sensitive value -> violates
        (1, 1, "A"),
        (1, 1, "A"),
        (1, 1, "A"),
        # group (1, 2): 2 distinct values -> violates l=3
        (1, 2, "A"),
        (1, 2, "B"),
        # group (2, 1): 3 distinct values -> passes
        (2, 1, "A"),
        (2, 1, "B"),
        (2, 1, "C"),
    ]
    df = spark.createDataFrame(rows, "region int, band int, diagnosis string")
    got = {
        (r["region"], r["band"]): (r["group_size"], r["n_sensitive"])
        for r in PV.l_diversity_audit(
            df, ["region", "band"], "diagnosis", ell=3
        ).collect()
    }
    assert got == {(1, 1): (3, 1), (1, 2): (2, 2)}
    # k-anonymity alone would certify the homogeneous group: it is k=3
    assert (
        PV.k_anonymity_audit(df, ["region", "band"], k=3)
        .filter("region = 1 AND band = 1")
        .count()
        == 0
    )


def test_first_touch_attribution_hand_case(spark):
    from semantic_index_spark.operators import timeseries as TS

    rows = [
        # user 1, session A: view -> click -> purchase (credit: view)
        (1, 1, "2024-01-01 10:00:00", "view", 0.0),
        (2, 1, "2024-01-01 10:05:00", "click", 0.0),
        (3, 1, "2024-01-01 10:10:00", "purchase", 30.0),
        # user 1, session B (gap > 30 min): click -> purchase (credit: click)
        (4, 1, "2024-01-01 12:00:00", "click", 0.0),
        (5, 1, "2024-01-01 12:01:00", "purchase", 70.0),
        # user 2: purchase with no preceding touch credits itself
        (6, 2, "2024-01-01 09:00:00", "purchase", 5.0),
        # user 3: session without a conversion contributes nothing
        (7, 3, "2024-01-01 09:00:00", "view", 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["first_touch"]: (r["n_conversions"], r["total_value"])
        for r in TS.first_touch_attribution(
            ev, conversion="purchase", gap_s=1800
        ).collect()
    }
    assert got == {"view": (1, 30.0), "click": (1, 70.0), "purchase": (1, 5.0)}


def test_referential_integrity_nulls_vs_orphans(spark):
    from semantic_index_spark.operators import pipeline as P

    fact = spark.createDataFrame(
        [(1, 10), (2, 20), (3, None), (4, 99), (5, 10)], "id long, fk long"
    )
    dim = spark.createDataFrame([(10,), (20,), (30,)], "k long")
    row = P.referential_integrity([("fact_fk", fact, "fk", dim, "k")]).collect()[0]
    # NULL keys are not orphans; duplicates in the fact all count
    assert (row["relation"], row["n_rows"], row["n_null_keys"], row["n_orphans"]) == (
        "fact_fk", 5, 1, 1
    )
    # clean relation reports zeros
    clean = spark.createDataFrame([(1, 10)], "id long, fk long")
    r2 = P.referential_integrity([("c", clean, "fk", dim, "k")]).collect()[0]
    assert (r2["n_null_keys"], r2["n_orphans"]) == (0, 0)


def test_table_checksum_injective_encoding(spark):
    # adversarial cases for the length-prefix encoding: separator bytes
    # inside values, sentinel look-alikes, and boundary-shifted splits
    # must all fingerprint differently
    from semantic_index_spark.operators import pipeline as P

    ck = lambda rows: P.table_checksum(
        spark.createDataFrame(rows, "a string, b string"), ["a", "b"]
    ).collect()[0]["checksum"]
    assert ck([("a\x1fb", "c")]) != ck([("a", "b\x1fc")])
    assert ck([("n:", "x")]) != ck([(None, "x")])
    assert ck([("v1:a", "x")]) != ck([("a", "x")])
    assert ck([("ab", "")]) != ck([("a", "b")])
    assert ck([("", None)]) != ck([(None, "")])


def test_event_transition_matrix_hand_case(spark):
    from semantic_index_spark.operators import timeseries as TS

    rows = [
        (1, 1, "2024-01-01 10:00:00", "view"),
        (2, 1, "2024-01-01 10:01:00", "click"),
        (3, 1, "2024-01-01 10:02:00", "view"),
        (4, 1, "2024-01-01 10:03:00", "click"),
        (5, 2, "2024-01-01 10:00:00", "view"),
        (6, 2, "2024-01-01 10:01:00", "buy"),
        (7, 3, "2024-01-01 10:00:00", "view"),  # no successor -> no pair
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["prob"])
        for r in TS.event_transition_matrix(ev).collect()
    }
    # view -> click x2, view -> buy x1, click -> view x1; rows normalize
    assert got == {
        ("view", "click"): (2, round(2 / 3, 6)),
        ("view", "buy"): (1, round(1 / 3, 6)),
        ("click", "view"): (1, 1.0),
    }


def test_stratified_split_exact_proportions(spark):
    import pytest

    from semantic_index_spark.operators import skew as SKW

    df = spark.createDataFrame(
        [(i, "a" if i < 100 else "b") for i in range(107)],  # strata 100 + 7
        "doc_id long, lang string",
    )
    out = SKW.stratified_split(
        df, "lang", "doc_id", {"train": 8, "val": 1, "test": 1}
    ).collect()
    from collections import Counter

    by = Counter((r["lang"], r["fold"]) for r in out)
    # exact proportions within one row, per stratum
    assert by[("a", "train")] == 80 and by[("a", "val")] == 10 and by[("a", "test")] == 10
    assert by[("b", "train")] == 6  # floor boundaries of 7 rows at 8/1/1
    assert by[("b", "val")] + by[("b", "test")] == 1
    assert sum(by.values()) == 107
    # deterministic across runs
    again = SKW.stratified_split(
        df, "lang", "doc_id", {"train": 8, "val": 1, "test": 1}
    ).collect()
    assert sorted((r["doc_id"], r["fold"]) for r in out) == sorted(
        (r["doc_id"], r["fold"]) for r in again
    )
    with pytest.raises(ValueError):
        SKW.stratified_split(df, "lang", "doc_id", {"train": 0})


def test_dsir_weights_randomized_against_reference(spark):
    # seeded random corpora; exact match vs an independent pure-python
    # implementation, plus order-invariance of the result
    import hashlib
    import math
    import random

    from semantic_index_spark.operators import text_analysis as TA

    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    rows = [
        (
            i,
            " ".join(rng.choices(vocab, k=rng.randint(1, 12))),
            "t" if rng.random() < 0.4 else "r",
        )
        for i in range(60)
    ]
    B, a = 16, 1.0

    def bkt(f):
        return int(hashlib.md5(("dsir:" + f).encode()).hexdigest()[:15], 16) % B

    def feats(text):
        t = text.split()
        return t + [f"{w1} {w2}" for w1, w2 in zip(t, t[1:])]

    tgt = [f for (_, tx, s) in rows if s == "t" for f in feats(tx)]
    raw = [f for (_, tx, s) in rows if s == "r" for f in feats(tx)]
    ct = {b: sum(1 for f in tgt if bkt(f) == b) for b in range(B)}
    cr = {b: sum(1 for f in raw if bkt(f) == b) for b in range(B)}
    tt, tr = len(tgt), len(raw)

    def logw(text):
        s = 0
        for f in feats(text):
            ratio = ((ct[bkt(f)] + a) * (tr + a * B)) / (
                (cr[bkt(f)] + a) * (tt + a * B)
            )
            s += math.floor(math.log(ratio) * 1e6 + 0.5)
        return s

    want = {
        i: (len(feats(tx)), logw(tx)) for (i, tx, s) in rows if s == "r"
    }
    for perm in (rows, list(reversed(rows))):
        df = spark.createDataFrame(perm, "doc_id long, text string, source string")
        got = {
            r["doc_id"]: (r["n_feats"], r["logw_micro"])
            for r in TA.dsir_weights(
                df, target_cond=F.col("source") == "t", buckets=B, alpha=a
            ).collect()
        }
        assert got == want


def test_cdc_apply_last_writer_wins_and_tombstones(spark, sf_dir):
    from semantic_index_spark.operators import relational as R

    out = R.cdc_apply(spark, sf_dir)
    rows = {r["user_id"]: r for r in out.collect()}
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    # independent reference: python-side replay of the changelog
    import collections

    changes = collections.defaultdict(list)
    for r in ev.collect():
        changes[r["user_id"]].append(
            (int(r["ts"].timestamp()), r["event_id"], r["event_type"], r["value"])
        )
    for uid, log in changes.items():
        log.sort()
        tse, _, etype, value = log[-1]
        if etype == "error":
            assert uid not in rows  # terminal tombstone deletes the key
        else:
            got = rows[uid]
            assert got["last_type"] == etype
            assert got["last_tse"] == tse
            assert got["last_value_cents"] == math.floor(value * 100)
            assert got["n_changes"] == len(log)
    # every emitted key exists in the changelog
    assert set(rows) <= set(changes)


def test_skyline_frontier_is_pareto_optimal_and_complete(spark, sf_dir):
    from semantic_index_spark.operators import relational as R

    part = spark.read.parquet(os.path.join(sf_dir, "part.parquet"))
    pts = [
        (r["p_partkey"], round(r["p_retailprice"] * 100), r["p_size"])
        for r in part.collect()
    ]
    def dominated(p):
        return any(
            q[1] <= p[1] and q[2] >= p[2] and (q[1] < p[1] or q[2] > p[2])
            for q in pts
            if q[0] != p[0]
        )
    expect = {p[0] for p in pts if not dominated(p)}
    got = {r["p_partkey"] for r in R.skyline_frontier(spark, sf_dir).collect()}
    assert got == expect
    # the window runs over the distinct-price spine, not the fact table:
    # no NOT-EXISTS nested-loop join may appear in the plan
    plan = R.skyline_frontier(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_naive_bayes_confusion_matches_python_reference(spark, sf_dir):
    import collections

    from semantic_index_spark.operators import text_analysis as TA

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    got = {
        (r["actual_lang"], r["predicted_lang"]): r["n_docs"]
        for r in TA.naive_bayes_language(docs).collect()
    }
    rows = [(r["doc_id"], r["lang"], r["text"].strip().lower().split())
            for r in docs.collect()]
    cw = collections.Counter()
    tl = collections.Counter()
    nl = collections.Counter()
    vocab = set()
    for _, lang, toks in rows:
        nl[lang] += 1
        for w in toks:
            cw[(lang, w)] += 1
            tl[lang] += 1
            vocab.add(w)
    n_docs = sum(nl.values())
    v = len(vocab)
    micro = lambda x: math.floor(math.log(x) * 1e6 + 0.5)
    want = collections.Counter()
    langs = sorted(nl)
    for _, actual, toks in rows:
        scores = {}
        for l in langs:
            s = micro(nl[l] / n_docs) - len(toks) * micro(tl[l] + v)
            s += sum(micro(cw[(l, w)] + 1) for w in toks if (l, w) in cw)
            scores[l] = s
        pred = max(langs, key=lambda l: (scores[l], [-ord(c) for c in l]))
        want[(actual, pred)] += 1
    assert got == dict(want)


def test_quantile_normalize_is_exact_cume_dist(spark, sf_dir):
    from semantic_index_spark.operators import pipeline as P

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    got = {
        r["doc_id"]: r["pct_micro"]
        for r in P.quantile_normalize(docs, "source", "n_chars").collect()
    }
    by_source = {}
    for r in docs.collect():
        by_source.setdefault(r["source"], []).append((r["doc_id"], r["n_chars"]))
    for src, rows in by_source.items():
        vals = sorted(v for _, v in rows)
        n = len(vals)
        import bisect
        for doc_id, v in rows:
            r_le = bisect.bisect_right(vals, v)
            assert got[doc_id] == (r_le * 1000000) // n


def test_throttle_dedup_greedy_chain_matches_python(spark, sf_dir):
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    got = {r["user_id"]: r for r in TS.throttle_dedup(ev, cooldown_s=1800).collect()}
    per_user = {}
    for r in ev.collect():
        per_user.setdefault(r["user_id"], []).append(int(r["ts"].timestamp()))
    for uid, ts_list in per_user.items():
        xs = sorted(set(ts_list))
        kept = [xs[0]]
        for t in xs[1:]:
            if t >= kept[-1] + 1800:
                kept.append(t)
        row = got[uid]
        assert row["n_events"] == len(ts_list)
        assert row["n_distinct_seconds"] == len(xs)
        assert row["n_kept"] == len(kept)
        assert row["first_kept_tse"] == kept[0]
        assert row["last_kept_tse"] == kept[-1]


def test_holt_winters_matches_python_fold(spark, sf_dir):
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    got = {r["event_type"]: r for r in TS.holt_winters_level_trend(ev).collect()}
    daily = {}
    for r in ev.collect():
        key = (r["event_type"], r["ts"].date())
        daily[key] = daily.get(key, 0) + math.floor(r["value"] * 100)
    series = {}
    for (et, d), cents in daily.items():
        series.setdefault(et, []).append((d, cents))
    for et, rows in series.items():
        xs = [c for _, c in sorted(rows)]
        assert len(xs) >= 2
        level, trend = float(xs[1]), float(xs[1]) - float(xs[0])
        for x in xs[2:]:
            new_level = 0.3 * float(x) + 0.7 * (level + trend)
            trend = 0.1 * (new_level - level) + 0.9 * trend
            level = new_level
        row = got[et]
        assert row["n_days"] == len(xs)
        assert row["level_cents"] == math.floor(level)
        assert row["trend_cents"] == math.floor(trend)
        assert row["forecast7_cents"] == math.floor(level + 7.0 * trend)


def test_ivf_silhouette_matches_numpy_reference(spark, sf_dir):
    import numpy as np

    import __spark_entry__ as entrymod

    got = {
        r["cell"]: (r["n"], r["sum_s_micro"])
        for r in entrymod.q_ivf_silhouette(spark, sf_dir).collect()
    }
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).collect()
    C = np.asarray(entrymod.CENTROIDS, dtype=np.float64)
    want = {}
    for r in emb:
        x = np.asarray([float(v) for v in r["embedding"]], dtype=np.float64)
        dots = C @ x
        cell = int(np.argmax(dots))
        ds = np.sqrt(((x - C) ** 2).sum(axis=1))
        a = ds[cell]
        srt = np.sort(ds)
        b = srt[1] if a == srt[0] else srt[0]
        sm = math.floor(1e6 * (b - a) / max(a, b))
        n, s = want.get(cell, (0, 0))
        want[cell] = (n + 1, s + sm)
    # numpy sums in a different order than the Spark fold: allow the
    # per-point micro floor to sit one unit off at most, times n
    for cell, (n, s) in want.items():
        gn, gs = got[cell]
        assert gn == n
        assert abs(gs - s) <= n  # each point's floor can differ by ≤1


def test_trimmed_mean_udaf_matches_python(spark, sf_dir):
    import __spark_entry__ as entrymod

    got = {
        r["c_mktsegment"]: r
        for r in entrymod.q_trimmed_mean_udaf(spark, sf_dir).collect()
    }
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).collect()
    cust = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).collect()
    }
    groups = {}
    for r in orders:
        seg = cust.get(r["o_custkey"])
        if seg is not None:
            groups.setdefault(seg, []).append(round(100 * r["o_totalprice"]))
    for seg, cents in groups.items():
        a = sorted(cents)
        cut = len(a) // 4
        kept = a[cut : len(a) - cut]
        row = got[seg]
        assert row["n_orders"] == len(a)
        assert row["trimmed_n"] == len(kept)
        assert row["trimmed_sum_cents"] == sum(kept)


def test_collect_bounded_guard(spark):
    from semantic_index_spark.session import collect_bounded

    df = spark.range(100)
    # within cap: all rows, order/content unchanged
    rows = collect_bounded(df.orderBy("id"), 100, "test")
    assert [r["id"] for r in rows[:3]] == [0, 1, 2] and len(rows) == 100
    # past cap: raises with the named contract, never materializes the rest
    with pytest.raises(ValueError, match="99-row cap"):
        collect_bounded(df, 99, "test surface")
    # zero cap on empty input is fine
    assert collect_bounded(df.filter("id < 0"), 0) == []


def test_ensure_parallelism_compute_gaps(spark):
    # r13: poisson_bootstrap_ci, blocked_linkage and interval_overlap_join
    # route their compute-bound stages through ensure_parallelism — the
    # under-split input spreads up to cluster width with the row SET
    # unchanged, and an already-wide input passes through untouched
    from semantic_index_spark.operators.dedup import ensure_parallelism

    n = spark.sparkContext.defaultParallelism
    small = spark.range(1000).coalesce(1)
    spread = ensure_parallelism(small)
    assert spread.rdd.getNumPartitions() == n
    assert sorted(r["id"] for r in spread.collect()) == list(range(1000))
    # an input already at/above cluster width is returned AS-IS — the
    # at-scale no-op contract (no repartition of a well-split big input)
    wide = spark.range(1000).repartition(n + 4)
    assert ensure_parallelism(wide) is wide


def test_collect_bounded_operators_still_exact(spark, sf_dir):
    # the routed call sites must be behavior-preserving: k-means init and
    # MMR pool ride limits <= cap, gradient/inertia are 1-row aggregates
    from semantic_index_spark.operators import similarity as S

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    out = S.kmeans_fit(emb.limit(50), k=3, iters=2)
    assert out.count() == 3


# ------------------------------------------------------- stratified ATE


def test_stratified_ate_hand_computed(spark):
    from semantic_index_spark.operators import stats as ST

    rows = [
        ("a", True, 10),
        ("a", True, 20),
        ("a", False, 5),
        ("b", True, 100),
        ("b", False, 40),
        ("b", False, 60),
    ]
    df = spark.createDataFrame(rows, ["s", "t", "y"])
    out = {r["stratum"]: r for r in
           ST.stratified_treatment_effect(df, "s", "t", "y").collect()}
    assert out["a"]["mean_treated"] == 15.0
    assert out["a"]["mean_control"] == 5.0
    assert out["a"]["effect"] == 10.0
    assert out["b"]["effect"] == 50.0


def test_stratified_ate_empty_arm_is_null(spark):
    from semantic_index_spark.operators import stats as ST

    df = spark.createDataFrame([("a", True, 3), ("a", True, 5)], ["s", "t", "y"])
    r = ST.stratified_treatment_effect(df, "s", "t", "y").collect()[0]
    assert r["mean_treated"] == 4.0
    assert r["mean_control"] is None and r["effect"] is None


# ----------------------------------------------------------- best split


def test_best_split_perfect_separation(spark):
    from semantic_index_spark.operators import stats as ST

    # feature < 10 -> label 0, >= 10 -> label 1; the boundary threshold
    # has gain == parent entropy (= ln 2 for a balanced label)
    rows = [(float(v), 0) for v in range(0, 10)] + [
        (float(v), 1) for v in range(10, 20)
    ]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = ST.best_split(df, "x", "y", bucket_width=1.0).collect()
    best = max(out, key=lambda r: r["gain"])
    assert best["threshold"] == 9.0
    assert abs(best["gain"] - math.log(2)) < 1e-6
    assert best["n_left"] == 10 and best["pos_left"] == 0


def test_best_split_uninformative_feature_zero_gain(spark):
    from semantic_index_spark.operators import stats as ST

    # label independent of bucket -> every split has ~0 gain
    rows = [(float(v % 4), (v // 4) % 2) for v in range(64)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = ST.best_split(df, "x", "y", bucket_width=1.0).collect()
    assert all(abs(r["gain"]) < 1e-9 for r in out)
    # right side must be non-empty: the last bucket is never a threshold
    assert max(r["threshold"] for r in out) == 2.0


# --------------------------------------------------------- phrase search


def test_phrase_search_counts_overlapping_starts(spark):
    rows = [
        (1, "big table hash join on the table hash map"),
        (2, "hash table only reversed"),
        (3, "a a a"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["n_matches"] for r in
           TA.phrase_search(df, "table hash").collect()}
    assert out == {1: 2}
    # overlapping starts both count
    out3 = {r["doc_id"]: r["n_matches"] for r in
            TA.phrase_search(df, "a a").collect()}
    assert out3 == {3: 2}


def test_phrase_search_three_words_and_case(spark):
    df = spark.createDataFrame(
        [(1, "The Quick Brown fox"), (2, "quick brown dog")],
        ["doc_id", "text"],
    )
    out = TA.phrase_search(df, "quick brown fox").collect()
    assert [(r["doc_id"], r["n_matches"]) for r in out] == [(1, 1)]


# ------------------------------------------------------------------ LOCF


def test_resample_locf_fills_gaps_with_prior_sum(spark):
    rows = [
        ("u", "2026-01-01 01:00:00", 1.0),
        ("u", "2026-01-01 02:00:00", 2.0),
        ("u", "2026-01-04 03:00:00", 5.0),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "value"]).withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {str(r["day"]): r for r in
           TS.resample_locf(df, "ts", "k", "value").collect()}
    assert len(out) == 4  # dense Jan 1-4
    assert out["2026-01-01"]["value_cents"] == 300 and not out["2026-01-01"]["is_filled"]
    assert out["2026-01-02"]["value_cents"] == 300 and out["2026-01-02"]["is_filled"]
    assert out["2026-01-03"]["value_cents"] == 300 and out["2026-01-03"]["is_filled"]
    assert out["2026-01-04"]["value_cents"] == 500 and not out["2026-01-04"]["is_filled"]


# ------------------------------------------------------------------- geo


def test_grid_neighbor_join_exact_pairs(spark):
    from semantic_index_spark.operators import geo as GEO

    # b is across a cell boundary from a but within radius; c is far
    pts = spark.createDataFrame(
        [(1, 99, 0), (2, 101, 0), (3, 500, 500), (4, 99, 10)],
        ["id", "x", "y"],
    )
    out = {(r["id_a"], r["id_b"]): r["dist2"] for r in
           GEO.grid_neighbor_join(pts, radius=100).collect()}
    assert out[(1, 2)] == 4
    assert out[(1, 4)] == 100
    assert (2, 4) in out
    assert all(3 not in pair for pair in out)


def test_grid_neighbor_join_boundary_inclusive(spark):
    from semantic_index_spark.operators import geo as GEO

    pts = spark.createDataFrame([(1, 0, 0), (2, 10, 0), (3, 11, 0)], ["id", "x", "y"])
    out = {(r["id_a"], r["id_b"]) for r in
           GEO.grid_neighbor_join(pts, radius=10).collect()}
    assert (1, 2) in out      # dist == radius exactly
    assert (1, 3) not in out  # one past
    assert (2, 3) in out


# ------------------------------------------------------------ survivorship


def test_golden_records_field_survivorship(spark):
    from semantic_index_spark.operators import dedup as D

    recs = spark.createDataFrame(
        [
            (1, "en", "web", 100),
            (2, "fr", "web", 300),
            (3, "fr", "pdf", 200),
            (9, "zh", "api", 50),
        ],
        ["doc_id", "lang", "source", "n_chars"],
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (9, 9)], ["doc_id", "component"]
    )
    out = {r["cluster"]: r for r in D.golden_records(
        recs, labels, mode_cols=["lang", "source"], max_cols=["n_chars"]
    ).collect()}
    g = out[1]
    assert g["canonical_id"] == 1 and g["n_members"] == 3
    assert g["n_chars"] == 300
    assert g["lang"] == "fr"          # mode 2-of-3
    assert g["source"] == "web"       # web appears twice, pdf once
    assert out[9]["n_members"] == 1 and out[9]["lang"] == "zh"


def test_golden_records_mode_tie_breaks_smallest(spark):
    from semantic_index_spark.operators import dedup as D

    recs = spark.createDataFrame(
        [(1, "b"), (2, "a"), (3, "b"), (4, "a")], ["doc_id", "lang"]
    )
    labels = spark.createDataFrame([(i, 1) for i in (1, 2, 3, 4)],
                                   ["doc_id", "component"])
    r = D.golden_records(recs, labels, mode_cols=["lang"]).collect()[0]
    assert r["lang"] == "a"  # 2-2 tie -> smallest value


# ---------------------------------------------------------------- dp top-k


def test_dp_exponential_topk_shape_and_determinism(spark):
    from semantic_index_spark.operators import privacy as P

    rows = [(f"s{i % 7}",) for i in range(200)]
    df = spark.createDataFrame(rows, ["src"])
    a = P.dp_exponential_topk(df, "src", k=3).collect()
    b = P.dp_exponential_topk(df, "src", k=3).collect()
    assert a == b
    assert [r["rank"] for r in a] == [1, 2, 3]
    assert len({r["src"] for r in a}) == 3


def test_dp_exponential_topk_huge_epsilon_tracks_true_counts(spark):
    from semantic_index_spark.operators import privacy as P

    # eps so large the noise cannot reorder: top-1 must be the true mode
    rows = [("big",)] * 50 + [("mid",)] * 10 + [("sml",)] * 2
    df = spark.createDataFrame(rows, ["src"])
    out = P.dp_exponential_topk(df, "src", k=2, epsilon=100.0).collect()
    assert out[0]["src"] == "big" and out[1]["src"] == "mid"


# -------------------------------------------------------------------- PQ


def _pq_fixture(spark):
    import random

    rng = random.Random(7)
    # 3 well-separated cluster centers in 8-dim space
    centers = [[0.0] * 8, [10.0] * 8, [-10.0] * 8]
    rows = []
    for i in range(60):
        c = centers[i % 3]
        rows.append((i, [c[d] + rng.uniform(-0.5, 0.5) for d in range(8)]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_pq_encode_shape_and_determinism(spark):
    df = _pq_fixture(spark)
    codes1, cb1 = S.pq_train_encode(df, m_sub=2, k=4, iters=2)
    codes2, cb2 = S.pq_train_encode(df, m_sub=2, k=4, iters=2)
    assert cb1 == cb2
    got = codes1.collect()
    assert len(got) == 60 * 2
    assert all(0 <= r["code"] < 4 and r["sub"] in (0, 1) for r in got)
    assert sorted(map(tuple, got)) == sorted(map(tuple, codes2.collect()))


def test_pq_topk_finds_query_cluster(spark):
    df = _pq_fixture(spark)
    codes, cb = S.pq_train_encode(df, m_sub=2, k=4, iters=2)
    q = df.filter("vec_id = 0").collect()[0]["embedding"]
    top = S.pq_topk(codes, cb, q, k_results=20).collect()
    assert [r["rank"] for r in top] == list(range(1, 21))
    # the query's own cluster (vec_id % 3 == 0) fills the top ranks:
    # same-cluster vectors share codes, distance 0 to the query cell
    assert all(r["vec_id"] % 3 == 0 for r in top)
    assert top[0]["approx_dist2"] <= top[-1]["approx_dist2"]


def test_pq_dim_not_divisible_raises(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 1.0, 2.0])], "vec_id bigint, embedding array<float>"
    )
    with pytest.raises(ValueError):
        S.pq_train_encode(df, m_sub=2, k=2, iters=1)


def test_ivfpq_equals_pq_on_probed_candidates(spark):
    df = _pq_fixture(spark)
    codes, cb = S.pq_train_encode(df, m_sub=2, k=4, iters=2)
    q = df.filter("vec_id = 1").collect()[0]["embedding"]
    cents = S.make_centroids(4, 8, seed=5)
    got = S.ivfpq_topk(df, codes, cb, cents, q, k_results=5, nprobe=4).collect()
    # nprobe == K probes every cell -> identical to plain PQ ADC
    ref = S.pq_topk(codes, cb, q, k_results=5).collect()
    assert got == ref
    # nprobe=1 returns a subset of some cell, still ranked 1..n
    narrow = S.ivfpq_topk(df, codes, cb, cents, q, k_results=5, nprobe=1).collect()
    assert [r["rank"] for r in narrow] == list(range(1, len(narrow) + 1))


def test_ivfpq_index_roundtrip_and_indexed_serving(spark, tmp_path):
    # write_ivfpq_index + ivfpq_topk_indexed must equal the ad-hoc
    # ivfpq_topk on the raw table with the same frozen artifacts
    df = _pq_fixture(spark)
    codes, cb = S.pq_train_encode(df, m_sub=2, k=4, iters=2)
    cents = S.make_centroids(4, 8, seed=5)
    q = df.filter("vec_id = 1").collect()[0]["embedding"]
    idx = str(tmp_path / "ivfpq")
    S.write_ivfpq_index(df, cb, cents, idx)
    for nprobe in (1, 2, 4):
        got = S.ivfpq_topk_indexed(
            spark, idx, cb, cents, q, k_results=5, nprobe=nprobe
        ).collect()
        ref = S.ivfpq_topk(df, codes, cb, cents, q, k_results=5, nprobe=nprobe).collect()
        assert got == ref
    # plan-lock: the nprobe cell filter must land on the PARTITION column —
    # non-probed cells are pruned at planning time, never listed at 100 TB
    served = S.ivfpq_topk_indexed(spark, idx, cb, cents, q, k_results=5, nprobe=2)
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "_cell" in plan.split("PartitionFilters", 1)[1][:200]


def test_append_ivfpq_equals_rebuild(spark, tmp_path):
    # encoding is a pure function of (embedding, frozen artifacts): base
    # build + append of the remainder == from-scratch build of the union
    df = _pq_fixture(spark)
    _, cb = S.pq_train_encode(df, m_sub=2, k=4, iters=2)
    cents = S.make_centroids(4, 8, seed=5)
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    S.write_ivfpq_index(df.filter("vec_id % 3 != 2"), cb, cents, inc)
    S.append_ivfpq_index(df.filter("vec_id % 3 = 2"), cb, cents, inc, batch_id=0)
    S.write_ivfpq_index(df, cb, cents, full)
    key = ["vec_id", "sub", "code", "_cell"]
    got = sorted(map(tuple, spark.read.parquet(inc).select(*key).collect()))
    ref = sorted(map(tuple, spark.read.parquet(full).select(*key).collect()))
    assert got == ref and len(got) == 60 * 2


def test_ivfpq_sink_epoch_replay_idempotent(spark, tmp_path):
    # a re-delivered epoch (post-crash restart) must overwrite its own
    # batch_id partitions, not duplicate them
    from semantic_index_spark.streaming import ingest as SI

    df = _pq_fixture(spark)
    _, cb = S.pq_train_encode(df, m_sub=2, k=4, iters=2)
    cents = S.make_centroids(4, 8, seed=5)
    idx = str(tmp_path / "idx")
    S.write_ivfpq_index(df.filter("vec_id < 40"), cb, cents, idx)
    sink = SI.incremental_ivfpq_sink(idx, cb, cents)
    batch = df.filter("vec_id >= 40")
    sink(batch, 1)
    once = sorted(map(tuple, spark.read.parquet(idx).collect()))
    sink(batch, 1)  # replay
    assert sorted(map(tuple, spark.read.parquet(idx).collect())) == once
    assert len(once) == 60 * 2


def test_mutual_nn_hand_computed(spark):
    # a<->b mutual best; c's best is b but b's best is a -> c excluded
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [0.5, 0.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = S.mutual_nn(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)


def test_mutual_nn_symmetric_pairs_all_match(spark):
    # two tight clusters of two: both pairs mutual
    rows = [
        (1, [10.0, 0.0]), (2, [10.0, 0.1]),
        (3, [0.0, 10.0]), (4, [0.1, 10.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = {(r["id_a"], r["id_b"]) for r in S.mutual_nn(df).collect()}
    assert got == {(1, 2), (3, 4)}


def test_sequence_support_gapped_not_adjacent(spark):
    from semantic_index_spark.operators import mining as MN

    rows = [
        # u1: a .. c .. b  -> <a,b> holds despite the gap; <b,a> does not
        ("u1", "2026-01-01 00:00:00", "a"),
        ("u1", "2026-01-01 01:00:00", "c"),
        ("u1", "2026-01-01 02:00:00", "b"),
        # u2: b then a -> <b,a> holds
        ("u2", "2026-01-01 00:00:00", "b"),
        ("u2", "2026-01-01 01:00:00", "a"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"]).withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {(r["type_a"], r["type_b"]): r["support"]
           for r in MN.sequence_support(df, min_support=1).collect()}
    assert out[("a", "b")] == 1
    assert out[("a", "c")] == 1 and out[("c", "b")] == 1
    assert out[("b", "a")] == 1  # u2 only
    assert ("b", "c") not in out


def test_sequence_support_min_support_filters(spark):
    from semantic_index_spark.operators import mining as MN

    rows = [
        ("u1", "2026-01-01 00:00:00", "a"),
        ("u1", "2026-01-01 01:00:00", "b"),
        ("u2", "2026-01-01 00:00:00", "a"),
        ("u2", "2026-01-01 01:00:00", "b"),
        ("u3", "2026-01-01 00:00:00", "b"),
        ("u3", "2026-01-01 01:00:00", "a"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"]).withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {(r["type_a"], r["type_b"]): r["support"]
           for r in MN.sequence_support(df, min_support=2).collect()}
    assert out == {("a", "b"): 2}


def test_sequence_support_max_types_cap(spark):
    # the Σ|types|² contract: a type vocabulary past max_types must fail
    # fast with the pre-bucket remediation, not run a quadratic self-join
    from semantic_index_spark.operators import mining as MN

    rows = [("u1", f"2026-01-01 0{i}:00:00", f"t{i}") for i in range(5)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"]).withColumn(
        "ts", F.to_timestamp("ts")
    )
    with pytest.raises(ValueError, match="max_types"):
        MN.sequence_support(df, max_types=3).collect()
    # at the boundary (cardinality == max_types) it must still run
    assert MN.sequence_support(df, max_types=5).count() == 10


def test_mrl_truncate_renorm_and_recall(spark):
    df = _pq_fixture(spark)  # 8-dim clustered vectors
    t = S.mrl_truncate(df, 4)
    rows = t.collect()
    assert all(len(r["embedding"]) == 4 for r in rows)
    # unit norm after renormalization
    for r in rows[:10]:
        assert abs(sum(x * x for x in r["embedding"]) - 1.0) < 1e-9
    # truncated retrieval still finds the query's own cluster — use the
    # [10,…]-centered cluster (vec_id % 3 == 1): its members normalize to
    # ~[0.5]*4 (pairwise cos ≈ 1), while the zero-centered cluster
    # normalizes to arbitrary unit noise
    q = t.filter("vec_id = 1").collect()[0]["embedding"]
    top = S.topk(t, list(q), k=10)
    assert all(r["vec_id"] % 3 == 1 for r in top.collect())
    # no-renorm variant returns the raw prefix
    raw = S.mrl_truncate(df, 4, renormalize=False).filter("vec_id = 0").collect()[0]
    orig = df.filter("vec_id = 0").collect()[0]["embedding"]
    assert [round(x, 5) for x in raw["embedding"]] == [round(float(x), 5) for x in orig[:4]]
    with pytest.raises(ValueError):
        S.mrl_truncate(df, 0)


# ---------------------------------------------------------------------------
# SQ8 scalar quantization, filtered IVF, late-interaction MaxSim (r8)
# ---------------------------------------------------------------------------


def test_sq_encode_roundtrip_codes_and_determinism(spark):
    df = _pq_fixture(spark)  # 8-dim, 3 well-separated clusters
    model = S.sq_train(df)
    assert len(model["lo"]) == 8 and len(model["step"]) == 8
    codes = S.sq_encode(df, model)
    rows = codes.collect()
    assert len(rows) == 60
    # tinyint storage, full [-128, 127] range usable
    assert codes.schema["codes"].dataType.simpleString() == "array<tinyint>"
    for r in rows:
        assert len(r["codes"]) == 8
        assert all(-128 <= c <= 127 for c in r["codes"])
    # deterministic: retrain + re-encode is identical
    model2 = S.sq_train(df)
    assert model2 == model
    assert sorted(map(tuple, S.sq_encode(df, model2).collect())) == sorted(
        map(tuple, rows)
    )
    # dequantized vectors approximate the originals within step/2 per dim
    orig = {r["vec_id"]: r["embedding"] for r in df.collect()}
    for r in rows[:20]:
        for d, c in enumerate(r["codes"]):
            deq = model["lo"][d] + model["step"][d] * (c + 128)
            assert abs(deq - float(orig[r["vec_id"]][d])) <= model["step"][d] / 2 + 1e-9


def test_sq_constant_dimension_encodes_zero(spark):
    df = spark.createDataFrame(
        [(i, [1.5, float(i)]) for i in range(10)], "vec_id bigint, embedding array<float>"
    )
    model = S.sq_train(df)
    assert model["step"][0] == 0.0
    codes = {r["vec_id"]: r["codes"] for r in S.sq_encode(df, model).collect()}
    assert all(c[0] == -128 for c in codes.values())  # code 0, shifted


def test_sq_topk_rescore_matches_exact_topk(spark):
    # clusters are far apart relative to quantization error, so the
    # two-stage (ADC candidates -> exact rescore) result must EQUAL the
    # brute-force exact top-k, scores included (stage 2 is the exact dot)
    df = _pq_fixture(spark)
    model = S.sq_train(df)
    codes = S.sq_encode(df, model)
    q = [float(x) for x in df.filter("vec_id = 1").collect()[0]["embedding"]]
    got = S.sq_topk_rescore(codes, df, model, q, k=10, candidates=30)
    want = S.topk(df, q, k=10)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]
    # stage-1 plan: bounded top-k over the codes scan, no join, no shuffle
    from semantic_index_spark.plans import explain as E
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_ivf_topk_filtered_prunes_cells_and_pushes_predicate(spark, tmp_path):
    import random

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)], i % 4)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    cents = S.make_centroids(4, 8)
    path = str(tmp_path / "ivf_filtered")
    S.write_ivf_index(df, cents, path)
    q = [float(x) for x in rows[7][1]]
    got = S.ivf_topk_filtered(spark, path, q, cents, "label = 3", k=5, nprobe=2)
    rows_got = got.collect()
    assert len(rows_got) == 5
    # parity: same probe + filter + scoring done by hand on the raw frame
    probe = S._probe_cells(q, cents, 2)
    want = (
        S.ivf_assign(df, cents)
        .filter(F.col("_cell").isin(probe))
        .filter("label = 3")
    )
    from semantic_index_spark.functions import vector as V
    want = (
        want.select("vec_id", F.round(V.dot_literal(F.col("embedding"), q), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(5)
    )
    assert [tuple(r) for r in rows_got] == [tuple(r) for r in want.collect()]
    # every result satisfies the predicate
    assert all(r["vec_id"] % 4 == 3 for r in rows_got)
    # plan: cells pruned at PLANNING time + predicate pushed to the scan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "_cell" in plan.split("PartitionFilters", 1)[1][:200]
    assert "PushedFilters" in plan
    assert "label" in plan.split("PushedFilters", 1)[1][:200]


def test_late_interaction_maxsim_semantics(spark):
    # 2 docs x 2 tokens in 2-dim space; query = 2 tokens.
    # doc 0 tokens: e1, e2; doc 1 tokens: -e1, e2.
    toks = spark.createDataFrame(
        [
            (0, [1.0, 0.0]), (0, [0.0, 1.0]),
            (1, [-1.0, 0.0]), (1, [0.0, 1.0]),
        ],
        "doc_id bigint, embedding array<float>",
    )
    got = {r["doc_id"]: r["score_micros"]
           for r in S.late_interaction_topk(toks, [[1.0, 0.0], [0.0, 2.0]], k=10).collect()}
    # doc0: max(1,0) + max(0,2) = 3.0 ; doc1: max(-1,0) + max(0,2) = 2.0
    assert got == {0: 3_000_000, 1: 2_000_000}
    # top-k ordering + bound
    top = S.late_interaction_topk(toks, [[1.0, 0.0], [0.0, 2.0]], k=1).collect()
    assert [(r["doc_id"], r["score_micros"]) for r in top] == [(0, 3_000_000)]


def test_late_interaction_matches_single_vector_topk_when_one_token(spark):
    # with ONE query token and ONE token per doc, MaxSim degenerates to
    # the exact dot top-k (micro-integer scores)
    df = _pq_fixture(spark).withColumnRenamed("vec_id", "doc_id")
    q = [float(x) for x in df.filter("doc_id = 1").collect()[0]["embedding"]]
    got = S.late_interaction_topk(df, [q], k=10)
    want = S.topk(df.withColumnRenamed("doc_id", "vec_id"), q, k=10)
    got_ids = [r["doc_id"] for r in got.collect()]
    want_ids = [r["vec_id"] for r in want.collect()]
    assert got_ids == want_ids


def test_training_pipeline_e2e_stage_invariants(spark, sf_dir):
    # the composed pipeline's summary must be internally consistent:
    # stages only shrink, and packing covers exactly the surviving tokens
    import __spark_entry__ as entry

    r = entry.q_training_pipeline_e2e(spark, sf_dir).collect()[0]
    assert r["n_train"] >= r["n_quality"] >= r["n_dedup"] >= r["n_clean"] > 0
    # every stage actually filters something on the test corpus
    assert r["n_clean"] < r["n_train"]
    # n_seqs counts sequences holding a doc's FIRST token; the stream is
    # ceil(tok/B) sequences long, and first-token sequences are a subset
    budget = entry.PACK_BUDGET
    assert r["n_seqs"] <= (r["tok_clean"] + budget - 1) // budget
    assert r["n_spanning"] >= 0 and r["pack_checksum"] > 0


def test_ivfsq_indexed_matches_adhoc_two_stage_and_prunes(spark, tmp_path):
    # the composed layout must return exactly what the ad-hoc pipeline
    # (assign -> filter probed cells -> sq two-stage) returns, while the
    # plan prunes cells at planning time and scans only (id, codes)
    df = _pq_fixture(spark)  # 60 rows, 8-dim, 3 clusters
    cents = S.make_centroids(3, 8)
    model = S.sq_train(df)
    path = str(tmp_path / "ivfsq")
    S.write_ivfsq_index(df, cents, model, path)
    q = [float(x) for x in df.filter("vec_id = 1").collect()[0]["embedding"]]
    got = S.ivfsq_topk_indexed(
        spark, path, df, model, q, cents, k=5, nprobe=2, candidates=20
    )
    probe = S._probe_cells(q, cents, 2)
    adhoc_codes = S.sq_encode(
        S.ivf_assign(df, cents).filter(F.col("_cell").isin(probe)), model
    )
    want = S.sq_topk_rescore(adhoc_codes, df, model, q, k=5, candidates=20)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "_cell" in plan.split("PartitionFilters", 1)[1][:200]
    # the index scan reads codes, never a float embedding column
    import re
    scans = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    idx_scans = [ln for ln in scans if "codes" in ln]
    assert idx_scans and all("embedding" not in ln for ln in idx_scans)


def test_append_ivfsq_equals_rebuild(spark, tmp_path):
    # SQ8 encoding + cell assignment are pure functions of (embedding,
    # frozen artifacts): base build + append of the remainder must be
    # row-identical to a from-scratch build of the union — the same
    # contract as append_ivfpq_index, now symmetric across both
    # compressed served layouts
    df = _pq_fixture(spark)
    cents = S.make_centroids(3, 8)
    model = S.sq_train(df)
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    S.write_ivfsq_index(df.filter("vec_id % 3 != 2"), cents, model, inc)
    S.append_ivfsq_index(df.filter("vec_id % 3 = 2"), cents, model, inc, batch_id=0)
    S.write_ivfsq_index(df, cents, model, full)
    key = ["vec_id", "codes", "_cell"]
    got = sorted((r["vec_id"], tuple(r["codes"]), r["_cell"])
                 for r in spark.read.parquet(inc).select(*key).collect())
    ref = sorted((r["vec_id"], tuple(r["codes"]), r["_cell"])
                 for r in spark.read.parquet(full).select(*key).collect())
    assert got == ref and len(got) == 60


def test_ivfsq_sink_epoch_replay_idempotent(spark, tmp_path):
    # a re-delivered epoch (post-crash restart) must overwrite its own
    # batch_id partitions, not duplicate them
    from semantic_index_spark.streaming import ingest as SI

    df = _pq_fixture(spark)
    cents = S.make_centroids(3, 8)
    model = S.sq_train(df)
    idx = str(tmp_path / "idx")
    S.write_ivfsq_index(df.filter("vec_id < 40"), cents, model, idx)
    sink = SI.incremental_ivfsq_sink(idx, cents, model)
    batch = df.filter("vec_id >= 40")
    sink(batch, 1)
    once = sorted(
        (r["vec_id"], tuple(r["codes"]), r["_cell"], r["batch_id"])
        for r in spark.read.parquet(idx).collect()
    )
    sink(batch, 1)  # replay
    again = sorted(
        (r["vec_id"], tuple(r["codes"]), r["_cell"], r["batch_id"])
        for r in spark.read.parquet(idx).collect()
    )
    assert again == once and len(once) == 60
    # serving over the maintained layout equals serving over a rebuild
    q = [float(x) for x in df.filter("vec_id = 1").collect()[0]["embedding"]]
    full = str(tmp_path / "full")
    S.write_ivfsq_index(df, cents, model, full)
    got = S.ivfsq_topk_indexed(spark, idx, df, model, q, cents, k=5, nprobe=2)
    want = S.ivfsq_topk_indexed(spark, full, df, model, q, cents, k=5, nprobe=2)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]


def test_ivf_compressed_base_rebuild_truncates_stale_epochs(spark, tmp_path):
    # r10 (ADVICE r9): batch_id=-1 is the BASE build — the quantizer /
    # codebook re-train event — and must truncate the whole layout; a
    # dynamic overwrite would leave streamed batch_id>=0 partitions
    # encoded under the OLD artifacts in place, poisoning served
    # candidates. Dynamic overwrite stays reserved for epoch appends.
    df = _pq_fixture(spark)
    cents = S.make_centroids(3, 8)
    model = S.sq_train(df)
    sq = str(tmp_path / "sq")
    S.write_ivfsq_index(df.filter("vec_id < 40"), cents, model, sq)
    S.append_ivfsq_index(df.filter("vec_id >= 40"), cents, model, sq, batch_id=0)
    S.write_ivfsq_index(df, cents, model, sq)  # re-train rebuild
    dirs = {d for _, ds, _ in os.walk(sq) for d in ds}
    assert "batch_id=0" not in dirs and "batch_id=-1" in dirs
    got = sorted(r["vec_id"] for r in spark.read.parquet(sq).collect())
    assert got == list(range(60))  # exactly the rebuilt corpus, once
    # the PQ twin shares the contract
    _, cb = S.pq_train_encode(df, m_sub=2, k=4, iters=2)
    pq = str(tmp_path / "pq")
    S.write_ivfpq_index(df.filter("vec_id < 40"), cb, cents, pq)
    S.append_ivfpq_index(df.filter("vec_id >= 40"), cb, cents, pq, batch_id=0)
    S.write_ivfpq_index(df, cb, cents, pq)
    dirs = {d for _, ds, _ in os.walk(pq) for d in ds}
    assert "batch_id=0" not in dirs and "batch_id=-1" in dirs
    got = sorted(set(r["vec_id"] for r in spark.read.parquet(pq).collect()))
    assert got == list(range(60))
    # epoch appends still land additively after the rebuild
    S.append_ivfsq_index(df.limit(0), cents, model, sq, batch_id=1)
    got = sorted(r["vec_id"] for r in spark.read.parquet(sq).collect())
    assert got == list(range(60))


# ---------------------------------------------------------------- HNSW


def _hnsw_corpus(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )


def test_hnsw_exhaustive_equals_exact_topk(spark, sf_dir):
    from semantic_index_spark.operators import hnsw as H

    emb = _hnsw_corpus(spark, sf_dir)
    q = emb.filter("vec_id = 0").collect()[0]["embedding"]
    idx = H.build_hnsw(emb, n_shards=4, m=6, ef_construction=24)
    got = [(r["vec_id"], r["score"]) for r in H.hnsw_topk(idx, q, k=10, ef=None).collect()]
    want = [(r["vec_id"], r["score"]) for r in S.topk(emb, q, k=10).collect()]
    assert got == want


def test_hnsw_beam_recall_and_determinism(spark, sf_dir):
    from semantic_index_spark.operators import hnsw as H

    emb = _hnsw_corpus(spark, sf_dir)
    q = emb.filter("vec_id = 3").collect()[0]["embedding"]
    idx = H.build_hnsw(emb, n_shards=4, m=8, ef_construction=64)
    exact = {r["vec_id"] for r in S.topk(emb, q, k=10).collect()}
    approx = [r["vec_id"] for r in H.hnsw_topk(idx, q, k=10, ef=64).collect()]
    assert len(approx) == 10
    assert len(exact & set(approx)) >= 9  # recall@10 >= 0.9 with a real beam
    # two independent builds give byte-identical graphs (hash levels, id
    # tie-breaks, sorted insertion — no RNG state anywhere)
    idx2 = H.build_hnsw(emb, n_shards=4, m=8, ef_construction=64)
    a = sorted(map(tuple, idx.select("shard", "id", "max_level", "neighbors").collect()))
    b = sorted(map(tuple, idx2.select("shard", "id", "max_level", "neighbors").collect()))
    assert a == b


def test_hnsw_index_roundtrip_and_shard_partitioning(spark, sf_dir, tmp_path):
    from semantic_index_spark.operators import hnsw as H

    emb = _hnsw_corpus(spark, sf_dir).filter("vec_id < 120")
    q = emb.filter("vec_id = 7").collect()[0]["embedding"]
    path = str(tmp_path / "hnsw")
    H.write_hnsw_index(H.build_hnsw(emb, n_shards=3, m=4, ef_construction=16), path)
    dirs = {d for _, ds, _ in os.walk(path) for d in ds}
    assert {"shard=0", "shard=1", "shard=2"} <= dirs
    got = [(r["vec_id"], r["score"]) for r in H.hnsw_topk_indexed(spark, path, q, k=5, ef=None).collect()]
    want = [(r["vec_id"], r["score"]) for r in S.topk(emb, q, k=5).collect()]
    assert got == want


def test_hnsw_single_node_shard_and_small_corpus(spark):
    from semantic_index_spark.operators import hnsw as H

    rows = [(i, [float(i), 1.0]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = H.build_hnsw(df, n_shards=5, m=2, ef_construction=4)
    got = [r["vec_id"] for r in H.hnsw_topk(idx, [1.0, 0.0], k=3, ef=None).collect()]
    assert got == [4, 3, 2]


def test_hnsw_append_equals_rebuild_for_monotone_ids(spark, sf_dir, tmp_path):
    from semantic_index_spark.operators import hnsw as H

    emb = _hnsw_corpus(spark, sf_dir).filter("vec_id < 150")
    base, batch = emb.filter("vec_id < 100"), emb.filter("vec_id >= 100")
    path = str(tmp_path / "inc")
    H.write_hnsw_index(
        H.build_hnsw(base, n_shards=3, m=4, ef_construction=16),
        path, n_shards=3, m=4, ef_construction=16,
    )
    H.append_hnsw_index(batch, path)
    got = sorted(
        map(tuple, spark.read.parquet(path).select("id", "max_level", "neighbors").collect())
    )
    want = sorted(
        map(tuple,
            H.build_hnsw(emb, n_shards=3, m=4, ef_construction=16)
            .select("id", "max_level", "neighbors").collect())
    )
    assert got == want
    # and the appended index serves exactly (exhaustive mode)
    from semantic_index_spark.operators import similarity as S
    q = emb.filter("vec_id = 2").collect()[0]["embedding"]
    got_k = [(r["vec_id"], r["score"]) for r in H.hnsw_topk_indexed(spark, path, q, k=5, ef=None).collect()]
    want_k = [(r["vec_id"], r["score"]) for r in S.topk(emb, q, k=5).collect()]
    assert got_k == want_k


def test_hnsw_append_rewrites_only_affected_shards(spark, tmp_path):
    import os

    from semantic_index_spark.operators import hnsw as H

    rows = [(i, [float(i % 7), 1.0]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "inc2")
    H.write_hnsw_index(
        H.build_hnsw(df, n_shards=4, m=2, ef_construction=8),
        path, n_shards=4, m=2, ef_construction=8,
    )
    # find one new id and the shards it does NOT touch
    batch = spark.createDataFrame([(1000, [3.0, 1.0])], "vec_id long, embedding array<double>")
    hit = batch.selectExpr("cast(pmod(xxhash64(vec_id), 4) as int) s").collect()[0]["s"]
    untouched = [s for s in range(4) if s != hit]
    before = {
        s: sorted(os.listdir(os.path.join(path, f"shard={s}"))) for s in untouched
    }
    H.append_hnsw_index(batch, path)
    after = {
        s: sorted(os.listdir(os.path.join(path, f"shard={s}"))) for s in untouched
    }
    assert before == after  # dynamic overwrite left other shards' files alone
    assert 1000 in {r["id"] for r in spark.read.parquet(path).filter(f"shard = {hit}").collect()}


def test_hnsw_append_duplicate_id_raises(spark, tmp_path):
    from semantic_index_spark.operators import hnsw as H

    rows = [(i, [float(i), 1.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "inc3")
    H.write_hnsw_index(
        H.build_hnsw(df, n_shards=2, m=2, ef_construction=8),
        path, n_shards=2, m=2, ef_construction=8,
    )
    with pytest.raises(Exception, match="duplicate ids"):
        H.append_hnsw_index(
            spark.createDataFrame([(3, [9.0, 1.0])], "vec_id long, embedding array<double>"),
            path,
        )


def test_hnsw_topk_multi_matches_per_query_search(spark, sf_dir):
    from semantic_index_spark.operators import hnsw as H

    emb = _hnsw_corpus(spark, sf_dir)
    idx = H.build_hnsw(emb, n_shards=4, m=6, ef_construction=24).localCheckpoint()
    queries = emb.filter("vec_id < 3").select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_embedding")
    )
    multi = H.hnsw_topk_multi(idx, queries, k=5, ef=None).collect()
    assert len(multi) == 15
    by_q = {}
    for r in multi:
        by_q.setdefault(r["q_id"], []).append((r["rank"], r["vec_id"], r["score"]))
    for qid in (0, 1, 2):
        q = emb.filter(f"vec_id = {qid}").collect()[0]["embedding"]
        single = [
            (i + 1, r["vec_id"], r["score"])
            for i, r in enumerate(H.hnsw_topk(idx, q, k=5, ef=None).collect())
        ]
        assert sorted(by_q[qid]) == single
    # exact parity with brute force multi-query
    exact = {
        (r["q_id"], r["rank"]): (r["vec_id"], r["score"])
        for r in S.topk_multi(emb, queries, k=5).collect()
    }
    got = {(r["q_id"], r["rank"]): (r["vec_id"], r["score"]) for r in multi}
    assert got == exact
    # empty panel → empty result, stable schema
    assert H.hnsw_topk_multi(idx, queries.limit(0), k=5).count() == 0


def test_hnsw_topk_filtered_exact_and_waypoint_routing(spark, sf_dir):
    from semantic_index_spark.operators import hnsw as H

    emb = _hnsw_corpus(spark, sf_dir)
    full = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = emb.filter("vec_id = 0").collect()[0]["embedding"]
    idx = H.build_hnsw(emb, n_shards=4, m=6, ef_construction=24).localCheckpoint()
    allowed = full.filter("label = 3").select("vec_id")
    got = [
        (r["vec_id"], r["score"])
        for r in H.hnsw_topk_filtered(idx, allowed, q, k=5, ef=None).collect()
    ]
    want = [
        (r["vec_id"], r["score"])
        for r in S.topk(
            emb.join(allowed, "vec_id", "left_semi"), q, k=5
        ).collect()
    ]
    assert got == want and len(got) == 5
    # every hit satisfies the predicate
    lbls = {r["vec_id"] for r in full.filter("label = 3").collect()}
    assert all(v in lbls for v, _ in got)
    # empty allowed set → empty result
    assert H.hnsw_topk_filtered(idx, allowed.limit(0), q, k=5).count() == 0
    # real-beam path returns only allowed rows too (recall probabilistic,
    # membership exact)
    beam = H.hnsw_topk_filtered(idx, allowed, q, k=5, ef=64).collect()
    assert beam and all(r["vec_id"] in lbls for r in beam)


def test_hnsw_sink_epoch_replay_idempotent(spark, sf_dir, tmp_path):
    """Streaming HNSW maintenance: a re-delivered epoch is skipped via the
    meta-file ledger (exactly-once for a STATEFUL structure), and the
    final graph equals applying each epoch once."""
    from semantic_index_spark.operators import hnsw as H
    from semantic_index_spark.streaming.ingest import incremental_hnsw_sink

    emb = _hnsw_corpus(spark, sf_dir).filter("vec_id < 150")
    path = str(tmp_path / "hnsw_stream")
    H.write_hnsw_index(
        H.build_hnsw(emb.filter("vec_id < 100"), n_shards=3, m=4, ef_construction=16),
        path, n_shards=3, m=4, ef_construction=16,
    )
    sink = incremental_hnsw_sink(path)
    b1 = emb.filter("vec_id >= 100 AND vec_id < 125")
    b2 = emb.filter("vec_id >= 125")
    sink(b1, 0)
    sink(b1, 0)  # replayed epoch: skipped (duplicate ids would error)
    sink(b2, 1)
    sink(b2, 1)
    got = sorted(
        map(tuple, spark.read.parquet(path).select("id", "max_level", "neighbors").collect())
    )
    want = sorted(
        map(tuple,
            H.build_hnsw(emb, n_shards=3, m=4, ef_construction=16)
            .select("id", "max_level", "neighbors").collect())
    )
    assert got == want
    import json
    with open(path + "/_hnsw_meta.json") as f:
        assert json.load(f)["applied_epochs"] == [0, 1]


def test_hnsw_delete_tombstones_and_compact(spark, sf_dir, tmp_path):
    """Graph-layout DVs: O(delete-keys) tombstone writes applied at serve
    (deleted nodes keep routing, never rank); compact folds them into a
    live-only rebuild with identical serve results."""
    from semantic_index_spark.operators import hnsw as H

    emb = _hnsw_corpus(spark, sf_dir)
    q = emb.filter("vec_id = 4").collect()[0]["embedding"]
    path = str(tmp_path / "dv")
    H.write_hnsw_index(
        H.build_hnsw(emb, n_shards=3, m=6, ef_construction=24),
        path, n_shards=3, m=6, ef_construction=24,
    )
    H.delete_from_hnsw_index(emb.filter("vec_id % 7 = 0").select("vec_id"), path)
    want = [
        (r["vec_id"], r["score"])
        for r in S.topk(emb.filter("vec_id % 7 != 0"), q, k=5).collect()
    ]
    got = [
        (r["vec_id"], r["score"])
        for r in H.hnsw_topk_indexed(spark, path, q, k=5, ef=None).collect()
    ]
    assert got == want
    # graph untouched by the delete: all nodes still stored
    n_before = spark.read.parquet(path).count()
    assert n_before == emb.count()
    # compact: identical serve, tombstones cleared, dead nodes gone
    folded = H.compact_hnsw_index(spark, path)
    assert folded == emb.filter("vec_id % 7 = 0").count()
    got2 = [
        (r["vec_id"], r["score"])
        for r in H.hnsw_topk_indexed(spark, path, q, k=5, ef=None).collect()
    ]
    assert got2 == want
    assert H.read_tombstones(spark, path) == set()
    assert spark.read.parquet(path).count() == emb.filter("vec_id % 7 != 0").count()
    # a deleted id becomes insertable again after compaction
    H.append_hnsw_index(
        emb.filter("vec_id = 0").select("vec_id", "embedding"), path
    )
    assert 0 in {r["id"] for r in spark.read.parquet(path).collect()}
    assert H.compact_hnsw_index(spark, path) == 0  # no tombstones -> no-op


def test_hnsw_concurrent_appends_serialize(spark, sf_dir, tmp_path):
    """Round 11 (VERDICT r10 #1): concurrent appenders SERIALIZE on the
    layout commit lock — every batch's nodes land. Without the lock this
    interleaves: both appenders read the same shard state and the loser's
    dynamic partition overwrite silently drops the winner's nodes."""
    import threading

    from semantic_index_spark.operators import hnsw as H

    emb = _hnsw_corpus(spark, sf_dir).filter("vec_id < 240")
    base = emb.filter("vec_id < 120")
    path = str(tmp_path / "occ")
    H.write_hnsw_index(
        H.build_hnsw(base, n_shards=3, m=4, ef_construction=16),
        path, n_shards=3, m=4, ef_construction=16,
    )
    batches = [
        emb.filter(f"vec_id >= {lo} AND vec_id < {lo + 40}")
        for lo in (120, 160, 200)
    ]
    errs = []

    def run(b):
        try:
            H.append_hnsw_index(b, path)
        except Exception as e:  # surfaced after join
            errs.append(e)

    ths = [threading.Thread(target=run, args=(b,)) for b in batches]
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    assert not errs, errs
    got_ids = sorted(r["id"] for r in spark.read.parquet(path).select("id").collect())
    assert got_ids == list(range(240))  # no batch lost, no id duplicated
    # exhaustive serve is EXACT regardless of which serial order won
    q = emb.filter("vec_id = 7").collect()[0]["embedding"]
    got = [
        (r["vec_id"], r["score"])
        for r in H.hnsw_topk_indexed(spark, path, q, k=10, ef=None).collect()
    ]
    want = [(r["vec_id"], r["score"]) for r in S.topk(emb, q, k=10).collect()]
    assert got == want


def test_ivf_concurrent_appends_serialize(spark, tmp_path):
    """Round 11 (VERDICT r10 #1): IVF appends take the same layout commit
    lock — concurrent append jobs no longer race each other's _temporary
    staging inside the target directory; every batch's rows land."""
    import threading

    df = spark.range(60).selectExpr(
        "id AS vec_id",
        "array(cast(id % 7 as double), cast(id % 5 as double)) AS embedding",
    )
    cents = [[1.0, 0.0], [0.0, 1.0]]
    path = str(tmp_path / "ivfocc")
    S.write_ivf_index(df.filter("vec_id < 20"), cents, path)
    errs = []

    def run(lo):
        try:
            S.append_ivf_index(
                df.filter(f"vec_id >= {lo} AND vec_id < {lo + 20}"), cents, path
            )
        except Exception as e:
            errs.append(e)

    ths = [threading.Thread(target=run, args=(lo,)) for lo in (20, 40)]
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    assert not errs, errs
    got = sorted(r["vec_id"] for r in spark.read.parquet(path).collect())
    assert got == list(range(60))


def test_hnsw_compact_large_tombstone_set_antijoin(spark, tmp_path):
    """Round 11 (VERDICT r10 #2): compaction removes dead ids with an
    ANTI-JOIN against the tombstone DataFrame — a ~100k-id tombstone set
    (which as an isin() literal list would blow up the optimizer's
    expression tree) compacts fine, and serve identity holds."""
    from semantic_index_spark.operators import hnsw as H

    rows = [
        (int(i), [float((i * 37) % 11), float((i * 53) % 13)]) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "bigdv")
    H.write_hnsw_index(
        H.build_hnsw(df, n_shards=2, m=4, ef_construction=16),
        path, n_shards=2, m=4, ef_construction=16,
    )
    # tombstone 100k distinct ids; only 100..199 actually live in the graph
    H.delete_from_hnsw_index(
        spark.range(100, 100_100).selectExpr("id AS vec_id"), path
    )
    folded = H.compact_hnsw_index(spark, path)
    assert folded == 100_000
    live = sorted(r["id"] for r in spark.read.parquet(path).select("id").collect())
    assert live == list(range(100))
    q = rows[5][1]
    got = [
        r["vec_id"]
        for r in H.hnsw_topk_indexed(spark, path, q, k=5, ef=None).collect()
    ]
    want = [r["vec_id"] for r in S.topk(df.filter("vec_id < 100"), q, k=5).collect()]
    assert got == want
    # the swap left no construction debris behind
    import os

    assert not os.path.exists(path + ".__compact_tmp__")
    assert not os.path.exists(path + ".__compact_old__")


def test_hnsw_interleaved_append_recall_vs_rebuild(spark, tmp_path):
    """Round 11 (VERDICT r10 #6): the interleaved-id append contract as a
    NUMBER. Appending ids below the existing max diverges from the
    from-scratch rebuild's insertion order (standard HNSW order
    sensitivity); measure recall@10 at production ef against exact brute
    force and hold the append graph to >= 0.95."""
    import numpy as np

    from semantic_index_spark.operators import hnsw as H

    rng = np.random.default_rng(11)
    n, d = 400, 16
    mat = rng.normal(size=(n, d))
    rows = [(i, [float(x) for x in mat[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = df.filter("vec_id % 2 = 0")  # evens first...
    batch = df.filter("vec_id % 2 = 1")  # ...odds appended: fully interleaved
    path = str(tmp_path / "inter")
    H.write_hnsw_index(
        H.build_hnsw(base, n_shards=2, m=8, ef_construction=64),
        path, n_shards=2, m=8, ef_construction=64,
    )
    H.append_hnsw_index(batch, path)
    qs = spark.createDataFrame(
        [(i, rows[i][1]) for i in range(0, 200, 10)],
        "q_id long, q_embedding array<double>",
    )
    exact = {}
    for r in S.topk_multi(df, qs, k=10).collect():
        exact.setdefault(r["q_id"], set()).add(r["vec_id"])
    got = {}
    for r in H.hnsw_topk_multi(
        spark.read.parquet(path), qs, k=10, ef=64
    ).collect():
        got.setdefault(r["q_id"], set()).add(r["vec_id"])
    hits = sum(len(exact[q] & got[q]) for q in exact)
    recall = hits / (10 * len(exact))
    # measured 1.000 on this corpus (seed 11, 400x16, m=8, ef=64); the
    # contract floor is 0.95 — insertion-order sensitivity is real but
    # small at production beam widths
    assert recall >= 0.95, f"interleaved append recall@10 = {recall:.3f}"


def test_hnsw_compact_crash_recovery(spark, tmp_path):
    """Round 11: recover_hnsw_layout repairs every crash state the
    compaction swap can leave — old-aside-only (rename back, tombstones
    intact) and new-complete (finish the swap) — and is a cleanup no-op
    on a healthy layout."""
    import os
    import shutil

    from semantic_index_spark.operators import hnsw as H

    rows = [(int(i), [float((i * 37) % 11), float((i * 53) % 13)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "rec")
    H.write_hnsw_index(
        H.build_hnsw(df, n_shards=2, m=4, ef_construction=16),
        path, n_shards=2, m=4, ef_construction=16,
    )
    H.delete_from_hnsw_index(spark.range(0, 10).selectExpr("id AS vec_id"), path)
    q = rows[15][1]
    want = [
        (r["vec_id"], r["score"])
        for r in H.hnsw_topk_indexed(spark, path, q, k=5, ef=None).collect()
    ]
    tmp = path + ".__compact_tmp__"
    old = path + ".__compact_old__"
    # state A: crash between the two renames with tmp INCOMPLETE is
    # impossible (tmp is fully written before any rename), but a pre-swap
    # crash leaves path + debris: recover cleans up
    os.makedirs(tmp + "/junk")
    assert H.recover_hnsw_layout(path) == "ok"
    assert not os.path.exists(tmp)
    # state B: crash after old moved aside, new never landed
    os.rename(path, old)
    assert H.recover_hnsw_layout(path) == "recovered-old"
    got = [
        (r["vec_id"], r["score"])
        for r in H.hnsw_topk_indexed(spark, path, q, k=5, ef=None).collect()
    ]
    assert got == want  # tombstones still apply after recovery
    assert H.read_tombstones(spark, path) != set()
    # state C: crash between the renames with the NEW layout complete —
    # simulate by compacting into tmp for real, then losing path
    folded = H.compact_hnsw_index(spark, path)
    assert folded == 10
    shutil.copytree(path, tmp)  # a complete new layout in the tmp slot
    shutil.rmtree(path)
    assert H.recover_hnsw_layout(path) == "recovered-new"
    got2 = [
        (r["vec_id"], r["score"])
        for r in H.hnsw_topk_indexed(spark, path, q, k=5, ef=None).collect()
    ]
    assert got2 == want
    # nothing to recover -> loud error
    import pytest

    shutil.rmtree(path)
    with pytest.raises(FileNotFoundError):
        H.recover_hnsw_layout(path)


def test_r12_compact_tmp_meta_carries_ledger_atomically(spark, tmp_path, monkeypatch):
    """ADVICE r11: compact writes tmp's meta ONCE with the replay ledger
    already merged — a crash between tmp completion and the swap leaves a
    tmp whose meta has applied_epochs, so recovery + epoch replay still
    skips (the exactly-once contract survives the crash)."""
    import json
    import os
    import shutil

    from semantic_index_spark.operators import hnsw as H

    rows = [(int(i), [float((i * 37) % 11), float((i * 53) % 13)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "led")
    H.write_hnsw_index(
        H.build_hnsw(df, n_shards=2, m=4, ef_construction=16),
        path, n_shards=2, m=4, ef_construction=16,
    )
    batch = spark.createDataFrame(
        [(100, [1.0, 2.0]), (101, [3.0, 4.0])], "vec_id long, embedding array<double>"
    )
    H.append_hnsw_index(batch, path, epoch_id=1)
    H.delete_from_hnsw_index(spark.range(0, 5).selectExpr("id AS vec_id"), path)
    # crash the compaction at the first rename: tmp is complete, path intact
    real_rename = os.rename

    def crash_rename(src, dst):
        if src.rstrip("/") == path.rstrip("/"):
            raise OSError("simulated crash before the swap")
        return real_rename(src, dst)

    import pytest

    with monkeypatch.context() as m:
        m.setattr(os, "rename", crash_rename)
        with pytest.raises(OSError, match="simulated crash"):
            H.compact_hnsw_index(spark, path)
    tmp = path + ".__compact_tmp__"
    with open(H._meta_path(tmp)) as f:
        tmp_meta = json.load(f)
    # THE invariant: meta presence == complete layout INCLUDING the ledger
    assert tmp_meta.get("applied_epochs") == [1]
    # finish the crash into state C (path lost, complete tmp) and recover
    shutil.rmtree(path)
    assert H.recover_hnsw_layout(path) == "recovered-new"
    # the replayed epoch is skipped, not double-inserted
    H.append_hnsw_index(batch, path, epoch_id=1)
    ids = {r["id"] for r in spark.read.parquet(path).select("id").collect()}
    assert ids == (set(range(5, 60)) | {100, 101})


def test_r12_hnsw_maintenance_status_advisor(spark, tmp_path):
    """VERDICT r11 #8 (optional): the dry-run compaction advisor — reports
    exactly what compact_hnsw_index would fold, recommends at the ratio
    threshold, mutates nothing, and flips after a real compaction."""
    from semantic_index_spark.operators import hnsw as H

    rows = [(int(i), [float((i * 37) % 11), float((i * 53) % 13)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "adv")
    H.write_hnsw_index(
        H.build_hnsw(df, n_shards=2, m=4, ef_construction=16),
        path, n_shards=2, m=4, ef_construction=16,
    )
    H.append_hnsw_index(
        spark.createDataFrame([(100, [1.0, 2.0])], "vec_id long, embedding array<double>"),
        path, epoch_id=9,
    )
    st0 = H.hnsw_maintenance_status(spark, path)
    assert st0 == {
        "n_nodes": 51, "n_tombstones": 0, "tombstone_ratio": 0.0,
        "n_shards": 2, "n_applied_epochs": 1, "recommend_compact": False,
    }
    H.delete_from_hnsw_index(spark.range(0, 10).selectExpr("id AS vec_id"), path)
    st1 = H.hnsw_maintenance_status(spark, path)
    assert st1["n_nodes"] == 51 and st1["n_tombstones"] == 10
    assert st1["recommend_compact"] is False  # 10/51 < 0.2
    assert H.hnsw_maintenance_status(spark, path, compact_threshold=0.1)[
        "recommend_compact"
    ] is True
    # the advisor is a dry run: nothing moved, serve unchanged
    assert H.hnsw_maintenance_status(spark, path)["n_nodes"] == 51
    folded = H.compact_hnsw_index(spark, path)
    assert folded == 10
    st2 = H.hnsw_maintenance_status(spark, path)
    assert st2["n_nodes"] == 41 and st2["n_tombstones"] == 0
    assert st2["recommend_compact"] is False and st2["n_applied_epochs"] == 1


def test_r12_ivf_epoch_consolidation(spark, tmp_path, monkeypatch):
    """Round 12: consolidate_ivf_epochs folds streamed epochs into the
    base partition — serve bit-identical, per-epoch fan-out gone, the
    replay ledger keeps exactly-once (a folded epoch's re-delivery is
    skipped), a base rebuild resets the ledger, and the swap window
    recovers from every crash state."""
    import json
    import os
    import shutil

    import pytest

    from semantic_index_spark.operators import similarity as S

    rows = [(int(i), [float((i * 37) % 11), float((i * 53) % 13)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = S.make_centroids(4, 2)
    model = S.sq_train(df)
    path = str(tmp_path / "sq_layout")
    S.write_ivfsq_index(df.filter("vec_id < 60"), cents, model, path)

    def epoch_df(lo, hi):
        return spark.createDataFrame(
            [(i, e) for i, e in rows if lo <= i < hi],
            "vec_id long, embedding array<double>",
        )

    S.append_ivfsq_index(epoch_df(60, 70), cents, model, path, batch_id=1)
    S.append_ivfsq_index(epoch_df(70, 80), cents, model, path, batch_id=2)
    q = rows[11][1]

    def serve():
        return [
            (r["vec_id"], r["score"])
            for r in S.ivfsq_topk_indexed(
                spark, path, df, model, q, cents, k=5, nprobe=4, candidates=200
            ).collect()
        ]

    before = serve()
    st = S.ivf_maintenance_status(path, epoch_threshold=2)
    assert st["live_epochs"] == [1, 2] and st["recommend_consolidate"] is True
    assert 1 <= st["n_cells"] <= 4 and st["folded_epochs"] == []
    # consolidate: serve identical, epochs folded, ledger recorded
    assert S.consolidate_ivf_epochs(spark, path) == 2
    assert serve() == before
    st2 = S.ivf_maintenance_status(path, epoch_threshold=2)
    assert st2["live_epochs"] == [] and st2["folded_epochs"] == [1, 2]
    assert st2["recommend_consolidate"] is False
    # exactly-once after consolidation: replaying folded epoch 2 is a
    # SKIP, not a duplicate partition
    S.append_ivfsq_index(epoch_df(70, 80), cents, model, path, batch_id=2)
    assert S.ivf_maintenance_status(path)["live_epochs"] == []
    assert spark.read.parquet(path).count() == 80
    assert serve() == before
    # a NEW epoch still lands and a second consolidation folds it too
    extra = spark.createDataFrame(
        [(100, [9.0, 9.0])], "vec_id long, embedding array<double>"
    )
    S.append_ivfsq_index(extra, cents, model, path, batch_id=3)
    assert S.ivf_maintenance_status(path)["live_epochs"] == [3]
    assert S.consolidate_ivf_epochs(spark, path) == 1
    assert S.ivf_maintenance_status(path)["folded_epochs"] == [1, 2, 3]
    assert spark.read.parquet(path).count() == 81
    # crash between the two renames with tmp complete → recovered-new,
    # ledger intact
    real_rename = os.rename

    def crash_rename(src, dst):
        if src.rstrip("/") == path.rstrip("/"):
            raise OSError("simulated crash before the swap")
        return real_rename(src, dst)

    S.append_ivfsq_index(epoch_df(0, 5), cents, model, path, batch_id=4)
    # (epoch 4 re-upserts ids 0..4 as duplicates? no — dynamic overwrite
    # lands them as their own partition; dedup is the caller's contract.
    # Use fresh ids instead to keep the serve comparable.)
    with monkeypatch.context() as m:
        m.setattr(os, "rename", crash_rename)
        with pytest.raises(OSError, match="simulated crash"):
            S.consolidate_ivf_epochs(spark, path)
    tmp = path + ".__consolidate_tmp__"
    with open(S._ivf_meta_path(tmp)) as f:
        assert set(json.load(f)["folded_epochs"]) == {1, 2, 3, 4}
    shutil.rmtree(path)
    assert S.recover_ivf_layout(path) == "recovered-new"
    assert S.ivf_maintenance_status(path)["folded_epochs"] == [1, 2, 3, 4]
    # crash before anything moved → path intact, debris removed
    os.makedirs(tmp + "/junk")
    assert S.recover_ivf_layout(path) == "ok"
    assert not os.path.exists(tmp)
    # old-aside state → rename back
    old = path + ".__consolidate_old__"
    real_rename(path, old)
    assert S.recover_ivf_layout(path) == "recovered-old"
    # base rebuild resets the ledger: epoch ids are reusable again
    S.write_ivfsq_index(df, cents, model, path)
    assert S.ivf_maintenance_status(path)["folded_epochs"] == []
    S.append_ivfsq_index(extra, cents, model, path, batch_id=1)
    assert S.ivf_maintenance_status(path)["live_epochs"] == [1]
