"""ANN index build + serve over the synthetic embeddings table:
assign IVF cells → materialize the cell-partitioned index → compact →
probe with planning-time partition pruning, with recall measured against
brute force. Run: python examples/ann_serving.py

The build/serve split is the 100 TB shape: the index is a parquet LAYOUT
(one directory per cell), so a probe query reads ~nprobe/K of the files —
pruned during planning, not row-filtered — and periodic compaction keeps
the per-cell file count sane as ingest appends.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from semantic_index_spark.operators import similarity as S
from semantic_index_spark.session import get_spark, load_table
from semantic_index_spark.sources.io import compact_parquet

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

spark = get_spark(app_name="ann-serving", master="local[4]", shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")

emb = load_table(spark, SF_DIR, "embeddings")
centroids = S.make_centroids(8, 64, seed=11)

with tempfile.TemporaryDirectory() as tmp:
    index_path = os.path.join(tmp, "ivf_index")

    # 1. build from the initial corpus: one pass assigns cells and lays the
    #    rows out by cell
    base = emb.filter(F.col("vec_id") % 2 == 0)
    S.write_ivf_index(base, centroids, index_path)
    cells = sorted(d for d in os.listdir(index_path) if d.startswith("_cell="))
    print(f"index built: {len(cells)} cells -> {cells}")

    # 2. ingest: a later batch appends under the SAME cell layout — no
    #    corpus rewrite, probes stay consistent throughout
    S.append_ivf_index(emb.filter(F.col("vec_id") % 2 == 1), centroids, index_path)
    print("appended the second half incrementally")

    # 3. hygiene: bound the file count after appends accumulate
    n_files = compact_parquet(spark, index_path)
    print(f"compacted to <= {n_files} files")

    # 4. serve: probes prune at planning time (PartitionFilters on _cell)
    queries = [(r["vec_id"], r["embedding"]) for r in emb.filter(F.col("vec_id") < 5).collect()]
    exact_all = approx_all = None
    for qid, q in queries:
        e = S.topk(emb, q, k=10).withColumn("q", F.lit(qid))
        a = S.ivf_topk_indexed(spark, index_path, q, centroids, k=10, nprobe=2).withColumn(
            "q", F.lit(qid)
        )
        exact_all = e if exact_all is None else exact_all.unionByName(e)
        approx_all = a if approx_all is None else approx_all.unionByName(a)

    print("\nrecall@10 per query (nprobe=2 of 8 cells, ~25% of files read):")
    S.ann_recall(exact_all, approx_all, by="q").orderBy("q").show()

    # 5. IVF-PQ: 16-byte codes instead of floats, maintained incrementally —
    #    train codebooks offline, build the code index from the base half,
    #    stream the rest through the exactly-once foreachBatch sink, serve
    #    with planning-time cell pruning + broadcast-LUT ADC scoring
    import tempfile

    from semantic_index_spark.streaming import ingest as SI

    codes, cb = S.pq_train_encode(emb, m_sub=4, k=16, iters=2)
    pq_path = tempfile.mkdtemp(prefix="ivfpq_") + "/index"
    S.write_ivfpq_index(base, cb, centroids, pq_path)
    sink = SI.incremental_ivfpq_sink(pq_path, cb, centroids)
    sink(emb.filter(F.col("vec_id") % 2 == 1), 0)  # one ingest epoch
    qid, q = queries[0]
    print("IVF-PQ served top-5 (codes only, corpus floats untouched):")
    S.ivfpq_topk_indexed(spark, pq_path, cb, centroids, q, k_results=5, nprobe=2).show()

    # 6. SQ8 (round 8): the lighter compression dial — int8 byte-array
    #    codes (4x less scan IO), asymmetric candidate scan + exact
    #    broadcast rescore; composed with the cell layout as IVF-SQ8
    model = S.sq_train(emb)
    codes8 = S.sq_encode(emb, model)
    print("SQ8 two-stage top-5 (ADC over codes -> exact rescore):")
    S.sq_topk_rescore(codes8, emb, model, q, k=5, candidates=25).show()

    sq_path = os.path.join(tmp, "ivfsq_index")
    S.write_ivfsq_index(emb, centroids, model, sq_path)
    print("IVF-SQ8 served top-5 (cell pruning x byte-code scan):")
    S.ivfsq_topk_indexed(
        spark, sq_path, emb, model, q, centroids, k=5, nprobe=2, candidates=25
    ).show()

    # 7. filtered search (round 8): the "WHERE label = x AND near q" query —
    #    cells prune at planning time, the predicate pushes into the scan
    print("label-filtered IVF top-5 (PartitionFilters + PushedFilters):")
    S.ivf_topk_filtered(
        spark, index_path, q, centroids, "label = 3", k=5, nprobe=2
    ).show()

    # 8. late interaction (round 8): multi-vector docs (8 tokens each)
    #    scored by ColBERT MaxSim with exact micro-integer aggregation
    toks = emb.selectExpr("CAST(vec_id DIV 8 AS BIGINT) AS doc_id", "embedding")
    qvecs = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()
    ]
    print("ColBERT MaxSim top-5 docs (sum of per-query-token max dots):")
    S.late_interaction_topk(toks, qvecs, k=5).show()

spark.stop()
