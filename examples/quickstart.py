"""Quickstart: the reference's workflow (insert → search → persist), then a
taste of the pipeline operators. Run: python examples/quickstart.py

Mirrors the reference's Preview demo (`Program.cs`) with a deterministic
embedder instead of the OpenAI call, then goes beyond the reference:
dedup, chunking, and approximate search over the synthetic test tables.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from semantic_index_spark import DeterministicEmbedder, SemanticIndex, get_spark
from semantic_index_spark.operators import dedup as D
from semantic_index_spark.operators import similarity as S
from semantic_index_spark.operators.text_analysis import chunk_documents

spark = get_spark(app_name="quickstart", master="local[4]", shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")

# --- the reference's workflow (SemanticDatabase / Program.cs) ---------------
idx = SemanticIndex(spark, embedder=DeterministicEmbedder(dim=64))
idx.add_range(["cat", "dog", "fish", "apple", "banana", "orange"])
print("count:", idx.count())
print("search('animal', 3):", idx.search_text("animal", 3))

with tempfile.TemporaryDirectory() as d:
    path = os.path.join(d, "test-database.json")
    idx.save(path, fmt="ref_json")  # the reference's exact JSON-array format
    again = SemanticIndex.from_file(
        spark, path, embedder=DeterministicEmbedder(dim=64), fmt="ref_json"
    )
    print("reloaded:", again.count(), "| contains('cat'):", again.contains("cat"))

# --- beyond the reference: pipeline operators over the test tables ----------
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
if os.path.isdir(sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    pairs = D.minhash_lsh_pairs(docs, num_hashes=4, bands=4)
    print("near-dup candidate pairs:", pairs.count())
    comps = D.connected_components(docs.select("doc_id"), pairs)
    n_clusters = comps.select("component").distinct().count()
    print("duplicate clusters:", n_clusters, "of", comps.count(), "docs")

    print("chunks:", chunk_documents(docs.limit(50), chunk_tokens=40, overlap=10).count())

    q = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    exact = S.topk(emb, q, k=5)
    approx = S.ivf_topk(emb, q, S.make_centroids(8, 64), k=5, nprobe=2)
    print("exact top-5:", [r["vec_id"] for r in exact.collect()])
    print("ivf   top-5:", [r["vec_id"] for r in approx.collect()])

spark.stop()
