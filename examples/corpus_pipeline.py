"""End-to-end training-corpus preparation over the synthetic test tables:
quality gate → exact + near-dup + duplicated-span removal → per-source cap →
source re-weighting → chunking → incremental embedding against a cache.
Run: python examples/corpus_pipeline.py

Every stage is the scale-shaped operator the engine ships (one pass / one
bounded shuffle each) — the same composition a 100 TB pipeline would run,
exercised here at sf0.001.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from semantic_index_spark import DeterministicEmbedder, get_spark
from semantic_index_spark.functions import text as T
from semantic_index_spark.operators import dedup as D
from semantic_index_spark.operators import pipeline as P
from semantic_index_spark.operators import skew as SK
from semantic_index_spark.operators.text_analysis import chunk_documents
from semantic_index_spark.session import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

spark = get_spark(app_name="corpus-pipeline", master="local[4]", shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")

docs = load_table(spark, SF_DIR, "documents")

# 1. Data-quality gate: refuse to proceed if the snapshot is malformed.
report = P.validate_expectations(
    docs,
    [
        P.expect_not_null("text"),
        P.expect_unique("doc_id"),
        P.expect_in_range("n_chars", 1, 10_000),
    ],
)
report.show()
assert report.filter(~F.col("passed")).count() == 0, "input snapshot failed QA"

# 1b. Per-domain quality gate: drop each source's bottom quartile by
#     composite quality score. The thresholds come from the mergeable
#     per-group histogram and BROADCAST back — no per-domain sort, and a
#     low-quality domain can't ride in under a globally-calibrated cutoff.
scored = docs.withColumn("quality", T.quality_score("text"))
docs_q = P.quantile_threshold_filter(
    scored, "quality", "source", q=0.25, lo=0.0, hi=1.0, bins=64
).drop("quality")
print("quality gate: kept", docs_q.count(), "of", docs.count())
docs = docs_q

# 2. Exact dedup (md5 fingerprint, keep lowest doc_id), then LSH near-dup
#    screening with exact edit-distance verification of the candidates.
winners = D.exact_dedup(docs)
pairs = D.minhash_lsh_pairs(docs, num_hashes=4, bands=2, shingle_n=3)
near = D.edit_distance_verify(docs, pairs, max_ratio=0.5)
drop = near.select(F.col("id_b").alias("doc_id")).distinct()
kept = (
    docs.join(winners.select("doc_id"), "doc_id", "left_semi")
    .join(drop, "doc_id", "left_anti")
)
print("dedup: kept", kept.count(), "of", docs.count(), f"({near.count()} near-dup pairs)")

# 2b. Substring-level screening: drop docs that are mostly duplicated
#     text (boilerplate / templated blocks whole-doc fingerprints miss).
span_frac = D.duplicate_spans(docs, n=8, min_docs=2)
spammy = span_frac.filter(F.col("dup_fraction") > 0.6).select("doc_id")
kept = kept.join(spammy, "doc_id", "left_anti")
print("span screen: kept", kept.count(), f"(dropped {spammy.count()} boilerplate-heavy docs)")

# 2c. Per-domain cap: no source may contribute more than 15 docs (keep
#     the longest) — the skew-safe two-stage top-n, so one hot crawl
#     domain can't own a reducer OR the mix.
kept = SK.capped_top_n(
    kept, ["source"], [F.length("text").desc(), F.col("doc_id")], n=15
)
print("per-source cap: kept", kept.count())

# 3. Re-weight sources for the training mix (2 epochs of src0, thin the
#    rest) — AFTER dedup, so upsampling can't resurrect duplicates.
weights = {f"src{i}": (2.0 if i == 0 else 0.5) for i in range(20)}
mixed = SK.weighted_mix(kept, weights, group_col="source", key_col="doc_id")
print("mix:", kept.count(), "deduped docs ->", mixed.count(), "weighted rows")

# 4. Chunk the weighted mix into overlapping token windows; the composite
#    id keeps each epoch-copy addressable.
mixed_docs = mixed.select(
    F.concat_ws("#", "doc_id", "copy_idx").alias("doc_id"), "text"
)
chunks = chunk_documents(mixed_docs, chunk_tokens=64, overlap=16)
print("chunks:", chunks.count())

# 5. Incremental embedding: a cold run computes everything; re-running
#    against the cache it produced reuses every vector — including across
#    epoch copies, which share text fingerprints.
chunk_docs = chunks.select(
    F.concat_ws("#", "doc_id", "chunk_idx").alias("doc_id"),
    F.col("chunk_text").alias("text"),
)
embedder = DeterministicEmbedder(dim=32)
cold = P.embed_incremental(
    chunk_docs,
    spark.createDataFrame([], "fingerprint string, embedding array<float>"),
    embedder,
)
cache = cold.select("fingerprint", "embedding").distinct()
warm = P.embed_incremental(chunk_docs, cache, embedder)
warm.groupBy("was_cached").count().show()

# 6. Day-2 incremental ingest: screen the next batch against a Bloom
#    filter of everything already ingested — the batch probes a broadcast
#    ≤m-row bit set instead of shuffle-joining the historical corpus.
#    No false negatives: nothing already ingested is re-admitted; the few
#    "maybe seen" rows would go to an exact verification join.
from semantic_index_spark.functions import bloom as B

raw = load_table(spark, SF_DIR, "documents")
hist = raw.where(F.col("doc_id") % 4 != 3).select(T.fingerprint("text").alias("fp"))
batch = raw.where(F.col("doc_id") % 4 == 3).select(
    "doc_id", "source", "text", T.fingerprint("text").alias("fp")
)
bloom = B.bloom_bits(hist, "fp", m=1 << 16, k=4)
fresh = B.bloom_definitely_new(bloom, batch, "fp", m=1 << 16, k=4)
print("day-2 screen:", fresh.count(), "definitely-new of", batch.count(), "batch docs")

# 7. Drift monitor: PSI between the historical and day-2 quality
#    distributions — both sides collapse to <=bins histogram rows before
#    comparison. A production pipeline gates the ingest on the standard
#    bands (<0.1 stable, 0.1-0.25 drifting, >0.25 quarantine); at this
#    example's 125-doc batch the empty-bin eps terms dominate, so we
#    report the band rather than hard-fail the demo.
from semantic_index_spark.functions import sketch as SKT

hist_q = raw.where(F.col("doc_id") % 4 != 3).select(T.quality_score("text").alias("q"))
batch_q = batch.select(T.quality_score("text").alias("q"))
psi = SKT.psi_drift(hist_q, batch_q, "q", 0.0, 1.0, bins=16).collect()[0]
band = "stable" if psi["psi"] < 0.1 else ("drifting" if psi["psi"] < 0.25 else "shifted")
print(f"quality drift PSI: {psi['psi']} -> {band}")

# 8. Vocabulary audit: which terms are distinctive of each language —
#    doc-presence PMI over the kept corpus. A training pipeline uses the
#    same statistic to sanity-check that a "German" shard actually
#    carries German-distinctive vocabulary (here the synthetic text is
#    language-agnostic, so weak associations are the EXPECTED finding).
from semantic_index_spark.operators import text_analysis as TA

pmi = TA.term_label_pmi(kept, label_col="lang", min_count=10)
strongest = pmi.orderBy(F.desc("pmi"), "tok").limit(3).collect()
print("strongest term-language associations:",
      [(r["label"], r["tok"], r["pmi"]) for r in strongest])

# 9. Budget the final corpus reproducibly: weight-proportional sample
#    without replacement (longer docs more likely, md5-deterministic —
#    the same docs win on every engine and every rerun).
sample = SK.weighted_sample(kept, "doc_id", "n_chars", 25)
print("weighted sample:", sample.count(), "docs; stable across reruns")

# 10. Domain-targeted selection (DSIR): weight every non-curated doc by
#     how much its hashed n-gram profile looks like the curated source;
#     the weights feed the same weighted sampler for the resampling step.
#     Model state is O(buckets) however large the corpus.
dsir = TA.dsir_weights(kept, target_cond=F.col("source") == "src0", buckets=256)
# weighted_sample wants positive weights; shift by the (bounded, collected)
# minimum so ordering is preserved and every weight is >= 1 micro-nat
min_w = int(dsir.agg(F.min("logw_micro")).collect()[0][0])
target_like = SK.weighted_sample(
    dsir.withColumn("w", F.col("logw_micro") - F.lit(min_w - 1)),
    "doc_id",
    "w",
    15,
)
print("DSIR: scored", dsir.count(), "raw docs; resampled", target_like.count(),
      "target-alike docs")

# 11. Leakage-safe split: assign train/test to whole near-dup CLUSTERS
#     (connected components over the LSH pairs) so near-duplicates never
#     straddle the split.
comp = D.connected_components(kept.select("doc_id"), pairs)
fold = F.when(
    F.pmod(T.md5_bigint(F.col("component").cast("string"), salt="split:"), F.lit(10)) < 8,
    "train",
).otherwise("test")
split = comp.select("doc_id", fold.alias("fold"))
split.groupBy("fold").count().show()

# 12. Deterministic training order: every epoch reshuffles into shards
#     with fixed in-shard positions — loaders resume from (shard, pos).
order = P.epoch_shard_order(
    split.filter(F.col("fold") == "train").select("doc_id"), epochs=2, n_shards=4
)
print("training order:", order.count(), "rows across 2 epochs")

# 13. Sign-off: order-insensitive per-source checksum of the released
#     corpus — re-run after any copy/migration; equal (n_rows, checksum)
#     certifies the release byte-identical.
P.table_checksum(kept, ["doc_id", "text", "lang", "n_chars"], by="source").show(5)

spark.stop()
print("corpus pipeline complete.")
