"""Live corpus/event monitor composed from the incremental streaming sinks.

Demonstrates the O(state)-not-O(history) monitoring posture: four
foreachBatch maintainers drain the same event stream and each keeps a
table whose size is independent of how much history has flowed —

  * HLL registers       → "distinct users ever" (2^p rows)
  * fixed-bin histogram → value distribution (≤bins rows) → quantiles/PSI
  * decayed sums        → recency-weighted engagement (|groups| rows)
  * moment partials     → running mean/stddev per type (|groups| rows)

Run: python examples/streaming_monitor.py  (uses sf0.001 by default)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from semantic_index_spark import get_spark
from semantic_index_spark.functions import sketch as SKT
from semantic_index_spark.session import load_table
from semantic_index_spark.streaming import ingest as I

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

spark = get_spark(app_name="streaming-monitor", master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

work = tempfile.mkdtemp(prefix="stream_monitor_")
src = f"{work}/events"
events = load_table(spark, SF_DIR, "events")
# stage as 3 files so maxFilesPerTrigger=1 forces 3 micro-batches — the
# merge branch of every sink actually runs
events.repartition(3).write.parquet(src)


def drain(sink_fn, ckpt_name):
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    writer = stream.writeStream.foreachBatch(sink_fn).option(
        "checkpointLocation", f"{work}/{ckpt_name}"
    )
    I.run_batch_like(writer)


HLL_P = 12
drain(I.incremental_hll_sink(f"{work}/hll", "user_id", p=HLL_P), "c_hll")
drain(
    I.incremental_histogram_sink(f"{work}/hist", "value", 0.0, 500.0, bins=32),
    "c_hist",
)
drain(
    I.decayed_sum_sink(f"{work}/decay", "ts", "value", "event_type", half_life_days=7.0),
    "c_decay",
)
drain(I.moments_sink(f"{work}/moments", "value", "event_type"), "c_moments")
drain(I.incremental_mg_sink(f"{work}/mg", "user_id", k=8), "c_mg")
drain(
    I.incremental_sample_sink(f"{work}/sample", "event_id", ["value"], k=64),
    "c_sample",
)
drain(
    I.incremental_weighted_sample_sink(f"{work}/wsample", "event_id", "value", n=32),
    "c_wsample",
)

# ---- the monitor report: every read touches only sketch-sized tables ----
est = SKT.hll_estimate(spark.read.parquet(f"{work}/hll"), p=HLL_P).collect()[0][0]
exact = events.select(F.count_distinct("user_id")).collect()[0][0]
print(f"distinct users: HLL≈{est} (exact {exact})")

hist = spark.read.parquet(f"{work}/hist")
print(f"value histogram: {hist.count()} bins, {hist.agg(F.sum('n')).collect()[0][0]} rows covered")

anchor = str(events.agg(F.max(F.col("ts").cast("timestamp"))).collect()[0][0])
decayed = I.read_decayed_sums(spark, f"{work}/decay", anchor, 7.0)
print("decayed engagement (top types):")
for r in decayed.orderBy(F.desc("decayed_sum")).limit(3).collect():
    print(f"  {r[0]:10s} {r['decayed_sum']:12.2f} over {r['n_events']} events")

print("running value stats per type:")
for r in I.read_moments(spark, f"{work}/moments").orderBy("event_type").collect():
    print(f"  {r[0]:10s} n={r['n']:6d} mean={r['mean']:8.2f} sd={r['stddev']:8.2f}")

mg = spark.read.parquet(f"{work}/mg")
print(f"Misra-Gries heavy users (k=8, guaranteed if count > n/9): {mg.count()} entries")

q = SKT.sample_quantiles(spark.read.parquet(f"{work}/sample"), "value", [0.5, 0.9])
print("value quantiles from the 64-row maintained sample:")
for r in q.collect():
    print(f"  p{int(r['p'] * 100):2d} ≈ {r['estimate']:8.2f}")

ws = spark.read.parquet(f"{work}/wsample")
print(f"weighted sample: {ws.count()} rows, value-proportional, deterministic")

shutil.rmtree(work, ignore_errors=True)
spark.stop()
print("streaming monitor complete.")
