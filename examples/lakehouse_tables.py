"""The table-format subsystem end to end: create a bucketed versioned
table, apply an incremental MERGE (update/insert/delete), time-travel to
the pre-merge state, read the change data feed between versions, stream
a CDC feed through the exactly-once MERGE sink, and expire reclaimable
versions. Run: python examples/lakehouse_tables.py

Every step rewrites ONLY the buckets it touches (the per-version bucket
manifest is the point) — at 100 TB a 1% feed costs ~1% of the table per
merge, and the diff between versions reads just the moved buckets.
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from semantic_index_spark import get_spark
from semantic_index_spark.session import load_table
from semantic_index_spark.sources import versioned as VER
from semantic_index_spark.streaming import ingest as SI

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

spark = get_spark(app_name="lakehouse-tables", master="local[4]", shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")

root = tempfile.mkdtemp(prefix="lakehouse_")
tbl = os.path.join(root, "docs")
try:
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "n_chars")

    # 1. create: 16 hash buckets, manifest v0 owns them all
    VER.create_bucketed(docs, tbl, ["doc_id"], n_buckets=64)
    print("v0 rows:", VER.read_bucketed(spark, tbl).count())

    # 2. incremental MERGE: CDC batch with upserts + tombstones
    batch = docs.filter(F.col("doc_id") % 53 == 0).select(
        "doc_id",
        (F.col("n_chars") + 1).alias("n_chars"),
        F.when(F.col("doc_id") % 106 == 0, F.lit("delete")).otherwise(F.lit("upsert")).alias("op"),
    )
    v1 = VER.merge_into_bucketed(spark, tbl, batch, op_col="op")
    man = VER._read_manifest(tbl)
    moved = sum(1 for v in man["buckets"].values() if v == v1)
    print(f"v{v1}: rewrote {moved}/64 buckets")

    # 3. time travel + change data feed
    print("v0 still readable:", VER.read_bucketed(spark, tbl, version=0).count())
    diff = VER.diff_bucketed(spark, tbl, 0, v1)
    diff.groupBy("_action").count().show()

    # 4. point lookup with manifest-level bucket pruning
    VER.read_bucketed(spark, tbl, key_values=[(21,)]).filter("doc_id = 21").show()

    # 5. streaming CDC through the exactly-once MERGE sink
    feed = os.path.join(root, "feed")
    batch.limit(20).coalesce(1).write.parquet(os.path.join(feed, "f1"))
    stream = (
        spark.readStream.schema("doc_id bigint, n_chars bigint, op string")
        .parquet(feed + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(SI.merge_stream_sink(tbl, op_col="op"))
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    print("after stream merge:", VER.current_version(tbl), "versions;",
          VER.read_bucketed(spark, tbl).count(), "rows")

    # 6. retention: reclaim versions no kept manifest references
    print("reclaimed:", VER.expire_bucketed(tbl, keep_manifests=2))

    # 7. incremental view maintenance: a per-lang aggregate view absorbs
    # the change feed instead of rescanning the table
    d2 = load_table(spark, SF_DIR, "documents").select("doc_id", "lang", "n_chars")
    tbl2 = os.path.join(root, "docs_ivm")
    VER.create_bucketed(d2, tbl2, ["doc_id"], n_buckets=16)
    view = (
        VER.read_bucketed(spark, tbl2, version=0)
        .groupBy("lang")
        .agg(F.count("*").cast("bigint").alias("n_rows"), F.sum("n_chars").alias("sum_value"))
        .localCheckpoint(eager=True)
    )
    VER.merge_into_bucketed(
        spark,
        tbl2,
        d2.filter(F.col("doc_id") % 7 == 0).select(
            "doc_id", "lang", (F.col("n_chars") + 5).alias("n_chars"), F.lit("upsert").alias("op")
        ),
        op_col="op",
    )
    maintained = VER.maintain_group_agg(view, VER.diff_bucketed(spark, tbl2, 0, 1), "lang", "n_chars")
    print("IVM view (reads the delta, not the table):")
    maintained.orderBy("lang").show(5)

    # 7b. deletion vectors: row-level DELETE with zero bucket rewrites,
    # then OPTIMIZE folds them in
    VER.delete_bucketed(spark, tbl2, d2.filter(F.col("doc_id") % 21 == 0).select("doc_id"))
    print("after DV delete:", VER.read_bucketed(spark, tbl2).count(),
          "rows; buckets rewritten: 0 (keys land as per-bucket DV files)")
    VER.optimize_bucketed(spark, tbl2)
    print("after OPTIMIZE:", VER.read_bucketed(spark, tbl2).count(),
          "rows; DVs folded:", not VER._read_manifest(tbl2).get("dv"))

    # 8. optimistic concurrency (r9): a writer that planned against a
    # stale version loses with a retryable conflict instead of clobbering
    # the winner's pointer; retry_commit is the standard recovery
    stale = VER.current_version(tbl2)
    VER.merge_into_bucketed(  # the winner commits first
        spark, tbl2,
        d2.filter(F.col("doc_id") == 1).select(
            "doc_id", "lang", (F.col("n_chars") + 9).alias("n_chars")),
    )
    try:
        VER.commit_version(d2.limit(1), tbl2, expected_version=stale)
    except VER.CommitConflictError as e:
        print("conflict detected (expected):", str(e)[:80], "...")
    v = VER.retry_commit(lambda: VER.merge_into_bucketed(
        spark, tbl2,
        d2.filter(F.col("doc_id") == 2).select(
            "doc_id", "lang", (F.col("n_chars") + 9).alias("n_chars")),
    ))
    print("retry_commit landed v", v)

    # 8. hidden partitioning + zone-map skipping: the two pruning layers
    from semantic_index_spark.sources import hidden as H
    from semantic_index_spark.sources import skipping as Z

    ev = load_table(spark, SF_DIR, "events")
    ht = os.path.join(root, "events_hidden")
    H.create_hidden(ev, ht, [("day", "ts"), ("bucket", "user_id", 4)])
    win = H.read_hidden(spark, ht, filters=[("ts", ">=", "2024-01-10"), ("ts", "<", "2024-01-12")])
    print("hidden-partitioned window rows:", win.count(), "(PartitionFilters prune the layout)")

    zt = os.path.join(root, "li_zoned")
    li = load_table(spark, SF_DIR, "lineitem")
    Z.write_skipping(li, zt, ["l_shipdate"], n_files=8, cluster_by="l_shipdate")
    filt = [("l_shipdate", ">=", "1996-01-01"), ("l_shipdate", "<", "1996-07-01")]
    print(
        f"zone maps: {len(Z.candidate_files(zt, filt))}/8 files scanned,",
        Z.read_skipping(spark, zt, filt).count(),
        "rows",
    )

    # 9. COMPOSED layout (round 8): one table prunes at BOTH granularities —
    # day(ts) transforms eliminate whole directories, per-file zone maps
    # eliminate files inside the survivors
    ct = os.path.join(root, "events_composed")
    H.create_hidden_skipping(
        ev, ct, [("day", "ts")], stats_cols=["value", "user_id"],
        n_files=8, cluster_by="value",
    )
    cf = [("ts", ">=", "2024-01-10"), ("ts", "<", "2024-01-12"), ("value", "<", 100.0)]
    kept = H.candidate_files_hidden(ct, cf)
    n_all = len(H.candidate_files_hidden(ct))
    print(
        f"composed dir+file pruning: {len(kept)}/{n_all} files survive,",
        H.read_hidden_skipping(spark, ct, cf).count(), "rows",
    )

    # 10. Z-order (round 8): the Morton key as the cluster expression makes
    # zone maps selective in BOTH dimensions of a box predicate
    from semantic_index_spark.sources.io import zorder_key

    zzt = os.path.join(root, "ev_zorder")
    Z.write_skipping(
        ev, zzt, ["user_id", "value"], n_files=8,
        cluster_by=zorder_key([("user_id", 0, 150), ("value", 0, 500)], bits=8),
    )
    box = [("user_id", ">=", 10), ("user_id", "<", 40),
           ("value", ">=", 100.0), ("value", "<", 200.0)]
    print(
        f"z-order box predicate: {len(Z.candidate_files(zzt, box))}/8 files scanned,",
        Z.read_skipping(spark, zzt, box).count(), "rows",
    )
finally:
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
