"""The SQL front door end to end (round 12): bind a versioned table to a
pure-SQL view, point-lookup it with manifest-level bucket pruning, INSERT
INTO it (upsert-as-merge through the same OCC commit path as the Python
API), read a hidden-partitioned table through SQL with directory + zone-map
pruning, and serve a multi-index table. Run: python examples/sql_front_door.py

Everything after the setup lines is SQL TEXT — the point of the front door:
a user who lives in SQL gets versioned reads, time travel, pruned scans,
and writable views without touching the Python verbs.
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from semantic_index_spark import get_spark
from semantic_index_spark.session import load_table
from semantic_index_spark.sources import hidden as HID
from semantic_index_spark.sources import indexed as IDX
from semantic_index_spark.sources import versioned as VER
from semantic_index_spark.sources import versioned_batch as VB

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

spark = get_spark(app_name="sql-front-door", master="local[4]", shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
root = tempfile.mkdtemp(prefix="sql_front_door_demo_")

try:
    # ---- a bucketed versioned table, bound to SQL ---------------------------
    customers = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    tbl = os.path.join(root, "accounts")
    VER.create_bucketed(customers, tbl, ["id"], n_buckets=8)
    VB.sql_view(spark, "accounts", tbl)

    # point lookup: pushFilters computes the key's bucket with a
    # Spark-bit-exact xxhash64 and plans ~1/8 of the files
    spark.sql("SELECT * FROM accounts WHERE id = 42").show()

    # INSERT INTO = upsert on the key, committed through the same
    # staged-directory + OCC pointer-swap path as merge_into_bucketed
    spark.sql(
        "INSERT INTO accounts SELECT id, concat('user-', id) AS name, "
        "id * 7 AS cents FROM range(1, 6)"
    )
    VB.sql_view(spark, "accounts", tbl)  # reads pin at bind time: rebind
    spark.sql("SELECT * FROM accounts WHERE id <= 5 ORDER BY id").show()

    # time travel: VERSION AS OF as a pinned view
    VB.sql_view(spark, "accounts_v0", tbl, version=0)
    print(
        "v0 still shows the pre-insert names:",
        spark.sql("SELECT name FROM accounts_v0 WHERE id = 1").collect()[0][0],
    )

    # ---- a hidden-partitioned table: SQL prunes directories -----------------
    events = load_table(spark, SF_DIR, "events")
    htbl = os.path.join(root, "events_by_day")
    HID.create_hidden(events, htbl, [("day", "ts")])
    VB.sql_view(spark, "events_by_day", htbl)
    # the WHERE clause's UTC instants convert through the table's pinned
    # zone and prune day directories at planning time; the filter still
    # re-applies post-scan (pruning is IO-only)
    spark.sql(
        """
        SELECT date_format(ts, 'yyyy-MM-dd') AS day, count(*) AS n
        FROM events_by_day
        WHERE ts >= timestamp'2024-01-03 00:00:00'
          AND ts < timestamp'2024-01-05 00:00:00'
        GROUP BY day ORDER BY day
        """
    ).show()

    # ---- a multi-index table: HNSW + IVF-SQ8 under one manifest -------------
    emb = load_table(spark, SF_DIR, "embeddings").select(
        F.col("vec_id").alias("id"), "embedding"
    )
    vtbl = os.path.join(root, "vectors")
    VER.create_bucketed(emb, vtbl, ["id"], n_buckets=4)
    IDX.attach_hnsw_index(spark, vtbl, m=8, ef_construction=32)
    IDX.attach_ivfsq_index(spark, vtbl, n_cells=8)
    q = emb.filter("id = 7").collect()[0]["embedding"]
    print("HNSW serve (exhaustive-exact):")
    IDX.indexed_hnsw_topk(spark, vtbl, q, k=3, ef=None).show()
    print("IVF-SQ8 serve (same answer from the byte-code shards):")
    IDX.indexed_ivfsq_topk(spark, vtbl, q, k=3, nprobe=8, candidates=100).show()

    # SQL INSERT works on the indexed table too (round 13): the commit
    # worker rebuilds the affected shards Spark-free, bit-identically
    VB.sql_view(spark, "vectors", vtbl)
    spark.sql(
        "INSERT INTO vectors SELECT 90000 + id, embedding "
        "FROM vectors WHERE id < 3"
    )
    print("post-INSERT serve still matches the table:")
    IDX.indexed_hnsw_topk(spark, vtbl, q, k=3, ef=None).show()

    # ---- joining a versioned view: broadcast needs a hint -------------------
    # the Python DataSource API exposes no statistics hook, so a
    # versioned view reports UNKNOWN size and is never auto-broadcast
    # (the safe default — an unknown-size view can't OOM a broadcast).
    # When you know the dim view is small, say so:
    spark.range(0, 100_000).selectExpr(
        "id % 100 AS fk", "id AS meas"
    ).createOrReplaceTempView("fact")
    spark.sql(
        """
        SELECT /*+ BROADCAST(d) */ d.name, sum(f.meas) AS total
        FROM fact f JOIN accounts d ON f.fk = d.id
        GROUP BY d.name ORDER BY total DESC LIMIT 5
        """
    ).show()
finally:
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
