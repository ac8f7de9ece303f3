"""Local mimic of the driver's correctness gate: run each __spark_entry__
query on Spark AND its DuckDB oracle at sf0.01, compare row count, schema
(column names), and an order-insensitive value hash (columns sorted by
name, rows sorted, floats rounded at compare time is NOT done here — the
queries themselves must round).

Usage: python tools/check_oracles.py [name-substring ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from semantic_index_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    # Type-faithful, exactly as strict as the driver's hash compare: an
    # int-valued float renders "43684.0", an int renders "43684" — so
    # engine-type mismatches (BIGINT vs DOUBLE, HUGEINT vs BIGINT) FAIL here
    # before they fail at the driver. No rounding at compare time: queries
    # themselves must round float aggregates.
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    filters = [a for a in sys.argv[1:] if not a.startswith("-")]
    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = [n for n in qs if not filters or any(f in n for f in filters)]
    n_pass = n_fail = n_weak = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name:28s} spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"WEAK  {name:28s} rows={len(s_rows)} (no oracle, rows-only)")
            n_weak += 1
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name:28s} duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"schema spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if not problems:
            hs, hd = table_hash(s_cols, s_rows), table_hash(d_cols, d_rows)
            if hs != hd:
                problems.append(f"valuehash {hs} != {hd}")
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                set_s = {"|".join(norm_cell(r[i]) for i in order_s) for r in s_rows}
                set_d = {"|".join(norm_cell(r[i]) for i in order_d) for r in d_rows}
                only_s = list(set_s - set_d)[:3]
                only_d = list(set_d - set_s)[:3]
                if only_s:
                    problems.append(f"spark-only: {only_s}")
                if only_d:
                    problems.append(f"duck-only: {only_d}")
        dt = time.time() - t0
        if problems:
            print(f"FAIL  {name:28s} {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"ok    {name:28s} rows={len(s_rows):6d} {dt:5.1f}s")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_fail} fail, {n_weak} weak (rows-only)")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
