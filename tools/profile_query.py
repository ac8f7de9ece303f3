"""Per-query profiler — wall time + Spark job count + plan capture.

Job count is the local-scale overhead proxy: at sf0.1 every declared query's
data fits in one task, so wall time ≈ (#jobs × scheduling/Python-worker
overhead) + planning time. A query that launches 40 jobs for a lifecycle of
8 logical steps is paying for actions the design does not need — the same
actions that at 100 TB each cost a full cluster round-trip.

Usage:
    python tools/profile_query.py name [name ...]       # profile named queries
    python tools/profile_query.py --plans name ...      # also dump formatted plans
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from semantic_index_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    dump_plans = False
    if args and args[0] == "--plans":
        dump_plans = True
        args = args[1:]
    names = args

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(app_name="semantic-index-profile", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    entrymod.entry(spark).collect()  # warm-up

    registry = entrymod.queries()
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    out: dict[str, dict] = {}
    for name in names:
        fn = registry[name]
        # warm-up rep (untimed) so footer reads/codegen don't skew
        fn(spark, sf_dir).collect()
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        rows = len(df.collect())
        t_total = time.perf_counter() - t0
        sc.setJobGroup("idle", "idle")
        jobs = tracker.getJobIdsForGroup(name)
        out[name] = {
            "total_s": round(t_total, 3),
            "build_s": round(t_build, 3),
            "n_jobs": len(jobs),
            "rows": rows,
        }
        print(
            f"{name:28s} total={t_total:6.2f}s build={t_build:6.2f}s "
            f"jobs={len(jobs):4d} rows={rows}",
            file=sys.stderr,
        )
        if dump_plans:
            from semantic_index_spark.plans.explain import formatted_plan

            plan_dir = os.environ.get("SPARK_GRAFT_PLAN_DIR", "r14")
            os.makedirs(f"plans/{plan_dir}", exist_ok=True)
            with open(f"plans/{plan_dir}/{name}_profile.txt", "w") as f:
                f.write(formatted_plan(fn(spark, sf_dir)))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
