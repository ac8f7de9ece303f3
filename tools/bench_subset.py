"""Isolated A/B bench of a named query subset — the r10/r11/r12 drift
protocol (VERDICT r12 perf task #2).

Runs ONLY the named registry queries from the repo rooted at argv[1],
with the same warm-up + median-of-reps discipline as bench.py, and
prints one JSON line.  Intended use: run once against HEAD and once
against a ``git worktree`` of a prior round's commit on a quiet box,
then compare medians — in-suite bench numbers carry local[32]
contention that this isolates away.

    python tools/bench_subset.py /root/repo map_functions kmeans_centroids
    python tools/bench_subset.py /tmp/r11ref map_functions kmeans_centroids
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> int:
    repo = os.path.abspath(sys.argv[1])
    names = sys.argv[2:]
    sys.path.insert(0, repo)
    import __spark_entry__ as entrymod
    from semantic_index_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    spark = get_spark(app_name="semantic-index-bench-subset", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    entrymod.entry(spark).collect()  # JVM/page-cache warm-up

    registry = entrymod.queries()
    out: dict[str, dict] = {}
    for name in names:
        fn = registry[name]
        times: list[float] = []
        rows = -1
        for rep in range(-1, reps):  # one untimed warm-up rep
            t0 = time.perf_counter()
            rows = len(fn(spark, sf_dir).collect())
            if rep >= 0:
                times.append(time.perf_counter() - t0)
        med = statistics.median(times)
        out[name] = {
            "median": round(med, 3),
            "min": round(min(times), 3),
            "max": round(max(times), 3),
            "rows": rows,
        }
        print(f"{name:24s} med={med:6.2f}s [{min(times):.2f}..{max(times):.2f}]",
              file=sys.stderr)
    print(json.dumps({"repo": repo, "sf_dir": sf_dir, "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
