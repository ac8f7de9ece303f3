"""Benchmark harness — the driver's per-round perf gate.

Runs ``entry()`` plus every declared query from ``__spark_entry__.queries()``
at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints exactly ONE machine-parseable JSON
line to stdout::

    {"metric": "suite_seconds", "value": N, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

All human-facing progress goes to stderr so the driver's stdout parse stays
clean. Each query is timed end-to-end (plan + execute + collect) — the same
work a user pays for.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return -1.0


def main() -> int:
    import __spark_entry__ as entrymod
    from semantic_index_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(app_name="semantic-index-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: JVM JIT, parquet footer reads, first-job scheduling overhead.
    entrymod.entry(spark).collect()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    total = 0.0
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        try:
            rows = fn(spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            print(f"{name:28s} {dt:7.2f}s rows={len(rows)}", file=sys.stderr)
            timings[name] = round(dt, 3)
            total += dt
        except Exception as e:  # a broken query must not hide the others —
            # but it must also be VISIBLE in the parsed output, not just
            # stderr: a near-zero elapsed time for a crashed query would
            # read as a speedup.
            dt = time.perf_counter() - t0
            errors[name] = f"{type(e).__name__}: {e}"[:300]
            print(f"{name:28s} ERROR after {dt:.2f}s: {e}", file=sys.stderr)

    out = {
        "metric": "suite_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "errors": errors,
        "n_errors": len(errors),
        "sf": _sf_from_dir(sf_dir),
    }
    print(json.dumps(out))
    spark.stop()
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
