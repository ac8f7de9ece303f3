"""Dump .explain('formatted') for named registry queries into plans/<round>/.

The round directory defaults to r14 and can be overridden with
``$SPARK_GRAFT_PLAN_DIR`` (e.g. r15 next optimization round).

Usage:
    python tools/capture_query_plans.py <repo_root> <suffix> name [name ...]

Writes plans/r13/<name>_<suffix>.txt under THIS repo (cwd's checkout), while
building the DataFrames from the registry at <repo_root> — so a prior-commit
worktree produces the `before` files and the working tree the `after` files.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout


def main() -> int:
    repo = os.path.abspath(sys.argv[1])
    suffix = sys.argv[2]
    names = sys.argv[3:]
    sys.path.insert(0, repo)
    import __spark_entry__ as entrymod
    from semantic_index_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(app_name="plan-capture", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    plan_dir = os.environ.get("SPARK_GRAFT_PLAN_DIR", "r14")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", plan_dir)
    os.makedirs(out_dir, exist_ok=True)
    registry = entrymod.queries()
    for name in names:
        df = registry[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print("wrote", name, suffix)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
