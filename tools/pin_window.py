"""Compute the next round's 50-query driver verification window.

The driver hash-checks the FIRST 50 ``queries()`` entries each round and
records the results in ``CORRECTNESS_r{N}.json``.  This script implements the
steady-state rotation policy documented on ``queries()``:

1. names never seen in any CORRECTNESS file (new queries) first, in
   canonical registry order;
2. then names whose LATEST driver row failed (rows/schema/hash mismatch or
   error) — these need a re-check as soon as the fix lands;
3. then names whose most recent driver row is OLDEST, oldest round first,
   ties broken by canonical registry order.

It prints the 50 names as a Python list literal ready to paste over
``_DRIVER_WINDOW_R{N}`` in ``__spark_entry__.py``.

Usage: python tools/pin_window.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50


def latest_driver_round() -> tuple[dict[str, int], set[str]]:
    """(latest round per name, names whose LATEST row failed)."""
    latest: dict[str, int] = {}
    failed: set[str] = set()
    for f in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(f))
        if not m:
            continue
        rnd = int(m.group(1))
        with open(f) as fh:
            for name, row in json.load(fh).items():
                if rnd >= latest.get(name, 0):
                    latest[name] = rnd
                    ok = (
                        isinstance(row, dict)
                        and row.get("rows_match")
                        and row.get("schema_match")
                        and row.get("hash_match")
                        and not row.get("err")
                    )
                    failed.discard(name)
                    if not ok:
                        failed.add(name)
    return latest, failed


def main() -> int:
    import __spark_entry__ as entrymod

    # canonical order = source order of the dict literal, which the reorder
    # preserves for non-window names; recover it by sorting window names back
    # in.  Simplest faithful source: parse nothing, use the returned dict —
    # the rotation is insensitive to the current window's internal order
    # because staleness (round number) dominates the sort key.
    names = list(entrymod.queries().keys())
    latest, failed = latest_driver_round()
    orig = {n: i for i, n in enumerate(names)}
    never = [n for n in names if n not in latest]
    recheck = sorted((n for n in names if n in failed), key=lambda n: orig[n])
    stale = sorted(
        (n for n in names if n in latest and n not in failed),
        key=lambda n: (latest[n], orig[n]),
    )
    window = (never + recheck + stale)[:WINDOW]
    print(
        f"# next window: {len(never)} never-checked + {len(recheck)} re-checks"
        f" + {max(0, WINDOW - len(never) - len(recheck))} stalest"
    )
    print("[")
    never_set, recheck_set = set(never), set(recheck)
    for n in window:
        if n in never_set:
            suffix = "  # never-checked"
        elif n in recheck_set:
            suffix = f"  # RE-CHECK (failed r{latest[n]})"
        else:
            suffix = f"  # last r{latest[n]}"
        print(f'    "{n}",{suffix}')
    print("]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
