"""Scale-factor scaling probe: time a panel of headline operators at every
available sf directory and report per-query scaling exponents.

The point is EVIDENCE for the 100 TB posture: an operator whose runtime
grows ~linearly (exponent ≈ 1 in log-time vs log-rows) across sf0.001 →
sf0.01 → sf0.1 is shuffle/partition-shaped correctly; a super-linear
exponent (≥ ~1.5) flags a pair blow-up or a global sort hiding behind
small-data timings. Fixed overheads (session, planning, codegen) dominate
tiny SFs and DEFLATE the exponent — read the sf0.01→sf0.1 column as the
honest one.

Writes SCALING.md at the repo root and prints one JSON line.

Usage: python tools/scaling_probe.py [reps]
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from semantic_index_spark.session import get_spark

SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.isdir(d)
]

# the queries whose scaling behavior IS the scale story: every family with
# a potential blow-up (pair joins, iterative closure, windows, streaming)
PANEL = [
    "knn_topk",               # scan + bounded top-k: must be ~linear
    "q1_pricing_summary",     # partial-agg groupBy
    "q3_shipping_priority",   # broadcast-join star query
    "exact_dedup",            # fingerprint groupBy
    "minhash_lsh_pairs",      # banded candidate join (Σ band-bucket²)
    "ngram_jaccard",          # shingle equi-join with df cutoff
    "semdedup",               # cell-confined quadratic
    "dedup_components",       # iterative pointer jumping
    "triangle_count",         # O(m^1.5) wedge bound
    "window_running_sum",     # keyed window
    "global_ranking",         # distributed prefix-sum ranking
    "segment_dedup",          # word-count-shaped corpus edit
    "bm25_topk",              # filtered explode + bounded top-k
    "events_tumbling_windows",  # event-time windows
    "dsir_weights",           # O(buckets)-state model est. + broadcast-back scoring
    "quality_model",          # GD aggregations + full-corpus scoring pass
    "attribution",            # three windows over one user-key shuffle
    "corpus_checksum",        # single partial-agg scan, O(1) state
    "q9_product_profit",      # fact-fact join + derived-supply join-back
    "q21_waiting_suppliers",  # per-order aggregate + semi join-back
    "cdc_apply",              # one keyed window, no joins
    "skyline_frontier",       # distinct-price spine window + broadcast back
    "merge_versioned",        # bucketed incremental MERGE (touched-bucket IO)
    "label_propagation",      # per-round edge join + node-keyed argmax
    "ols_closed_form",        # one map-side-combined moment aggregate
    "audience_overlap",       # bitmap build + bitmap-sized intersect joins
    "shortest_paths",         # per-round min-plus edge join
    "window_distribution",    # grouped_ranks distribution measures
    "rolling_event_stats",    # block-overlap RANGE window
    "geo_neighbors",          # grid-stencil spatial join (Σ|cell|² bound)
    "adamic_adar",            # hub-capped wedge join (cap·m bound)
    "pq_topk",                # PQ train + ADC serve: codebook joins
    "phrase_search",          # filtered positional-postings joins
    "kmv_overlap",            # sketch-sized pair re-rank
    "resample_locf",          # calendar-bounded spine + keyed fill window
    "ngram_jaccard_maxdf",    # exact-Jaccard verify, Σdf² bound via max_df
    "association_lift",       # basket pair join, max_basket Σ|basket|² bound
    "media_shared_frames",    # media inverted-index pair join (Σdf² on frames)
    "jaccard_prefix",         # AllPairs/PPJoin prefix-filtered pair join
    "golden_records",         # LSH pairs + iterative closure + mode windows
    "leakage_safe_split",     # LSH pairs + connected components + fold hash
    "motif_triangles",        # 3-term motif join chain (capped: cap·m wedge bound)
    "sampled_quantiles",      # bounded bottom-k sample + k-row statistics
    "k_core",                 # iterative peeling: degree agg + semi joins per round
    "personalized_pagerank",  # per-round rank-vector join, seed teleport
    "sq_rescore_topk",        # byte-code ADC scan + bounded candidate rescore
    "colbert_maxsim",         # |Q|-row broadcast x token corpus, integer max/sum
    "training_pipeline_e2e",  # quality->dedup->decontam->pack composition
    "ivfpq_incremental",      # base build + 2-epoch streamed PQ encode + serve
    "ivfsq_incremental",      # base build + 2-epoch streamed SQ8 encode + serve
    "graph_walks",            # per-step frontier equi-join + hash-argmin
    "hnsw_incremental",       # per-shard graph build/resume: n_shard·ef·M work
    "versioned_feed",         # commit-version stream drain: file-listing + reads
    "merge_type_widening",    # bucketed MERGE + type-widened manifest read
    "sql_hidden_prune",       # SQL front door over hidden+zonemap layout (scales with events)
    "sql_insert_merge",       # SQL INSERT upsert lifecycle (fixed-size seed: ~flat)
    "indexed_table_ivfsq",    # co-committed IVF-SQ8 lifecycle (fixed-size seed: ~flat)
    "index_maintenance_advice",  # advisor lifecycle (fixed-size seed: ~flat)
    "multi_index_table",      # two co-committed indexes, one merge (fixed-size seed: ~flat)
    "ivf_consolidate",        # epoch fold + ledger + serve (corpus-scaling encode)
]

# ---- scaling GATE ------------------------------------------------------
# Exponent ceiling per query between the two largest SFs, computed on
# MIN-of-reps (min is the contention-robust statistic). Linear work = 1.0;
# measured values sit well below that while fixed overheads amortize. A
# documented-lever operator whose exponent crosses its ceiling means the
# lever silently stopped biting (max_df/max_basket/max_degree/Σ|cell|²) —
# exactly the quadratic pair blow-up no per-SF correctness oracle can see.
# Queries faster than MIN_GATE_SECONDS at the largest SF are skipped:
# below that, runtime is scheduler/planning noise, not work.
DEFAULT_MAX_EXP = 1.35
GATE_OVERRIDES = {
    # O(m^1.5) wedge bound IS the design (oriented edge orientation);
    # gate above it so only a regression past the design bound trips
    "triangle_count": 1.7,
    # cell-confined quadratics: Σ|cell|² with FIXED cell count k grows
    # super-linearly by design at fixed k — k is the production lever
    # (scale cells with corpus). Gate at the documented design bound.
    "semdedup": 1.8,
    "geo_neighbors": 1.8,
}
# Every panel query that runs >2 s at the largest SF must carry an
# EXPLICIT ceiling here (r9 — the gate's coverage contract: heavyweights
# are never gated by an implicit default that nobody reviewed). Values
# are the reviewed design bounds: 1.35 = linear work + amortizing
# overheads; entries above 1.35 must justify themselves in
# GATE_OVERRIDES instead. _assert_gate_coverage enforces the contract
# after every probe run.
EXPLICIT_CEILINGS = {
    "dedup_components": 1.35,     # pointer jumping: O(m log n) rounds
    "adamic_adar": 1.35,          # hub-capped wedges: cap·m
    "golden_records": 1.35,       # banded LSH pairs + capped closure
    "leakage_safe_split": 1.35,   # banded LSH pairs + components
    "label_propagation": 1.35,    # per-round edge join, fixed rounds
    "shortest_paths": 1.35,       # per-round min-plus join, fixed rounds
    "personalized_pagerank": 1.35,  # per-round rank join, fixed rounds
    "k_core": 1.35,               # peeling: per-round degree agg + semi joins
    "motif_triangles": 1.35,      # capped induced subgraph: cap·m (r9)
    "sq_rescore_topk": 1.35,      # byte-code scan + k-bounded rescore
    "training_pipeline_e2e": 1.35,  # map-only gates + hash equi-joins
    "ivfpq_incremental": 1.35,    # pure-function encode, epoch-partitioned
    "ivfsq_incremental": 1.35,    # pure-function encode, epoch-partitioned
    "graph_walks": 1.35,          # step cost = sum outdeg(frontier), frontier linear in corpus
    "hnsw_incremental": 1.35,     # per-shard insert: n·ef·M·log n, shard count is the lever
    "versioned_feed": 1.35,       # one pyarrow read per added file, O(commits) listing
    "merge_type_widening": 1.35,  # keyed anti-join + union over touched buckets
    "sql_hidden_prune": 1.35,     # pruned per-file pyarrow reads + one agg shuffle
    "sql_insert_merge": 1.35,     # fixed seed size: version churn, not corpus scale
    "indexed_table_ivfsq": 1.35,  # fixed seed size: encode+serve on <=350 rows
    "index_maintenance_advice": 1.35,  # fixed seed size: build+compact on <=280 rows
    "multi_index_table": 1.35,    # fixed seed size: both indexes on <=310 rows
    "ivf_consolidate": 1.35,      # pure-function encode + one layout rewrite pass
}
MIN_GATE_SECONDS = 0.8
HEAVY_SECONDS = 2.0  # the explicit-ceiling coverage threshold


def _assert_gate_coverage(mins: dict, hi: str) -> list[str]:
    """The gate's own gate: every query >HEAVY_SECONDS at the largest SF
    must have an explicit ceiling (EXPLICIT_CEILINGS or GATE_OVERRIDES) —
    a heavyweight silently riding the default is how a tuned-pre-r8 gate
    rots. Returns the uncovered names (also surfaced in SCALING.md)."""
    return sorted(
        name
        for name in PANEL
        if mins[name][hi] > HEAVY_SECONDS
        and name not in EXPLICIT_CEILINGS
        and name not in GATE_OVERRIDES
    )


def _sf(d: str) -> float:
    return float(os.path.basename(d)[2:])


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    timings: dict[str, dict[str, float]] = {}
    mins: dict[str, dict[str, float]] = {}
    for sf_dir in SF_DIRS:
        for name in PANEL:
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).collect()
                ts.append(time.perf_counter() - t0)
            timings.setdefault(name, {})[sf_dir] = statistics.median(ts)
            mins.setdefault(name, {})[sf_dir] = min(ts)
            print(f"{os.path.basename(sf_dir)} {name:24s} {min(ts):.2f}s", file=sys.stderr)

    lines = [
        "# SCALING — per-operator runtime vs scale factor",
        "",
        f"median of {reps} reps per cell, local[{os.cpu_count()}]; exponent = "
        "log(t_hi/t_lo)/log(sf_hi/sf_lo) between the two largest SFs "
        "(fixed overheads dominate the smallest SF and deflate exponents "
        "— sub-linear values mean overhead-bound, NOT sub-linear work).",
        "",
        "| query | "
        + " | ".join(os.path.basename(d) for d in SF_DIRS)
        + " | exponent (last step) |",
        "|---|" + "---|" * (len(SF_DIRS) + 1),
    ]
    exps = {}
    for name in PANEL:
        row = timings[name]
        cells = " | ".join(f"{row[d]:.2f}s" for d in SF_DIRS)
        if len(SF_DIRS) >= 2:
            hi, lo = SF_DIRS[-1], SF_DIRS[-2]
            exp = math.log(max(row[hi], 1e-3) / max(row[lo], 1e-3)) / math.log(
                _sf(hi) / _sf(lo)
            )
            exps[name] = round(exp, 2)
            lines.append(f"| {name} | {cells} | {exp:.2f} |")
        else:
            lines.append(f"| {name} | {cells} | n/a |")
    # ---- gate: assert ≲-linear growth on min-of-reps -------------------
    violations = {}
    gate_exps = {}
    gate_rows = []
    skipped = []
    uncovered: list[str] = []
    if len(SF_DIRS) >= 2:
        hi, lo = SF_DIRS[-1], SF_DIRS[-2]
        uncovered = _assert_gate_coverage(mins, hi)
        for name in PANEL:
            t_hi, t_lo = mins[name][hi], mins[name][lo]
            ceiling = GATE_OVERRIDES.get(
                name, EXPLICIT_CEILINGS.get(name, DEFAULT_MAX_EXP)
            )
            explicit = name in GATE_OVERRIDES or name in EXPLICIT_CEILINGS
            if t_hi < MIN_GATE_SECONDS:
                # surfaced, never silent: a skipped query is a decision
                skipped.append(f"{name} ({t_hi:.2f}s)")
                continue
            exp = math.log(max(t_hi, 1e-3) / max(t_lo, 1e-3)) / math.log(
                _sf(hi) / _sf(lo)
            )
            gate_exps[name] = round(exp, 2)
            status = "pass" if exp <= ceiling else "**VIOLATION**"
            gate_rows.append(
                f"| {name} | {t_lo:.2f}s | {t_hi:.2f}s | {exp:.2f} | "
                f"{ceiling}{' (explicit)' if explicit else ''} | {status} |"
            )
            if exp > ceiling:
                violations[name] = {
                    "exponent": round(exp, 2),
                    "ceiling": ceiling,
                    "t_lo": round(t_lo, 2),
                    "t_hi": round(t_hi, 2),
                }
    lines += [
        "",
        "## Gate (min-of-reps, two largest SFs)",
        "",
        f"default ceiling {DEFAULT_MAX_EXP}; every query over "
        f"{HEAVY_SECONDS:.0f}s at the largest SF carries an EXPLICIT "
        "reviewed ceiling (EXPLICIT_CEILINGS / GATE_OVERRIDES in "
        "tools/scaling_probe.py) — the probe fails if a heavyweight "
        f"rides the default. Queries under {MIN_GATE_SECONDS}s at the "
        "largest SF are overhead-bound and skipped, and listed below so "
        "no skip is silent.",
        "",
        "| query | min t(sf_lo) | min t(sf_hi) | exponent | ceiling | status |",
        "|---|---|---|---|---|---|",
        *gate_rows,
        "",
        "Skipped (overhead-bound, < "
        f"{MIN_GATE_SECONDS}s): {', '.join(skipped) if skipped else 'none'}.",
        "",
        (
            "**HEAVYWEIGHTS WITHOUT AN EXPLICIT CEILING: "
            + ", ".join(uncovered)
            + "**"
            if uncovered
            else "Explicit-ceiling coverage: complete (every >"
            f"{HEAVY_SECONDS:.0f}s query reviewed)."
        ),
        "",
        (
            "**VIOLATIONS: " + json.dumps(violations) + "**"
            if violations
            else "All gated operators within their ceilings."
        ),
    ]
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"
    )
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(
        json.dumps(
            {
                "metric": "scaling_exponents",
                "exponents": exps,
                "gate_violations": violations,
                "gate_skipped": skipped,
                "uncovered_heavyweights": uncovered,
            }
        )
    )
    spark.stop()
    return 1 if violations or uncovered else 0


if __name__ == "__main__":
    raise SystemExit(main())
