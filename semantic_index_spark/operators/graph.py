"""Graph analytics over edge lists — PageRank-style link analysis.

[absent in reference — north-star extension] The reference has no graph
surface at all; training-data pipelines need link analysis for source
ranking (which domains/authors matter), crawl prioritization, and
citation-weighted sampling. Connected components (dedup clustering) lives
in :mod:`..operators.dedup`; this module adds iterative score propagation.

Scale shape: classic distributed PageRank — the edge list is the big
table and it is shuffled ONCE per iteration on the source key; the rank
vector is |nodes| rows (orders of magnitude smaller than edges) and
co-partitions with the edge shuffle. Nothing ever collects to the driver;
lineage is cut per iteration with ``localCheckpoint`` so the plan does not
grow O(iterations) deep (the same discipline as
:func:`..operators.dedup.dedup_components`).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
    damping: float = 0.85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Returns (node, rank) for every node appearing as a source or a
    destination. Semantics (the textbook synchronous update):

      rank⁰(v)      = 1 / N
      rankᵗ⁺¹(v)    = (1 − d)/N + d·(Σ_{u→v} rankᵗ(u)/outdeg(u)
                                      + dangling_massᵗ/N)

    Dangling nodes (no out-edges) redistribute their mass uniformly — the
    standard stochastic-matrix fix, so Σ rank = 1 at every step and the
    result is a true probability distribution (checked by the tests).

    A FIXED iteration count (not convergence-tested) keeps the operator
    deterministic and cross-engine checkable: the oracle unrolls the same
    recurrence as plain SQL CTEs. For production convergence, call with a
    larger ``iterations`` — the loop structure is identical.

    Scale: per iteration, one hash-shuffle of the edge list on ``src``
    (joining the |N|-row rank vector) and one groupBy on ``dst`` with
    map-side partial sums; the dangling term is a 1-row aggregate
    broadcast back. Edges and degrees are computed once and cached.
    ``localCheckpoint`` every ``checkpoint_every`` iterations bounds both
    lineage depth and AQE replanning cost.
    """
    if iterations < 0:
        raise ValueError("pagerank: iterations must be >= 0")
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst")).distinct()
    e.cache()
    nodes = (
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst").alias("node")))
        .distinct()
    )
    nodes.cache()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy("_src").agg(F.count("*").alias("_deg"))
    # degree rides with the rank vector so the per-iteration join against
    # the edge list ships one small table, not two
    base = nodes.join(outdeg, nodes["node"] == outdeg["_src"], "left").select(
        "node", F.coalesce(F.col("_deg"), F.lit(0)).alias("_deg")
    )
    base.cache()
    ranks = base.withColumn("rank", F.lit(1.0 / n_nodes))

    for it in range(iterations):
        # mass that dangling nodes spread uniformly this step: 1-row agg,
        # broadcast into the closure of the next plan via crossJoin
        dangling = ranks.filter(F.col("_deg") == 0).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang")
        )
        contrib = (
            e.join(
                ranks.filter(F.col("_deg") > 0).select(
                    F.col("node").alias("_src"),
                    (F.col("rank") / F.col("_deg")).alias("_share"),
                ),
                "_src",
            )
            .groupBy(F.col("_dst").alias("node"))
            .agg(F.sum("_share").alias("_in"))
        )
        ranks = (
            base.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "_deg",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping)
                    * (F.coalesce(F.col("_in"), F.lit(0.0)) + F.col("_dang") / n_nodes)
                ).alias("rank"),
            )
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", "rank")


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Global triangle count of an UNDIRECTED graph given as an edge list
    (either orientation, duplicates/self-loops tolerated — canonicalized
    away first). Returns one row: (n_triangles).

    Scale shape — the degree-ordered orientation trick (Schank & Wagner
    2005; the same plan Spark GraphX and most MPP triangle counters use):
    orient every edge from its lower-(degree, node) endpoint to the
    higher one. Every triangle then has exactly ONE wedge whose center is
    the triangle's minimum-order vertex, so counting = (1) self-join the
    oriented edges on the source to enumerate wedges, (2) semi-join the
    wedge's outer pair against the oriented edge set. The payoff: wedge
    count is Σ outdeg(v)² where every outdeg is O(√m) under this
    orientation — O(m^1.5) total work instead of the Σ deg(v)² blow-up a
    hub vertex causes in the naive plan. Both joins are hash equi-joins;
    no nested loop at any size.
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
    )
    e.cache()
    deg = (
        e.select(F.col("a").alias("v"))
        .union(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    # orientation key: (degree, node) — a total order, so every edge gets
    # exactly one direction and every triangle exactly one minimum vertex
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("w")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("w")))
            .alias("e")
        )
        .select("e.u", "e.w")
    )
    w1 = oriented.select(F.col("u"), F.col("w").alias("x"))
    w2 = oriented.select(F.col("u"), F.col("w").alias("y"))
    # wedge (x, y) around center u, emitted once (x < y in node order);
    # the closing edge may be oriented either way, so canonicalize the
    # pair back to (min, max) and probe the canonical edge set
    wedges = w1.join(w2, "u").filter(F.col("x") < F.col("y")).select("x", "y")
    # count closed wedges; each triangle contributes exactly one (its
    # min-order-center wedge appears once and the (x, y) probe is keyed
    # on the canonical a<b form)
    return wedges.join(
        e.select(F.col("a").alias("x"), F.col("b").alias("y")), ["x", "y"], "left_semi"
    ).agg(F.count("*").cast("bigint").alias("n_triangles"))
