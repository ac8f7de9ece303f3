"""Spatial analytics — fixed-grid neighbor joins over point sets.

[absent in reference — north-star extension] The reference has no spatial
surface; training-data pipelines meet it as geo-dedup (same venue scraped
twice), location-bucketed sampling, and "nearby entities" joins. The
classic distributed strategy is the one every spatial engine (Sedona,
PostGIS tiling, S2/geohash buckets) uses: overlay a fixed grid sized to
the query radius, hash-partition by cell, and check the exact predicate
only inside a 3×3 cell stencil — candidate pairs are bounded by local
density, never the corpus square.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def grid_neighbor_join(
    points: DataFrame,
    radius: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """All point pairs within Euclidean distance ``radius`` via fixed-grid
    bucketing: cell width = radius, so any qualifying pair sits in the
    same or an adjacent cell. One side explodes its 3×3 stencil in-JVM
    (×9 rows), the other keys by its own cell; ONE hash equi-join on the
    cell + the exact integer distance check. Each unordered pair lands
    exactly once: only the (id_a < id_b) orientation survives, and a's
    stencil covers b's home cell exactly once.

    Integer coordinates keep dist² = Δx² + Δy² exact on any engine — no
    floating-point geometry. Σ|cell|² bounds the candidate space (the
    same contract as blocked_linkage's blocks); at 100 TB the grid
    co-partitions both sides so the join never widens beyond local
    density.

    Returns (id_a, id_b, dist2) with dist2 ≤ radius².
    """
    if radius <= 0:
        raise ValueError("grid_neighbor_join: radius must be positive")
    p = points.select(
        F.col(id_col).alias("_id"),
        F.col(x_col).cast("bigint").alias("_x"),
        F.col(y_col).cast("bigint").alias("_y"),
    )
    cx = F.floor(F.col("_x") / F.lit(radius))
    cy = F.floor(F.col("_y") / F.lit(radius))
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe = p.select(
        "_id",
        "_x",
        "_y",
        F.explode(offs).alias("_o"),
        cx.alias("_cx"),
        cy.alias("_cy"),
    ).select(
        F.col("_id").alias("id_a"),
        F.col("_x").alias("xa"),
        F.col("_y").alias("ya"),
        (F.col("_cx") + F.col("_o.dx")).alias("cell_x"),
        (F.col("_cy") + F.col("_o.dy")).alias("cell_y"),
    )
    home = p.select(
        F.col("_id").alias("id_b"),
        F.col("_x").alias("xb"),
        F.col("_y").alias("yb"),
        cx.alias("cell_x"),
        cy.alias("cell_y"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        probe.join(home, ["cell_x", "cell_y"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", d2.cast("bigint").alias("dist2"))
        .filter(F.col("dist2") <= radius * radius)
    )
