"""Co-occurrence / association mining over (basket, item) relations.

[absent in reference — north-star extension] The pattern behind
"customers who bought X also bought Y", query-term co-occurrence, and
document-tag affinity: count how often two items share a basket and
normalize by chance (lift). A training-data pipeline uses the same
statistic for source co-citation and concept co-occurrence audits.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def association_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket: int | None = None,
) -> DataFrame:
    """Item-pair co-occurrence counts with lift:

      lift(a, b) = P(a, b) / (P(a)·P(b))
                 = n_ab · N / (n_a · n_b)

    over basket-level presence (an item twice in one basket counts once).
    Returns (item_a, item_b, n_ab, lift) with item_a < item_b and
    n_ab ≥ ``min_support``; lift > 1 means the pair co-occurs more than
    chance.

    Scale shape: the pair enumeration is a self-equi-join ON THE BASKET
    KEY — cost Σ|basket|², the exact analogue of the Σdf² shingle join in
    the dedup family, with the same lever: ``max_basket`` drops baskets
    larger than the cap BEFORE the join (one mega-basket of 10⁵ items
    would otherwise contribute 10¹⁰ pairs; such baskets are almost always
    crawler artifacts, and the cap is applied consistently to marginals
    and pairs so lift stays internally coherent). Pair counts partial-
    aggregate map-side; the item-marginal join is vocabulary-sized and
    left to AQE to broadcast when small.
    """
    items = df.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    if max_basket is not None:
        ok = (
            items.groupBy("b")
            .agg(F.count("*").alias("_sz"))
            .filter(F.col("_sz") <= max_basket)
            .select("b")
        )
        items = items.join(ok, "b")
    n_baskets = items.select(F.count_distinct("b").alias("_n"))
    marg = items.groupBy("i").agg(F.count("*").alias("_ni"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(b, (F.col("a.b") == F.col("b.b")) & (F.col("a.i") < F.col("b.i")))
        .groupBy(F.col("a.i").alias("item_a"), F.col("b.i").alias("item_b"))
        .agg(F.count("*").cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    ma = marg.select(F.col("i").alias("item_a"), F.col("_ni").alias("_na"))
    mb = marg.select(F.col("i").alias("item_b"), F.col("_ni").alias("_nb"))
    return (
        pairs.join(ma, "item_a")
        .join(mb, "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            F.round(
                F.col("n_ab").cast("double")
                * F.col("_n").cast("double")
                / (F.col("_na").cast("double") * F.col("_nb").cast("double")),
                6,
            ).alias("lift"),
        )
    )
