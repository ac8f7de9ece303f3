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


def audience_overlap(
    df: DataFrame,
    group_col: str,
    id_col: str,
    round_decimals: int = 6,
) -> DataFrame:
    """Exact audience-overlap matrix via positional bitmap aggregation —
    the analytics answer to "how many users did both X and Y" for every
    group pair WITHOUT a corpus-sized pairwise self-join.
    [absent in reference — north-star extension]

    Shape: each (group, id) collapses into per-64-bit-word bitmaps
    (word = id DIV 64, ``bit_or`` of ``1 << (id % 64)``) — ONE partial-agg
    shuffle over ≤ |groups|·(id_domain/64) keys; the pairwise
    intersection is then a bitmap-sized equi-join on the word index with
    a JVM ``bit_count(a & b)`` fold. The naive alternative (self-join of
    the (group, id) relation on id) shuffles the corpus against itself;
    here the corpus is read once and everything after is bitmap-sized.
    The roaring-bitmap analytics-engine trick, in pure DataFrame ops.

    ``id_col`` must be a non-negative integer id; DENSE ids keep the
    bitmaps compact (sparse 64-bit ids: remap via ``skew.global_ranks``
    first, or hash to a fixed domain and accept collision-approximate
    counts). Returns (group_a, group_b, n_a, n_b, n_overlap, jaccard)
    for group_a < group_b."""
    g = F.col(group_col)
    words = (
        df.select(
            g.alias("_g"),
            F.expr(f"CAST({id_col} AS BIGINT) DIV 64").alias("_w"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({id_col} % 64 AS INT))").alias("_bit"),
        )
        .groupBy("_g", "_w")
        .agg(F.expr("bit_or(_bit)").alias("_bm"))
    )
    sizes = words.groupBy("_g").agg(
        F.sum(F.bit_count("_bm")).cast("bigint").alias("_n")
    )
    a, b = words.alias("a"), words.alias("b")
    inter = (
        a.join(b, (F.col("a._w") == F.col("b._w")) & (F.col("a._g") < F.col("b._g")))
        .groupBy(F.col("a._g").alias("group_a"), F.col("b._g").alias("group_b"))
        .agg(
            F.sum(F.bit_count(F.col("a._bm").bitwiseAND(F.col("b._bm"))))
            .cast("bigint")
            .alias("n_overlap")
        )
    )
    sa = sizes.select(F.col("_g").alias("group_a"), F.col("_n").alias("n_a"))
    sb = sizes.select(F.col("_g").alias("group_b"), F.col("_n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "group_a")
        .join(F.broadcast(sb), "group_b")
        .select(
            "group_a",
            "group_b",
            "n_a",
            "n_b",
            "n_overlap",
            F.round(
                F.col("n_overlap").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_overlap")).cast("double"),
                round_decimals,
            ).alias("jaccard"),
        )
    )


def sequence_support(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    min_support: int = 1,
    max_types: int = 1024,
) -> DataFrame:
    """Gapped-subsequence support mining (PrefixSpan's length-2 core): for
    every ordered type pair (a, b), how many users ever did a and LATER b
    — regardless of what happened in between. The complement of the
    adjacent-pair Markov matrix: "signup … eventually purchase" patterns
    that adjacency misses. [absent in reference — north-star extension]

    The existence trick makes it one pass: user u exhibits <a, b> iff
    min_ts(u, a) < max_ts(u, b) — no per-user sequence scan, no
    subsequence enumeration. ONE (user, type) groupBy collapses the
    corpus, then a user-keyed self-equi-join over the per-user type rows
    and a (a, b)-keyed count.

    100 TB contract — the Σ|types-per-user|² lever: the self-join emits at
    most |distinct types|² rows PER USER (independent of the user's event
    count, since the groupBy collapsed repeats), so total work is
    Σ_u |types(u)|² ≤ n_users · |types|². That is linear in users only
    while the TYPE vocabulary stays dimension-like (event taxonomies,
    page categories). ``max_types`` enforces the contract the way
    ``max_basket``/``max_degree`` do for association_lift/adamic_adar:
    if the observed type cardinality exceeds it, fail fast with the
    remediation (pre-bucket the type column into a bounded taxonomy)
    rather than silently running a quadratic blowup.

    Returns (type_a, type_b, support) for pairs with support ≥
    ``min_support``.
    """
    n_types = df.select(type_col).distinct().limit(max_types + 1).count()
    if n_types > max_types:
        raise ValueError(
            f"sequence_support: type cardinality exceeds max_types="
            f"{max_types}; per-user pair space is |types|^2 — pre-bucket "
            f"'{type_col}' into a bounded taxonomy (or raise max_types "
            f"deliberately) before mining pairs"
        )
    ut = (
        df.filter(F.col(user_col).isNotNull())
        .groupBy(F.col(user_col).alias("u"), F.col(type_col).alias("t"))
        .agg(F.min(ts_col).alias("tmin"), F.max(ts_col).alias("tmax"))
    )
    a = ut.select("u", F.col("t").alias("type_a"), "tmin")
    b = ut.select(F.col("u").alias("_u"), F.col("t").alias("type_b"), "tmax")
    pairs = a.join(b, (a["u"] == b["_u"])).filter(
        (F.col("type_a") != F.col("type_b")) & (F.col("tmin") < F.col("tmax"))
    )
    return (
        pairs.groupBy("type_a", "type_b")
        .agg(F.count("*").cast("bigint").alias("support"))
        .filter(F.col("support") >= min_support)
    )
