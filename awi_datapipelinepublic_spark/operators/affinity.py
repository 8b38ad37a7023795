"""Market-basket affinity: pairwise item co-occurrence with support,
confidence, and lift over transaction baskets.

The classic association-rule head (the counting core of Apriori's
first pass) as pure DataFrame ops — the recommendation / assortment
primitive every retail warehouse computes, and the co-occurrence
backbone reused by the graph census family (operators/graph.py builds
its co-purchase edges the same way).

Scale design: the only super-linear step is per-basket pair expansion,
Σ c·(c−1)/2 over basket sizes — bounded here by ``max_basket``
(degenerate "everything" baskets are excluded BEFORE expansion, the
same refuse-to-detonate stance as dedup's _guard_pair_expansion;
market-basket practice drops them anyway since a basket containing
everything carries no co-occurrence signal). Everything else is
hash-partitioned groupBys with map-side combine; the statistic math is
exact integer products divided once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pair_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket: int = 64,
    round_dp: int = 6,
) -> DataFrame:
    """(item_a, item_b, n_ab, support, confidence, lift) for every
    unordered item pair co-occurring in ≥ ``min_support`` baskets.

    - support    = n_ab / N          (N = baskets after the size cap)
    - confidence = n_ab / n_a        (a → b direction; item_a < item_b,
                                      both directions derivable)
    - lift       = n_ab·N / (n_a·n_b)

    Plan: baskets collapse to sorted distinct item arrays (one groupBy
    on the basket key), oversized baskets are filtered out, pairs
    explode via the array-slice transform (codegen, no UDF), then one
    groupBy on the pair key; per-item basket counts aggregate from the
    SAME capped basket table and broadcast back twice (item
    cardinality ≪ pair cardinality). All ratios are exact longs
    divided once and rounded at ``round_dp``.
    """
    baskets = (
        df.groupBy(F.col(basket_col).alias("__b"))
        .agg(F.array_sort(F.collect_set(F.col(item_col))).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_basket))
        # four consumers (pairs, two item-count join-backs, N) — one
        # eager materialization keeps the fact scan single; blocks are
        # GC-owned (ContextCleaner), not a leaked persist
        .localCheckpoint()
    )
    n_baskets = baskets.agg(F.count(F.lit(1)).alias("__N"))
    item_counts = (
        baskets.select(F.explode("ids").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("__n_item"))
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(ids, (a, i) -> "
                "transform(slice(ids, i + 2, size(ids) - i - 1), "
                "b -> struct(a AS item_a, b AS item_b))))"
            )
        ).alias("p")
    ).select("p.item_a", "p.item_b")
    pair_counts = (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    return (
        # item_counts is VOCABULARY-sized (one row per distinct item) —
        # no forced broadcast; AQE promotes by measured size when the
        # catalog is actually small, and shuffles when it isn't.
        pair_counts.join(
            item_counts.select(F.col("item").alias("item_a"), F.col("__n_item").alias("__na")),
            "item_a",
        )
        .join(
            item_counts.select(F.col("item").alias("item_b"), F.col("__n_item").alias("__nb")),
            "item_b",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            F.round(F.col("n_ab") / F.col("__N"), round_dp).alias("support"),
            F.round(F.col("n_ab") / F.col("__na"), round_dp).alias("confidence"),
            F.round(
                F.col("n_ab") * F.col("__N") / (F.col("__na") * F.col("__nb")),
                round_dp,
            ).alias("lift"),
        )
    )


def triple_support(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket: int = 64,
    round_dp: int = 6,
) -> DataFrame:
    """Frequent 3-itemsets: (item_a < item_b < item_c, n_abc, support)
    for every unordered item triple co-occurring in ≥ ``min_support``
    baskets — Apriori's second expansion pass, the bundle/assortment
    signal one hop past :func:`pair_lift`.

    Plan — Apriori pruning BEFORE the cubic expansion: a frequent
    triple's items are each frequent, so baskets are first projected
    onto the frequent-item set (explode → broadcast semi-join on the
    ≥min_support items → re-collect arrays). The pruned baskets then
    explode their C(c,3) triples via a nested slice-transform
    (codegen, no UDF) — Σ C(c,3) is bounded by ``max_basket``³/6 per
    basket, and in practice by the pruned basket size, which is what
    the pruning is FOR: at 100 TB the raw expansion is the detonation
    risk, the pruned one is support-bounded. One final groupBy on the
    triple key with map-side combine. Pruning never changes the
    result, so the oracle replays the plain unpruned count.

    N (the support denominator) is the basket count after the size
    cap, matching pair_lift's contract.
    """
    baskets = (
        df.groupBy(F.col(basket_col).alias("__b"))
        .agg(F.array_sort(F.collect_set(F.col(item_col))).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_basket))
        .localCheckpoint()  # N + item counts + triple expansion
    )
    n_baskets = baskets.agg(F.count(F.lit(1)).alias("__N"))
    frequent = (
        baskets.select(F.explode("ids").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("__n_item"))
        .filter(F.col("__n_item") >= min_support)
        .select("item")
    )
    pruned = (
        baskets.select(F.col("__b"), F.explode("ids").alias("item"))
        # frequent is vocabulary-sized (min-support bounds it only
        # loosely) — unhinted; AQE broadcasts the semi-join side when
        # its measured size allows.
        .join(frequent, "item")
        .groupBy("__b")
        .agg(F.array_sort(F.collect_set("item")).alias("ids"))
        .filter(F.size("ids") >= 3)
    )
    triples = pruned.select(
        F.explode(
            F.expr(
                "flatten(transform(ids, (a, i) -> "
                "flatten(transform(slice(ids, i + 2, size(ids) - i - 1), (b, j) -> "
                "transform(slice(ids, i + j + 3, size(ids) - i - j - 2), "
                "c -> struct(a AS item_a, b AS item_b, c AS item_c))))))"
            )
        ).alias("t")
    ).select("t.item_a", "t.item_b", "t.item_c")
    return (
        triples.groupBy("item_a", "item_b", "item_c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_abc"))
        .filter(F.col("n_abc") >= min_support)
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "item_c",
            "n_abc",
            F.round(F.col("n_abc") / F.col("__N"), round_dp).alias("support"),
        )
    )
