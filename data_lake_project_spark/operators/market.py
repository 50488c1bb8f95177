"""Market-basket co-occurrence analysis: item-pair support + lift.

The classic association-mining readout (and the co-occurrence
statistics that feed item-item recommenders and word-embedding
pipelines): for every unordered item pair, in how many baskets do
they appear together (support), and how much MORE often than
independence predicts (lift = N * n_ab / (n_a * n_b), > 1 means
positive association).

Scale design: the pair fan-out is per-basket C(n, 2) — bounded by
the basket-size cap, NOT corpus size — and the self-join runs on the
basket key (one keyed shuffle; within-basket pairing is local).
``max_basket`` is the standard degenerate-basket guard: a single
mega-basket (a crawler session touching every item) would otherwise
emit O(items²) pairs; dropping baskets above the cap is what every
production basket miner does (the cap is a knob, the drop is
explicit). Counts are integers end-to-end; lift's single double
division is engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_lake_project_spark.functions import pround


def cooccurrence_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket: int = 200,
) -> DataFrame:
    """Pairwise basket co-occurrence with lift.

    Output: (item_a, item_b, n_ab, n_a, n_b, lift) for unordered
    pairs with support >= ``min_support``; item_a < item_b. ``n_a``
    counts baskets containing the item (after the basket-size cap),
    ``lift`` is pround(N * n_ab / (n_a * n_b), 4).
    """
    from pyspark.sql import Window

    b = df.select(
        F.col(basket_col).alias("__bk"), F.col(item_col).alias("__it")
    ).distinct()
    # size-gate via one basket-keyed window (no second agg + join),
    # then EAGERLY materialize: four consumers read this frame (both
    # sides of the pair self-join, the item counts, the basket
    # count) — without the cut each re-derives the distinct + gate
    # from scratch (measured 19 exchanges -> 6; the q148/q141
    # multi-consumer rule: count evaluations, not references). On a
    # cluster flip to reliable checkpoint — same call shape.
    b2 = (
        b.withColumn(
            "__bn", F.count("*").over(Window.partitionBy("__bk"))
        )
        .filter(F.col("__bn") <= max_basket)
        .drop("__bn")
        .localCheckpoint(eager=True)
    )
    pairs = (
        b2.select("__bk", F.col("__it").alias("item_a"))
        .join(b2.select("__bk", F.col("__it").alias("item_b")), "__bk")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    ci = b2.groupBy("__it").agg(F.count("*").cast("long").alias("n_i"))
    n_baskets = b2.agg(
        F.countDistinct("__bk").cast("long").alias("__N")
    )
    return (
        pairs.join(
            ci.select(F.col("__it").alias("item_a"), F.col("n_i").alias("n_a")),
            "item_a",
        )
        .join(
            ci.select(F.col("__it").alias("item_b"), F.col("n_i").alias("n_b")),
            "item_b",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            "n_a",
            "n_b",
            pround(
                (F.col("n_ab") * F.col("__N")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double"),
                4,
            ).alias("lift"),
        )
    )
