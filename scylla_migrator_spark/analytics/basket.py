"""Market-basket / co-occurrence association mining.

Pairwise frequent-itemset statistics (support, confidence, lift) over a
(basket, item) relation — the Agrawal-Srikant association-rule family at
the pairwise level, which is the part that matters for recommendation
candidate generation and "frequently bought together" surfaces.

Scale design: candidate pairs come from a SELF-JOIN ON THE BASKET KEY, so
the join fan-out is bounded by basket width (a few dozen items), never by
item popularity — a hot item appears in many baskets but each basket
contributes only its own pairs. The pair table aggregates map-side; the
min_support filter runs BEFORE the per-item statistics join back (the
probe side is the frequent head, not the long tail); item-support tables
are catalog-sized (unbounded across tenants/SKU spaces) so they join
without a forced broadcast — AQE picks broadcast vs shuffle from measured
size (the text._stats_side posture). All counts are exact integers; the
two ratios are single double divisions rounded to 6 dp, so the output is
oracle-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def item_pair_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 3,
) -> DataFrame:
    """Pairwise association statistics: for every unordered item pair
    co-occurring in >= ``min_support`` baskets,

        support_ab   baskets containing both (integer)
        confidence   P(b | a) = support_ab / support_a   (a < b ordering)
        lift         P(a,b) / (P(a) P(b)) = support_ab * N / (sa * sb)

    Output: (item_a, item_b, pair_count, confidence[6dp], lift[6dp]),
    item_a < item_b."""
    items = df.select(
        F.col(basket_col).alias("bk"), F.col(item_col).alias("it")
    ).distinct()
    n_baskets = items.agg(F.count_distinct("bk").alias("n"))
    sup = items.groupBy("it").agg(F.count("*").alias("s"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            on=[F.col("a.bk") == F.col("b.bk"), F.col("a.it") < F.col("b.it")],
        )
        .groupBy(F.col("a.it").alias("item_a"), F.col("b.it").alias("item_b"))
        .agg(F.count("*").alias("pair_count"))
        .filter(F.col("pair_count") >= min_support)
    )
    sa = sup.select(F.col("it").alias("item_a"), F.col("s").alias("sa"))
    sb = sup.select(F.col("it").alias("item_b"), F.col("s").alias("sb"))
    return (
        pairs.join(sa, "item_a")
        .join(sb, "item_b")
        .join(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "pair_count",
            F.round(F.col("pair_count") / F.col("sa"), 6).alias("confidence"),
            F.round(
                F.col("pair_count") * F.col("n") / (F.col("sa") * F.col("sb")), 6
            ).alias("lift"),
        )
    )
