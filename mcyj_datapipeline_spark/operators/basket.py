"""Market-basket association mining: the a-priori 2-itemset pass with
support-based candidate pruning, as a DataFrame plan.

The scale story IS the pruning: pair enumeration is quadratic in
basket size, so infrequent items are dropped BEFORE the self-join (the
a-priori monotonicity argument — a pair can only be frequent if both
members are), and the pair floor is applied straight after the count.
At 100 TB the basket relation shuffles once on the basket key for the
self-join; item supports and the basket total are vocabulary-sized /
one-row relations that broadcast onto the surviving pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_item_support: int = 3,
    min_pair_support: int = 3,
) -> DataFrame:
    """Association rules over 2-itemsets: for every item pair whose
    co-occurrence count reaches ``min_pair_support``, emit BOTH
    directed rules with ``support`` (co-occurrence count),
    ``confidence`` = sup(ab)/sup(antecedent) and
    ``lift`` = confidence / (sup(consequent)/n_baskets).

    Plan: distinct (basket, item) → item supports → a-priori item
    prune (frequent-items semi-join) → basket self-join with
    ``item_a < item_b`` → pair floor → rule expansion via a tiny
    2-row explode, with supports and the basket count broadcast on.
    """
    # the distinct basket relation feeds the self-join (twice), the
    # item supports, and the basket count — checkpoint it once so the
    # scan+distinct subtree is not re-executed per consumer (static
    # plans duplicate it; exchange reuse is a runtime maybe, this is a
    # guarantee)
    b = (
        df.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    supp = b.groupBy("item").agg(F.count(F.lit(1)).alias("s"))
    freq = supp.filter(F.col("s") >= min_item_support)
    bf = b.join(freq.select("item"), "item", "left_semi").localCheckpoint(
        eager=False
    )
    left = bf.select("basket", F.col("item").alias("item_a"))
    right = bf.select("basket", F.col("item").alias("item_b"))
    pairs = (
        left.join(right, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_support"))
        .filter(F.col("pair_support") >= min_pair_support)
    )
    n_baskets = b.select("basket").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("n_baskets")
    )
    # both rule directions from each undirected pair
    rules = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("item_a").alias("antecedent"),
                    F.col("item_b").alias("consequent"),
                ),
                F.struct(
                    F.col("item_b").alias("antecedent"),
                    F.col("item_a").alias("consequent"),
                ),
            )
        ).alias("r"),
        "pair_support",
    ).select("r.antecedent", "r.consequent", "pair_support")
    sa = F.broadcast(
        supp.select(F.col("item").alias("antecedent"), F.col("s").alias("s_a"))
    )
    sc = F.broadcast(
        supp.select(F.col("item").alias("consequent"), F.col("s").alias("s_c"))
    )
    return (
        rules.join(sa, "antecedent")
        .join(sc, "consequent")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            "pair_support",
            F.round(F.col("pair_support") / F.col("s_a"), 6).alias(
                "confidence"
            ),
            F.round(
                (F.col("pair_support") / F.col("s_a"))
                / (F.col("s_c") / F.col("n_baskets")),
                6,
            ).alias("lift"),
        )
    )
