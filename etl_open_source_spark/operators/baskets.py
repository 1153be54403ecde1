"""Market-basket pair mining with a degenerate-basket guard.

[EXT] — co-occurrence counting, the first step of association-rule /
complementary-item analysis. The scale hazard is a single huge basket
(a crawler session with a million "items") whose O(basket²) pair
explosion dominates the job; ``max_basket_size`` drops such baskets the
same way the LSH hot-bucket cap drops degenerate buckets
(operators/dedup.py) — skew-robustness over completeness, explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurring_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 1,
    max_basket_size: int | None = None,
) -> DataFrame:
    """Count (item_a < item_b) pairs co-occurring in a basket. ONE shuffle
    on the basket key (collect_set), pair generation scan-local from the
    per-basket array (no self-join — a join formulation re-shuffles or
    duplicates the dedup subtree), then the pair-count aggregate.
    Baskets larger than ``max_basket_size`` are dropped whole."""
    baskets = df.groupBy(basket_col).agg(
        F.collect_set(item_col).alias("__items")
    )
    if max_basket_size is not None:
        baskets = baskets.filter(F.size("__items") <= max_basket_size)
    pairs = F.flatten(
        F.transform(
            "__items",
            lambda x: F.transform(
                F.filter("__items", lambda y: y > x),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return (
        baskets.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("part_a"), F.col("p.b").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )
