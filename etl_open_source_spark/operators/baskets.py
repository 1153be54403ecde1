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
    Baskets larger than ``max_basket_size`` are dropped whole.

    A NULL basket key is NOT a basket: SQL equality never matches NULL,
    so the self-join formulation this mirrors can never pair rows with a
    NULL key — but groupBy would collect them into one phantom basket
    (caught by the randomized relational-agg differential; same contract
    as the as-of join's NULL by-key)."""
    baskets = (
        df.filter(F.col(basket_col).isNotNull())
        .groupBy(basket_col)
        .agg(F.collect_set(item_col).alias("__items"))
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


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket_size: int | None = None,
) -> DataFrame:
    """Directed association rules (antecedent → consequent) from pair
    co-occurrence: support(a,b), confidence = support(a,b)/support(a),
    lift = confidence / (support(b)/n_baskets).

    Shape: the single-shuffle pair mine from :func:`cooccurring_pairs`
    plus one item-support aggregate; the 1-row basket count broadcasts
    onto the rule set and item supports join on the item key (shuffle
    bounded by |items|, not |baskets|). Each unordered pair emits both
    rule directions. Rates round to 6 places for cross-engine parity.

    When ``max_basket_size`` fires, the dropped baskets are removed from
    EVERY universe — pair supports, item supports, and n_baskets — so
    confidence and lift stay internally consistent (they describe the
    guarded dataset exactly, rather than mixing a guarded numerator with
    unguarded denominators).
    """
    # NULL items can never appear in a rule (collect_set in
    # cooccurring_pairs drops them) and a NULL basket key is not a basket
    # (cooccurring_pairs excludes it) — exclude both from EVERY universe
    # up front, so the per-basket size below counts exactly what the pair
    # guard counts (a NULL item row must not push a basket over the cap
    # here while the pair mine keeps it — self-review finding)
    items = (
        df.filter(
            F.col(item_col).isNotNull() & F.col(basket_col).isNotNull()
        )
        .select(basket_col, item_col)
        .distinct()
    )
    if max_basket_size is not None:
        from pyspark.sql import Window

        items = (
            items.withColumn(
                "__bsz",
                F.count(F.lit(1)).over(Window.partitionBy(basket_col)),
            )
            .filter(F.col("__bsz") <= max_basket_size)
            .drop("__bsz")
        )
    n_baskets = items.select(basket_col).distinct().agg(
        F.count(F.lit(1)).alias("__n_baskets")
    )
    item_supp = items.groupBy(F.col(item_col).alias("__item")).agg(
        F.count(F.lit(1)).alias("__item_supp")
    )
    pairs = cooccurring_pairs(
        df, basket_col, item_col, min_support=min_support,
        max_basket_size=max_basket_size,
    )
    rules = pairs.select(
        F.col("part_a").alias("antecedent"),
        F.col("part_b").alias("consequent"),
        "support",
    ).unionAll(
        pairs.select(
            F.col("part_b").alias("antecedent"),
            F.col("part_a").alias("consequent"),
            "support",
        )
    )
    conf = F.col("support") / F.col("__supp_a")
    lift = conf * F.col("__n_baskets") / F.col("__supp_b")
    return (
        rules.join(
            item_supp.withColumnsRenamed(
                {"__item": "antecedent", "__item_supp": "__supp_a"}
            ),
            "antecedent",
        )
        .join(
            item_supp.withColumnsRenamed(
                {"__item": "consequent", "__item_supp": "__supp_b"}
            ),
            "consequent",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            "support",
            F.round(conf, 6).alias("confidence"),
            F.round(lift, 6).alias("lift"),
        )
    )
