"""MERGE (upsert) — the ETL-engine staple the reference's append/replace
loaders can't express (core/loaders/sqlserver.py:247-269 offers only
insert-all or delete-all+insert).

Without a transactional table format, merge is: updated+inserted rows win,
unmatched target rows survive, snapshot rewritten. With Delta/Iceberg the
same call maps to a native MERGE INTO; the plan shape (anti-join + union)
is identical.

Scale: one shuffle-join of target×updates on the key. For partitioned
targets, filter the rewrite to touched partitions (dynamic partition
overwrite) instead of rewriting the full snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assert_unique_keys(df: DataFrame, keys: list[str], ctx: str) -> None:
    """Eager one-job guard: raise if ``df`` carries more than one row per
    key (NULL keys group like any value). The merge/SCD operators assume
    one update row per key; a duplicate-key batch would otherwise emit
    duplicate rows (merge) or multiple current versions (SCD2) SILENTLY.
    Callers that legitimately carry duplicates pass ``dedup_order``
    instead of paying this check."""
    dup = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") > 1)
        .limit(1)
        .take(1)
    )
    if dup:
        key_vals = {k: dup[0][k] for k in keys}
        raise ValueError(
            f"{ctx}: updates carry {dup[0]['__c']} rows for key {key_vals} — "
            f"one row per key required (pre-dedupe, or pass dedup_order=<ts col>)"
        )


def _latest_per_key(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    dedup_order: str | None = None,
) -> DataFrame:
    """whenMatched → update all columns; whenNotMatched → insert.
    Schemas must match. Returns the merged dataset (caller writes it).

    ``dedup_order``: column whose max picks the winner when a batch holds
    several rows per key (CDC feeds); omitted → an eager uniqueness check
    fails loudly on duplicate keys rather than silently emitting
    duplicate rows into the snapshot."""
    if set(target.columns) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: target {sorted(target.columns)} vs updates {sorted(updates.columns)}"
        )
    if dedup_order is not None:
        updates = _latest_per_key(updates, keys, dedup_order)
    else:
        assert_unique_keys(updates, keys, "merge_upsert")
    survivors = target.join(updates.select(*keys).distinct(), keys, "left_anti")
    return updates.unionByName(survivors)
