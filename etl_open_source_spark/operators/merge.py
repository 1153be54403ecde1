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


def merge_upsert(target: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """whenMatched → update all columns; whenNotMatched → insert.
    Schemas must match. Returns the merged dataset (caller writes it)."""
    if set(target.columns) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: target {sorted(target.columns)} vs updates {sorted(updates.columns)}"
        )
    survivors = target.join(updates.select(*keys).distinct(), keys, "left_anti")
    return updates.unionByName(survivors)
