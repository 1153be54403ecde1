"""SCD Type-2 apply — versioned dimension maintenance, the warehouse-ETL
staple beyond the reference's append/replace-only loaders.

Semantics: for each incoming update row,
- attrs changed   → close the current version (valid_to = effective,
  is_current = false) and open a new one (valid_from = effective);
- attrs unchanged → no-op (no spurious versions);
- new key         → insert first version.
History rows (is_current = false) pass through untouched.

Plan shape: one join current×updates on the key + one anti-join for brand-
new keys; history is a pass-through union. Nothing quadratic; the join key
is the dimension key.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END_OF_TIME = "2200-01-01 00:00:00"


def _any_attr_differs(attrs: list[str]) -> Column:
    # null-safe inequality per attribute, OR-ed
    diffs = [~F.col(a).eqNullSafe(F.col(f"__u_{a}")) for a in attrs]
    return functools.reduce(lambda x, y: x | y, diffs)


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    keys: list[str],
    attrs: list[str],
    effective_ts: str,
) -> DataFrame:
    """``current`` must carry (keys, attrs, valid_from, valid_to,
    is_current); ``updates`` carries (keys, attrs). Returns the new full
    dimension table.

    ``updates`` must hold at most ONE row per key — a duplicate-key batch
    would fan the live version out per duplicate and open several
    is_current versions at once, breaking the non-overlapping invariant
    every point-in-time lookup relies on. Checked eagerly (one small job
    over the batch-sized updates) and rejected loudly."""
    from etl_open_source_spark.operators.merge import assert_unique_keys

    assert_unique_keys(updates, keys, "scd2_apply")
    eff = F.lit(effective_ts).cast("timestamp")
    eot = F.lit(END_OF_TIME).cast("timestamp")

    live = current.filter(F.col("is_current"))
    history = current.filter(~F.col("is_current"))

    # __matched marks "an update row exists for this key" — attr values
    # can't: an update that sets every tracked attr to NULL would otherwise
    # be indistinguishable from no-match and silently ignored.
    u = updates.select(
        *keys,
        *[F.col(a).alias(f"__u_{a}") for a in attrs],
        F.lit(True).alias("__matched"),
    )
    joined = live.join(u, keys, "left")
    has_update = F.coalesce(F.col("__matched"), F.lit(False))
    changed = has_update & _any_attr_differs(attrs)

    closed_or_kept = joined.select(
        *keys,
        *attrs,
        F.col("valid_from"),
        F.when(changed, eff).otherwise(F.col("valid_to")).alias("valid_to"),
        (~changed).alias("is_current"),
    )

    new_versions = (
        joined.filter(changed)
        .select(*keys, *[F.col(f"__u_{a}").alias(a) for a in attrs])
        .withColumns({"valid_from": eff, "valid_to": eot, "is_current": F.lit(True)})
    )
    brand_new = (
        updates.join(live.select(*keys), keys, "left_anti")
        .select(*keys, *attrs)
        .withColumns({"valid_from": eff, "valid_to": eot, "is_current": F.lit(True)})
    )
    return (
        history.select(*closed_or_kept.columns)
        .unionByName(closed_or_kept)
        .unionByName(new_versions)
        .unionByName(brand_new)
    )
