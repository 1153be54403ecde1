"""Skew-handling operators: salting for hot keys.

AQE's skew-join splitting handles moderate skew automatically; salting is
the explicit tool for pathological keys (one key = 30% of a 100 TB table):

- salted aggregation: two-phase — aggregate on (key, salt) first so the hot
  key's rows spread over N reducers, then combine partials per key.
- salted join: replicate the small side N× (one copy per salt), salt the
  big side's keys randomly — every hot-key row still finds its match.

Both are pure DataFrame rewrites; results are IDENTICAL to the unsalted
plan (verified by oracle), only the shuffle distribution changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(n_salts: int, *deterministic_from: str) -> Column:
    """A salt in [0, n_salts). Derived from row content (xxhash) rather than
    rand() so runs are reproducible; any well-spread expression works.

    CAVEAT: if every supplied column is constant within the hot key, the
    salt is constant too and the mitigation silently no-ops (all hot-key
    rows still hit one reducer). Callers without a genuinely varying
    column should use :func:`salt_col_rowid`."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in deterministic_from]), F.lit(n_salts))


def salt_col_rowid(n_salts: int) -> Column:
    """A salt in [0, n_salts) from the row's physical position
    (monotonically_increasing_id) — varies within EVERY key by
    construction, so the spread cannot silently degenerate. Not stable
    across runs/repartitioning, which is fine for a salt: it only shapes
    the shuffle, never the result."""
    return F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))


def salted_count_sum(
    df: DataFrame,
    key: str,
    value: str,
    n_salts: int = 8,
    salt_from: list[str] | None = None,
) -> DataFrame:
    """groupBy(key).agg(count, decimal-sum(value)) with a salted first
    phase: (key, salt) partials then per-key combine. Output: (key, cnt,
    total) — bit-identical to the direct aggregation."""
    salt_from = salt_from or [value]
    partial = (
        df.withColumn("__salt", salt_col(n_salts, key, *salt_from))
        .groupBy(key, "__salt")
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.sum(F.col(value).cast("decimal(18,4)")).alias("__sum"),
        )
    )
    return (
        partial.groupBy(key)
        .agg(
            F.sum("__cnt").alias("cnt"),
            F.sum("__sum").cast("double").alias("total"),
        )
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Inner equi-join where ``big`` has skewed keys: the small side is
    replicated once per salt (explode over 0..n-1), the big side gets a
    content-derived salt, and the join runs on (key, salt) — the hot key's
    rows spread across n_salts reducers instead of one.

    ``salt_from``: columns that VARY within the hot key (the salt must
    differ row-to-row or the spread no-ops). When omitted, the salt comes
    from the row id (salt_col_rowid) — always well-spread, at the cost of
    run-to-run shuffle-placement stability (results unaffected)."""
    if salt_from:
        big_salted = big.withColumn("__salt", salt_col(n_salts, key, *salt_from))
    else:
        big_salted = big.withColumn("__salt", salt_col_rowid(n_salts))
    small_replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>"))
    )
    return big_salted.join(small_replicated, [key, "__salt"]).drop("__salt")
