"""As-of join — DataFrame-native, no Spark SQL ASOF exists (SURVEY §4.2).

Semantics (backward as-of, inclusive): for each left row, attach the right
row with the greatest ``right_on <= left_on`` within the same ``by`` keys;
left rows with no earlier right row keep NULLs (left-join semantics).
Matches DuckDB's ``ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts``.

Algorithm (union + ordered window, the scale-friendly plan):
  1. Tag right rows 0 and left rows 1, union by name.
  2. One window partitioned by ``by``, ordered by (ts, tag): right rows sort
     before left rows at equal ts → inclusive match.
  3. The right payload travels as ONE struct column; ``last(struct,
     ignorenulls=True)`` carries the latest right row forward onto each
     left row.  The struct itself is non-NULL for every right row, so
     legitimately-NULL payload *fields* are carried faithfully (a
     per-column carry would skip them and match an older row's value).
  4. Keep only left rows; unwrap the struct in a single select.

Cost: ONE shuffle of |L|+|R| rows by the equality keys + an in-partition
sort — identical asymptotics to a sort-merge join, with no range-explosion
(a naive theta-join would be |L|×|R| per key). Skewed ``by`` keys can be
salted upstream; AQE handles moderate skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_on: str,
    right_on: str,
    right_values: list[str] | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """Backward as-of join (inclusive). ``right_values`` are the payload
    columns carried from the right side (default: all non-key columns).
    ``tolerance`` (an INTERVAL literal, e.g. ``'30 minutes'``) drops matches
    older than ``left_on - tolerance``.

    Left and right payload column names must not collide (pre-rename).
    """
    right_values = right_values or [
        c for c in right.columns if c not in by and c != right_on
    ]
    overlap = (set(right_values) | {right_on}) & set(left.columns)
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)} — rename first")

    # The whole right row rides in one struct: the struct is non-NULL for
    # every right row even when payload fields are NULL, so the ignorenulls
    # carry below is keyed on "was there a right row", not on field values.
    payload = F.struct(F.col(right_on), *[F.col(c) for c in right_values])
    r = right.select(
        *by,
        F.col(right_on).alias("__rts"),
        payload.alias("__r"),
        F.lit(0).alias("__tag"),
    )
    l = left.withColumn("__tag", F.lit(1))
    unioned = l.unionByName(r, allowMissingColumns=True).withColumn(
        "__ts", F.coalesce(F.col(left_on), F.col("__rts"))
    )

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__ts").asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__r", F.last(F.col("__r"), ignorenulls=True).over(w))
    out = carried.filter(F.col("__tag") == 1)

    # Match validity (struct carried + inside tolerance) is computed once
    # against the carried struct, then every output column unwraps in a
    # single select — no column is read after being overwritten.
    match_ok = F.col("__r").isNotNull()
    if tolerance is not None:
        match_ok = match_ok & (
            F.col("__r")[right_on] >= F.col(left_on) - F.expr(f"INTERVAL {tolerance}")
        )
    return out.select(
        *left.columns,
        *[
            F.when(match_ok, F.col("__r")[c]).alias(c)
            for c in [right_on, *right_values]
        ],
    )
