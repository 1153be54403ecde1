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

    # Internal working columns must not collide with either side's schema —
    # grow a suffix until every candidate is free.
    taken = set(left.columns) | set(right.columns)
    suffix = ""
    while any(f"__{b}{suffix}" in taken for b in ("r", "rts", "ts", "tag")):
        suffix += "_"
    c_r, c_rts, c_ts, c_tag = (f"__{b}{suffix}" for b in ("r", "rts", "ts", "tag"))

    # The whole right row rides in one struct: the struct is non-NULL for
    # every right row even when payload fields are NULL, so the ignorenulls
    # carry below is keyed on "was there a right row", not on field values.
    # Right rows with NULL event time can never satisfy l.ts >= r.ts, so
    # drop them up front (matches DuckDB ASOF NULL semantics — otherwise
    # they'd sort first under nulls-first and be carried onto every left
    # row in an otherwise-empty partition).
    payload = F.struct(F.col(right_on), *[F.col(c) for c in right_values])
    r = right.filter(F.col(right_on).isNotNull()).select(
        *by,
        F.col(right_on).alias(c_rts),
        payload.alias(c_r),
        F.lit(0).alias(c_tag),
    )
    l = left.withColumn(c_tag, F.lit(1))
    unioned = l.unionByName(r, allowMissingColumns=True).withColumn(
        c_ts, F.coalesce(F.col(left_on), F.col(c_rts))
    )

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(c_ts).asc(), F.col(c_tag).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(c_r, F.last(F.col(c_r), ignorenulls=True).over(w))
    out = carried.filter(F.col(c_tag) == 1)

    # Match validity (struct carried + non-NULL left time + inside
    # tolerance) is computed once against the carried struct, then every
    # output column unwraps in a single select — no column is read after
    # being overwritten.  A NULL left_on can't match (l.ts >= r.ts is
    # NULL-falsy in the reference semantics).
    match_ok = F.col(c_r).isNotNull() & F.col(left_on).isNotNull()
    if tolerance is not None:
        match_ok = match_ok & (
            F.col(c_r)[right_on] >= F.col(left_on) - F.expr(f"INTERVAL {tolerance}")
        )
    return out.select(
        *left.columns,
        *[
            F.when(match_ok, F.col(c_r)[c]).alias(c)
            for c in [right_on, *right_values]
        ],
    )
