"""As-of join — DataFrame-native, no Spark SQL ASOF exists (SURVEY §4.2).

Semantics (backward as-of, inclusive): for each left row, attach the right
row with the greatest ``right_on <= left_on`` within the same ``by`` keys;
left rows with no earlier right row keep NULLs (left-join semantics).
Matches DuckDB's ``ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts``,
including NULL by-keys: equality never matches NULL, so NULL-key left
rows come back unmatched (and skip the shuffle entirely — see below).

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
salted upstream; AQE handles moderate skew. The NULL-key left route adds
a second, ``key IS NULL``-pushed scan of the left side (parquet min/max
stats prune it to near-zero on mostly-non-NULL keys) — cheap insurance
against the alternative, which is shuffling every NULL-key row in the
corpus onto one reducer.
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
    direction: str = "backward",
) -> DataFrame:
    """As-of join (inclusive). ``right_values`` are the payload columns
    carried from the right side (default: all non-key columns).
    ``tolerance`` (an INTERVAL literal, e.g. ``'30 minutes'``) bounds the
    match distance on the chosen side.

    ``direction``: ``"backward"`` (latest right row at-or-before the left
    time — the default everywhere: kdb aj, pandas merge_asof, DuckDB
    ASOF), ``"forward"`` (earliest right row at-or-after), or
    ``"nearest"`` (closer of the two; exact ties resolve backward, like
    pandas). All three are the same ONE union + (by)-partitioned ordered
    window — forward carries first-over-following instead of
    last-over-preceding; nearest runs both carries in the same window
    pass and picks per-row.

    Left and right payload column names must not collide (pre-rename).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
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
    while any(f"__{b}{suffix}" in taken for b in ("r", "rts", "ts", "tag", "cb", "cf")):
        suffix += "_"
    c_r, c_rts, c_ts, c_tag, c_b, c_f = (
        f"__{b}{suffix}" for b in ("r", "rts", "ts", "tag", "cb", "cf")
    )

    # The whole right row rides in one struct: the struct is non-NULL for
    # every right row even when payload fields are NULL, so the ignorenulls
    # carry below is keyed on "was there a right row", not on field values.
    # Right rows with NULL event time can never satisfy l.ts >= r.ts, so
    # drop them up front (matches DuckDB ASOF NULL semantics — otherwise
    # they'd sort first under nulls-first and be carried onto every left
    # row in an otherwise-empty partition).
    #
    # NULL by-keys: SQL join equality never matches NULL, but
    # Window.partitionBy groups all NULL keys into ONE partition — which
    # is both wrong (NULL-key lefts would match NULL-key rights) and, at
    # corpus scale, the worst skew hotspot in the plan (every NULL-key
    # row on one reducer). So NULL-key right rows are dropped with the
    # NULL-time ones, and NULL-key left rows BYPASS the window entirely
    # and re-enter the output with NULL payloads (left-join semantics),
    # never shuffling into a degenerate partition.
    by_nonnull = F.lit(True)
    for b in by:
        by_nonnull = by_nonnull & F.col(b).isNotNull()
    payload = F.struct(F.col(right_on), *[F.col(c) for c in right_values])
    r = right.filter(F.col(right_on).isNotNull() & by_nonnull).select(
        *by,
        F.col(right_on).alias(c_rts),
        payload.alias(c_r),
        F.lit(0).alias(c_tag),
    )
    l_null = left.filter(~by_nonnull)
    l = left.filter(by_nonnull).withColumn(c_tag, F.lit(1))
    unioned = l.unionByName(r, allowMissingColumns=True).withColumn(
        c_ts, F.coalesce(F.col(left_on), F.col(c_rts))
    )

    # Backward carries last-over-preceding with right-before-left at equal
    # timestamps (tag asc → inclusive); forward carries first-over-following
    # with left-before-right at equal timestamps (tag desc → inclusive).
    # Both windows share the (by) partitioning, so the second direction
    # costs one extra in-partition sort, never an extra shuffle.
    w_b = (
        Window.partitionBy(*by)
        .orderBy(F.col(c_ts).asc(), F.col(c_tag).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_f = (
        Window.partitionBy(*by)
        .orderBy(F.col(c_ts).asc(), F.col(c_tag).desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned
    if direction in ("backward", "nearest"):
        carried = carried.withColumn(c_b, F.last(F.col(c_r), ignorenulls=True).over(w_b))
    if direction in ("forward", "nearest"):
        carried = carried.withColumn(c_f, F.first(F.col(c_r), ignorenulls=True).over(w_f))
    out = carried.filter(F.col(c_tag) == 1)

    # Match validity (struct carried + non-NULL left time + inside
    # tolerance) is computed once against the carried struct, then every
    # output column unwraps in a single select — no column is read after
    # being overwritten.  A NULL left_on can't match (l.ts >= r.ts is
    # NULL-falsy in the reference semantics).
    def _ok(col, side: str):
        ok = col.isNotNull() & F.col(left_on).isNotNull()
        if tolerance is not None:
            bound = F.expr(f"INTERVAL {tolerance}")
            if side == "b":
                ok = ok & (col[right_on] >= F.col(left_on) - bound)
            else:
                ok = ok & (col[right_on] <= F.col(left_on) + bound)
        return ok

    if direction == "backward":
        chosen = F.when(_ok(F.col(c_b), "b"), F.col(c_b))
    elif direction == "forward":
        chosen = F.when(_ok(F.col(c_f), "f"), F.col(c_f))
    else:
        ok_b, ok_f = _ok(F.col(c_b), "b"), _ok(F.col(c_f), "f")
        d_b = F.col(left_on).cast("double") - F.col(c_b)[right_on].cast("double")
        d_f = F.col(c_f)[right_on].cast("double") - F.col(left_on).cast("double")
        chosen = F.when(ok_b & (~ok_f | (d_b <= d_f)), F.col(c_b)).when(
            ok_f, F.col(c_f)
        )
    matched = out.select(
        *left.columns,
        *[chosen[c].alias(c) for c in [right_on, *right_values]],
    )
    unmatched = l_null.select(
        *left.columns,
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in [right_on, *right_values]
        ],
    )
    return matched.unionByName(unmatched)
