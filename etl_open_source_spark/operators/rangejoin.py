"""Range (interval) join — points matched to every interval containing
them. Spark has no native range-join optimization (Databricks' range-join
hint is proprietary); a naive theta join is a broadcast-nested-loop when
one side is small and O(|P|·|I|) when both are big.

The scale path here is the standard bucketing decomposition: quantize
time into fixed-width buckets, replicate each interval into every bucket
it overlaps (intervals are short relative to the bucket width in the
common telemetry case, so the blow-up is small), tag each point with its
single bucket, equi-join on the bucket id, then apply the exact range
predicate as a residual filter. Cost: one shuffle on a well-distributed
key, join fan-in proportional to interval density per bucket — survives
|P| and |I| both huge where the nested loop cannot.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """Inner join of ``points`` to ``intervals`` on
    ``start <= point_ts < end`` via bucket equi-join + residual filter.
    Pick ``bucket_seconds`` near the typical interval length: shorter
    buckets replicate intervals more, longer buckets raise residual-filter
    fan-in. Output columns = points' ++ intervals' (names must not clash).
    """
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)} — rename first")

    def bucket_of(c: Column) -> Column:
        return F.floor(F.unix_timestamp(c) / bucket_seconds)

    pb = points.withColumn("__bucket", bucket_of(F.col(point_ts)))
    ib = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(bucket_of(F.col(start_col)), bucket_of(F.col(end_col)))
        ),
    )
    return (
        pb.join(ib, "__bucket")
        .filter((F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col)))
        .drop("__bucket")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """Interval-to-interval overlap join (closed intervals:
    ``l_start <= r_end AND r_start <= l_end``) — the two-sided sibling of
    :func:`range_join_bucketed`, for which a theta join is O(|L|·|R|).

    Both sides replicate into every bucket they span and equi-join on the
    bucket id; the exact overlap predicate runs as a residual. A pair
    sharing k buckets would match k times, so the join keeps only the
    FIRST shared bucket (``max(bucket(l_start), bucket(r_start))``) —
    exact dedup with arithmetic, no ``distinct`` shuffle.

    Pick ``bucket_seconds`` near the typical interval length: replication
    factor is len/bucket + 1 per row, residual fan-in is interval density
    per bucket. Output = left columns ++ right columns (must not clash).

    Malformed rows (end < start — an empty interval) are DROPPED on both
    sides before the explode: Spark's ``sequence(a, b)`` DESCENDS when
    a > b (it does not return an empty array), which would replicate the
    row across reversed buckets and make the result depend on bucket
    geometry instead of interval semantics.
    """
    clash = set(left.columns) & set(right.columns)
    if clash:
        raise ValueError(f"column collision between sides: {sorted(clash)} — rename first")

    def bucket_of(c: str) -> Column:
        return F.floor(F.unix_timestamp(F.col(c)) / bucket_seconds)

    left = left.filter(F.col(l_end) >= F.col(l_start))
    right = right.filter(F.col(r_end) >= F.col(r_start))
    lb = left.withColumn(
        "__bucket",
        F.explode(F.sequence(bucket_of(l_start), bucket_of(l_end))),
    )
    rb = right.withColumn(
        "__bucket",
        F.explode(F.sequence(bucket_of(r_start), bucket_of(r_end))),
    )
    return (
        lb.join(rb, "__bucket")
        .filter(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            & (
                F.col("__bucket")
                == F.greatest(bucket_of(l_start), bucket_of(r_start))
            )
        )
        .drop("__bucket")
    )
