"""Dominance (skyline / Pareto-frontier) operator.

[EXT] per SURVEY.md §2 — the reference's transform vocabulary stops at
filter/map/merge (structure.txt:24); skyline is the standard
multi-objective shortlist op (cheapest-AND-largest part, best
price/quality trade-off) that a warehouse team otherwise hand-rolls as an
O(n²) NOT EXISTS self-join.

Two-phase distributed shape (the classic partition-prune-merge skyline):

1. **Local prune** — rows are hashed into ``n_buckets`` synthetic buckets
   (one balanced shuffle); within each bucket the 2-D skyline is computed
   with a sort + running-max, O(n log n), no self-join. Any globally
   non-dominated row is also non-dominated inside its bucket, so the
   survivor union is a superset of the answer.
2. **Global merge** — survivors (for independent-ish dimensions the
   expected skyline of a random N-row bucket is O(log N) rows) collapse
   into one bucket and the same routine runs once more, exactly.

At 100 TB the heavy input is touched by exactly one shuffle (the bucket
window) and everything after phase 1 is dimension-table sized; there is
no quadratic candidate join anywhere.

Honest adversarial bound: phase 2 sorts the SURVIVOR union in one
partition, so its cost is O(S log S) single-node for skyline size S.
For independent-ish dimensions S ≈ O(log² n) (tiny); the worst case is
an anti-chain (perfect price/size anti-correlation) where S = n and
phase 1 prunes nothing — then this operator degenerates to a global
sort, exactly like any exact skyline must (the answer itself is O(n)).
Correctness is unaffected (pinned by the anti-chain property test);
at that shape the downstream consumer, not the operator, is the
problem. The sort-based local kernel:
after collapsing to one row per (bucket, x) with the per-x max of y,
a row survives iff its y equals its x-group max AND strictly-cheaper
groups never reached y (running max over preceding groups < y). Ties on
both dimensions are all kept (no strict dominator exists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BUCKET = "_sky_bucket"
_GMAX = "_sky_gmax"
_MLT = "_sky_mlt"


def _local_skyline(df: DataFrame, minimize: str, maximize: str) -> DataFrame:
    """Per-bucket 2-D skyline (minimize ``minimize``, maximize ``maximize``)
    via group-collapse + running max — no self-join. Expects ``_BUCKET``."""
    grp = df.groupBy(_BUCKET, minimize).agg(F.max(maximize).alias(_GMAX))
    w = (
        Window.partitionBy(_BUCKET)
        .orderBy(minimize)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    grp = grp.withColumn(_MLT, F.max(_GMAX).over(w))
    survivors = grp.where(F.col(_MLT).isNull() | (F.col(_MLT) < F.col(_GMAX)))
    return (
        df.join(survivors, [_BUCKET, minimize])
        .where(F.col(maximize) == F.col(_GMAX))
        .drop(_GMAX, _MLT)
    )


def skyline_2d(
    df: DataFrame,
    minimize: str,
    maximize: str,
    keys: list[str],
    n_buckets: int = 64,
) -> DataFrame:
    """Exact 2-D skyline: rows with no other row that is <= on ``minimize``
    and >= on ``maximize`` with at least one strict inequality. Duplicate
    (minimize, maximize) pairs on the frontier are all returned.

    Rows with NULL in either dimension are EXCLUDED up front — dominance
    is undefined for them, and leaving them in silently diverges from a
    SQL NOT-EXISTS oracle (NULL comparisons make the subquery empty, so
    SQL would return every NULL row as 'non-dominated' while the window
    kernel drops them; the fixtures have no NULLs, which is exactly the
    fixture-masked class this guard exists for)."""
    df = df.where(F.col(minimize).isNotNull() & F.col(maximize).isNotNull())
    bucketed = df.withColumn(
        _BUCKET, F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets))
    )
    local = _local_skyline(bucketed, minimize, maximize)
    merged = local.withColumn(_BUCKET, F.lit(0))
    return _local_skyline(merged, minimize, maximize).drop(_BUCKET)
