"""Data-quality operators: column profiling and expectation checks.

Completes the reference's declared-but-empty validation surface
(`services/validation_service.py` is a 0-byte stub; the UI references a
"Validation" step it never implements) with an engine-native design:

- :func:`profile_columns` — per-column stats (rows, nulls, distinct,
  min/max) computed in ONE scan: a single wide aggregate row, unpivoted
  with ``stack``. At 100 TB this matters — the naive per-column loop is
  N full scans.
- :func:`run_checks` — declarative expectations (not-null, unique,
  range, accepted values) folded into ONE conditional aggregate pass,
  plus referential-integrity checks as broadcast anti-join counts (one
  extra job per FK, unavoidable: it needs the dimension).

Both return DataFrames, so results land in the same sinks/pipelines as
any other step.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, numeric_cols: list[str], string_cols: list[str]
) -> DataFrame:
    """One-pass column profile: (col_name, n_rows, n_nulls, n_distinct,
    min_num, max_num, min_str, max_str). Numeric min/max as double,
    string min/max as string; the other pair is NULL."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in numeric_cols + string_cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"nulls_{c}"),
            F.countDistinct(c).alias(f"dist_{c}"),
        ]
    for c in numeric_cols:
        aggs += [
            F.min(c).cast("double").alias(f"min_{c}"),
            F.max(c).cast("double").alias(f"max_{c}"),
        ]
    for c in string_cols:
        aggs += [F.min(c).alias(f"smin_{c}"), F.max(c).alias(f"smax_{c}")]
    row = df.agg(*aggs)

    parts = []
    for c in numeric_cols:
        parts.append(
            f"'{c}', nulls_{c}, dist_{c}, min_{c}, max_{c}, "
            "CAST(NULL AS STRING), CAST(NULL AS STRING)"
        )
    for c in string_cols:
        parts.append(
            f"'{c}', nulls_{c}, dist_{c}, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), "
            f"smin_{c}, smax_{c}"
        )
    n = len(parts)
    stack = (
        f"stack({n}, {', '.join(parts)}) AS "
        "(col_name, n_nulls, n_distinct, min_num, max_num, min_str, max_str)"
    )
    return row.select(F.col("__n").alias("n_rows"), F.expr(stack)).select(
        "col_name", "n_rows", "n_nulls", "n_distinct", "min_num", "max_num", "min_str", "max_str"
    )


# ------------------------------------------------------------ expectations


@dataclass(frozen=True)
class Check:
    """One named expectation; ``violations == 0`` means it passed."""

    name: str
    kind: str  # not_null | unique | in_range | accepted | fk


def not_null(col: str) -> tuple[Check, F.Column]:
    return Check(f"not_null({col})", "not_null"), F.sum(
        F.when(F.col(col).isNull(), 1).otherwise(0)
    ).cast("bigint")


def in_range(col: str, lo, hi) -> tuple[Check, F.Column]:
    bad = ~F.col(col).between(lo, hi)  # NULL-safe: NULL compares to NULL → not counted
    return Check(f"in_range({col},{lo},{hi})", "in_range"), F.sum(
        F.when(bad, 1).otherwise(0)
    ).cast("bigint")


def accepted(col: str, values: list) -> tuple[Check, F.Column]:
    bad = ~F.col(col).isin(values)
    return Check(f"accepted({col})", "accepted"), F.sum(F.when(bad, 1).otherwise(0)).cast(
        "bigint"
    )


def unique(col: str) -> tuple[Check, F.Column]:
    """Violations = rows beyond the first per key = COUNT(col) - COUNT(DISTINCT col)."""
    return Check(f"unique({col})", "unique"), (
        F.count(F.col(col)) - F.countDistinct(F.col(col))
    ).cast("bigint")


def run_checks(
    df: DataFrame,
    row_checks: list[tuple[Check, F.Column]],
    fk_checks: list[tuple[str, str, DataFrame, str]] = (),
) -> DataFrame:
    """Evaluate all expectations; returns (rule, violations) with one row
    per check. All ``row_checks`` fold into a single aggregate scan;
    each ``fk_checks`` entry (rule_name, col, dim_df, dim_key) costs one
    broadcast anti-join count."""
    if row_checks:
        aggs = [expr.alias(f"v{i}") for i, (_, expr) in enumerate(row_checks)]
        row = df.agg(*aggs)
        # rule names are quoted into the stack() SQL — escape embedded
        # quotes (a column named "it's" must not break the parse)
        pairs = ", ".join(
            f"""'{c.name.replace("'", "''")}', v{i}"""
            for i, (c, _) in enumerate(row_checks)
        )
        out = row.select(
            F.expr(f"stack({len(row_checks)}, {pairs}) AS (rule, violations)")
        )
    else:
        # FK-only call: stack(0, ...) would be a parse error
        out = df.sparkSession.createDataFrame([], "rule string, violations bigint")
    for rule_name, col, dim, dim_key in fk_checks:
        orphans = (
            df.filter(F.col(col).isNotNull())
            .join(F.broadcast(dim.select(F.col(dim_key).alias(col))), col, "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("violations"))
            .select(F.lit(rule_name).alias("rule"), "violations")
        )
        out = out.unionByName(orphans)
    return out
