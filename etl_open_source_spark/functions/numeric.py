"""Numeric helpers for deterministic, oracle-parity aggregation.

Why: Spark sums doubles in whatever order partitions finish, so
``SUM(double)`` is not bit-stable across runs nor identical to DuckDB's
result. Aggregating through fixed-point ``DECIMAL(18,4)`` makes the sum
exact and order-independent in BOTH engines; casting the final value back to
double yields bit-identical results. Averages are expressed as
``CAST(SUM(decimal) AS DOUBLE) / COUNT`` so the one inexact operation (the
division) is a single IEEE-754 op on identical inputs.

The SQL-side mirror of each helper lives in the oracle strings
(see queries/*). Keep the two in sync.

Exactness boundary (tests/test_decimal_boundary.py): the final
``CAST(decimal AS DOUBLE)`` is cross-engine bit-identical only while the
decimal's scaled integer |value·10^scale| < 2^53 — above that DuckDB
1.0.0 double-rounds its int128→double conversion (1 ulp off the
correctly-rounded value Spark produces). At scale 6 that bounds sums to
~9.0e9: 17× above the largest sf0.01 driver-gate sum, but only 1.7×
above sf0.1's. Under ANSI mode (the Spark 4.x default this engine runs
with) an out-of-range money cast hard-errors on both engines rather
than NULLing — pre-filter corrupt values with quality in_range checks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"


def dec(c: Column | str) -> Column:
    """Cast to the canonical fixed-point type used for exact aggregation."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC)


def dsum(c: Column | str) -> Column:
    """Order-independent SUM over a double column, returned as double."""
    return F.sum(dec(c)).cast("double")


def davg(c: Column | str) -> Column:
    """Order-independent AVG: exact decimal sum, one double division."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(dec(col)).cast("double") / F.count(col)


def money(c: Column | str) -> Column:
    """Narrow money cast (2-decimal data, values < 10^10). Products of
    ``money * rate * rate`` stay well under decimal precision 38, so neither
    engine truncates the scale — keeps multiply-then-sum exact."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(12,2)")


def rate(c: Column | str) -> Column:
    """Narrow cast for small 2-decimal rates (discount/tax in [0,1))."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(4,2)")


def one() -> Column:
    """Literal 1 as a narrow decimal (lazy: F.lit needs a live session)."""
    return F.lit(1).cast("decimal(3,2)")


# SQL fragments (DuckDB side) mirroring the helpers above.
SQL_ONE = "CAST(1 AS DECIMAL(3,2))"


def sql_money(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(12,2))"


def sql_rate(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(4,2))"


def sql_finite(expr: str) -> str:
    """DuckDB mirror of ``finite_or_null`` / Spark's silent ANSI
    decimal-cast NULL for non-finite doubles. DuckDB's integer-backed
    decimal cast HARD-ERRORS on NaN/±Inf, so any oracle decimal cast
    over a possibly-corrupt column needs this guard (NaN-axis r11 —
    reached through o_totalprice/c_acctbal after the r10 events.value
    sweep guarded the measure sites). ORACLE-side only: Spark has no
    ISFINITE and needs none — its ANSI cast already NULLs non-finite by
    mechanism, so queries whose engine side runs SQL through spark.sql
    keep that string unguarded and give only the DuckDB twin this guard
    (a per-row guard riding along in the engine string measured ~1.2x
    on q_sql_transform for semantics the cast already had)."""
    return f"CASE WHEN ISFINITE({expr}) THEN {expr} END"


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE)"


def sql_dsum_finite(expr: str) -> str:
    """``sql_dsum`` with the non-finite→NULL ingestion guard — mirrors
    what the engine's ``dsum`` already does by mechanism (Spark's ANSI
    cast NULLs non-finite silently, so the decimal fold skips them)."""
    return sql_dsum(sql_finite(expr))


def sql_davg(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE) / COUNT({expr})"


def finite_or_null(c: Column | str) -> Column:
    """NULL out non-finite doubles (NaN/±Inf) — the corrupt-measure
    ingestion contract for double-arithmetic queries.

    Spark's ANSI decimal cast already maps non-finite to NULL silently
    (probed: CAST(NaN/±Inf AS DECIMAL) → NULL even with ansi on, while
    finite out-of-range values hard-error), so every decimal-fold query
    drops corrupt measures by mechanism; this helper gives the
    double-path queries (median/MAD, PSI bins, interval windows) the
    SAME semantics explicitly. Oracle mirror: CASE WHEN ISFINITE(x)
    THEN x END."""
    col = F.col(c) if isinstance(c, str) else c
    return F.when(~F.isnan(col) & (F.abs(col) != F.lit(float("inf"))), col)
