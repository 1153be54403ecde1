"""Null/timestamp sanitization transform — opt-in parity with the
reference's lossy per-cell sanitizer (reference core/utils.py:6-15, applied
unconditionally before every load at core/loaders/sqlserver.py:245):

  reference: NaT → datetime(1900,1,1); Timestamp → second precision;
             any other NaN/None → ""   (even numerics — a type error in a
             typed engine)

Our typed version (documented divergences, SURVEY §7 risk register):
  - string NULL   → ""                      (same)
  - timestamp NULL→ 1900-01-01 00:00:00     (same)
  - timestamps truncated to whole seconds   (same)
  - numeric NULL  → kept NULL               (divergence: "" is not a number)

Vectorized Catalyst expressions — the reference's version is an
interpreted per-cell Python map (its dominant transform cost, SURVEY §4.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, TimestampType

SENTINEL_TS = "1900-01-01 00:00:00"


def sanitize_nulls(df: DataFrame) -> DataFrame:
    out = df
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, StringType):
            out = out.withColumn(f.name, F.coalesce(c, F.lit("")))
        elif isinstance(f.dataType, TimestampType):
            truncated = F.date_trunc("second", c)
            out = out.withColumn(
                f.name,
                F.coalesce(truncated, F.lit(SENTINEL_TS).cast("timestamp")),
            )
    return out
