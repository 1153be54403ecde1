"""Time-series operators: gap filling with forward fill, percentile
aggregates — the hypertable-style rollup surface (SURVEY §1.1 [EXT]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_open_source_spark.catalog import load_table
from etl_open_source_spark.registry import query


@query(
    "q_ts_gapfill",
    oracle="""
WITH hourly AS (
  SELECT user_id, DATE_TRUNC('hour', ts) AS hour,
         COUNT(*) AS cnt,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS hour_sum
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT user_id, MIN(DATE_TRUNC('hour', ts)) AS s, MAX(DATE_TRUNC('hour', ts)) AS e
  FROM events GROUP BY 1
),
spine AS (
  SELECT b.user_id, g.h AS hour
  FROM bounds b
  JOIN (SELECT * FROM GENERATE_SERIES(TIMESTAMP '2024-01-01 00:00:00',
                                      TIMESTAMP '2024-02-01 00:00:00',
                                      INTERVAL '1 hour')) g(h)
    ON g.h BETWEEN b.s AND b.e
)
SELECT s.user_id, s.hour,
       COALESCE(h.cnt, 0) AS cnt,
       LAST_VALUE(h.hour_sum IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_sum
FROM spine s LEFT JOIN hourly h USING (user_id, hour)
""",
    tags=("timeseries",),
)
def q_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resampling with gap filling: a per-user hourly spine
    (sequence + explode) left-joined to hourly aggregates; empty hours get
    cnt=0 and the last observed hourly sum carried forward (the standard
    time-series densification every monitoring/feature pipeline needs).

    At scale the spine is generated, not materialized: |users|×|hours|
    rows stream out of the explode; the join key (user, hour) spreads the
    shuffle. (The oracle uses a constant series clipped per user — DuckDB's
    generate_series takes constants only; the engine derives bounds from
    the data.)"""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("hour_sum"),
    )
    bounds = e.groupBy("user_id").agg(
        F.min(F.date_trunc("hour", "ts")).alias("s"),
        F.max(F.date_trunc("hour", "ts")).alias("e"),
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("s", "e", F.expr("INTERVAL 1 HOUR"))).alias("hour"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["user_id", "hour"], "left")
        .select(
            "user_id",
            "hour",
            F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("cnt"),
            F.last("hour_sum", ignorenulls=True).over(w).alias("filled_sum"),
        )
    )


@query(
    "q_agg_percentile",
    oracle="""
SELECT l_returnflag,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 6) AS p50,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.95), 6) AS p95,
       ROUND(QUANTILE_CONT(l_quantity, 0.5), 6) AS qty_median,
       COUNT(*) AS cnt
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("agg", "timeseries"),
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation — matches QUANTILE_CONT;
    rounded to 6dp since the interpolation arithmetic differs in op order).
    At 100 TB exact percentile means a sort per group — prefer
    approx_percentile (t-digest) there; this is the exactness baseline."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_extendedprice", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("l_extendedprice", F.lit(0.95)), 6).alias("p95"),
            F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("qty_median"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("l_returnflag")
    )
