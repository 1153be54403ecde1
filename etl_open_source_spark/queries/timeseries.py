"""Time-series operators: gap filling with forward fill, percentile
aggregates — the hypertable-style rollup surface (SURVEY §1.1 [EXT]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_open_source_spark.catalog import load_table
from etl_open_source_spark.functions.numeric import finite_or_null
from etl_open_source_spark.registry import query


@query(
    "q_ts_gapfill",
    oracle="""
WITH hourly AS (
  SELECT user_id, DATE_TRUNC('hour', ts) AS hour,
         COUNT(*) AS cnt,
         CAST(SUM(CAST(CASE WHEN ISFINITE(value) THEN value END AS DECIMAL(18,4))) AS DOUBLE) AS hour_sum
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT user_id, MIN(DATE_TRUNC('hour', ts)) AS s, MAX(DATE_TRUNC('hour', ts)) AS e
  FROM events GROUP BY 1
),
spine AS (
  -- data-derived, like the engine's sequence(min, max): a constant
  -- series here silently truncated any user whose activity left the
  -- constant's range (calendar-axis r12 fixture artifact)
  SELECT b.user_id, UNNEST(GENERATE_SERIES(b.s, b.e, INTERVAL '1 hour')) AS hour
  FROM bounds b
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
    shuffle. (The oracle spine is data-derived too — DuckDB's list-valued
    GENERATE_SERIES accepts column bounds under UNNEST; the earlier
    constant-series form silently truncated users outside its range,
    which the calendar axis would have misread as an engine bug.)"""
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


@query(
    "q_ts_sessionize",
    oracle="""
WITH ordered AS (
  SELECT event_id, user_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
)
SELECT event_id, user_id, ts,
       CAST(SUM(CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL '30 minutes'
                     THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS session_num
FROM ordered
""",
    tags=("timeseries",),
)
def q_ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: a session breaks after a >30 min silence.
    lag + running sum of break flags — two window passes over ONE
    (user_id)-partitioned sort, no join, no state store (the streaming
    twin is q_window_session). event_id tiebreaks equal timestamps so the
    numbering is deterministic."""
    e = load_table(spark, sf_dir, "events")
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w_lag = Window.partitionBy("user_id").orderBy(*order)
    w_run = w_lag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    is_break = (
        F.lag("ts").over(w_lag).isNull()
        | (F.col("ts") > F.lag("ts").over(w_lag) + F.expr("INTERVAL 30 MINUTES"))
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.when(is_break, 1).otherwise(0)).over(w_run).alias("session_num"),
    )


@query(
    "q_ts_rollup",
    oracle="""
SELECT STRFTIME(DATE_TRUNC('month', ts), '%Y-%m') AS b_month,
       STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d') AS b_day,
       STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:00') AS b_hour,
       CAST(GROUPING(STRFTIME(DATE_TRUNC('month', ts), '%Y-%m'),
                     STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d'),
                     STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:00')) AS BIGINT) AS lvl,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(CASE WHEN ISFINITE(value) THEN value END AS DECIMAL(18,4))) AS DOUBLE) AS val_sum
FROM events
GROUP BY ROLLUP(b_month, b_day, b_hour)
HAVING COUNT(*) > 0
""",
    tags=("timeseries", "agg"),
)
def q_ts_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup: hour, day, month, and
    grand totals in ONE pass via ROLLUP over aligned time buckets —
    continuous-aggregate materialization without re-scanning per
    granularity. Buckets formatted as strings (not timestamps) so NULL
    super-aggregate rows are engine-portable; grouping_id labels the
    level. Decimal sums keep the double fold order-independent.
 Empty-input contract: Spark's Expand+keyed hash aggregate emits
    NO rows over an empty table (ANSI would emit the () grand-total
    row); the oracle mirrors with HAVING COUNT(*) > 0, which filters
    nothing on non-empty input (every grouping-set row covers >= 1
    source row) - pinned by tests/test_empty_input.py.
    """
    e = load_table(spark, sf_dir, "events")
    b_month = F.date_format(F.date_trunc("month", "ts"), "yyyy-MM")
    b_day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    b_hour = F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00")
    return (
        e.select(
            b_month.alias("b_month"), b_day.alias("b_day"), b_hour.alias("b_hour"), "value"
        )
        .rollup("b_month", "b_day", "b_hour")
        .agg(
            F.grouping_id().cast("bigint").alias("lvl"),
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("val_sum"),
        )
        .select("b_month", "b_day", "b_hour", "lvl", "cnt", "val_sum")
    )


@query(
    "q_funnel",
    oracle="""
WITH w1 AS (
  SELECT user_id, ts, event_type,
         MIN(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS v1
  FROM events
),
w2 AS (
  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > v1 THEN ts END)
              OVER (PARTITION BY user_id) AS c1
  FROM w1
),
w3 AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > c1 THEN ts END)
              OVER (PARTITION BY user_id) AS p1
  FROM w2
),
per_user AS (
  SELECT user_id, MAX(v1) AS v1, MAX(c1) AS c1, MAX(p1) AS p1
  FROM w3 GROUP BY user_id
)
SELECT CASE WHEN p1 IS NOT NULL THEN 3
            WHEN c1 IS NOT NULL THEN 2
            WHEN v1 IS NOT NULL THEN 1
            ELSE 0 END AS stage_reached,
       COUNT(*) AS users
FROM per_user GROUP BY 1
""",
    tags=("timeseries", "funnel"),
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis (view → click → purchase): per user, the
    first view, the first click strictly after it, the first purchase
    strictly after that; users counted by furthest stage reached.

    The three conditional-min windows share ONE (user_id) hash partition —
    Spark plans a single shuffle and evaluates the chained windows in the
    same sort, so stage depth adds no extra exchanges (check .explain:
    one Exchange, stacked Window nodes). The standard alternative —
    per-stage self-joins — shuffles once per stage."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    v1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    staged = e.withColumn("v1", v1)
    c1 = F.min(
        F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("v1")), F.col("ts"))
    ).over(w)
    staged = staged.withColumn("c1", c1)
    p1 = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("c1")), F.col("ts")
        )
    ).over(w)
    staged = staged.withColumn("p1", p1)
    per_user = staged.groupBy("user_id").agg(
        F.max("v1").alias("v1"), F.max("c1").alias("c1"), F.max("p1").alias("p1")
    )
    stage = (
        F.when(F.col("p1").isNotNull(), 3)
        .when(F.col("c1").isNotNull(), 2)
        .when(F.col("v1").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        per_user.select(stage.cast("int").alias("stage_reached"))
        .groupBy("stage_reached")
        .agg(F.count(F.lit(1)).alias("users"))
    )


@query(
    "q_ts_interpolate",
    oracle="""
WITH hourly AS (
  SELECT user_id, DATE_TRUNC('hour', ts) AS hour,
         CAST(SUM(CAST(CASE WHEN ISFINITE(value) THEN value END AS DECIMAL(18,4))) AS DOUBLE) AS hour_sum
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT user_id, MIN(DATE_TRUNC('hour', ts)) AS s, MAX(DATE_TRUNC('hour', ts)) AS e
  FROM events GROUP BY 1
),
spine AS (
  -- data-derived, like the engine's sequence(min, max) (calendar-axis r12)
  SELECT b.user_id, UNNEST(GENERATE_SERIES(b.s, b.e, INTERVAL '1 hour')) AS hour
  FROM bounds b
),
staged AS (
  SELECT s.user_id, s.hour, h.hour_sum,
         LAST_VALUE(h.hour_sum IGNORE NULLS) OVER wb AS prev_v,
         LAST_VALUE(CASE WHEN h.hour_sum IS NOT NULL THEN s.hour END IGNORE NULLS)
           OVER wb AS prev_h,
         FIRST_VALUE(h.hour_sum IGNORE NULLS) OVER wf AS next_v,
         FIRST_VALUE(CASE WHEN h.hour_sum IS NOT NULL THEN s.hour END IGNORE NULLS)
           OVER wf AS next_h
  FROM spine s LEFT JOIN hourly h USING (user_id, hour)
  WINDOW wb AS (PARTITION BY s.user_id ORDER BY s.hour
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY s.user_id ORDER BY s.hour
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, hour,
       CASE WHEN hour_sum IS NOT NULL THEN hour_sum
            WHEN prev_v IS NULL THEN next_v
            WHEN next_v IS NULL THEN prev_v
            ELSE prev_v + (next_v - prev_v)
                 * ((CAST(EPOCH(hour) AS DOUBLE) - CAST(EPOCH(prev_h) AS DOUBLE))
                    / (CAST(EPOCH(next_h) AS DOUBLE) - CAST(EPOCH(prev_h) AS DOUBLE)))
       END AS interp_sum,
       (hour_sum IS NOT NULL) AS observed
FROM staged
""",
    tags=("timeseries",),
)
def q_ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over the hourly spine: gaps get
    prev + (next-prev) * elapsed-fraction; edges carry the nearest
    observation. The feature-engineering resampler for sensor/metric data
    (gapfill's forward-fill sibling).

    Same scale shape as q_ts_gapfill: generated spine, one (user, hour)
    shuffle, two partitioned window passes (backward + forward) over the
    same partitioning — no global sort, no self-join. The interpolation
    itself is identical IEEE double arithmetic in both engines (integer
    epoch seconds, one division, one multiply, one add)."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("hour_sum")
    )
    bounds = e.groupBy("user_id").agg(
        F.min(F.date_trunc("hour", "ts")).alias("s"),
        F.max(F.date_trunc("hour", "ts")).alias("e"),
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("s", "e", F.expr("INTERVAL 1 HOUR"))).alias("hour"),
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_hour = F.when(F.col("hour_sum").isNotNull(), F.col("hour"))
    staged = (
        spine.join(hourly, ["user_id", "hour"], "left")
        .withColumn("prev_v", F.last("hour_sum", ignorenulls=True).over(wb))
        .withColumn("prev_h", F.last(obs_hour, ignorenulls=True).over(wb))
        .withColumn("next_v", F.first("hour_sum", ignorenulls=True).over(wf))
        .withColumn("next_h", F.first(obs_hour, ignorenulls=True).over(wf))
    )
    frac = (
        F.col("hour").cast("double") - F.col("prev_h").cast("double")
    ) / (F.col("next_h").cast("double") - F.col("prev_h").cast("double"))
    interp = (
        F.when(F.col("hour_sum").isNotNull(), F.col("hour_sum"))
        .when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .otherwise(F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac)
    )
    return staged.select(
        "user_id",
        "hour",
        interp.alias("interp_sum"),
        F.col("hour_sum").isNotNull().alias("observed"),
    )


@query(
    "q_ts_resample_ohlc",
    oracle="""
WITH r AS (
  SELECT user_id, STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:00') AS bucket,
         value, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, DATE_TRUNC('hour', ts)
                            ORDER BY ts ASC, event_id ASC) AS rn_open,
         ROW_NUMBER() OVER (PARTITION BY user_id, DATE_TRUNC('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_close
  FROM events
)
SELECT user_id, bucket,
       ROUND(MAX(CASE WHEN rn_open = 1 THEN value END), 6) AS open,
       ROUND(MAX(value), 6) AS high,
       ROUND(MIN(value), 6) AS low,
       ROUND(MAX(CASE WHEN rn_close = 1 THEN value END), 6) AS close,
       COUNT(*) AS n_events
FROM r GROUP BY user_id, bucket
""",
    tags=("timeseries",),
)
def q_ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling: per (user, hour) the first/max/min/last value.
    open/close are max_by/min_by with struct(ts, event_id) ordinals — ONE
    hash aggregate, no window pass over the fact table (the oracle uses
    the equivalent two-window formulation). This is the argmax rollup
    shape that replaces sort-based resampling at 100 TB: partial
    aggregates combine map-side, nothing global sorts."""
    e = load_table(spark, sf_dir, "events")
    bucket = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00")
    ordinal = F.struct(F.col("ts"), F.col("event_id"))
    return (
        e.select("user_id", bucket.alias("bucket"), "value", "ts", "event_id")
        .groupBy("user_id", "bucket")
        .agg(
            F.round(F.expr("min_by(value, struct(ts, event_id))"), 6).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.round(F.expr("max_by(value, struct(ts, event_id))"), 6).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "q_ts_ewma",
    oracle="""
WITH b AS (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn,
         FIRST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS x0
  FROM events
),
c AS (
  SELECT user_id, event_id, rn, x0,
         SUM(value * POWER(1.25, rn)) OVER (
           PARTITION BY user_id ORDER BY rn
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM b
)
SELECT user_id, event_id,
       ROUND(POWER(0.8, rn) * (x0 + 0.2 * (s - x0)), 6) AS ewma
FROM c
""",
    tags=("timeseries",),
)
def q_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average (alpha = 0.2,
    pandas adjust=False semantics: ewma_i = a*x_i + (1-a)*ewma_{i-1},
    seeded at x_0) — the recurrence re-expressed as a CLOSED FORM over
    one cumulative window sum, so it runs entirely in whole-stage
    codegen: ewma_i = (1-a)^i * (x_0 + a * (S_i - x_0)) with
    S_i = sum_{j<=i} x_j / (1-a)^j. One shuffle (the user partition);
    both window passes share it.

    Numeric bound: the rescaled weights grow as (1/(1-a))^i, so series
    longer than ~3.1k points per key (at a=0.2: 308/log10(1.25))
    overflow doubles — at that scale
    renormalize per fixed-size segment (same identity applied per
    segment, carrying one scalar across boundaries) or drop to an
    ordered applyInPandas per key. Fixture series are <= ~900 points."""
    e = load_table(spark, sf_dir, "events")
    a = 0.2
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = e.select(
        "user_id",
        "event_id",
        "value",
        (F.row_number().over(w) - 1).alias("rn"),
        F.first("value").over(w).alias("x0"),
    )
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = F.sum(F.col("value") * F.pow(F.lit(1.0 / (1 - a)), F.col("rn"))).over(wcum)
    ewma = F.pow(F.lit(1 - a), F.col("rn")) * (
        F.col("x0") + F.lit(a) * (s - F.col("x0"))
    )
    return base.select("user_id", "event_id", F.round(ewma, 6).alias("ewma"))


@query(
    "q_ts_anomaly",
    oracle="""
WITH ev_f AS (
  -- non-finite measures NULL at ingestion (DuckDB cannot shadow a view
  -- with a same-named CTE: that binds as a circular reference)
  SELECT * REPLACE (CASE WHEN ISFINITE(value) THEN value END AS value)
  FROM events
),
med AS (
  SELECT user_id, ROUND(MEDIAN(value), 6) AS med
  FROM ev_f GROUP BY user_id
),
mad AS (
  SELECT e.user_id, ROUND(MEDIAN(ABS(e.value - m.med)), 6) AS mad
  FROM ev_f e JOIN med m USING (user_id)
  GROUP BY e.user_id
)
SELECT e.event_id, e.user_id, e.value,
       ROUND(m.med, 4) AS med, ROUND(d.mad, 4) AS mad,
       ABS(e.value - m.med) > 4.4478 * d.mad AS is_anomaly
FROM ev_f e
JOIN med m USING (user_id)
JOIN mad d USING (user_id)
""",
    tags=("timeseries", "quality"),
)
def q_ts_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-series anomaly flagging: median + MAD (median absolute
    deviation) per user, flag |x - med| > 3 * 1.4826 * MAD — the standard
    robust z-score that, unlike the mean/stddev variant
    (q_quality_outliers), is not itself dragged by the outliers it hunts.

    Boundary contract (round-10 float-boundary audit): MED and MAD are
    interpolating medians feeding a strict ``>``, the same shape as
    q_winsorize's round-9 QUANTILE_CONT catch. Probed directly, DuckDB
    1.0.0's d=0.5 interpolation is bit-identical to Spark's factored
    ``lo + d*(hi-lo)`` (the un-factored cancellation artifact appears
    only at d∉{0,0.5,1}, e.g. QUANTILE_CONT(0.05) of equal 100001.0s →
    100001.00000000001), so no divergence was observed here — but that
    is an empirical, version-dependent coincidence, not a contract.
    Both medians are therefore ROUNDED TO 6 on both sides BEFORE the
    comparison, aligning with the engine-wide rule (never compare an
    unrounded interpolated percentile); the comparison operands stay
    unrounded (value − med and 4.4478·mad are the same IEEE ops on
    identical inputs → bit-identical), avoiding the separate
    ROUND-at-tie divergence class.

    Shape: two small per-key aggregates (exact median needs a sort-based
    agg — Spark's F.median, same interpolating semantics as DuckDB's
    MEDIAN) broadcast back onto the event scan. The per-user median frame
    is key-cardinality-sized and materialized ONCE via an eager
    localCheckpoint — without that, Spark inlines the median subtree into
    both consumers and the corpus is scanned four times; with it, three
    scans, the minimum for the inherently two-sequential-pass MAD chain
    plus the final flagging pass. (localCheckpoint, not persist(): cache
    entries pinned in the session's CacheManager leak across the
    registry's repeated invocations, while checkpoint blocks are freed by
    the ContextCleaner on GC — the operators/dedup.py pattern.) Both
    joins broadcast; the corpus itself is never shuffled. At 100 TB with
    high-cardinality keys, swap exact median for approx_percentile(0.5)
    (q_agg_approx_percentile) and the chain collapses to one
    map-side-combinable aggregate.

    Corrupt-measure contract (round-10 non-finite axis): NaN/±Inf values
    are NULLed at ingestion (functions/numeric.py finite_or_null; oracle
    mirrors with ISFINITE) — a single corrupt float otherwise drags the
    median/MAD to ±Inf differently per engine."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "value", finite_or_null("value")
    )
    med = (
        e.groupBy("user_id")
        .agg(F.round(F.median("value"), 6).alias("med"))
        .localCheckpoint(eager=True)
    )
    mad = (
        e.join(F.broadcast(med), "user_id")
        .groupBy("user_id")
        .agg(F.round(F.median(F.abs(F.col("value") - F.col("med"))), 6).alias("mad"))
    )
    stats = med.join(mad, "user_id")
    return (
        e.join(F.broadcast(stats), "user_id")
        .select(
            "event_id",
            "user_id",
            "value",
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
            (F.abs(F.col("value") - F.col("med")) > F.lit(4.4478) * F.col("mad")).alias(
                "is_anomaly"
            ),
        )
    )


@query(
    "q_cohort_retention",
    oracle="""
WITH act AS (
  SELECT DISTINCT o_custkey, DATE_TRUNC('month', o_orderdate) AS act_month
  FROM orders WHERE o_orderdate IS NOT NULL
),
c AS (
  SELECT o_custkey, act_month,
         MIN(act_month) OVER (PARTITION BY o_custkey) AS cohort_month
  FROM act
)
SELECT cohort_month,
       CAST((EXTRACT(YEAR FROM act_month) * 12 + EXTRACT(MONTH FROM act_month))
          - (EXTRACT(YEAR FROM cohort_month) * 12 + EXTRACT(MONTH FROM cohort_month)) AS BIGINT) AS offset_m,
       COUNT(*) AS n_customers
FROM c
GROUP BY cohort_month, offset_m
""",
    tags=("timeseries", "agg"),
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: customers grouped by first-order month,
    counted in every later month they stayed active — the standard
    retention triangle (cohort_month × months-since-cohort → active
    customers).

    Shape: ONE exchange on the customer key — collect_set gathers each
    customer's distinct active months (bounded: one cell per month in the
    date range, ~80 here), the cohort month is array_min of that set, and
    the offsets explode back out; the final matrix aggregate is
    cohort-cardinality-sized. (A distinct + window formulation costs a
    second exchange because distinct hashes on (customer, month) while
    the window partitions on customer alone.) Month arithmetic is
    explicit year*12+month on both engines (months_between/date_diff
    have per-engine day-of-month semantics). A NULL order date is no
    activity: collect_set drops it naturally, and the oracle filters it
    — SQL DISTINCT would otherwise keep a NaT cohort row (caught by the
    randomized orders differential)."""
    o = load_table(spark, sf_dir, "orders")
    act = o.select(
        "o_custkey", F.date_trunc("month", "o_orderdate").alias("m")
    )
    per_cust = act.groupBy("o_custkey").agg(F.collect_set("m").alias("months"))
    exploded = per_cust.select(
        F.array_min("months").alias("cohort_month"),
        F.explode("months").alias("act_month"),
    )
    months = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    return (
        exploded
        .groupBy(
            "cohort_month",
            (months(F.col("act_month")) - months(F.col("cohort_month")))
            .cast("bigint")
            .alias("offset_m"),
        )
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "q_attribution_last_touch",
    oracle="""
SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
       c.click_id,
       c.click_id IS NOT NULL AS attributed
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN LATERAL (
  SELECT c.event_id AS click_id
  FROM events c
  WHERE c.event_type = 'click' AND c.user_id = p.user_id
    AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 7 DAY
  ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
) c ON TRUE
""",
    tags=("timeseries", "join"),
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the latest click by
    the same user within a 7-day lookback — marketing attribution as a
    tolerance-bounded backward as-of join (operators/asof.py), i.e. the
    same one-union one-window shape as q_join_asof, no per-pair candidate
    explosion. The oracle is an independent LATERAL top-1 formulation.

    At 100 TB: one shuffle on user_id for the union of both event
    streams; the 7-day tolerance is a post-carry filter, not a range
    join."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    # One click per (user, instant), max event_id wins: equal-timestamp
    # clicks would otherwise resolve nondeterministically in the as-of
    # carry (and the oracle's LIMIT 1) — the same tiebreak discipline as
    # q_event_transitions / q_ts_twap, applied before the join
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("click_ts"))
        .agg(F.max("event_id").alias("click_id"))
    )
    from etl_open_source_spark.operators.asof import asof_join

    out = asof_join(
        purchases,
        clicks,
        by=["user_id"],
        left_on="purchase_ts",
        right_on="click_ts",
        right_values=["click_id"],
        tolerance="7 days",
        direction="backward",
    )
    return out.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        "click_id",
        F.col("click_id").isNotNull().alias("attributed"),
    )


@query(
    "q_ts_twap",
    oracle="""
WITH seq AS (
  SELECT user_id, value, ts,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
  FROM events
),
seg AS (
  -- durations via epoch_us // 1000000 (truncate-toward-zero), matching
  -- the engine's per-endpoint cast-to-long exactly. DATE_DIFF('second')
  -- instead counts FLOOR-boundary crossings, which differs on negative
  -- (pre-1970) epochs with fractional seconds (calendar axis r12).
  SELECT user_id,
         CAST(CASE WHEN ISFINITE(value) THEN value END AS DECIMAL(18,4))
           * CAST(epoch_us(next_ts) // 1000000
                  - epoch_us(ts) // 1000000 AS BIGINT) AS weighted,
         CAST(epoch_us(next_ts) // 1000000
              - epoch_us(ts) // 1000000 AS BIGINT) AS dur
  FROM seq WHERE next_ts IS NOT NULL
)
SELECT user_id,
       CAST(SUM(dur) AS BIGINT) AS total_seconds,
       CAST(SUM(weighted) AS DOUBLE) / NULLIF(CAST(SUM(dur) AS DOUBLE), 0) AS twap
FROM seg
GROUP BY user_id
""",
    tags=("timeseries",),
)
def q_ts_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP): each observation's value is weighted
    by how long it HELD (until the next observation) — the correct
    average for irregularly sampled series, where the plain mean
    over-weights bursts (TimescaleDB's time_weight, kdb's twap).

    One (user)-partitioned window for the lead, then a map-side-
    combinable aggregate: value×duration products fold through
    DECIMAL(18,4)·BIGINT (exact, order-independent), one double division
    at the end. One shuffle total; at 100 TB the window and the
    aggregate share the user-key exchange.

    Duration contract: whole seconds, each endpoint truncated toward
    zero (Spark's timestamp→long cast; oracle mirrors with
    epoch_us // 1000000 — the calendar axis pinned that DATE_DIFF
    'second' floor-counting diverges on pre-1970 fractional
    timestamps)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    seq = e.select(
        "user_id",
        "value",
        "ts",
        F.lead("ts").over(w).alias("next_ts"),
    ).filter(F.col("next_ts").isNotNull())
    # to_unix_timestamp truncates toward zero like the oracle's
    # epoch_us // 1000000 (the sanctioned pairing, q_window_range_frame);
    # a bare cast-to-long FLOORS instead and diverges on pre-1970
    # fractional timestamps (calendar axis r12)
    dur = F.expr("to_unix_timestamp(next_ts)") - F.expr("to_unix_timestamp(ts)")
    weighted = F.col("value").cast("decimal(18,4)") * dur.cast("bigint")
    return (
        seq.select("user_id", weighted.alias("weighted"), dur.cast("bigint").alias("dur"))
        .groupBy("user_id")
        .agg(
            F.sum("dur").cast("bigint").alias("total_seconds"),
            # try_divide: a user whose observations all share one instant
            # has total duration 0 — twap is undefined (NULL), mirrored
            # by NULLIF in the oracle; plain division is an ANSI error
            F.try_divide(
                F.sum("weighted").cast("double"), F.sum("dur").cast("double")
            ).alias("twap"),
        )
    )


@query(
    "q_ts_mom_change",
    oracle="""
WITH monthly AS (
  SELECT DATE_TRUNC('month', o_orderdate) AS month,
         COUNT(*) AS n_orders,
         SUM(CAST(CASE WHEN ISFINITE(o_totalprice) THEN o_totalprice END AS DECIMAL(18,4))) AS rev
  FROM orders GROUP BY 1
)
SELECT month,
       n_orders,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(rev - LAG(rev) OVER (ORDER BY month) AS DOUBLE) AS rev_delta,
       ROUND(CAST(rev - LAG(rev) OVER (ORDER BY month) AS DOUBLE)
             / NULLIF(CAST(LAG(rev) OVER (ORDER BY month) AS DOUBLE), 0) * 100, 4) AS pct_change
FROM monthly
""",
    tags=("timeseries", "window"),
)
def q_ts_mom_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month deltas and percent change on the revenue rollup —
    the standard KPI-trend query every BI layer runs. Exact decimal
    month sums first (order-independent), then lag over the
    MONTH-CARDINALITY frame: the window's total order is over ~80 rows,
    never the corpus, so the single-partition window sort that makes
    global rank/ntile a scale caveat (q_rfm_segments) is a non-issue
    here — aggregate first, window the aggregate."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev"),
    )
    w = Window.orderBy("month")
    prev = F.lag("rev").over(w)
    return monthly.select(
        "month",
        "n_orders",
        F.col("rev").cast("double").alias("revenue"),
        (F.col("rev") - prev).cast("double").alias("rev_delta"),
        # try_divide: a previous month whose revenue sums to exactly 0
        # makes percent-change undefined (NULL), not an ANSI error —
        # found by the randomized differential sweep (price pool
        # includes 0.0, so an all-zero month is reachable)
        F.round(
            F.try_divide((F.col("rev") - prev).cast("double"), prev.cast("double"))
            * 100,
            4,
        ).alias("pct_change"),
    )


@query(
    "q_ts_rolling_median",
    oracle="""
WITH daily AS (
  SELECT event_type,
         STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d') AS day,
         CAST(SUM(CAST(CASE WHEN ISFINITE(value) THEN value END AS DECIMAL(18,4))) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, ROUND(x, 4) AS daily_value,
       ROUND(quantile_cont(x, 0.5) OVER (
         PARTITION BY event_type ORDER BY day
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS med7
FROM daily
""",
    tags=("timeseries", "window"),
)
def q_ts_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day rolling MEDIAN of the daily value series per event
    type — the robust smoother: one outlier day shifts a rolling mean by
    outlier/7 but leaves the rolling median untouched, which is why
    monitoring pipelines medianize before thresholding (q_ts_anomaly's
    z-scores are the mean-based counterpart).

    Parity: Spark's exact `percentile(x, 0.5)` and DuckDB's
    `quantile_cont(x, 0.5)` share the same 0-based (n-1)·q interpolation
    rule — verified including even-count frames — while DuckDB's
    windowed `median()` does NOT interpolate; inputs are decimal-exact
    daily sums so both engines interpolate identical doubles. Rounded to
    4 places.

    Shape: one daily pre-aggregate (map-side combinable — facts never
    reach the window), then an event_type-partitioned window whose
    ROWS-7 frame bounds per-row state at 7 values regardless of series
    length. Two exchanges, but the second moves only the
    |types|x|days|-row daily frame, never facts."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "event_type",
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("x"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    return daily.select(
        "event_type",
        "day",
        F.round("x", 4).alias("daily_value"),
        F.round(F.expr("percentile(x, 0.5)").over(w), 4).alias("med7"),
    )


@query(
    "q_ts_hampel",
    oracle="""
WITH daily AS (
  SELECT event_type,
         STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d') AS day,
         CAST(SUM(CAST(CASE WHEN ISFINITE(value) THEN value END AS DECIMAL(18,4))) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, day, x,
         list(x) OVER (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS win
  FROM daily
),
f AS (SELECT event_type, day, x, list_filter(win, v -> v IS NOT NULL) AS fw FROM w),
m AS (SELECT *, list_sort(fw) AS sw, len(fw) AS n FROM f),
med AS (
  SELECT event_type, day, x, fw, n,
         CASE WHEN n % 2 = 1 THEN sw[(n + 1) // 2]
              ELSE (sw[n // 2] + sw[n // 2 + 1]) / 2 END AS med7
  FROM m
),
dev AS (SELECT *, list_sort([abs(v - med7) FOR v IN fw]) AS sd FROM med)
SELECT event_type, day,
       ROUND(x, 4) AS daily_value,
       ROUND(med7, 4) AS med7,
       ROUND(CASE WHEN n % 2 = 1 THEN sd[(n + 1) // 2]
                  ELSE (sd[n // 2] + sd[n // 2 + 1]) / 2 END, 4) AS mad7,
       (abs(x - med7) > 3 * 1.4826 *
          (CASE WHEN n % 2 = 1 THEN sd[(n + 1) // 2]
                ELSE (sd[n // 2] + sd[n // 2 + 1]) / 2 END)) AS is_outlier
FROM dev
""",
    tags=("timeseries", "quality"),
)
def q_ts_hampel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel filter: trailing 7-day rolling median + rolling MAD (median
    absolute deviation), flagging days where |x − med| > 3·1.4826·MAD —
    the robust outlier detector (both center AND spread are medians, so
    one spike can neither mask itself by inflating a stddev nor drag a
    mean; q_ts_anomaly's z-score fails both ways). 1.4826 scales MAD to
    σ-equivalent under normality.

    Parity: the frame's values come through a window collect (frame
    order = the day sort, deterministic), and BOTH engines compute the
    same explicit sorted-array median — (n+1)//2 or the mean of the two
    middle elements — on decimal-exact daily sums, so the unrounded
    comparison arithmetic is bit-identical. A zero-MAD window (constant
    values) flags only genuine deviations (|x − med| > 0). NULL daily
    sums (a day whose every value is NULL) are excluded from the window
    on BOTH sides — Spark's collect_list skips NULLs where DuckDB's
    list() keeps them, which silently shifts the median (caught by the
    randomized timeseries differential); an all-NULL window yields NULL
    med/MAD (engine n>0 guard; DuckDB's out-of-range list index).

    Shape: the daily pre-aggregate bounds the window input at |types| ×
    |days| rows, and the ROWS-7 frame bounds per-row state at 7 values.
    Each derived array (window, sorted window, sorted deviations)
    materializes as a real column between projections — the
    q_text_winnowing lesson: referencing an array EXPRESSION inside a
    per-element lambda makes Catalyst inline it per element, O(n²)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    ).agg(F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("x"))
    w7 = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )

    def arr_median(sorted_col, n):
        lo = F.element_at(sorted_col, ((n + 1) / 2).cast("int"))
        hi = F.element_at(sorted_col, (n / 2 + 1).cast("int"))
        mid2 = (F.element_at(sorted_col, (n / 2).cast("int")) + hi) / 2
        return F.when(n % 2 == 1, lo).otherwise(mid2)

    stepped = (
        daily.withColumn("win", F.collect_list("x").over(w7))
        .withColumn("sw", F.sort_array(F.col("win")))
        .withColumn("n", F.size("win"))
        .withColumn(
            "med7",
            F.when(F.col("n") > 0, arr_median(F.col("sw"), F.col("n"))),
        )
        .withColumn(
            "sd",
            F.sort_array(
                F.transform(F.col("win"), lambda v: F.abs(v - F.col("med7")))
            ),
        )
        .withColumn(
            "mad7",
            F.when(F.col("n") > 0, arr_median(F.col("sd"), F.col("n"))),
        )
    )
    return stepped.select(
        "event_type",
        "day",
        F.round("x", 4).alias("daily_value"),
        F.round("med7", 4).alias("med7"),
        F.round("mad7", 4).alias("mad7"),
        (F.abs(F.col("x") - F.col("med7")) > 3 * 1.4826 * F.col("mad7")).alias(
            "is_outlier"
        ),
    )


@query(
    "q_funnel_latency",
    oracle="""
WITH w1 AS (
  SELECT user_id, ts, event_type,
         MIN(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS v1
  FROM events
),
w2 AS (
  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > v1 THEN ts END)
              OVER (PARTITION BY user_id) AS c1
  FROM w1
),
w3 AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > c1 THEN ts END)
              OVER (PARTITION BY user_id) AS p1
  FROM w2
),
per_user AS (
  SELECT user_id, MAX(v1) AS v1, MAX(c1) AS c1, MAX(p1) AS p1
  FROM w3 GROUP BY user_id
),
conv AS (
  -- latencies via the sanctioned truncating pair (epoch_us // 1000000,
  -- matching engine to_unix_timestamp): DATE_DIFF('second') follows a
  -- different rule on pre-1970 fractional timestamps (r12 soak catch)
  SELECT user_id,
         CAST(epoch_us(c1) // 1000000 - epoch_us(v1) // 1000000 AS BIGINT) AS s_view_click,
         CAST(epoch_us(p1) // 1000000 - epoch_us(c1) // 1000000 AS BIGINT) AS s_click_purch,
         CAST(epoch_us(p1) // 1000000 - epoch_us(v1) // 1000000 AS BIGINT) AS s_total
  FROM per_user WHERE p1 IS NOT NULL
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
       ROUND(quantile_cont(s_view_click, 0.5), 4) AS p50_view_click,
       ROUND(quantile_cont(s_click_purch, 0.5), 4) AS p50_click_purch,
       ROUND(quantile_cont(s_total, 0.5), 4) AS p50_total,
       ROUND(quantile_cont(s_total, 0.95), 4) AS p95_total,
       CAST(MAX(s_total) AS BIGINT) AS max_total
FROM conv
""",
    tags=("timeseries", "funnel"),
)
def q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel time-to-convert: for users who completed view → click →
    purchase (q_funnel's strict ordering), the per-leg and end-to-end
    latency distribution — the half of funnel analysis q_funnel's stage
    COUNTS don't answer (how long the funnel takes, where converts
    stall).

    Latencies are integer epoch-second differences (bit-identical in
    both engines); percentiles are exact interpolating
    percentile/quantile_cont on those integers, rounded 4dp. Shape: the
    same single (user_id) exchange as q_funnel (three stacked
    conditional-min windows + the per-user aggregate), then one global
    aggregate over converted users only. Caveat (same bound
    q_skew_key_stats documents): the final 1-row fold's exact
    ``percentile`` buffers all |converted users| latencies on one
    reducer — input is per-user rows, not facts, but beyond ~10^8
    converts swap in ``approx_percentile`` (same call shape,
    sketch-sized state); the exact form is kept for oracle parity."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    staged = e.withColumn(
        "v1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    staged = staged.withColumn(
        "c1",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("v1")),
                F.col("ts"),
            )
        ).over(w),
    )
    staged = staged.withColumn(
        "p1",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("c1")),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("v1").alias("v1"), F.max("c1").alias("c1"), F.max("p1").alias("p1")
    )
    # to_unix_timestamp truncates toward zero like the oracle's
    # epoch_us // 1000000; a bare cast-to-long FLOORS and diverges on
    # pre-1970 fractional timestamps (r12 soak catch, twap's sibling)
    sec = lambda a, b: (  # noqa: E731
        F.expr(f"to_unix_timestamp({b})") - F.expr(f"to_unix_timestamp({a})")
    ).cast("bigint")
    conv = per_user.filter(F.col("p1").isNotNull()).select(
        sec("v1", "c1").alias("s_view_click"),
        sec("c1", "p1").alias("s_click_purch"),
        sec("v1", "p1").alias("s_total"),
    )
    return conv.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.round(F.percentile("s_view_click", F.lit(0.5)), 4).alias("p50_view_click"),
        F.round(F.percentile("s_click_purch", F.lit(0.5)), 4).alias("p50_click_purch"),
        F.round(F.percentile("s_total", F.lit(0.5)), 4).alias("p50_total"),
        F.round(F.percentile("s_total", F.lit(0.95)), 4).alias("p95_total"),
        F.max("s_total").cast("bigint").alias("max_total"),
    )


@query(
    "q_path_topk",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
sessioned AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_num
  FROM ordered
),
capped AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, session_num
                               ORDER BY ts, event_id) AS rn
  FROM sessioned
),
paths AS (
  SELECT user_id, session_num,
         STRING_AGG(event_type, '>' ORDER BY ts, event_id) AS path
  FROM capped WHERE rn <= 8
  GROUP BY user_id, session_num
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT 10
""",
    tags=("timeseries", "analytics"),
)
def q_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 session journey paths: sessions cut at 30-minute silences
    (q_ts_sessionize's rule), each session's first 8 event types joined
    into a path string, paths ranked by frequency — the "what do users
    actually do" query behind every funnel hypothesis (q_funnel tests ONE
    ordering; this surfaces the orderings worth testing).

    Determinism: the event order inside a path carries the (ts, event_id)
    tiebreak end to end — session numbering, the 8-event cap, and the
    string order all use it — and the top-10 cut breaks count ties on the
    path string, so the boundary row is identical in both engines. The
    8-event cap bounds path-string length (and distinct-path cardinality)
    regardless of session length — the hot-session guard.

    Shape: ONE (user_id) exchange shared by the lag + running-sum + cap
    windows (same sort), one (user, session) aggregate, one path count,
    then TakeOrdered for the top-10 (no global sort)."""
    e = load_table(spark, sf_dir, "events")
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w_lag = Window.partitionBy("user_id").orderBy(*order)
    w_run = w_lag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    is_break = (
        F.lag("ts").over(w_lag).isNull()
        | (F.col("ts") > F.lag("ts").over(w_lag) + F.expr("INTERVAL 30 MINUTES"))
    )
    sessioned = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(F.when(is_break, 1).otherwise(0)).over(w_run).alias("session_num"),
    )
    w_sess = Window.partitionBy("user_id", "session_num").orderBy(*order)
    capped = sessioned.withColumn("rn", F.row_number().over(w_sess)).filter(
        F.col("rn") <= 8
    )
    # NULL contract (randomized-differential catch): STRING_AGG yields NULL
    # for a group with zero non-NULL inputs, while concat_ws renders ''.
    # Pin the SQL semantics: a session whose every event type is NULL has
    # NO path (NULL), not an empty one — and mid-path NULL steps are
    # skipped by both engines alike. (NULLIF('') would be wrong: a single
    # ''-typed event is a real, empty-string path in both engines.)
    paths = (
        capped.groupBy("user_id", "session_num")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("evs")
        )
        .select(
            F.when(
                F.exists(F.col("evs"), lambda s: s["event_type"].isNotNull()),
                F.concat_ws(
                    ">", F.transform(F.col("evs"), lambda s: s["event_type"])
                ),
            ).alias("path")
        )
    )
    # asc_nulls_last: DuckDB sorts NULL last under ASC, Spark first — the
    # tiebreak decides WHICH paths survive the LIMIT 10, so pin it.
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc_nulls_last())
        .limit(10)
    )


@query(
    "q_session_stats",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_id,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
sessioned AS (
  SELECT user_id, ts,
         SUM(CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_num
  FROM ordered
),
sess AS (
  -- duration via the sanctioned truncating pair (epoch_us // 1000000,
  -- matching engine to_unix_timestamp): DATE_DIFF('second') follows a
  -- different rule on pre-1970 fractional timestamps (r12 soak catch)
  SELECT user_id, session_num,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(epoch_us(MAX(ts)) // 1000000
              - epoch_us(MIN(ts)) // 1000000 AS BIGINT) AS duration_s
  FROM sessioned GROUP BY user_id, session_num
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
       ROUND(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS bounce_rate,
       ROUND(quantile_cont(n_events, 0.5), 4) AS p50_events,
       ROUND(quantile_cont(n_events, 0.95), 4) AS p95_events,
       ROUND(quantile_cont(duration_s, 0.5), 4) AS p50_duration_s,
       ROUND(quantile_cont(duration_s, 0.95), 4) AS p95_duration_s,
       CAST(MAX(duration_s) AS BIGINT) AS max_duration_s
FROM sess
""",
    tags=("timeseries", "analytics"),
)
def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-level distribution summary: session count, bounce rate
    (single-event sessions — the classic engagement KPI), and exact
    length/duration percentiles — the aggregate layer over
    q_ts_sessionize's row-level numbering (q_path_topk tells you WHAT
    sessions do; this tells you how long and how deep they are).

    Durations are integer epoch-second spans (max − min inside the
    session, bit-identical engines); percentiles are the exact
    interpolating pair percentile/quantile_cont on integers, rounded
    4dp. Shape: the ONE (user)-keyed exchange shared by the lag and
    running-sum windows and the per-session aggregate, then a 1-row
    global fold. Caveat (same bound q_skew_key_stats documents): the
    fold's exact ``percentile`` buffers all |sessions| values on one
    reducer — input is per-session rows (O(users·sessions)), not facts,
    but beyond ~10^8 sessions swap in ``approx_percentile`` (same call
    shape, sketch-sized state); the exact form is kept for oracle
    parity."""
    e = load_table(spark, sf_dir, "events")
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w_lag = Window.partitionBy("user_id").orderBy(*order)
    w_run = w_lag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    is_break = (
        F.lag("ts").over(w_lag).isNull()
        | (F.col("ts") > F.lag("ts").over(w_lag) + F.expr("INTERVAL 30 MINUTES"))
    )
    sessioned = e.select(
        "user_id",
        "ts",
        F.sum(F.when(is_break, 1).otherwise(0)).over(w_run).alias("session_num"),
    )
    sess = sessioned.groupBy("user_id", "session_num").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        # to_unix_timestamp truncates toward zero like the oracle's
        # epoch_us // 1000000; a bare cast-to-long FLOORS and diverges on
        # pre-1970 fractional timestamps (r12 soak catch, twap's sibling)
        (
            F.expr("to_unix_timestamp(max(ts))")
            - F.expr("to_unix_timestamp(min(ts))")
        )
        .cast("bigint")
        .alias("duration_s"),
    )
    n = F.count(F.lit(1))
    bounces = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return sess.agg(
        n.cast("bigint").alias("n_sessions"),
        bounces.cast("bigint").alias("n_bounces"),
        F.round(bounces.cast("double") / n, 6).alias("bounce_rate"),
        F.round(F.percentile("n_events", F.lit(0.5)), 4).alias("p50_events"),
        F.round(F.percentile("n_events", F.lit(0.95)), 4).alias("p95_events"),
        F.round(F.percentile("duration_s", F.lit(0.5)), 4).alias("p50_duration_s"),
        F.round(F.percentile("duration_s", F.lit(0.95)), 4).alias("p95_duration_s"),
        F.max("duration_s").cast("bigint").alias("max_duration_s"),
    )
