"""Second analytics pack: CUSUM changepoint scan, rolling-window distinct
counts, and join-key skew diagnostics.

[EXT] per SURVEY.md §2 — monitoring/diagnostic passes over the events and
orders tables. The CUSUM statistic is kept in scaled integer form
(n_days * prefix_sum - day_index * total, all through DECIMAL) so both
engines agree bit-for-bit with no float recurrence anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_open_source_spark.catalog import load_table
from etl_open_source_spark.functions.numeric import finite_or_null
from etl_open_source_spark.registry import query


@query(
    "q_ts_cusum",
    oracle="""
WITH daily AS (
  SELECT event_type,
         STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d') AS day,
         SUM(CAST(CASE WHEN ISFINITE(value) THEN value END AS DECIMAL(18,4))) AS x
  FROM events GROUP BY 1, 2
),
cum AS (
  SELECT event_type, day, x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS d_idx,
         COUNT(*) OVER (PARTITION BY event_type) AS n_days,
         SUM(x) OVER (PARTITION BY event_type) AS total,
         SUM(x) OVER (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix
  FROM daily
),
s AS (
  SELECT event_type, day,
         CAST(n_days * prefix - d_idx * total AS DECIMAL(38,4)) AS s_scaled
  FROM cum
)
SELECT event_type, day,
       CAST(s_scaled AS DOUBLE) AS cusum_scaled,
       s_scaled = MAX(s_scaled) OVER (PARTITION BY event_type)
         OR s_scaled = MIN(s_scaled) OVER (PARTITION BY event_type)
         AS is_extreme
FROM s
""",
    tags=("timeseries", "quality"),
)
def q_ts_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan per event-type series: cumulative sum of
    daily deviations from the series mean, with the extreme day flagged —
    the day where |S| peaks is the classic single-changepoint estimate.

    The statistic is scaled through integers: S'_d = n_days * prefix_d -
    d * total (DECIMAL end to end, = n_days² times the textbook
    mean-deviation CUSUM), so there is no division and no float
    recurrence — both engines agree exactly. Shape: one daily aggregate
    (map-side combinable), then event_type-partitioned windows over the
    day-count-sized frame; the corpus shuffles once."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "event_type",
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,4)")).alias("x"))
    )
    wp = Window.partitionBy("event_type")
    wo = wp.orderBy("day")
    cum = daily.select(
        "event_type",
        "day",
        F.row_number().over(wo).alias("d_idx"),
        F.count(F.lit(1)).over(wp).alias("n_days"),
        F.sum("x").over(wp).alias("total"),
        F.sum("x").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("prefix"),
    )
    s_scaled = (
        F.col("n_days") * F.col("prefix") - F.col("d_idx") * F.col("total")
    ).cast("decimal(38,4)")
    s = cum.select("event_type", "day", s_scaled.alias("s_scaled"))
    return s.select(
        "event_type",
        "day",
        F.col("s_scaled").cast("double").alias("cusum_scaled"),
        (
            (F.col("s_scaled") == F.max("s_scaled").over(wp))
            | (F.col("s_scaled") == F.min("s_scaled").over(wp))
        ).alias("is_extreme"),
    )


@query(
    "q_window_distinct_rolling",
    oracle="""
WITH days AS (
  SELECT DISTINCT DATE_TRUNC('day', ts) AS day FROM events
)
SELECT STRFTIME(d.day, '%Y-%m-%d') AS day,
       COUNT(DISTINCT e.user_id) AS n_users_7d,
       COUNT(*) AS n_events_7d
FROM days d
JOIN events e
  ON DATE_TRUNC('day', e.ts) BETWEEN d.day - INTERVAL 6 DAY AND d.day
GROUP BY d.day
""",
    tags=("timeseries", "window"),
)
def q_window_distinct_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users per day: for each calendar day with
    events, the distinct user count and event count over that day and the
    six before it — the DAU/WAU-style rolling-distinct no plain window
    frame can produce (COUNT(DISTINCT) OVER a range frame isn't
    decomposable).

    Shape: each event EXPLODES into the 7 window days it serves
    (bounded 7x fan-out, scan-local), a broadcast semi-join against the
    distinct-day dimension drops target days with no events of their
    own, and one equi-shuffle on the day aggregates. (A range-condition
    join of the day dimension against the event scan would be a
    broadcast nested loop — |days| x |events| comparisons, wrong at
    10^12 events; the explode formulation is the standard
    rolling-distinct expansion.) At 100 TB the exactness-trading
    alternative is per-day HLL sketch union (q_agg_hll_merge shows the
    mergeable path)."""
    e = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").cast("date").alias("eday"), "user_id"
    )
    days = e.select(F.col("eday").alias("day")).distinct()
    exploded = e.select(
        F.explode(
            F.sequence(F.col("eday"), F.date_add(F.col("eday"), 6))
        ).alias("day"),
        "user_id",
    )
    return (
        exploded.join(F.broadcast(days), "day", "semi")
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("n_users_7d"),
            F.count(F.lit(1)).alias("n_events_7d"),
        )
    )


@query(
    "q_skew_key_stats",
    oracle="""
WITH cnts AS (
  SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey
)
SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
       COUNT(*) AS n_keys,
       CAST(MAX(cnt) AS BIGINT) AS max_cnt,
       ROUND(CAST(SUM(cnt) AS DOUBLE) / COUNT(*), 6) AS avg_per_key,
       ROUND(CAST(MAX(cnt) AS DOUBLE) / SUM(cnt), 6) AS top1_share,
       ROUND(CAST(MEDIAN(cnt) AS DOUBLE), 6) AS p50_cnt,
       ROUND(CAST(QUANTILE_CONT(cnt, 0.99) AS DOUBLE), 6) AS p99_cnt
FROM cnts
""",
    tags=("quality", "scale"),
)
def q_skew_key_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic for orders.o_custkey: total rows, distinct
    keys, heaviest key's count and share, and the p50/p99 of the per-key
    count distribution — the numbers that decide salting / AQE-skew-join
    settings before a big join ships (q_join_skew_salted is the remedy
    this diagnostic motivates).

    Shape: one per-key count (map-side combinable) then a single global
    aggregate over |keys| rows — per-key, not per-fact, so the reduction
    input shrinks by the average key multiplicity. Caveat: exact
    ``percentile`` buffers all |keys| counts on one reducer; beyond
    ~10^8 distinct keys swap in ``approx_percentile`` (same call shape,
    sketch-sized state) — the exact form is kept here for oracle
    parity. p50/p99 are rounded to 6 on both sides: DuckDB 1.0.0's
    QUANTILE_CONT interpolation (un-factored lo + d*hi - d*lo) carries
    magnitude-dependent cancellation error vs F.percentile's
    lo + d*(hi-lo) — the q_winsorize round-9 soak catch."""
    o = load_table(spark, sf_dir, "orders")
    cnts = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    return cnts.agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
        F.round(F.sum("cnt") / F.count(F.lit(1)), 6).alias("avg_per_key"),
        F.round(F.max("cnt") / F.sum("cnt"), 6).alias("top1_share"),
        F.round(F.expr("percentile(cnt, 0.5)").cast("double"), 6).alias("p50_cnt"),
        F.round(F.expr("percentile(cnt, 0.99)").cast("double"), 6).alias("p99_cnt"),
    )


@query(
    "q_join_interval_overlap",
    oracle="""
WITH ev_f AS (
  -- non-finite window lengths NULL at ingestion (same-named CTE would
  -- bind circularly in DuckDB)
  SELECT * REPLACE (CASE WHEN ISFINITE(value) THEN value END AS value)
  FROM events
),
e AS (
  SELECT event_id AS err_id, ts AS es,
         ts + CAST(FLOOR(value) AS BIGINT) * INTERVAL 1 MINUTE AS ee
  FROM ev_f WHERE event_type = 'error'
    AND ts + CAST(FLOOR(value) AS BIGINT) * INTERVAL 1 MINUTE >= ts
),
p AS (
  SELECT event_id AS buy_id, ts AS ps,
         ts + CAST(FLOOR(value) AS BIGINT) * INTERVAL 1 MINUTE AS pe
  FROM ev_f WHERE event_type = 'purchase'
    AND ts + CAST(FLOOR(value) AS BIGINT) * INTERVAL 1 MINUTE >= ts
)
SELECT err_id, buy_id,
       -- per-endpoint ms via the truncating pair epoch_us // 1000 (engine:
       -- unix_micros div 1000): EPOCH_MS truncates but Spark's unix_millis
       -- FLOORS, diverging on pre-1970 sub-millisecond timestamps (r12)
       epoch_us(LEAST(ee, pe)) // 1000 - epoch_us(GREATEST(es, ps)) // 1000 AS overlap_ms
FROM e JOIN p ON es <= pe AND ps <= ee
""",
    tags=("join", "timeseries"),
)
def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: error windows x purchase windows (each event
    opens a window of floor(value) minutes) — 'which purchases ran while
    an error condition was live'. The oracle is the naive theta join; the
    engine is the bucketed decomposition (operators/rangejoin.py::
    interval_overlap_join): both sides explode over spanned 1-hour
    buckets, equi-join on the bucket id, exact predicate as residual,
    first-shared-bucket arithmetic dedup (no distinct shuffle). A theta
    join is O(|L|*|R|) at any scale; this is one equi-shuffle on a dense
    key. Inverted windows (a negative value makes end < start) are
    invalid intervals and DROPPED — the operator's documented contract
    (rangejoin.py) — and the oracle now mirrors the drop (caught by the
    randomized events differential: a naive theta join would still match
    them).

    Corrupt-measure contract (round-10 non-finite axis): NaN/±Inf window
    lengths NULL at ingestion — the NULL window end then fails the
    ``ee >= ts`` validity predicate and the row drops, extending the
    inverted-window drop contract (both engines previously hard-errored
    casting FLOOR(±Inf) into the interval arithmetic)."""
    from etl_open_source_spark.operators.rangejoin import interval_overlap_join

    ev = load_table(spark, sf_dir, "events").withColumn(
        "value", finite_or_null("value")
    )
    win = F.expr("ts + make_dt_interval(0, 0, floor(value), 0)")
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), F.col("ts").alias("es"), win.alias("ee")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("buy_id"), F.col("ts").alias("ps"), win.alias("pe")
    )
    joined = interval_overlap_join(e, p, "es", "ee", "ps", "pe", bucket_seconds=3600)
    # unix_micros div 1000 truncates toward zero like the oracle's
    # epoch_us // 1000; unix_millis FLOORS and diverges on pre-1970
    # sub-millisecond timestamps (calendar axis r12)
    overlap_ms = (
        F.expr("unix_micros(least(ee, pe)) div 1000")
        - F.expr("unix_micros(greatest(es, ps)) div 1000")
    ).cast("bigint")
    return joined.select("err_id", "buy_id", overlap_ms.alias("overlap_ms"))


@query(
    "q_quality_psi",
    oracle="""
WITH e AS (
  SELECT event_type, CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
         CASE WHEN ISFINITE(value) THEN value END AS value
  FROM events
),
bounds AS (
  SELECT event_type,
         MIN(day) + CAST(DATE_DIFF('day', MIN(day), MAX(day)) // 2 AS BIGINT)
           * INTERVAL 1 DAY AS split_day
  FROM e GROUP BY event_type
),
tagged AS (
  SELECT e.event_type, e.value,
         CASE WHEN e.day <= b.split_day THEN 'ref' ELSE 'cur' END AS period
  FROM e JOIN bounds b ON e.event_type = b.event_type
),
stats AS (
  SELECT event_type, MIN(value) AS mn, MAX(value) AS mx
  FROM tagged WHERE period = 'ref' GROUP BY event_type
),
binned AS (
  SELECT t.event_type, t.period,
         CASE WHEN s.mx > s.mn
              THEN LEAST(9, GREATEST(0,
                   CAST(FLOOR((t.value - s.mn) / ((s.mx - s.mn) / 10.0)) AS BIGINT)))
              ELSE 0 END AS bin
  FROM tagged t JOIN stats s ON t.event_type = s.event_type
),
cells AS (
  SELECT event_type, bin,
         CAST(SUM(CASE WHEN period = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
         CAST(SUM(CASE WHEN period = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS c_cur
  FROM binned GROUP BY event_type, bin
),
tot AS (
  SELECT event_type, SUM(c_ref) AS n_ref, SUM(c_cur) AS n_cur
  FROM cells GROUP BY event_type
)
SELECT c.event_type,
       CAST(t.n_ref AS BIGINT) AS n_ref,
       CAST(t.n_cur AS BIGINT) AS n_cur,
       CAST(SUM(CASE WHEN c.c_ref > 0 AND c.c_cur > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bins_used,
       CAST(SUM(CASE WHEN c.c_ref > 0 AND c.c_cur > 0 THEN CAST(ROUND(
           (CAST(c.c_cur AS DOUBLE) / t.n_cur - CAST(c.c_ref AS DOUBLE) / t.n_ref)
           * LN((CAST(c.c_cur AS DOUBLE) / t.n_cur)
                / (CAST(c.c_ref AS DOUBLE) / t.n_ref)), 8) AS DECIMAL(18,8))
           ELSE CAST(0 AS DECIMAL(18,8)) END) AS DOUBLE) AS psi
FROM cells c JOIN tot t ON c.event_type = t.event_type
GROUP BY c.event_type, t.n_ref, t.n_cur
""",
    tags=("quality", "analytics"),
)
def q_quality_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift monitor: per event type, split the
    timeline in half, decile-bin the value distribution on the REFERENCE
    half's range, and compute PSI = sum (q-p)*ln(q/p) of the current half
    against it — the standard 'did the feature distribution move' gate
    (>0.2 = investigate) run before a model retrain consumes new data.

    Parity design: per-bin PSI contributions round to 8 places and SUM as
    DECIMAL(18,8) — float summation order can never drift between
    engines. Bins with either side empty are excluded (reported via
    n_bins_used). Shape: two broadcast-sized aggregates (split day,
    ref-range per type) joined back onto one corpus scan, then a
    type x bin cell aggregate — the corpus shuffles once.

    Corrupt-measure contract (round-10 non-finite axis): NaN/±Inf values
    NULL at ingestion (finite_or_null / ISFINITE both sides) — a NaN
    otherwise poisons the reference range (mx), collapsing every bin."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
        finite_or_null("value").alias("value"),
    )
    bounds = e.groupBy("event_type").agg(
        F.date_add(
            F.min("day"),
            F.floor(F.datediff(F.max("day"), F.min("day")) / 2).cast("int"),
        ).alias("split_day")
    )
    tagged = e.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "value",
        F.when(F.col("day") <= F.col("split_day"), "ref").otherwise("cur").alias("period"),
    )
    stats = (
        tagged.filter(F.col("period") == "ref")
        .groupBy("event_type")
        .agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    )
    bin_col = F.when(
        F.col("mx") > F.col("mn"),
        F.least(
            F.lit(9),
            F.greatest(
                F.lit(0).cast("bigint"),
                F.floor((F.col("value") - F.col("mn")) / ((F.col("mx") - F.col("mn")) / 10.0)),
            ),
        ),
    ).otherwise(0)
    cells = (
        tagged.join(F.broadcast(stats), "event_type")
        .select("event_type", "period", bin_col.alias("bin"))
        .groupBy("event_type", "bin")
        .agg(
            F.sum(F.when(F.col("period") == "ref", 1).otherwise(0)).cast("bigint").alias("c_ref"),
            F.sum(F.when(F.col("period") == "cur", 1).otherwise(0)).cast("bigint").alias("c_cur"),
        )
    )
    wt = Window.partitionBy("event_type")
    with_tot = cells.select(
        "event_type",
        "bin",
        "c_ref",
        "c_cur",
        F.sum("c_ref").over(wt).alias("n_ref"),
        F.sum("c_cur").over(wt).alias("n_cur"),
    )
    p = F.col("c_ref").cast("double") / F.col("n_ref")
    q = F.col("c_cur").cast("double") / F.col("n_cur")
    used = (F.col("c_ref") > 0) & (F.col("c_cur") > 0)
    contrib = F.when(
        used, F.round((q - p) * F.log(q / p), 8).cast("decimal(18,8)")
    ).otherwise(F.lit(0).cast("decimal(18,8)"))
    return (
        with_tot.groupBy("event_type", "n_ref", "n_cur")
        .agg(
            F.sum(F.when(used, 1).otherwise(0)).cast("bigint").alias("n_bins_used"),
            F.sum(contrib).cast("double").alias("psi"),
        )
        .select("event_type", "n_ref", "n_cur", "n_bins_used", "psi")
    )


@query(
    "q_ts_stl_decompose",
    oracle="""
WITH daily AS (
  SELECT event_type,
         STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d') AS day,
         CAST(DAYOFWEEK(DATE_TRUNC('day', ts)) AS BIGINT) AS dow,
         SUM(CAST(CASE WHEN ISFINITE(value) THEN value END AS DECIMAL(18,4))) AS x
  FROM events GROUP BY 1, 2, 3
),
tr AS (
  SELECT event_type, day, dow, x,
         CASE WHEN COUNT(*) OVER w7 = 7
              THEN CAST(SUM(x) OVER w7 AS DOUBLE) / 7 END AS trend
  FROM daily
  WINDOW w7 AS (PARTITION BY event_type ORDER BY day
                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
det AS (
  SELECT *, CAST(ROUND(CAST(x AS DOUBLE) - trend, 6) AS DECIMAL(18,6)) AS detr
  FROM tr
),
seas AS (
  SELECT event_type, dow,
         ROUND(CAST(SUM(detr) AS DOUBLE) / COUNT(detr), 6) AS seasonal
  FROM det WHERE detr IS NOT NULL GROUP BY 1, 2
)
SELECT d.event_type, d.day,
       CAST(d.x AS DOUBLE) AS x,
       ROUND(d.trend, 6) AS trend,
       s.seasonal,
       ROUND(CAST(d.detr AS DOUBLE) - s.seasonal, 6) AS resid
FROM det d JOIN seas s ON d.event_type = s.event_type AND d.dow = s.dow
""",
    tags=("timeseries",),
)
def q_ts_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-style additive decomposition per event-type series: trend =
    centered 7-day moving average (null at the edges where the window is
    short), seasonal = day-of-week mean of the detrended series,
    residual = the rest — the classic seasonality/anomaly split.

    Parity design: the daily aggregate folds through DECIMAL; the trend
    is ONE double division of an exact decimal sum; detrended values
    round to 6 places and re-enter DECIMAL so the seasonal mean's
    summation order cannot drift between engines. Shape: one corpus
    shuffle (daily aggregate), one per-type window pass, one
    dow-cardinality aggregate joined back."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.dayofweek(F.date_trunc("day", "ts")).cast("bigint").alias("dow"),
    ).agg(F.sum(F.col("value").cast("decimal(18,4)")).alias("x"))
    w7 = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    )
    trend = F.when(
        F.count("x").over(w7) == 7, F.sum("x").over(w7).cast("double") / 7
    )
    tr = daily.select("event_type", "day", "dow", "x", trend.alias("trend"))
    det = tr.withColumn(
        "detr",
        F.round(F.col("x").cast("double") - F.col("trend"), 6).cast("decimal(18,6)"),
    )
    seas = (
        det.filter(F.col("detr").isNotNull())
        .groupBy("event_type", "dow")
        .agg(
            F.round(
                F.sum("detr").cast("double") / F.count("detr"), 6
            ).alias("seasonal")
        )
    )
    return det.join(seas, ["event_type", "dow"]).select(
        "event_type",
        "day",
        F.col("x").cast("double").alias("x"),
        F.round("trend", 6).alias("trend"),
        "seasonal",
        F.round(F.col("detr").cast("double") - F.col("seasonal"), 6).alias("resid"),
    )


@query(
    "q_quality_benford",
    oracle="""
WITH digits AS (
  SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS d
  FROM orders WHERE o_totalprice >= 1 AND ISFINITE(o_totalprice)
),
tot AS (SELECT COUNT(*) AS n FROM digits)
SELECT d AS digit,
       COUNT(*) AS n,
       ROUND(CAST(COUNT(*) AS DOUBLE) / tot.n, 6) AS share,
       ROUND(LOG10(1 + 1.0 / d), 6) AS benford_expected,
       ROUND(CAST(COUNT(*) AS DOUBLE) / tot.n - LOG10(1 + 1.0 / d), 6) AS deviation
FROM digits CROSS JOIN tot
GROUP BY d, tot.n
""",
    tags=("quality", "analytics"),
)
def q_quality_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals: observed
    first-significant-digit shares vs the log10(1 + 1/d) expectation —
    the classic fabricated-data / unit-mixing smoke test for financial
    columns.

    The first digit is taken through FLOOR -> BIGINT -> string (never
    float formatting, whose shortest-round-trip text differs between
    engines). One scan + a 9-row aggregate; the 1-row total broadcasts.

    Non-finite prices are excluded on BOTH sides (NaN-axis r11): a
    corrupt price has no first digit, and they are not even safely
    inert — NaN passes the >= 1 filter in both engines (NaN-high), then
    Spark's FLOOR(NaN) returns 0 whose digit d=0 hits DIVIDE_BY_ZERO in
    log10(1 + 1/d) under ANSI, while FLOOR(Inf) yields Long.MAX's bogus
    leading 9."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_totalprice") >= 1) & finite_or_null("o_totalprice").isNotNull()
    )
    digits = o.select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        ).cast("bigint").alias("d")
    )
    tot = digits.agg(F.count(F.lit(1)).alias("n"))
    share = F.count(F.lit(1)) / F.first("n")
    return (
        digits.crossJoin(F.broadcast(tot))
        .groupBy(F.col("d").alias("digit"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.count(F.lit(1)) / F.first("n"), 6).alias("share"),
            F.round(F.log10(1 + 1.0 / F.col("digit").cast("double")), 6).alias(
                "benford_expected"
            ),
            F.round(
                F.count(F.lit(1)) / F.first("n")
                - F.log10(1 + 1.0 / F.col("digit").cast("double")),
                6,
            ).alias("deviation"),
        )
    )


@query(
    "q_join_asof_tolerance",
    oracle="""
WITH c AS (
  SELECT event_id AS click_id, user_id, ts AS cts
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id, ts AS pts FROM events WHERE event_type = 'purchase'
),
m AS (
  SELECT c.click_id, c.user_id, c.cts, MAX(p.pts) AS pts
  FROM c LEFT JOIN p
    ON p.user_id = c.user_id
   AND p.pts <= c.cts
   AND p.pts >= c.cts - INTERVAL 2 HOUR
  GROUP BY c.click_id, c.user_id, c.cts
)
SELECT click_id, user_id, pts AS last_purchase_ts,
       epoch_us(cts) // 1000 - epoch_us(pts) // 1000 AS gap_ms
FROM m
""",
    tags=("join", "timeseries"),
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded as-of join: each click annotated with the same
    user's most recent purchase, but only if it happened within the last
    2 hours — the 'recent context' lookup where an unbounded as-of would
    attach stale state. Exercises the operator's ``tolerance`` bound
    (operators/asof.py), which q_join_asof/q_join_asof_forward leave
    open.

    Same ONE union + (user)-partitioned window as every as-of direction;
    the tolerance is a post-carry validity predicate, not an extra
    join."""
    from etl_open_source_spark.operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("cts")
    )
    buys = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts")
    )
    joined = asof_join(
        clicks, buys, by=["user_id"], left_on="cts", right_on="pts",
        tolerance="2 hours", direction="backward",
    )
    return joined.select(
        "click_id",
        "user_id",
        F.col("pts").alias("last_purchase_ts"),
        (
            F.expr("unix_micros(cts) div 1000") - F.expr("unix_micros(pts) div 1000")
        ).alias("gap_ms"),
    )


@query(
    "q_ts_autocorr",
    oracle="""
WITH daily AS (
  SELECT event_type,
         STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d') AS day,
         CAST(SUM(CAST(CASE WHEN ISFINITE(value) THEN value END AS DECIMAL(18,4))) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT event_type, x,
         LAG(x, 1) OVER (PARTITION BY event_type ORDER BY day) AS x1,
         LAG(x, 7) OVER (PARTITION BY event_type ORDER BY day) AS x7
  FROM daily
)
SELECT event_type,
       CAST(COUNT(x1) AS BIGINT) AS n_lag1,
       ROUND(CORR(x, x1), 6) AS acf_lag1,
       ROUND(CORR(x, x7), 6) AS acf_lag7
FROM lagged
GROUP BY event_type
""",
    tags=("timeseries", "agg"),
)
def q_ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 and lag-7 autocorrelation of each event-type's daily series —
    the seasonality/persistence fingerprint (a strong lag-7 ACF is the
    weekly cycle q_ts_stl_decompose then extracts). Daily sums fold
    through DECIMAL; the Pearson correlations round to 6 places (CORR's
    merge order can differ between engines in the last ulps — same
    contract as q_agg_corr, hash-green since r5).

    The correlations are NOT the built-in ``F.corr``: under ANSI mode it
    raises DIVIDE_BY_ZERO on a zero-variance/single-pair series (a
    constant daily series — caught by the r12 soak after the calendar
    pool enrichment) where DuckDB's corr yields NULL. Same masked
    try_divide(covar, sd·sd) form as q_agg_corr, pairwise-complete.

    Shape: one daily aggregate, one per-type window for the lags, one
    type-cardinality aggregate."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    ).agg(F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("x"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 7).over(w).alias("x7"),
    )
    def _acf(lag_col: str):
        both = F.col("x").isNotNull() & F.col(lag_col).isNotNull()
        a, b = F.when(both, F.col("x")), F.when(both, F.col(lag_col))
        return F.try_divide(
            F.covar_samp(a, b), F.stddev_samp(a) * F.stddev_samp(b)
        )

    return lagged.groupBy("event_type").agg(
        F.count("x1").cast("bigint").alias("n_lag1"),
        F.round(_acf("x1"), 6).alias("acf_lag1"),
        F.round(_acf("x7"), 6).alias("acf_lag7"),
    )
