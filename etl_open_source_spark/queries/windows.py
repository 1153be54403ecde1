"""Window-function operators (SURVEY.md §2.C "Window functions").

One shuffle per distinct (partitionBy, orderBy) spec; running/frame aggs
over doubles go through decimal so prefix sums are exact in both engines.
Every orderBy carries a unique tiebreak key — row_number/lag/lead are
nondeterministic without one, which is a correctness bug at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_open_source_spark.catalog import load_table
from etl_open_source_spark.registry import query


@query(
    "q_window_rank",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
       CAST(RANK() OVER w AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
""",
    tags=("window",),
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / row_number over a partitioned order — one
    shuffle on the partition key; the order carries a unique tiebreak so
    row_number is deterministic."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
    )


@query(
    "q_window_lag_lead",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
       LAG(o_totalprice) OVER w AS prev_price,
       LEAD(o_totalprice) OVER w AS next_price,
       LAG(o_totalprice, 2, -1.0) OVER w AS prev2_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_orderdate NULLS LAST, o_orderkey NULLS LAST)
""",
    tags=("window",),
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead neighbor access over a partitioned order — one shuffle;
    unique tiebreak keeps neighbors deterministic at equal timestamps.
    NULL ordering pinned NULLS LAST both sides: a NULL-date row's
    neighbors flip between the engines' ascending NULL defaults
    otherwise (caught by the randomized orders differential)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc_nulls_last("o_orderdate"), F.asc_nulls_last("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.lag("o_totalprice", 2, -1.0).over(w).alias("prev2_price"),
    )


@query(
    "q_window_running",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER w AS DOUBLE) AS running_qty,
       CAST(COUNT(*) OVER w AS BIGINT) AS running_cnt
FROM lineitem
WINDOW w AS (PARTITION BY l_orderkey
             ORDER BY l_linenumber NULLS LAST, l_quantity NULLS LAST,
                      l_extendedprice NULLS LAST
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    tags=("window",),
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) aggregate with an explicit ROWS frame.

    (l_orderkey, l_linenumber) is NOT unique in the fixtures, so the sort
    carries value tiebreaks — rows tying on all sort keys then produce an
    identical output multiset under any physical order. NULL ordering is
    pinned NULLS LAST on both sides: a NULL quantity row placed first
    (Spark's ascending default) instead of last (DuckDB's) changes every
    prefix sum after it."""
    l = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy(
            F.asc_nulls_last("l_linenumber"),
            F.asc_nulls_last("l_quantity"),
            F.asc_nulls_last("l_extendedprice"),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).over(w).cast("double").alias("running_qty"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("running_cnt"),
    )


@query(
    "q_window_range_frame",
    oracle="""
SELECT event_id, user_id,
       epoch_us(ts) // 1000000 AS ts_sec,
       CAST(COUNT(*) OVER w AS BIGINT) AS cnt_1h,
       CAST(SUM(CAST(CASE WHEN ISFINITE(value) THEN value END AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY (epoch_us(ts) // 1000000)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
""",
    tags=("window",),
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (value-based) frame: trailing 1-hour moving aggregate per user.
    Peers at the same second are all included — well-defined under ties."""
    e = load_table(spark, sf_dir, "events")
    # to_unix_timestamp is NTZ-safe (a plain TIMESTAMP_NTZ cast to long is
    # rejected by Spark 4.1); the session also pins inferTimestampNTZ=false,
    # this is belt-and-braces for externally-built sessions.
    e = e.withColumn("ts_sec", F.expr("to_unix_timestamp(ts)"))
    w = Window.partitionBy("user_id").orderBy("ts_sec").rangeBetween(-3600, 0)
    return e.select(
        "event_id",
        "user_id",
        "ts_sec",
        F.count(F.lit(1)).over(w).cast("bigint").alias("cnt_1h"),
        F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double").alias("sum_1h"),
    )


@query(
    "q_window_ntile",
    oracle="""
SELECT c_custkey, c_acctbal,
       CAST(NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS balance_quartile
FROM customer
""",
    tags=("window",),
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing. NOTE: an un-partitioned window is a single-reducer
    sort — fine for dimension-sized inputs, never for the fact table (use
    ntile within partitions or approx quantiles at scale)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_custkey",
        "c_acctbal",
        F.ntile(4).over(w).cast("bigint").alias("balance_quartile"),
    )


@query(
    "q_window_first_last",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_orderdate, o_totalprice,
       FIRST_VALUE(o_totalprice) OVER w AS first_price,
       LAST_VALUE(o_totalprice) OVER w AS last_price
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus
             ORDER BY o_orderdate NULLS LAST, o_orderkey NULLS LAST
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    tags=("window",),
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last over the full partition (explicit unbounded frame — the
    default frame stops at CURRENT ROW, a classic silent-wrong-answer).
    NULL ordering pinned NULLS LAST both sides: with Spark's ascending
    NULLS FIRST default a NULL-date row becomes first_value while DuckDB
    makes it last_value (caught by the randomized orders differential)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy(F.asc_nulls_last("o_orderdate"), F.asc_nulls_last("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderdate",
        "o_totalprice",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
    )


@query(
    "q_topk_per_group",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
  FROM orders
) WHERE rn <= 3
""",
    bench=True,
    tags=("window",),
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group — rank window + filter. Spark pushes a per-partition
    top-k (WindowGroupLimit) below the shuffle, so only k rows per group
    move — the scalable top-k idiom."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_gaps_islands",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
isl AS (
  SELECT user_id, day,
         day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS INT) AS island
  FROM days
),
streaks AS (
  SELECT user_id, island, COUNT(*) AS len, MIN(day) AS start_day
  FROM isl GROUP BY user_id, island
)
SELECT user_id,
       CAST(SUM(len) AS BIGINT) AS n_active_days,
       COUNT(*) AS n_streaks,
       CAST(MAX(len) AS BIGINT) AS max_streak,
       CAST(MIN(CASE WHEN len = mx THEN start_day END) AS TIMESTAMP) AS max_streak_start
FROM (SELECT *, MAX(len) OVER (PARTITION BY user_id) AS mx FROM streaks) s
GROUP BY user_id
""",
    tags=("window", "timeseries"),
)
def q_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user consecutive-active-day streaks via the
    classic day-minus-row_number island key (consecutive days share one
    constant), then per-island lengths and the longest streak (earliest
    start breaks ties). The idiom turns sequence detection — seemingly
    iterative — into two shuffles: one window over (user, day) and one
    group-by, both on the same key, so at 100 TB the exchange is reused
    and nothing is quadratic or stateful."""
    e = load_table(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = days.withColumn(
        "island", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    streaks = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len"), F.min("day").alias("start_day")
    )
    mx = F.max("len").over(Window.partitionBy("user_id"))
    return (
        streaks.withColumn("mx", mx)
        .groupBy("user_id")
        .agg(
            F.sum("len").cast("bigint").alias("n_active_days"),
            F.count(F.lit(1)).alias("n_streaks"),
            F.max("len").cast("bigint").alias("max_streak"),
            # TIMESTAMP (not DATE) output: both engines' pandas frames then
            # carry identical datetime64 cells with no canonicalization step
            F.min(F.when(F.col("len") == F.col("mx"), F.col("start_day")))
            .cast("timestamp")
            .alias("max_streak_start"),
        )
    )
