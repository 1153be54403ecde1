"""Reshape + analytic coverage batch: unpivot (wide→long), fixed-bin
histograms, FILTER-style conditional aggregation, engine-exact mode/median,
cume_dist/nth_value windows.

All exact-oracle. Mode and median are computed with deterministic
tie-breaking (window row_number) rather than the engines' built-in
``mode``/``median`` — built-ins interpolate or break ties differently
across engines, which would poison the hash gate; the window formulation is
bit-identical everywhere and is also the shape that scales (one shuffle per
grouping, no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_open_source_spark.catalog import load_table
from etl_open_source_spark.functions.numeric import dec
from etl_open_source_spark.registry import query


@query(
    "q_unpivot",
    oracle="""
SELECT measure, COUNT(*) AS cnt,
       CAST(SUM(CAST(val AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM (
  SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
)
GROUP BY measure
""",
    tags=("reshape",),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot of the four lineitem measures, then a per-measure
    profile. ``DataFrame.unpivot`` expands rows inside the scan stage (an
    Expand node — no join, no shuffle to build the long form); the single
    shuffle is the 4-group aggregation with map-side partials."""
    l = load_table(spark, sf_dir, "lineitem")
    long = l.unpivot(
        ["l_orderkey"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "val",
    )
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(dec("val")).cast("double").alias("total"),
    )


@query(
    "q_histogram",
    oracle="""
SELECT CAST(LEAST(FLOOR(l_extendedprice / 5000), 19) AS INT) AS bin_id,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM lineitem
GROUP BY 1
""",
    tags=("reshape", "agg"),
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of extended price: 20 bins of 5000 with an
    overflow bin. Static bin edges mean one pass, one 20-group shuffle —
    the two-pass (min/max then bin) variant is deliberately avoided; at
    100 TB a histogram with data-derived bounds costs a full extra scan."""
    l = load_table(spark, sf_dir, "lineitem")
    bin_id = F.least(F.floor(F.col("l_extendedprice") / 5000), F.lit(19)).cast(
        "int"
    )
    return (
        l.select(bin_id.alias("bin_id"), "l_extendedprice")
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(dec("l_extendedprice")).cast("double").alias("total"),
        )
    )


@query(
    "q_agg_filtered",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS cnt,
       COUNT(*) FILTER (WHERE o_totalprice > 150000) AS hi_cnt,
       CAST(COALESCE(SUM(CAST(CASE WHEN ISFINITE(o_totalprice) THEN o_totalprice END AS DECIMAL(18,4)))
                     FILTER (WHERE o_totalprice > 150000),
                     0) AS DOUBLE) AS hi_total,
       BOOL_OR(o_orderstatus = 'O') AS any_open,
       BOOL_AND(o_totalprice > 0) AS all_pos
FROM orders
GROUP BY o_orderpriority
""",
    tags=("agg",),
)
def q_agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: count_if / filtered sum / bool_or /
    bool_and in one grouped pass (the SQL FILTER-clause surface). All
    branches fold into a single hash aggregate — one shuffle, map-side
    partials; the filter never forces a second scan."""
    o = load_table(spark, sf_dir, "orders")
    hi = F.col("o_totalprice") > 150000
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count_if(hi).alias("hi_cnt"),
        F.coalesce(F.sum(F.when(hi, dec("o_totalprice"))), F.lit(0).cast("decimal(18,4)"))
        .cast("double")
        .alias("hi_total"),
        F.bool_or(F.col("o_orderstatus") == "O").alias("any_open"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_pos"),
    )


@query(
    "q_agg_mode_median",
    oracle="""
WITH seg AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS cnt
  FROM customer WHERE c_mktsegment IS NOT NULL GROUP BY 1, 2
),
m AS (
  SELECT c_nationkey, c_mktsegment AS mode_segment
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                     ORDER BY cnt DESC, c_mktsegment) AS rn
        FROM seg)
  WHERE rn = 1
),
med AS (
  SELECT c_nationkey, c_acctbal AS median_bal
  FROM (SELECT c_nationkey, c_acctbal, c_custkey,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal, c_custkey NULLS LAST) AS rn,
               COUNT(*) OVER (PARTITION BY c_nationkey) AS n
        FROM customer WHERE c_acctbal IS NOT NULL)
  WHERE rn = (n + 1) // 2
)
SELECT c_nationkey, mode_segment, median_bal
FROM m JOIN med USING (c_nationkey)
""",
    tags=("agg",),
)
def q_agg_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation mode (most common market segment, ties → smallest
    segment) and low-median account balance (element at position
    ⌊(n+1)/2⌋ — percentile_disc semantics). Deliberately NOT the built-in
    ``mode()``/``median()``: their tie-breaking/interpolation differs
    between engines; this formulation is deterministic and exact in both.

    NULL convention pinned explicitly: NULL segments and NULL balances
    are excluded on BOTH sides, like the built-in ``mode()``/``median()``
    aggregates ignore NULLs — without the filters, GROUP BY keeps a NULL
    segment group (which can win the mode) and the window median counts
    NULL balances in ``n`` (caught by the randomized relational
    differential).

    Scale: mode is two grouped aggregations (the second over the already
    tiny (nation, segment) counts); median is one partitioned window — no
    global sort, no per-group collect."""
    c = load_table(spark, sf_dir, "customer")
    seg = (
        c.filter(F.col("c_mktsegment").isNotNull())
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_mode = Window.partitionBy("c_nationkey").orderBy(
        F.desc("cnt"), "c_mktsegment"
    )
    mode = (
        seg.withColumn("rn", F.row_number().over(w_mode))
        .filter(F.col("rn") == 1)
        .select("c_nationkey", F.col("c_mktsegment").alias("mode_segment"))
    )
    w_med = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    w_cnt = Window.partitionBy("c_nationkey")
    med = (
        c.filter(F.col("c_acctbal").isNotNull())
        .select(
            "c_nationkey",
            "c_acctbal",
            F.row_number().over(w_med).alias("rn"),
            F.count(F.lit(1)).over(w_cnt).alias("n"),
        )
        .filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select("c_nationkey", F.col("c_acctbal").alias("median_bal"))
    )
    return mode.join(med, "c_nationkey")


@query(
    "q_window_cume_dist",
    oracle="""
SELECT c_custkey, c_nationkey, c_acctbal,
       CUME_DIST() OVER w AS cd,
       NTH_VALUE(c_custkey, 2) OVER w AS second_key
FROM customer
WINDOW w AS (PARTITION BY c_nationkey
             ORDER BY c_acctbal NULLS LAST, c_custkey NULLS LAST)
""",
    tags=("window",),
)
def q_window_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist + nth_value over a per-nation balance ordering. The order
    key includes c_custkey so every row is its own peer group — cume_dist
    then equals rank/n in both engines and the default nth_value frame
    (unbounded preceding → current row) reads identically. One partitioned
    sort, no global ordering.

    NULL ordering is pinned explicitly (NULLS LAST both sides): Spark
    defaults ascending NULLS FIRST while DuckDB defaults NULLS LAST, so a
    NULL balance silently shifts every cume_dist/nth_value in the
    partition (caught by the randomized relational differential)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.asc_nulls_last("c_acctbal"), F.asc_nulls_last("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.cume_dist().over(w).alias("cd"),
        F.nth_value("c_custkey", 2).over(w).alias("second_key"),
    )
