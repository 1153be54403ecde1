"""TPC-H-shaped composite queries, adapted to the fixture columns
(FIXTURES.md; the fixtures omit some TPC-H columns — l_shipmode,
l_commitdate, o_comment — so Q12/Q19-style predicates are adapted).

These exercise the operator families TOGETHER — multi-join + agg + sort +
filter pipelines — the shapes the reference would have pushed to a source
DBMS whole (core/extractors/sqlserver.py:46-55).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from etl_open_source_spark.catalog import load_tables
from etl_open_source_spark.functions.numeric import SQL_ONE, money, one, rate, sql_money, sql_rate
from etl_open_source_spark.registry import query

_REV_SQL = f"SUM({sql_money('l_extendedprice')} * ({SQL_ONE} - {sql_rate('l_discount')}))"


def _rev():
    return F.sum(money("l_extendedprice") * (one() - rate("l_discount")))


@query(
    "q_tpch_q3",
    oracle=f"""
SELECT l.l_orderkey,
       CAST({_REV_SQL} AS DOUBLE) AS revenue,
       o.o_orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
LIMIT 10
""",
    bench=True,
    tags=("tpch",),
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 (shipping priority): 3-way join, grouped revenue, top-10."""
    c, o, l = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, c.c_custkey == o.o_custkey)
        .filter(F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp"))
        .join(l, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_rev().cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q_tpch_q5",
    oracle=f"""
SELECT n.n_name,
       CAST({_REV_SQL} AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
ORDER BY revenue DESC, n.n_name
""",
    tags=("tpch",),
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 (local supplier volume): 6-way star join with broadcast dims."""
    c, o, l, s, n, r = load_tables(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(
            broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r.filter(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_rev().cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "q_tpch_q6",
    oracle=f"""
SELECT CAST(SUM({sql_money('l_extendedprice')} * {sql_rate('l_discount')}) AS DOUBLE) AS revenue,
       COUNT(*) AS cnt
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    tags=("tpch",),
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 (forecasting revenue change): pure scan-filter-aggregate — every
    predicate pushes into the parquet scan."""
    (l,) = load_tables(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(money("l_extendedprice") * rate("l_discount")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@query(
    "q_tpch_q10",
    oracle=f"""
SELECT c.c_custkey, c.c_name,
       CAST({_REV_SQL} AS DOUBLE) AS revenue,
       c.c_acctbal, n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
    tags=("tpch",),
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 (returned-item reporting): join + group + top-20."""
    c, o, l, n = load_tables(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(l.filter(F.col("l_returnflag") == "R"), l.l_orderkey == o.o_orderkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_rev().cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q_tpch_q14",
    oracle=f"""
SELECT CAST(
         100.00 * CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
               THEN {sql_money('l.l_extendedprice')} * ({SQL_ONE} - {sql_rate('l.l_discount')})
               ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
         / CAST(SUM({sql_money('l.l_extendedprice')} * ({SQL_ONE} - {sql_rate('l.l_discount')})) AS DOUBLE)
       AS DOUBLE) AS promo_revenue_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-06-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1996-07-01 00:00:00'
""",
    tags=("tpch",),
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 (promotion effect): conditional aggregation over a join."""
    l, p = load_tables(spark, sf_dir, "lineitem", "part")
    net = money("l_extendedprice") * (one() - rate("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), net).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-06-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
        )
        .join(broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (F.lit(100.0) * F.sum(promo).cast("double") / F.sum(net).cast("double")).alias(
                "promo_revenue_pct"
            )
        )
    )
