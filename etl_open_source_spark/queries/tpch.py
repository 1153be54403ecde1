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
         / CAST(NULLIF(SUM({sql_money('l.l_extendedprice')} * ({SQL_ONE} - {sql_rate('l.l_discount')})), 0) AS DOUBLE)
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
            # try_divide + oracle NULLIF: a month whose net revenue sums to
            # exactly 0 must yield NULL in both engines (Spark ANSI would
            # hard-error, DuckDB would emit NaN/Inf) — randomized-TPC-H catch.
            # The ×100 stays INSIDE the numerator: (100·promo)/net is one
            # op order, 100·(promo/net) another — they differ in the last
            # ulp and the oracle computes the former.
            F.try_divide(
                F.lit(100.0) * F.sum(promo).cast("double"),
                F.sum(net).cast("double"),
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q_tpch_q4",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("tpch",),
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 (order priority checking), adapted: correlated EXISTS with an
    inequality on the outer row (l_shipdate > o_orderdate) — Catalyst
    decorrelates it into a left-semi join; fixtures lack l_commitdate so
    the late-ship predicate stands in."""
    o, l = load_tables(spark, sf_dir, "orders", "lineitem")
    window = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    cond = (l.l_orderkey == window.o_orderkey) & (l.l_shipdate > window.o_orderdate)
    return (
        window.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q_tpch_q7",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         CAST(YEAR(l.l_shipdate) AS BIGINT) AS l_year,
         {sql_money('l.l_extendedprice')} * ({SQL_ONE} - {sql_rate('l.l_discount')}) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    tags=("tpch",),
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 (volume shipping): revenue flows between two nations by year —
    the same dimension table joined twice under different roles (fixture
    nation names are NATION_<k>)."""
    c, o, l, s, n = load_tables(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation"
    )
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        s.join(l, s.s_suppkey == l.l_suppkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("bigint"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_rev().cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q_tpch_q13",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    tags=("tpch",),
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 (customer distribution): double aggregation over a left join —
    COUNT of a nullable column (unmatched customers count 0)."""
    c, o = load_tables(spark, sf_dir, "customer", "orders")
    filtered = o.filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(filtered, c.c_custkey == filtered.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q_tpch_q18",
    oracle="""
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 150
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
LIMIT 100
""",
    tags=("tpch",),
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 (large-volume customers): IN-subquery over an aggregate —
    planned as a semi join against the pre-aggregated key set."""
    c, o, l = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    big_orders = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(big_orders.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
        .limit(100)
    )


@query(
    "q_tpch_q8",
    oracle=f"""
SELECT o_year,
       CAST(SUM(CASE WHEN nation = 'NATION_1' THEN volume
                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
       / CAST(NULLIF(SUM(volume), 0) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
         {sql_money('l.l_extendedprice')} * ({SQL_ONE} - {sql_rate('l.l_discount')}) AS volume,
         n2.n_name AS nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'AMERICA'
    AND p.p_type = 'ECONOMY'
    AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
) all_nations
GROUP BY o_year
ORDER BY o_year
""",
    tags=("tpch",),
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 (national market share), adapted to fixture domains (p_type is a
    single word; nations are NATION_<k>): NATION_1's share of ECONOMY-part
    revenue sold into AMERICA, by order year. The share division is one
    IEEE-754 op over two exact decimal sums, so it matches DuckDB bit-for-bit."""
    c, o, l, s, n, r, p = load_tables(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region", "part"
    )
    amer_keys = (
        n.join(broadcast(r.filter(F.col("r_name") == "AMERICA")), n.n_regionkey == r.r_regionkey)
        .select(F.col("n_nationkey").alias("cust_nkey"))
    )
    n2 = n.select(F.col("n_nationkey").alias("supp_nkey"), F.col("n_name").alias("nation"))
    vol = money("l_extendedprice") * (one() - rate("l_discount"))
    return (
        l.join(
            broadcast(p.filter(F.col("p_type") == "ECONOMY").select("p_partkey")),
            l.l_partkey == F.col("p_partkey"),
        )
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            ),
            l.l_orderkey == o.o_orderkey,
        )
        .join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(amer_keys), c.c_nationkey == F.col("cust_nkey"))
        .join(broadcast(s.select("s_suppkey", "s_nationkey")), l.l_suppkey == F.col("s_suppkey"))
        .join(broadcast(n2), F.col("s_nationkey") == F.col("supp_nkey"))
        .withColumn("o_year", F.year("o_orderdate").cast("bigint"))
        .withColumn("volume", vol)
        .groupBy("o_year")
        .agg(
            # try_divide + oracle NULLIF: a year whose total volume sums to
            # exactly 0 must yield NULL share in both engines (ANSI vs
            # NaN/Inf divergence otherwise) — randomized-TPC-H pin.
            F.try_divide(
                F.sum(
                    F.when(F.col("nation") == "NATION_1", F.col("volume")).otherwise(
                        F.lit(0).cast("decimal(12,2)")
                    )
                ).cast("double"),
                F.sum("volume").cast("double"),
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q_tpch_q12",
    oracle="""
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
GROUP BY l.l_linestatus
ORDER BY l.l_linestatus
""",
    tags=("tpch",),
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 (shipping modes / priority), adapted: fixtures lack l_shipmode /
    l_commitdate / l_receiptdate, so "late" means shipped >45 days after the
    order date and the grouping key is l_linestatus. Keeps Q12's shape:
    join + residual date inequality + pivot-style conditional counts."""
    o, l = load_tables(spark, sf_dir, "orders", "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(
            l.filter(
                (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
                & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            ),
            o.o_orderkey == l.l_orderkey,
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q_tpch_q15",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey,
         SUM({sql_money('l_extendedprice')} * ({SQL_ONE} - {sql_rate('l_discount')})) AS rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.rev_dec AS DOUBLE) AS total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.l_suppkey
WHERE r.rev_dec = (SELECT MAX(rev_dec) FROM revenue)
ORDER BY s.s_suppkey
""",
    tags=("tpch",),
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 (top supplier): aggregate-then-argmax. The max-revenue comparison
    happens in exact decimal, so Spark and DuckDB agree on the winner even
    when several suppliers are within an ulp in double."""
    l, s = load_tables(spark, sf_dir, "lineitem", "supplier")
    rev = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(money("l_extendedprice") * (one() - rate("l_discount"))).alias("rev_dec"))
    )
    mx = rev.agg(F.max("rev_dec").alias("mx"))
    return (
        s.join(rev, s.s_suppkey == rev.l_suppkey)
        .join(broadcast(mx), F.col("rev_dec") == F.col("mx"))
        .select("s_suppkey", "s_name", F.col("rev_dec").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@query(
    "q_tpch_q17",
    oracle="""
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND p.p_size < 15
  AND l.l_quantity < (
    SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l2.l_quantity))
    FROM lineitem l2
    WHERE l2.l_partkey = p.p_partkey
  )
""",
    tags=("tpch",),
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 (small-quantity-order revenue), adapted (p_size stands in for the
    absent p_container). The correlated AVG subquery becomes a per-partkey
    aggregate joined back — Catalyst's own decorrelation strategy — and the
    0.2*avg threshold is the same decimal-sum/count expression on both sides
    so the `<` comparison can't flip."""
    l, p = load_tables(spark, sf_dir, "lineitem", "part")
    sel = p.filter((F.col("p_brand") == "Brand#23") & (F.col("p_size") < 15)).select("p_partkey")
    li = l.join(broadcast(sel), l.l_partkey == F.col("p_partkey"))
    thr = li.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double") / F.count("l_quantity"))
        ).alias("qty_thr")
    )
    return (
        li.drop("p_partkey")
        .join(thr, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@query(
    "q_tpch_q19",
    oracle=f"""
SELECT CAST(SUM({sql_money('l.l_extendedprice')} * ({SQL_ONE} - {sql_rate('l.l_discount')})) AS DOUBLE) AS revenue,
       COUNT(*) AS cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#3'  AND p.p_size BETWEEN 1  AND 15 AND l.l_quantity BETWEEN 1  AND 11)
   OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 10 AND 25 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity BETWEEN 20 AND 30)
""",
    tags=("tpch",),
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 (discounted revenue under disjunctive predicates), adapted to the
    fixture's brand/size domains (no p_container / l_shipmode). The OR of
    brand+size+quantity triples exercises join + residual disjunction —
    Catalyst extracts the common p_brand IN (...) prefilter for the scan."""
    l, p = load_tables(spark, sf_dir, "lineitem", "part")
    j = l.join(broadcast(p.select("p_partkey", "p_brand", "p_size")), l.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#14") & F.col("p_size").between(10, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#22") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 30))
    )
    return j.filter(cond).agg(
        F.sum(money("l_extendedprice") * (one() - rate("l_discount"))).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("cnt"),
    )


@query(
    "q_tpch_q21",
    oracle="""
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_3'
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 100
""",
    tags=("tpch",),
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 (suppliers who kept orders waiting), adapted: "late" is shipped
    >90 days after the order date (fixtures lack commit/receipt dates).
    EXISTS → left-semi join, NOT EXISTS → left-anti join, both with a
    non-equi residual on supplier inequality; the late-ship comparison for
    sibling lineitems reuses the outer row's o_orderdate (same order, so
    identical) instead of joining orders twice."""
    l, o, s, n = load_tables(spark, sf_dir, "lineitem", "orders", "supplier", "nation")
    late_cut = F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    s_n3 = (
        s.join(broadcast(n.filter(F.col("n_name") == "NATION_3")), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name")
    )
    cand = (
        l.join(
            o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate"),
            l.l_orderkey == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") > late_cut)
        .join(broadcast(s_n3), l.l_suppkey == F.col("s_suppkey"))
        .select("l_orderkey", "l_suppkey", "o_orderdate", "s_name")
    )
    l2 = l.select(F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2"))
    l3 = l.select(
        F.col("l_orderkey").alias("ok3"),
        F.col("l_suppkey").alias("sk3"),
        F.col("l_shipdate").alias("ship3"),
    )
    waiting = (
        cand.join(l2, (cand.l_orderkey == l2.ok2) & (cand.l_suppkey != l2.sk2), "left_semi")
        .join(
            l3,
            (F.col("l_orderkey") == l3.ok3)
            & (F.col("l_suppkey") != l3.sk3)
            & (l3.ship3 > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
            "left_anti",
        )
    )
    return (
        waiting.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@query(
    "q_tpch_q22",
    oracle="""
SELECT n.n_name AS cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(CASE WHEN ISFINITE(c.c_acctbal) THEN c.c_acctbal END AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE n.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4','NATION_5','NATION_6','NATION_7')
  AND c.c_acctbal > (
    SELECT CAST(SUM(CAST(CASE WHEN ISFINITE(c2.c_acctbal) THEN c2.c_acctbal END AS DECIMAL(18,4))) AS DOUBLE) / COUNT(c2.c_acctbal)
    FROM customer c2
    JOIN nation n2 ON c2.c_nationkey = n2.n_nationkey
    WHERE c2.c_acctbal > 0.0
      AND n2.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4','NATION_5','NATION_6','NATION_7')
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
  )
GROUP BY cntrycode
ORDER BY cntrycode
""",
    tags=("tpch",),
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 (global sales opportunity), adapted: country code is the nation
    name (fixtures lack c_phone), and "never ordered" becomes "no order since
    1999-01-01" (every fixture customer has at least one order). Scalar AVG
    subquery → broadcast 1-row cross join; NOT EXISTS → left-anti join."""
    c, n, o = load_tables(spark, sf_dir, "customer", "nation", "orders")
    sel = ["NATION_1", "NATION_2", "NATION_3", "NATION_4", "NATION_5", "NATION_6", "NATION_7"]
    cn = c.join(broadcast(n.filter(F.col("n_name").isin(sel))), c.c_nationkey == n.n_nationkey)
    avg_df = cn.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double") / F.count("c_acctbal")
        ).alias("avg_bal")
    )
    recent = (
        o.filter(F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cn.join(broadcast(avg_df))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cn.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("n_name").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
