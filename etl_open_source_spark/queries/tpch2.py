"""TPC-H Q2/Q9/Q11/Q16/Q20 adapted to the fixture schema.

The originals all need `partsupp`, which the fixtures omit; each query here
keeps the original's SHAPE (the part↔supplier relationship, nested/scalar
subqueries, argmin-per-group, NOT-IN exclusion) but derives the
part↔supplier facts from `lineitem` — the observed supply relation.
Adaptations are noted per query. Like queries/tpch.py, these exercise
multi-join + subquery + agg pipelines the reference would have pushed to the
source DBMS whole (core/extractors/sqlserver.py:46-55).

All double aggregates go through DECIMAL(18,4)/(12,2) (functions/numeric.py)
so min/threshold comparisons can't flip between Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from etl_open_source_spark.catalog import load_tables
from etl_open_source_spark.functions.numeric import (
    SQL_ONE,
    dec,
    money,
    one,
    rate,
    sql_money,
    sql_rate,
)
from etl_open_source_spark.registry import query


@query(
    "q_tpch_q2",
    oracle="""
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
           / CAST(NULLIF(SUM(CAST(l_quantity AS DECIMAL(18,4))), 0) AS DOUBLE) AS unit_cost
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
),
eligible AS (
  SELECT c.*, s.s_acctbal, s.s_name, n.n_name
  FROM cost c
  JOIN supplier s ON s.s_suppkey = c.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'ASIA'
)
SELECT e.s_acctbal, e.s_name, e.n_name,
       p.p_partkey, p.p_name, e.unit_cost
FROM eligible e
JOIN part p ON p.p_partkey = e.l_partkey
WHERE p.p_type = 'ECONOMY' AND p.p_size < 20
  AND e.unit_cost = (
    SELECT MIN(e2.unit_cost) FROM eligible e2 WHERE e2.l_partkey = e.l_partkey
  )
ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
LIMIT 100
""",
    tags=("tpch",),
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 (minimum-cost supplier): partsupp.ps_supplycost is adapted to the
    observed unit price SUM(extendedprice)/SUM(quantity) per (part,
    supplier) from lineitem; region filter and argmin-per-part correlated
    subquery keep the original shape. The correlated MIN decorrelates to a
    per-part aggregate joined back on (partkey, cost-equality) — both sides
    of the equality are the same decimal-sum division, so the argmin can't
    flip. Dims broadcast; the only big shuffle is the (part,supp) agg."""
    l, p, s, n, r = load_tables(
        spark, sf_dir, "lineitem", "part", "supplier", "nation", "region"
    )
    # try_divide + oracle NULLIF: a (part, supplier) whose quantities sum
    # to exactly 0 has no unit cost — NULL in both engines (Spark ANSI
    # would hard-error, DuckDB would emit NaN/Inf). NULL-cost rows then
    # drop from the argmin equality identically on both sides (MIN skips
    # NULLs; NULL = NULL never matches) — randomized-TPC-H pin.
    cost = l.groupBy("l_partkey", "l_suppkey").agg(
        F.try_divide(
            F.sum(money("l_extendedprice")).cast("double"),
            F.sum(dec("l_quantity")).cast("double"),
        ).alias("unit_cost")
    )
    dims = (
        s.join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r.filter(F.col("r_name") == "ASIA")), n.n_regionkey == F.col("r_regionkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    eligible = cost.join(broadcast(dims), cost.l_suppkey == dims.s_suppkey)
    min_cost = eligible.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    psel = p.filter((F.col("p_type") == "ECONOMY") & (F.col("p_size") < 20)).select(
        "p_partkey", "p_name"
    )
    return (
        eligible.join(
            min_cost,
            (eligible.l_partkey == min_cost.mk) & (eligible.unit_cost == min_cost.min_cost),
        )
        .join(broadcast(psel), eligible.l_partkey == psel.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q_tpch_q9",
    oracle=f"""
SELECT n.n_name AS nation,
       CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
       CAST(SUM({sql_money('l.l_extendedprice')} * ({SQL_ONE} - {sql_rate('l.l_discount')})
                - {sql_money('p.p_retailprice')} * {sql_money('l.l_quantity')} * CAST(0.05 AS DECIMAL(3,2))
           ) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%gear%'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY n.n_name, CAST(YEAR(o.o_orderdate) AS INT)
ORDER BY nation, o_year DESC
""",
    tags=("tpch",),
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 (product-type profit by nation and year): ps_supplycost is adapted
    to a 5%-of-retail-price unit cost (p_retailprice × quantity × 0.05, all
    in narrow decimals so neither engine truncates scale). Five-way join
    with three broadcast dims, one fact shuffle for the group-by."""
    l, o, p, s, n = load_tables(spark, sf_dir, "lineitem", "orders", "part", "supplier", "nation")
    profit = money("l_extendedprice") * (one() - rate("l_discount")) - money(
        "p_retailprice"
    ) * money("l_quantity") * F.lit(0.05).cast("decimal(3,2)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(p.filter(F.col("p_name").like("%gear%"))), l.l_partkey == F.col("p_partkey"))
        .join(broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "q_tpch_q11",
    oracle="""
WITH val AS (
  SELECT l.l_partkey,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
  GROUP BY l.l_partkey
)
SELECT l_partkey, value
FROM val
WHERE value > (SELECT CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) FROM val) * 0.01
ORDER BY value DESC, l_partkey
""",
    tags=("tpch",),
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 (important stock): ps_availqty·ps_supplycost is adapted to the
    shipped extended-price volume per part from EUROPE-region suppliers; the
    HAVING-fraction-of-grand-total scalar subquery is kept. The grand total
    is a broadcast single-row cross join, so the fact is scanned once and
    shuffled once (per-part agg); both engines compute the same decimal sums
    so the > threshold comparison is exact."""
    l, s, n, r = load_tables(spark, sf_dir, "lineitem", "supplier", "nation", "region")
    dims = (
        s.join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r.filter(F.col("r_name") == "EUROPE")), n.n_regionkey == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    val = (
        l.join(broadcast(dims), l.l_suppkey == dims.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(money("l_extendedprice")).cast("double").alias("value"))
    )
    total = val.agg((F.sum(dec("value")).cast("double") * F.lit(0.01)).alias("thr"))
    return (
        val.join(broadcast(total))
        .filter(F.col("value") > F.col("thr"))
        .select("l_partkey", "value")
        .orderBy(F.col("value").desc(), "l_partkey")
    )


@query(
    "q_tpch_q16",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#5'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 7, 10, 15, 23, 45, 49)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
""",
    tags=("tpch",),
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 (supplier count by part attributes): partsupp is adapted to the
    observed lineitem supply relation; the "customer complaints" NOT IN
    exclusion becomes negative-balance suppliers. s_suppkey is non-null on
    both sides so NOT IN is a plain broadcast anti-join, not the
    three-valued null-aware variant."""
    l, p, s = load_tables(spark, sf_dir, "lineitem", "part", "supplier")
    psel = p.filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 15, 23, 45, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = s.filter(F.col("s_acctbal") < 0).select(F.col("s_suppkey").alias("l_suppkey"))
    return (
        l.join(broadcast(psel), l.l_partkey == psel.p_partkey)
        .join(broadcast(bad), "l_suppkey", "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q_tpch_q20",
    oracle="""
WITH sup AS (
  SELECT l_suppkey, l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS q_sup
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
),
tot AS (
  SELECT l_partkey, CAST(SUM(CAST(q_sup AS DECIMAL(18,4))) AS DOUBLE) AS q_all
  FROM sup GROUP BY l_partkey
)
SELECT s.s_name, s.s_acctbal
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT sup.l_suppkey
  FROM sup
  JOIN tot ON tot.l_partkey = sup.l_partkey
  WHERE sup.q_sup > tot.q_all * 0.3
    AND sup.l_partkey IN (
      SELECT p_partkey FROM part WHERE p_name LIKE 'red %'
    )
)
ORDER BY s.s_name
""",
    tags=("tpch",),
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 (excess-supply suppliers): ps_availqty > 0.5·shipped is adapted
    to "supplied >30% of a red-part's 1997 volume". The nested IN
    subqueries become semi-joins: part-name filter broadcast into the
    per-(supp,part) agg, share threshold via a per-part re-agg of the same
    result (no second fact scan), final left-semi against supplier."""
    l, p, s = load_tables(spark, sf_dir, "lineitem", "part", "supplier")
    red = p.filter(F.col("p_name").like("red %")).select("p_partkey")
    sup = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("q_sup"))
    )
    tot = sup.groupBy(F.col("l_partkey").alias("tk")).agg(
        F.sum(dec("q_sup")).cast("double").alias("q_all")
    )
    excess = (
        sup.join(broadcast(red), sup.l_partkey == red.p_partkey)
        .join(tot, sup.l_partkey == tot.tk)
        .filter(F.col("q_sup") > F.col("q_all") * F.lit(0.3))
        .select("l_suppkey")
    )
    return (
        s.join(excess, s.s_suppkey == excess.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
