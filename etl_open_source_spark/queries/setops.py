"""Sorts, limits, set operations (SURVEY.md §2.C "Sorts / limits / set ops")."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_open_source_spark.catalog import load_table
from etl_open_source_spark.registry import query


@query(
    "q_sort_multi",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders
ORDER BY o_orderstatus ASC, o_totalprice DESC NULLS LAST, o_orderkey
""",
    tags=("sort",),
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null ordering. At scale this is a
    range-partitioned sort (sampled boundaries), not a single-node sort."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_orderstatus", "o_totalprice").orderBy(
        F.col("o_orderstatus").asc(),
        F.col("o_totalprice").desc_nulls_last(),
        F.col("o_orderkey").asc(),
    )


@query(
    "q_limit",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
    tags=("sort",),
)
def q_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic LIMIT (ordered, with a tiebreak key) — Spark plans
    TakeOrderedAndProject: per-partition top-N, then a constant-size merge;
    no global sort materialized."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


@query(
    "q_union_all",
    oracle="""
SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
UNION ALL
SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 5000
""",
    tags=("setop",),
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union — a zero-shuffle concatenation of partitions."""
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_mktsegment")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey", "c_mktsegment")
    return a.unionByName(b)


@query(
    "q_union_distinct",
    oracle="""
SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 5000
""",
    tags=("setop",),
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union — union + distinct (one hash-aggregate shuffle)."""
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_mktsegment")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey", "c_mktsegment")
    return a.unionByName(b).distinct()


@query(
    "q_intersect",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
""",
    tags=("setop",),
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics) — customers with both F and O orders."""
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(op)


@query(
    "q_except",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
""",
    tags=("setop",),
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics) — customers with F orders but no O orders."""
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.subtract(op)


@query(
    "q_intersect_all",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT ALL
SELECT s_nationkey FROM supplier
""",
    tags=("setop",),
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset intersection (min of per-side
    multiplicities), vs q_intersect's set semantics. Implemented by
    Spark as one aggregated count-min per key — a single shuffle, no
    row-pairing join."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersectAll(s)


@query(
    "q_except_all",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT ALL
SELECT s_nationkey FROM supplier
""",
    tags=("setop",),
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference (left multiplicity minus right
    multiplicity, floor 0). Same single-shuffle aggregated-count shape."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.exceptAll(s)


@query(
    "q_union_by_name",
    oracle="""
SELECT o_orderkey AS id, o_orderstatus AS status, o_totalprice AS price, NULL AS seg
FROM orders WHERE o_orderkey % 2 = 0
UNION ALL
SELECT c_custkey, NULL, NULL, c_mktsegment
FROM customer WHERE c_custkey % 2 = 1
""",
    tags=("setop",),
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two frames with DIFFERENT column sets
    combine by NAME with missing columns null-filled
    (unionByName(allowMissingColumns=True)) — the append path when a
    table grows columns over time. Positional UNION would silently
    misalign; by-name is the only safe semantics for evolving 100 TB
    datasets."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("id"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 2 == 1).select(
        F.col("c_custkey").alias("id"),
        F.col("c_mktsegment").alias("seg"),
    )
    return o.unionByName(c, allowMissingColumns=True).select(
        "id", "status", "price", F.col("seg").cast("string").alias("seg")
    )
