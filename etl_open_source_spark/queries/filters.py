"""Projection & filter operators (SURVEY.md §2.C).

The reference's declared-but-stubbed "Filtre, map, merge" pandas transformer
(structure.txt:24, core/transformers/pandas_transformer.py 0-byte) and the
field-mapping service (services/mapping_service.py 0-byte) — re-expressed as
DataFrame projections/filters. Every predicate here is a Catalyst expression,
so it is pushed into the parquet scan (PushedFilters) and never touches
Python row-by-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_open_source_spark.catalog import load_table
from etl_open_source_spark.functions.numeric import money, one, rate
from etl_open_source_spark.registry import query


@query(
    "q_project_select",
    oracle="SELECT c_custkey, c_name, c_mktsegment FROM customer",
    tags=("project",),
)
def q_project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-subset projection (column pruning reaches the scan)."""
    return load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")


@query(
    "q_project_rename",
    oracle="""
SELECT c_custkey AS customer_id, c_name AS customer_name,
       c_mktsegment AS segment, c_acctbal AS balance
FROM customer
""",
    tags=("project",),
)
def q_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rename/alias mapping — the field-mapping-service analog
    (reference services/mapping_service.py, 0-byte stub)."""
    mapping = {
        "c_custkey": "customer_id",
        "c_name": "customer_name",
        "c_mktsegment": "segment",
        "c_acctbal": "balance",
    }
    c = load_table(spark, sf_dir, "customer")
    return c.select(*[F.col(src).alias(dst) for src, dst in mapping.items()])


@query(
    "q_project_computed",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS net_price,
       CAST(l_quantity * 2 AS DOUBLE) AS double_qty
FROM lineitem
""",
    tags=("project",),
)
def q_project_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived-column arithmetic, computed inside whole-stage codegen."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        (money("l_extendedprice") * (one() - rate("l_discount"))).cast("double").alias("net_price"),
        (F.col("l_quantity") * 2).cast("double").alias("double_qty"),
    )


@query(
    "q_filter_compare",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE l_quantity > 45
""",
    tags=("filter",),
)
def q_filter_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison predicate — pushed to the parquet reader (PushedFilters)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_linenumber", "l_quantity")


@query(
    "q_filter_compound",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
WHERE (o_orderstatus = 'F' AND o_totalprice > 200000)
   OR (NOT o_orderpriority = '1-URGENT' AND o_totalprice < 50000)
""",
    tags=("filter",),
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND / OR / NOT composition."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 200000))
        | (~(F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") < 50000))
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "q_filter_in",
    oracle="""
SELECT o_orderkey, o_orderpriority
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
""",
    tags=("filter",),
)
def q_filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list membership filter — pushes to the scan as an In predicate
    (PushedFilters), zero shuffles."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW")).select(
        "o_orderkey", "o_orderpriority"
    )


@query(
    "q_filter_like",
    oracle="""
SELECT p_partkey, p_name, p_type
FROM part
WHERE p_name LIKE '%an%' OR REGEXP_MATCHES(p_type, '^PROMO')
""",
    tags=("filter",),
)
def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE and regexp predicates."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_name").like("%an%") | F.col("p_type").rlike("^PROMO")).select(
        "p_partkey", "p_name", "p_type"
    )


@query(
    "q_filter_null",
    oracle="""
SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS status_or_null
FROM orders
WHERE NULLIF(o_orderstatus, 'O') IS NULL
""",
    tags=("filter",),
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL semantics (fixtures have no physical NULLs, so NULLIF
    manufactures them — exercises three-valued logic for real)."""
    o = load_table(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select("o_orderkey", status_or_null.alias("status_or_null")).filter(
        F.col("status_or_null").isNull()
    )


@query(
    "q_filter_between",
    oracle="""
SELECT l_orderkey, l_linenumber, l_shipdate
FROM lineitem
WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 23:59:59'
""",
    tags=("filter",),
)
def q_filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicate (BETWEEN) — inclusive bounds push to the parquet
    scan as paired comparisons; scan-local."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
            F.lit("1996-12-31 23:59:59").cast("timestamp"),
        )
    ).select("l_orderkey", "l_linenumber", "l_shipdate")
