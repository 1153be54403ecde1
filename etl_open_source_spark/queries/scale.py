"""Scale-pattern queries: skew-salted operators whose RESULTS are
identical to their naive forms (oracle-verified) while their shuffle
distribution is built for pathological key skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_open_source_spark.catalog import load_table
from etl_open_source_spark.operators.skew import salted_count_sum, salted_join
from etl_open_source_spark.registry import query


@query(
    "q_agg_salted",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("scale", "agg"),
)
def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (operators/skew.py): the 3 hot
    l_returnflag keys spread over (key, salt) partials before combining —
    the rewrite for keys too hot even for AQE. Oracle = the plain GROUP BY:
    salting must be value-invisible (decimal path keeps it bit-exact)."""
    l = load_table(spark, sf_dir, "lineitem")
    return salted_count_sum(l, "l_returnflag", "l_quantity", n_salts=8).orderBy(
        "l_returnflag"
    )


@query(
    "q_join_skew_salted",
    oracle="""
SELECT s.s_nationkey,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_nationkey
""",
    tags=("scale", "join"),
)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join (operators/skew.py salted_join): the small side is
    replicated once per salt, the big side's keys get a content-derived
    salt, and the join runs on (key, salt) — a pathological hot supplier
    key spreads over 8 reducers instead of one. Oracle = the plain join:
    the rewrite must be value-invisible.

    At 100 TB this is the rewrite for keys AQE's skew splitting cannot fix
    (a single key at 30% of the table); the replication factor bounds the
    small-side blowup at n_salts x |small|."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    big = l.select(F.col("l_suppkey").alias("suppkey"), "l_extendedprice")
    small = s.select(F.col("s_suppkey").alias("suppkey"), "s_nationkey")
    joined = salted_join(big, small, "suppkey", n_salts=8)
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("total"),
    )
