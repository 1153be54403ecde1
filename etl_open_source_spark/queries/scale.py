"""Scale-pattern queries: skew-salted operators whose RESULTS are
identical to their naive forms (oracle-verified) while their shuffle
distribution is built for pathological key skew.
"""

from __future__ import annotations

import os

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


_Z_BITS = 10  # 2^10 x 2^10 key space -> 20-bit z-values


def _zorder_sql(xcol: str, ycol: str, bits: int = _Z_BITS) -> str:
    """Bit-interleave expression, identical integer arithmetic in Spark SQL
    and DuckDB (shiftright/shiftleft/&/| on BIGINT)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({xcol} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ycol} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


@query(
    "q_layout_zorder",
    oracle=f"""
WITH z AS (
  SELECT event_id,
         user_id % 1024 AS x,
         event_id % 1024 AS y,
         {_zorder_sql("(user_id % 1024)", "(event_id % 1024)")} AS zval
  FROM events
)
SELECT CAST(zval >> 14 AS BIGINT) AS z_bucket,
       COUNT(*) AS cnt,
       MIN(x) AS min_x, MAX(x) AS max_x,
       MIN(y) AS min_y, MAX(y) AS max_y
FROM z
GROUP BY 1
ORDER BY 1
""",
    tags=("scale", "layout"),
)
def q_layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) data layout: interleave the bits of two clustering
    keys and bucket rows by the high z-bits. Each bucket then covers a
    bounded 2-D tile (here 128x128 out of 1024x1024 — pinned by
    tests/test_plan_shape.py), which is exactly why z-ordering makes
    multi-dimensional predicates prunable: a file written per z-bucket
    carries tight min/max column stats on BOTH keys, so a scan with a
    range filter on either key (or both) skips every non-overlapping
    bucket at the parquet-footer level.

    At 100 TB the layout step is ``repartitionByRange(zval)`` + sorted
    write — one range shuffle at ingest, after which every downstream 2-D
    range query prunes; this query computes the z-assignment and the
    per-bucket bounding boxes that prove the locality. Pure integer bit
    arithmetic (20 shift/mask terms, one groupBy), bit-identical across
    engines."""
    e = load_table(spark, sf_dir, "events")
    z = e.select(
        "event_id",
        (F.col("user_id") % 1024).alias("x"),
        (F.col("event_id") % 1024).alias("y"),
        F.expr(_zorder_sql("(user_id % 1024)", "(event_id % 1024)")).alias("zval"),
    )
    return (
        z.groupBy(F.shiftright("zval", 14).cast("bigint").alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
        .orderBy("z_bucket")
    )


@query(
    "q_join_bucketed_colocated",
    oracle="""
SELECT o.o_orderstatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderstatus
""",
    tags=("scale", "join"),
)
def q_join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located join (sources/bucketing.py): both sides are
    written bucketed+sorted on the join key, so the join plans with ZERO
    exchange — bucket i of orders meets bucket i of lineitem in the same
    task (tests/test_bucketing.py pins the no-Exchange plan under a
    disabled broadcast threshold). At 100 TB this is THE dominant join
    cost eliminated at write time: the layout is the index.

    The query re-proves the result equals a plain join oracle; the write
    cost is paid once here per run (table names are sf-scoped so scales
    don't collide)."""
    import re as _re

    from etl_open_source_spark.sources.bucketing import bucketed_join, write_bucketed

    tag = _re.sub(r"[^0-9a-zA-Z]", "_", os.path.basename(os.path.normpath(sf_dir)))
    t_orders, t_lineitem = f"bq_orders_{tag}", f"bq_lineitem_{tag}"
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    l = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"
    )
    write_bucketed(o, t_orders, ["o_orderkey"], 8, sort_by=["o_orderkey"])
    write_bucketed(l, t_lineitem, ["o_orderkey"], 8, sort_by=["o_orderkey"])
    return (
        bucketed_join(spark, t_orders, t_lineitem, ["o_orderkey"])
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue"),
        )
    )
