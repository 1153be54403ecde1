"""Scale-pattern queries: skew-salted operators whose RESULTS are
identical to their naive forms (oracle-verified) while their shuffle
distribution is built for pathological key skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_open_source_spark.catalog import load_table
from etl_open_source_spark.operators.skew import salted_count_sum
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
