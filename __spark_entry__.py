"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Backed by the registry in ``etl_open_source_spark.registry``; each operator
module under ``etl_open_source_spark/queries/`` registers its queries and
oracle SQL at import time.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_open_source_spark.registry import get_registry

_SMOKE_SF_DIR = "/root/testdata/sf0.001"
_FLAGSHIP = "q_agg_groupby"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on sf0.001; driver checks rows>0."""
    return get_registry()[_FLAGSHIP].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.fn for name, qd in get_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted for non-SQL-expressible
    ops (approximate / algorithmic) → driver records rows-only."""
    return {name: qd.oracle for name, qd in get_registry().items() if qd.oracle is not None}
