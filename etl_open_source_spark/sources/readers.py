"""Readers — the engine's extractor surface.

Replaces the reference's extractors (the one implemented SQL Server extractor
at core/extractors/sqlserver.py:46-55 plus the declared-but-stubbed
postgres/mysql/oracle/mongo/csv extractors, SURVEY §2.B): each becomes a
`spark.read` call that is *distributed and pushdown-aware* instead of a
single-threaded `pd.read_sql` full materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Columnar scan with predicate pushdown + column pruning for free."""
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan. Always pass an explicit schema in production — schema
    inference is an extra full pass over 100 TB."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType | str | None = None) -> DataFrame:
    """JSON-lines scan (one object per line — splittable, parallel)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def jdbc_read_options(
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
    **extra: str,
) -> dict[str, str]:
    """Build the option dict for a *partitioned* JDBC read.

    This is the scale replacement for the reference's single-connection
    `pd.read_sql` extract (core/extractors/sqlserver.py:39-41,52-53): N
    executors each pull one stride of ``partition_column`` concurrently.
    Kept as a pure function so the plumbing is unit-testable without a live
    DBMS (the harness has none).
    """
    opts: dict[str, str] = {"url": url, "dbtable": table, "fetchsize": str(fetchsize)}
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError("partitioned JDBC read needs lower/upper bound and num_partitions")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    opts.update(extra)
    return opts


def read_jdbc(spark: SparkSession, **kwargs) -> DataFrame:
    """Apply ``jdbc_read_options`` to a real reader (needs a live DBMS)."""
    return spark.read.format("jdbc").options(**jdbc_read_options(**kwargs)).load()


def jdbc_query_options(url: str, query: str, **extra: str) -> dict[str, str]:
    """Arbitrary-SQL pushdown — parity with the reference's core capability
    (user-supplied SQL string executed by the source DBMS,
    core/extractors/sqlserver.py:46-55)."""
    return {"url": url, "query": query, **extra}
