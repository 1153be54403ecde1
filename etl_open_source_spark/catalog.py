"""Fixture catalog: table loading, temp-view registration, FK manifest.

The engine-side analog of the reference's catalog surface
(core/extractors/sqlserver.py:95-198 — list_tables / list_columns /
get_table_schema / get_fk_relations_all over INFORMATION_SCHEMA): here the
catalog is Spark's own (`spark.catalog`), fed from parquet footers, and the
FK graph is a static manifest of the driver fixtures (FIXTURES.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Engine-side FK manifest — replaces get_fk_relations_all
# (reference core/extractors/sqlserver.py:155-198, a sys.foreign_keys join).
FK_GRAPH = [
    {"table": "lineitem", "column": "l_orderkey", "ref_table": "orders", "ref_column": "o_orderkey"},
    {"table": "lineitem", "column": "l_partkey", "ref_table": "part", "ref_column": "p_partkey"},
    {"table": "lineitem", "column": "l_suppkey", "ref_table": "supplier", "ref_column": "s_suppkey"},
    {"table": "orders", "column": "o_custkey", "ref_table": "customer", "ref_column": "c_custkey"},
    {"table": "customer", "column": "c_nationkey", "ref_table": "nation", "ref_column": "n_nationkey"},
    {"table": "supplier", "column": "s_nationkey", "ref_table": "nation", "ref_column": "n_nationkey"},
    {"table": "nation", "column": "n_regionkey", "ref_table": "region", "ref_column": "r_regionkey"},
]

# Small dimensions that should always be broadcast, never shuffled.
BROADCAST_DIMS = {"region", "nation", "supplier"}


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark's vectorized reader
    rejects those outright, so they need the nanosAsLong escape hatch."""
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
    except Exception:
        return []
    import pyarrow as pa

    return [f.name for f in schema if pa.types.is_timestamp(f.type) and f.type.unit == "ns"]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan; Catalyst pushes filters/pruning into it.

    Nanosecond-timestamp columns (events.ts) are read as int64 nanos and
    floor-divided to microsecond timestamps — bit-identical to how DuckDB
    (the oracle) truncates ns→µs on read.
    """
    # Defensive: timezone-sensitive functions (unix_timestamp on NTZ cols,
    # literal parsing) must agree with the UTC-naive DuckDB oracle even if
    # the caller's session (e.g. the driver's) wasn't built by get_spark().
    if spark.conf.get("spark.sql.session.timeZone", "") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = table_path(sf_dir, name)
    ns_cols = _nanos_timestamp_columns(path)
    if not ns_cols:
        return spark.read.parquet(path)
    # Runtime-settable legacy conf: nanos columns arrive as long (nanos).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register every fixture table as a temp view so `spark.sql` queries
    (the engine's SQL-transformer surface, SURVEY §2.B) can address them by
    name — the Spark analog of the reference's per-DBMS table addressing."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def list_tables(spark: SparkSession) -> list[str]:
    """Catalog: list tables (parity with core/extractors/sqlserver.py:95-112)."""
    return sorted(t.name for t in spark.catalog.listTables())


def list_columns(spark: SparkSession, table: str) -> list[dict]:
    """Catalog: one table's columns with types/nullability (parity with
    core/extractors/sqlserver.py:60-90,117-150)."""
    return [
        {"name": c.name, "type": c.dataType, "nullable": c.nullable}
        for c in spark.catalog.listColumns(table)
    ]
