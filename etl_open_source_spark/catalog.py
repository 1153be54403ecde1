"""Fixture catalog: table loading, temp-view registration, FK manifest.

The engine-side analog of the reference's catalog surface
(core/extractors/sqlserver.py:95-198 — list_tables / list_columns /
get_table_schema / get_fk_relations_all over INFORMATION_SCHEMA): here the
catalog is Spark's own (`spark.catalog`), fed from parquet footers, and the
FK graph is a static manifest of the driver fixtures (FIXTURES.md).
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

_SCRATCH_REGISTERED: set[str] = set()


def cleanup_at_exit(path: str) -> str:
    """Idempotently register *path* for recursive removal at interpreter
    exit and return it.

    Scratch sinks (scan/sink round-trips, the backfill demo) used to
    leave their directories behind; on a long-lived box the litter
    compounds — measured at the r12 close, thousands of leaked temp
    dirs degraded the bench's Python-UDF-heavy queries ~14% via
    tmp-directory entry pressure. Exit-time (not eager) removal keeps
    the dir alive for the whole process: the returned DataFrames read
    their sink paths lazily, possibly long after the query fn returned.
    """
    if path not in _SCRATCH_REGISTERED:
        _SCRATCH_REGISTERED.add(path)
        atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


def scratch_dir(prefix: str) -> str:
    """Fresh per-run scratch dir under the system temp root, removed at
    interpreter exit (see cleanup_at_exit)."""
    return cleanup_at_exit(tempfile.mkdtemp(prefix=prefix))

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
def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan; Catalyst pushes filters/pruning into it.

    Nanosecond-timestamp columns (events.ts) are handled by the shared
    parquet reader (sources/readers.py read_parquet): read as int64 nanos
    and floor-divided to microsecond timestamps — bit-identical to how
    DuckDB (the oracle) truncates ns→µs on read.
    """
    from etl_open_source_spark.sources.readers import read_parquet

    # Defensive: timezone-sensitive functions (unix_timestamp on NTZ cols,
    # literal parsing) must agree with the UTC-naive DuckDB oracle even if
    # the caller's session (e.g. the driver's) wasn't built by get_spark().
    # Spark 4.1 VALIDATES the default passed to conf.get for this key (an
    # empty-string default raises INVALID_CONF_VALUE.TIME_ZONE on an unset
    # conf), so probe inside try/except instead of relying on a default.
    try:
        tz = spark.conf.get("spark.sql.session.timeZone")
    except Exception:
        tz = None
    if tz != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Same NTZ pin as session.py:get_spark — a runtime conf, so it also
    # protects sessions the caller built with plain builder defaults.
    try:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:
        pass
    return read_parquet(spark, table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register every fixture table as a temp view so `spark.sql` queries
    (the engine's SQL-transformer surface, SURVEY §2.B) can address them by
    name — the Spark analog of the reference's per-DBMS table addressing.

    Tables absent from ``sf_dir`` are skipped — the same partial-catalog
    contract as the test oracle harness: a query that references an
    unregistered view still fails loudly at bind time, while a dataset
    that ships only the tables it uses registers cleanly. But if NO
    requested table exists, ``sf_dir`` is almost certainly mistyped —
    raise here instead of deferring to a confusing 'table not found' at
    SQL bind time (ADVICE r8)."""
    import os

    found = [t for t in tables if os.path.exists(table_path(sf_dir, t))]
    if tables and not found:
        raise FileNotFoundError(
            f"register_views: none of {list(tables)} exist under {sf_dir!r} — "
            "is the data directory path correct?"
        )
    for t in found:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def list_tables(spark: SparkSession) -> list[str]:
    """Catalog: list tables (parity with core/extractors/sqlserver.py:95-112)."""
    return sorted(t.name for t in spark.catalog.listTables())


def list_columns(spark: SparkSession, table: str) -> list[dict]:
    """Catalog: one table's columns with types/nullability (parity with
    core/extractors/sqlserver.py:60-90,117-150). The catalog QUERIES
    (queries/catalog_q.py) read the parquet footers instead — schema
    without registering views — so this helper is the registered-view
    flavor of the same surface."""
    return [
        {"name": c.name, "type": c.dataType, "nullable": c.nullable}
        for c in spark.catalog.listColumns(table)
    ]
