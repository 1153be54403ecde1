"""Writers/sinks — the engine's loader surface.

Replaces the reference's loaders (the row-at-a-time SQL Server insert loop at
core/loaders/sqlserver.py:271-286 plus the stubbed postgres/mysql/csv
loaders): distributed `df.write` with proper modes.

Mode parity (core/loaders/sqlserver.py:244-269):
- append  → `mode("append")`
- replace → `mode("overwrite")`; for JDBC add ``option("truncate","true")``
  to match the reference's DELETE-rows-keep-DDL semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

VALID_MODES = {"append", "replace", "overwrite_partitions"}
# non-parquet sinks: dynamic partition overwrite is a partitioned-layout
# concept — only the parquet writer accepts the third mode
VALID_BASIC_MODES = {"append", "replace"}


def write_parquet(df: DataFrame, path: str, mode: str = "append", partition_by: list[str] | None = None) -> None:
    """``overwrite_partitions`` = overwrite mode with per-write
    ``partitionOverwriteMode=dynamic``: ONLY the partitions present in
    ``df`` are replaced — the idempotent daily-backfill semantics
    (q_sink_partition_overwrite pins the behavior; plain ``replace``
    would truncate the whole table). Requires ``partition_by``."""
    if mode not in VALID_MODES:
        raise ValueError(f"mode must be one of {VALID_MODES}, got {mode!r}")
    if mode == "overwrite_partitions":
        if not partition_by:
            raise ValueError(
                "mode 'overwrite_partitions' requires partition_by — without "
                "partitions, dynamic overwrite degenerates to a full truncate"
            )
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_by)
            .parquet(path)
        )
        return
    writer = df.write.mode("overwrite" if mode == "replace" else "append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "replace", header: bool = True) -> None:
    if mode not in VALID_BASIC_MODES:
        raise ValueError(f"mode must be one of {VALID_BASIC_MODES}, got {mode!r}")
    (
        df.write.mode("overwrite" if mode == "replace" else "append")
        .option("header", str(header).lower())
        .csv(path)
    )


def write_json(df: DataFrame, path: str, mode: str = "replace") -> None:
    if mode not in VALID_BASIC_MODES:
        raise ValueError(f"mode must be one of {VALID_BASIC_MODES}, got {mode!r}")
    df.write.mode("overwrite" if mode == "replace" else "append").json(path)


def write_orc(
    df: DataFrame, path: str, mode: str = "append", partition_by: list[str] | None = None
) -> None:
    """ORC sink — Spark-native columnar alternative to parquet (same
    pushdown/pruning story); rounds out the reference's stubbed loader
    matrix (core/loaders/*.py, all 0-byte)."""
    if mode not in VALID_BASIC_MODES:
        raise ValueError(f"mode must be one of {VALID_BASIC_MODES}, got {mode!r}")
    writer = df.write.mode("overwrite" if mode == "replace" else "append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_xml(df: DataFrame, path: str, mode: str = "replace", row_tag: str = "row") -> None:
    """XML sink — built into Spark core since 4.0 (SPARK-44265 merged the
    external spark-xml connector), so no extra jar. Row-per-element;
    splittable on read via the StAX record reader."""
    if mode not in VALID_BASIC_MODES:
        raise ValueError(f"mode must be one of {VALID_BASIC_MODES}, got {mode!r}")
    (
        df.write.mode("overwrite" if mode == "replace" else "append")
        .option("rowTag", row_tag)
        .format("xml")
        .save(path)
    )


def jdbc_write_options(
    url: str,
    table: str,
    mode: str,
    batchsize: int = 10_000,
    column_types: dict[str, str] | None = None,
    **extra: str,
) -> tuple[str, dict[str, str]]:
    """Options for a batched JDBC write — replaces the reference's one
    INSERT round-trip per row (core/loaders/sqlserver.py:282-286) with
    executor-parallel batched inserts. Returns (spark_mode, options).

    ``column_types`` maps columns to target DDL types for auto
    CREATE TABLE — the reference's ensure_table_exists / DDL-generation
    path (core/loaders/sqlserver.py:83-239, e.g. preserving varchar(n) and
    decimal(p,s) from a source schema) expressed as Spark's
    ``createTableColumnTypes`` option."""
    if mode not in VALID_BASIC_MODES:
        raise ValueError(f"mode must be one of {VALID_BASIC_MODES}, got {mode!r}")
    spark_mode = "append" if mode == "append" else "overwrite"
    opts = {"url": url, "dbtable": table, "batchsize": str(batchsize)}
    if mode == "replace":
        # DELETE-not-DROP parity: truncate preserves the target's DDL.
        opts["truncate"] = "true"
    if column_types:
        opts["createTableColumnTypes"] = ", ".join(
            f"{c} {t}" for c, t in column_types.items()
        )
    opts.update(extra)
    return spark_mode, opts


# pandas-dtype → SQL DDL fallback map — parity with the reference's
# dtype mapping table (core/loaders/sqlserver.py:217-239), with the
# deliberate divergence that int64 stays BIGINT (the reference narrows
# int64 → INT, SURVEY §1.3).
SPARK_TO_DDL = {
    "bigint": "BIGINT",
    "int": "INTEGER",
    "double": "DOUBLE PRECISION",
    "float": "REAL",
    "boolean": "BIT",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
    "date": "DATE",
    "string": "VARCHAR(4000)",
}


def ddl_column_types(df: DataFrame) -> dict[str, str]:
    """Derive the auto-CREATE-TABLE column types from a DataFrame schema
    (the engine's version of _generate_create_table_sql's fallback branch,
    core/loaders/sqlserver.py:217-239)."""
    return {
        f.name: SPARK_TO_DDL.get(f.dataType.simpleString(), "VARCHAR(4000)")
        for f in df.schema.fields
    }


def table_exists(spark: SparkSession, name: str) -> bool:
    """Existence probe (parity: core/loaders/sqlserver.py:64-78)."""
    return spark.catalog.tableExists(name)


def write_jdbc(df: DataFrame, **kwargs) -> None:
    """Apply ``jdbc_write_options`` to a real JDBC writer.

    Proven live against Spark's bundled embedded Derby driver
    (tests/test_jdbc_live.py) — the same executor-parallel batched-insert
    path runs against SQL Server/postgres/mysql given their driver jar;
    only the URL/driver options differ (``dialect_jdbc_options``). This is
    the distributed replacement for the reference's one-INSERT-per-row
    loop (core/loaders/sqlserver.py:282-286)."""
    spark_mode, opts = jdbc_write_options(**kwargs)
    df.write.format("jdbc").options(**opts).mode(spark_mode).save()
