"""Connection service — parity with the reference's connection test
(reference services/connection_service.py:20-40: 5 s-timeout connect
returning (ok, message); only one DBMS type supported there).

Here a connection is a reader config; testing it = attempting a minimal
read through it.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from etl_open_source_spark.plans.models import ConnectionConfig

SUPPORTED_TYPES = {"parquet", "csv", "json", "jdbc", "sqlserver", "postgres", "mysql", "mongo"}

_DIALECT_TYPES = {"sqlserver", "postgres", "mysql"}


def jdbc_connection_options(conn: ConnectionConfig) -> dict[str, str]:
    """Resolve a connection config to JDBC reader options. ``jdbc`` takes a
    raw params['url']; the dialect types (sqlserver/postgres/mysql) build
    the URL + driver class from host/database/port/user/password — the
    engine's version of the reference's per-DBMS connection-string builder
    (core/extractors/sqlserver.py:28-41)."""
    if conn.type == "jdbc":
        url = conn.params.get("url")
        if not url:
            raise ValueError("jdbc connection needs params['url']")
        return dict(conn.params)
    if conn.type in _DIALECT_TYPES:
        from etl_open_source_spark.sources.readers import dialect_jdbc_options

        missing = [k for k in ("host", "database") if not conn.params.get(k)]
        if missing:
            raise ValueError(f"{conn.type} connection needs params{missing}")
        params = dict(conn.params)
        port = params.pop("port", None)
        return dialect_jdbc_options(
            conn.type,
            params.pop("host"),
            params.pop("database"),
            port=int(port) if port is not None else None,
            user=params.pop("user", None),
            password=params.pop("password", None),
            **params,
        )
    raise ValueError(f"not a JDBC-family connection: {conn.type!r}")


def test_connection(spark: SparkSession, conn: ConnectionConfig) -> tuple[bool, str]:
    """Attempt a minimal probe through the connection; returns (ok, message)
    — same contract as the reference (never raises)."""
    if conn.type not in SUPPORTED_TYPES:
        return False, f"unsupported connection type: {conn.type!r}"
    try:
        if conn.type == "jdbc" or conn.type in _DIALECT_TYPES:
            opts = jdbc_connection_options(conn)
            # Minimal probe, same intent as the reference's test query.
            # Derby (the engine this repo live-tests against) rejects
            # SELECT without FROM — probe its dummy table instead (the
            # DB2-family idiom; Spark wraps the query in a subselect, so
            # bare VALUES breaks too). Other dialects can override via
            # params['probe_query'].
            probe = opts.pop("probe_query", None) or (
                "SELECT 1 AS ok FROM SYSIBM.SYSDUMMY1"
                if opts.get("url", "").startswith("jdbc:derby")
                else "SELECT 1"
            )
            (
                spark.read.format("jdbc")
                .options(**opts)
                .option("query", probe)
                .load()
                .collect()
            )
        elif conn.type == "mongo":
            from etl_open_source_spark.sources.readers import mongo_read_options

            missing = [
                k for k in ("uri", "database", "collection") if not conn.params.get(k)
            ]
            if missing:
                return False, f"mongo connection needs params{missing}"
            params = dict(conn.params)
            opts = mongo_read_options(
                params.pop("uri"), params.pop("database"), params.pop("collection"), **params
            )
            # schema probe; needs the connector jar + live server
            spark.read.format("mongodb").options(**opts).load().schema
        else:
            path = conn.params.get("path")
            if not path:
                return False, f"{conn.type} connection needs params['path']"
            reader = spark.read
            if conn.type == "parquet":
                reader.parquet(path).schema
            elif conn.type == "csv":
                reader.option("header", "true").csv(path).schema
            else:
                reader.json(path).schema
        return True, "connection ok"
    except Exception as ex:  # noqa: BLE001 — contract returns, never raises
        return False, f"connection failed: {ex}"
