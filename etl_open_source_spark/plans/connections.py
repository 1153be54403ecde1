"""Connection service — parity with the reference's connection test
(reference services/connection_service.py:20-40: 5 s-timeout connect
returning (ok, message); only one DBMS type supported there).

Here a connection is a reader config; testing it = attempting a minimal
read through it.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from etl_open_source_spark.plans.models import ConnectionConfig

SUPPORTED_TYPES = {"parquet", "csv", "json", "jdbc"}


def test_connection(spark: SparkSession, conn: ConnectionConfig) -> tuple[bool, str]:
    """Attempt a minimal probe through the connection; returns (ok, message)
    — same contract as the reference (never raises)."""
    if conn.type not in SUPPORTED_TYPES:
        return False, f"unsupported connection type: {conn.type!r}"
    try:
        if conn.type == "jdbc":
            url = conn.params.get("url")
            if not url:
                return False, "jdbc connection needs params['url']"
            # SELECT 1 probe, same as the reference's test query
            (
                spark.read.format("jdbc")
                .option("url", url)
                .option("query", "SELECT 1")
                .options(**{k: v for k, v in conn.params.items() if k != "url"})
                .load()
                .collect()
            )
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
