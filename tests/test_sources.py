"""Unit tests for source/sink plumbing that the harness can't run live
(JDBC — no DBMS in the container): option builders, DDL derivation,
connection probe contract.
"""

from __future__ import annotations

import pytest

from etl_open_source_spark.plans.connections import test_connection as probe_connection
from etl_open_source_spark.plans.models import ConnectionConfig
from etl_open_source_spark.sources.readers import jdbc_query_options, jdbc_read_options
from etl_open_source_spark.sources.writers import (
    ddl_column_types,
    jdbc_write_options,
)


def test_jdbc_partitioned_read_options():
    opts = jdbc_read_options(
        url="jdbc:postgresql://host/db",
        table="public.lineitem",
        partition_column="l_orderkey",
        lower_bound=0,
        upper_bound=6_000_000,
        num_partitions=64,
    )
    assert opts["partitionColumn"] == "l_orderkey"
    assert opts["numPartitions"] == "64"
    assert opts["lowerBound"] == "0" and opts["upperBound"] == "6000000"
    assert opts["fetchsize"] == "10000"


def test_jdbc_partitioned_read_requires_bounds():
    with pytest.raises(ValueError):
        jdbc_read_options(url="jdbc:x", table="t", partition_column="k")


def test_jdbc_query_pushdown_options():
    opts = jdbc_query_options("jdbc:x", "SELECT a, b FROM t WHERE a > 1")
    assert opts["query"].startswith("SELECT")


def test_jdbc_write_replace_preserves_ddl():
    mode, opts = jdbc_write_options("jdbc:x", "dbo.target", mode="replace")
    assert mode == "overwrite"
    assert opts["truncate"] == "true"  # DELETE-not-DROP parity
    mode, opts = jdbc_write_options("jdbc:x", "dbo.target", mode="append")
    assert mode == "append" and "truncate" not in opts


def test_jdbc_write_rejects_bad_mode():
    with pytest.raises(ValueError):
        jdbc_write_options("jdbc:x", "t", mode="upsert")


def test_jdbc_auto_ddl_column_types(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    types = ddl_column_types(df)
    assert types["l_orderkey"] == "BIGINT"  # int64 stays 64-bit (divergence
    # from the reference's int64→INT narrowing, SURVEY §1.3)
    assert types["l_linenumber"] == "INTEGER"
    assert types["l_quantity"] == "DOUBLE PRECISION"
    assert types["l_returnflag"].startswith("VARCHAR")
    _, opts = jdbc_write_options("jdbc:x", "t", mode="append", column_types=types)
    assert "l_orderkey BIGINT" in opts["createTableColumnTypes"]


def test_connection_probe_parquet_ok(spark, sf_dir):
    ok, msg = probe_connection(
        spark,
        ConnectionConfig(id="c1", name="fx", type="parquet", params={"path": f"{sf_dir}/orders.parquet"}),
    )
    assert ok, msg


def test_connection_probe_failures(spark):
    ok, msg = probe_connection(
        spark, ConnectionConfig(id="c2", name="bad", type="parquet", params={"path": "/nope"})
    )
    assert not ok and "failed" in msg
    ok, msg = probe_connection(
        spark, ConnectionConfig(id="c3", name="bad", type="mongo", params={})
    )
    assert not ok and "unsupported" in msg
    ok, msg = probe_connection(
        spark, ConnectionConfig(id="c4", name="bad", type="jdbc", params={})
    )
    assert not ok and "url" in msg
