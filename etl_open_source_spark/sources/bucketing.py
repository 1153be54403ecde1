"""Bucketed tables — shuffle-free co-located joins.

At 100 TB, re-shuffling the fact table for every join is the dominant
cost. Bucketing both join sides by the key at WRITE time means every
subsequent join/aggregation on that key runs with ZERO exchange: Spark
reads bucket i of both tables into the same task.

This is the Spark-native answer to the reference's per-row INSERT loader
(core/loaders/sqlserver.py:282-286): the write is not just parallel, its
LAYOUT is an index for future queries. tests/test_bucketing.py asserts the
no-Exchange plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) managed table. Sorting
    within buckets additionally enables merge-join without a sort step.

    Overwrite is made restart-safe: a managed-table LOCATION left behind
    by a previous session (fresh catalog, stale warehouse dir) would fail
    saveAsTable with LOCATION_ALREADY_EXISTS, so an orphaned location is
    removed first. (With a persistent metastore / table format the
    catalog itself owns this lifecycle.)"""
    spark = df.sparkSession
    if mode == "overwrite" and not spark.catalog.tableExists(table):
        # Map the name to its managed location: default DB puts the table
        # directly under the warehouse; "db.tbl" lives under <db>.db/.
        # Cleanup goes through the Hadoop FS API so any warehouse scheme
        # (file:/, hdfs:/, s3a:/) works — a local-only rmtree silently
        # no-ops elsewhere and LOCATION_ALREADY_EXISTS returns.
        parts = table.lower().split(".")
        if len(parts) == 1:
            # unqualified names resolve against the CURRENT database, not
            # always default — <warehouse>/<db>.db/<tbl> otherwise
            db = spark.catalog.currentDatabase()
            rel = parts[0] if db == "default" else f"{db}.db/{parts[0]}"
        elif len(parts) == 2:
            rel = (
                parts[1]
                if parts[0] == "default"
                else f"{parts[0]}.db/{parts[1]}"
            )
        else:
            raise ValueError(f"unsupported table identifier: {table!r}")
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(f"{warehouse}/{rel}")
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(jpath):
            fs.delete(jpath, True)
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: list[str]) -> DataFrame:
    """Join two same-bucketed tables on the bucket key — planner elides
    both exchanges (bucket i ⋈ bucket i per task)."""
    return spark.table(left_table).join(spark.table(right_table), on)
