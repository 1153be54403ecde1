"""Table-maintenance queries: snapshot diff, SCD2 point-in-time lookup,
deterministic sharding, small-file compaction.

[EXT] per SURVEY.md §2 — the reference re-reads full snapshots every run
and its loaders only append/replace (core/loaders/sqlserver.py:244-288);
it cannot derive a changelog, answer as-of-time dimension lookups, or
manage output layout. These are the maintenance ops a 100 TB warehouse
runs daily; operators in operators/maintenance.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_open_source_spark.catalog import load_table
from etl_open_source_spark.operators.maintenance import (
    compact_parquet,
    scd2_lookup,
    snapshot_diff,
)
from etl_open_source_spark.operators.sampling import det_hash, sql_det_hash
from etl_open_source_spark.queries.scans import _tmp  # shared sf-scoped temp dirs
from etl_open_source_spark.registry import query


@query(
    "q_snapshot_diff",
    oracle="""
WITH old_snap AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
),
new_snap AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 100.0 ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 13 <> 0
  UNION ALL
  SELECT o_orderkey + 100000000, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 11 = 0
)
SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
       CASE WHEN o.o_orderkey IS NULL THEN 'insert'
            WHEN n.o_orderkey IS NULL THEN 'delete'
            ELSE 'update' END AS change_type,
       o.o_orderstatus AS old_status, n.o_orderstatus AS new_status,
       o.o_totalprice AS old_price, n.o_totalprice AS new_price
FROM old_snap o FULL OUTER JOIN new_snap n USING (o_orderkey)
WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
   OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
   OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
""",
    bench=True,
    tags=("maintenance", "cdc"),
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a changelog from two full table snapshots — the inverse of
    q_cdc_apply (which replays one). The new snapshot is built
    deterministically from orders: keys %13==0 deleted, %7==0 updated
    (status→'X', price+100), %11==0 re-inserted under a new key.

    One full-outer join on the key; unchanged rows drop in the same stage.
    At 100 TB both snapshots live bucketed on the key, so the exchange
    vanishes and the diff is a co-partitioned merge — this is how daily
    ingest diffs stay linear."""
    o = load_table(spark, sf_dir, "orders")
    old = o.select("o_orderkey", "o_orderstatus", "o_totalprice")
    upd = F.col("o_orderkey") % 7 == 0
    new = (
        old.filter(F.col("o_orderkey") % 13 != 0)
        .select(
            "o_orderkey",
            F.when(upd, F.lit("X")).otherwise(F.col("o_orderstatus")).alias("o_orderstatus"),
            F.when(upd, F.col("o_totalprice") + 100.0)
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
        .unionByName(
            old.filter(F.col("o_orderkey") % 11 == 0).select(
                (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
                "o_orderstatus",
                "o_totalprice",
            )
        )
    )
    return snapshot_diff(
        old, new, keys=["o_orderkey"], compare=["o_orderstatus", "o_totalprice"]
    ).select(
        "o_orderkey",
        "change_type",
        F.col("old_o_orderstatus").alias("old_status"),
        F.col("new_o_orderstatus").alias("new_status"),
        F.col("old_o_totalprice").alias("old_price"),
        F.col("new_o_totalprice").alias("new_price"),
    )


@query(
    "q_scd2_lookup",
    oracle="""
WITH dim AS (
  SELECT c_custkey, c_mktsegment,
         TIMESTAMP '1990-01-01 00:00:00' AS valid_from,
         CASE WHEN c_custkey % 3 = 0 THEN TIMESTAMP '1998-01-01 00:00:00'
              ELSE TIMESTAMP '2200-01-01 00:00:00' END AS valid_to
  FROM customer
  UNION ALL
  SELECT c_custkey, 'UPDATED',
         TIMESTAMP '1998-01-01 00:00:00', TIMESTAMP '2200-01-01 00:00:00'
  FROM customer WHERE c_custkey % 3 = 0
)
SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
       d.c_mktsegment AS segment_at_order
FROM orders o
JOIN dim d ON o.o_custkey = d.c_custkey
          AND o.o_orderdate >= d.valid_from AND o.o_orderdate < d.valid_to
""",
    tags=("maintenance", "scd", "join"),
)
def q_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension join: each order picks the customer-segment
    version valid at its order date. The dim is an SCD2 table built
    deterministically (keys %3==0 flip to 'UPDATED' at 1998-01-01 — inside
    the 1995-2001 order-date range, so both versions are exercised).

    Plan: **equi-join on the key + residual validity filter**, not a range
    join — versions per key are few and bounded, so each fact row meets
    only that key's handful of versions after the hash exchange. This is
    the right 100 TB shape; a bucketed range join (q_join_range_bucketed)
    is for the unbounded-interval case."""
    c = load_table(spark, sf_dir, "customer")
    split = F.col("c_custkey") % 3 == 0
    v1 = c.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("1990-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.when(split, F.lit("1998-01-01 00:00:00"))
        .otherwise(F.lit("2200-01-01 00:00:00"))
        .cast("timestamp")
        .alias("valid_to"),
    )
    v2 = c.filter(split).select(
        "c_custkey",
        F.lit("UPDATED").alias("c_mktsegment"),
        F.lit("1998-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit("2200-01-01 00:00:00").cast("timestamp").alias("valid_to"),
    )
    dim = v1.unionByName(v2)
    facts = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    return scd2_lookup(
        facts, dim, fact_key="o_custkey", dim_key="c_custkey",
        fact_ts="o_orderdate", how="inner",
    ).select(
        "o_orderkey", "o_custkey", "o_orderdate",
        F.col("c_mktsegment").alias("segment_at_order"),
    )


_H_DOC = sql_det_hash("doc_id")


@query(
    "q_shard_assign",
    oracle=f"""
SELECT shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM (SELECT (({_H_DOC}) % 16) AS shard, doc_id, n_chars FROM documents) t
GROUP BY shard
""",
    tags=("maintenance", "llm"),
)
def q_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus sharding + balance audit: every document maps
    to one of 16 shards by the pure-arithmetic key hash
    (operators/sampling.py det_hash — engine-portable, stable under
    re-partitioning and corpus growth), then per-shard row/char counts
    expose imbalance before any expensive write.

    At 100 TB this is the step before a sharded export: the hash is
    scan-local, the audit is one map-side-combinable aggregate, and the
    same expression becomes the write's partitionBy column so shard
    assignment never drifts between audit and export."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.pmod(det_hash("doc_id"), F.lit(16)).alias("shard"), "doc_id", "n_chars")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@query(
    "q_compact_files",
    oracle="""
SELECT CAST(GREATEST(1, LEAST(64, COUNT(*))) AS INT) AS files_small,
       CAST(GREATEST(1, LEAST(4, COUNT(*))) AS INT) AS files_compacted,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM lineitem
""",
    tags=("maintenance", "sink"),
)
def q_compact_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (operators/maintenance.py compact_parquet):
    lineitem is first written as 64 deliberately-small files, then
    compacted 64→4 with round-robin repartition; the result row proves the
    layout change (actual on-disk file counts) and that no data was lost
    or duplicated (count + exact decimal checksum survive the rewrite).

    The 100 TB story: streaming/micro-batch ingest produces thousands of
    KB-sized files per partition; compaction to ~target_file_bytes
    (supported by the operator; the query pins n=4 for determinism) is
    what keeps scan task counts and file-listing costs sane. Round-robin
    repartition — not coalesce — so output files are even-sized under
    input skew. The oracle's file counts are GREATEST(1, LEAST(n, rows)):
    an empty round-robin partition writes no file, so a table smaller
    than the partition count produces one file per row (seen on the
    randomized micro-fixtures; at any real scale the counts are 64/4) —
    EXCEPT a fully empty table, where Spark's FileFormatWriter still
    emits exactly one schema-carrying empty part file (the empty-input
    axis pins this floor of 1)."""
    small_dir = _tmp(sf_dir, "lineitem_small")
    compact_dir = _tmp(sf_dir, "lineitem_compacted")
    src = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    src.repartition(64).write.mode("overwrite").parquet(small_dir)
    n_small = sum(1 for f in os.listdir(small_dir) if f.endswith(".parquet"))
    n_out = compact_parquet(spark, small_dir, compact_dir, num_files=4)
    back = spark.read.parquet(compact_dir)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("sum_qty"),
    ).select(
        F.lit(n_small).alias("files_small"),
        F.lit(n_out).alias("files_compacted"),
        "n_rows",
        "sum_qty",
    )


@query(
    "q_mv_incremental",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(CASE WHEN ISFINITE(o_totalprice) THEN o_totalprice END AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
       CAST(SUM(CAST(CASE WHEN ISFINITE(o_totalprice) THEN o_totalprice END AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price
FROM orders
GROUP BY o_orderpriority
""",
    tags=("maintenance", "agg"),
)
def q_mv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the per-priority order
    rollup is built as BASE (orders before 2000-01-01, the standing MV)
    plus DELTA (orders at/after — the new ingest batch), then the two
    partial-aggregate states merge: counts add, decimal sums add, avg is
    re-derived from the merged state. The oracle is the FULL recompute —
    hash-equality proves merge(base, delta) == recompute, the property
    that lets a 100 TB rollup absorb a daily batch by touching only the
    delta (map-side-combinable states, one dimension-sized merge; the
    corpus-sized base is never re-scanned)."""
    o = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("2000-01-01 00:00:00").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("sum_dec"),
        )

    # NULL order dates fail BOTH comparisons (NULL-falsy) and would drop
    # from the merge while the full-recompute oracle keeps them — route
    # them into the base partition explicitly
    base = partial(o.filter((F.col("o_orderdate") < cutoff) | F.col("o_orderdate").isNull()))
    delta = partial(o.filter(F.col("o_orderdate") >= cutoff))
    merged = (
        base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("sum_dec").alias("sum_dec"),
        )
    )
    return merged.select(
        "o_orderpriority",
        "n_orders",
        F.col("sum_dec").cast("double").alias("sum_price"),
        (F.col("sum_dec").cast("double") / F.col("n_orders")).alias("avg_price"),
    )


@query(
    "q_sink_partition_overwrite",
    oracle="""
SELECT NULLIF(o_orderstatus, '') AS o_orderstatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN o_orderstatus = 'F'
                     THEN CAST(CASE WHEN ISFINITE(o_totalprice) THEN o_totalprice END AS DECIMAL(18,4)) * 2
                     ELSE CAST(CASE WHEN ISFINITE(o_totalprice) THEN o_totalprice END AS DECIMAL(18,4)) END) AS DOUBLE)
         AS sum_price
FROM orders
GROUP BY NULLIF(o_orderstatus, '')
""",
    tags=("maintenance", "sink"),
)
def q_sink_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite — the idempotent-backfill primitive:
    a partitioned table is fully laid down, then ONE partition ('F') is
    re-written from corrected data (prices doubled, a visible change) in
    overwrite mode with ``partitionOverwriteMode=dynamic``. Dynamic mode
    replaces ONLY the partitions present in the incoming frame; static
    overwrite (the default) would silently TRUNCATE the other partitions
    — the classic backfill data-loss foot-gun this query exists to pin.
    The read-back per-status aggregate proves both halves: 'F' rows carry
    the corrected prices, every other partition is byte-identical source
    data.

    At 100 TB this is how daily reprocessing ships: recompute day D,
    overwrite partition D in place, never touch D-1 — write amplification
    is the day's data, not the table, and re-running the job is
    idempotent. The option is set per-write (no session-wide config
    flip)."""
    # per-run unique dir (not the shared _tmp path): a concurrent run's
    # static overwrite mid-flight would make the read-back see a MIX of
    # two runs' partitions — the same stale/concurrent hazard fixed in
    # q_scan_binary_files (self-review finding); removed at interpreter
    # exit (it holds a full orders copy per invocation)
    from etl_open_source_spark.catalog import scratch_dir

    from etl_open_source_spark.sources.writers import write_parquet

    # the engine writer is the spec layer's primitive — using it here
    # also applies the documented Hive-layout contract: '' partition
    # values canonicalize to NULL (a Hive directory layout cannot
    # represent an empty-string partition; the oracle mirrors NULLIF)
    dest = scratch_dir("etl_orders_backfill_")
    src = load_table(spark, sf_dir, "orders")
    write_parquet(src, dest, mode="replace", partition_by=["o_orderstatus"])
    fixed = src.filter(F.col("o_orderstatus") == "F").withColumn(
        "o_totalprice",
        (F.col("o_totalprice").cast("decimal(18,4)") * 2).cast("double"),
    )
    write_parquet(
        fixed, dest, mode="overwrite_partitions", partition_by=["o_orderstatus"]
    )
    # explicit schema on the read-back: an EMPTY source writes no
    # partition directories at all, and schema inference on the bare
    # dest dir raises UNABLE_TO_INFER_SCHEMA where the schema-carrying
    # read returns a valid empty frame (the empty-backfill-day case)
    back = spark.read.schema(src.schema).parquet(dest)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_price"),
    )
