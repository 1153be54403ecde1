"""Data-layout utilities: small-file compaction and range-sorted writes.

At 100 TB the two classic layout pathologies are (a) millions of small
files (metadata pressure, tiny scans) and (b) unsorted data (no min/max
pruning). These writers fix both at write time:

- ``write_compacted``: explicit output-file budget via repartition —
  streaming sinks and over-parallel jobs otherwise emit one file per task.
- ``write_range_sorted``: repartitionByRange + sortWithinPartitions so
  parquet row-group min/max statistics actually prune range predicates
  (each file owns a disjoint key range).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_compacted(df: DataFrame, path: str, target_files: int, mode: str = "overwrite") -> None:
    """Write exactly ``target_files`` parquet files (hash-distributed)."""
    df.repartition(target_files).write.mode(mode).parquet(path)


def write_range_sorted(
    df: DataFrame, path: str, sort_cols: list[str], n_files: int, mode: str = "overwrite"
) -> None:
    """Write ``n_files`` files, globally range-partitioned and internally
    sorted on ``sort_cols`` — scans with predicates on those columns skip
    whole files via footer min/max."""
    (
        df.repartitionByRange(n_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )


def parquet_file_count(path: str) -> int:
    return len([f for f in os.listdir(path) if f.endswith(".parquet")])
