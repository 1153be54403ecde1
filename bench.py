"""Benchmark runner — times the headline queries and prints ONE JSON line.

Usage: python bench.py
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_CPUS   (default all cores)

Prints {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}.
Each query is executed to completion with a cheap count() action (results
stay distributed; no driver materialization skew).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from etl_open_source_spark.registry import get_registry
    from etl_open_source_spark.session import get_spark

    registry = get_registry()
    bench_queries = {n: qd for n, qd in registry.items() if qd.bench}
    spark = get_spark(app_name="etl-open-source-spark-bench")

    # Warm up the JVM + parquet footer cache outside the timed region.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    for name, qd in sorted(bench_queries.items()):
        t0 = time.perf_counter()
        df = qd.fn(spark, sf_dir)
        df.count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
