"""Dump .explain('formatted') for registered queries → plans/r13/.

Usage:
    python scripts/r13_plan_dump.py before q_dedup_ngram q_sim_topk ...
    python scripts/r13_plan_dump.py after  q_dedup_ngram
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/r13_plan_dump.py before --all-bench

The optimization-round judge reads plans/r13/<query>_{before,after}.txt and
checks plan claims (Exchange counts, join strategies, PushedFilters,
BatchEvalPython nodes) against them — this script is how those files are
produced, so the evidence is reproducible.

Queries whose fn eagerly runs jobs while building the DataFrame (iterative
CC, KMeans fits, sink round-trips) still work here: the explain captures
the plan of the RETURNED frame, which is the timed artifact.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    if not args or args[0] not in ("before", "after"):
        raise SystemExit("usage: r13_plan_dump.py {before|after} [--all-bench] [query ...]")
    tag = args[0]
    names = args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from etl_open_source_spark.registry import get_registry
    from etl_open_source_spark.session import get_spark

    registry = get_registry()
    if "--all-bench" in names:
        names = [n for n in sorted(registry) if registry[n].bench]
    unknown = [n for n in names if n not in registry]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark(app_name="r13-plan-dump")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        # bench.py clearCache()s between samples — match those conditions so
        # a previous query's persist() can't ride into this plan as an
        # InMemoryRelation via CacheManager plan-matching
        spark.catalog.clearCache()
        df = registry[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} @ {sf_dir} ({tag})\n")
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
