"""CLI — run/validate/inspect pipeline specs.

The headless replacement for the reference's PySide6 GUI (ui/main_window.py
"Exécuter maintenant" button → EtlEngine.run_task, SURVEY §3.1):

    python -m etl_open_source_spark validate spec.json
    python -m etl_open_source_spark run spec.json [--history DIR]
    python -m etl_open_source_spark next-run spec.json
    python -m etl_open_source_spark test-connection spec.json CONN_ID
    python -m etl_open_source_spark list-queries [--tag TAG]
"""

from __future__ import annotations

import argparse
import sys
from datetime import datetime


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="etl_open_source_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_run = sub.add_parser("run", help="execute a pipeline spec")
    p_run.add_argument("spec")
    p_run.add_argument("--history", default=None, help="run-history parquet dir")
    p_run.add_argument("--show", type=int, default=5, help="rows of the final dataset to print")

    p_val = sub.add_parser("validate", help="static-check a pipeline spec")
    p_val.add_argument("spec")

    p_next = sub.add_parser("next-run", help="print the next cron fire time")
    p_next.add_argument("spec")

    p_conn = sub.add_parser("test-connection", help="probe a connection in a spec")
    p_conn.add_argument("spec")
    p_conn.add_argument("conn_id")

    p_list = sub.add_parser(
        "list-queries", help="list the registered operator/query surface"
    )
    p_list.add_argument("--tag", default=None, help="filter by tag (e.g. llm, join)")

    args = parser.parse_args(argv)

    if args.cmd == "list-queries":
        # registry introspection needs no spec and no SparkSession
        from etl_open_source_spark.registry import get_registry

        reg = get_registry()
        rows = [
            (n, ",".join(q.tags), "exact-oracle" if q.oracle else "rows-only")
            for n, q in sorted(reg.items())
            if args.tag is None or args.tag in q.tags
        ]
        for n, tags, kind in rows:
            print(f"{n:32s} {kind:12s} {tags}")
        print(f"-- {len(rows)} queries" + (f" tagged {args.tag!r}" if args.tag else ""))
        return 0

    from etl_open_source_spark.plans.models import PipelineSpec

    try:
        spec = PipelineSpec.load(args.spec)
    except Exception as ex:  # malformed JSON / missing fields / bad enums
        # `validate`'s whole job is static checking — a parse failure is an
        # INVALID verdict, not a traceback (and the other commands want the
        # same one-line diagnosis before touching Spark)
        print(f"INVALID: cannot load spec {args.spec!r}: {ex}")
        return 1

    if args.cmd == "validate":
        from etl_open_source_spark.plans.validation import validate_spec

        issues = validate_spec(spec)
        if issues:
            for issue in issues:
                print(f"INVALID: {issue}")
            return 1
        print(f"OK: spec {spec.id!r} ({len(spec.steps)} steps) is valid")
        return 0

    if args.cmd == "next-run":
        from etl_open_source_spark.plans.cron import next_run_from_cron

        print(next_run_from_cron(spec.cron, datetime.now()).isoformat(sep=" "))
        return 0

    # remaining commands need a session
    from etl_open_source_spark.session import get_spark

    spark = get_spark(app_name=f"etl-cli-{args.cmd}")
    try:
        if args.cmd == "test-connection":
            from etl_open_source_spark.plans.connections import test_connection

            conn = spec.connection(args.conn_id)
            if conn is None:
                print(f"INVALID: no connection {args.conn_id!r} in spec")
                return 1
            ok, msg = test_connection(spark, conn)
            print(("OK: " if ok else "FAILED: ") + msg)
            return 0 if ok else 1

        if args.cmd == "run":
            from etl_open_source_spark.plans.runner import PipelineRunner

            runner = PipelineRunner(spark, history_path=args.history)
            result = runner.run(spec)
            print(f"OK: pipeline {spec.id!r} finished")
            if result is not None and args.show:
                result.show(args.show, truncate=False)
            return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
