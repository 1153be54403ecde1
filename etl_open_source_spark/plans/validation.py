"""Spec validation — the reference's declared-but-stubbed validation
service (services/validation_service.py, 0 bytes; structure.txt:65
"Validation de steps et pipelines") made real.

Static checks only (no Spark session needed); schema-level validation
happens for free at Catalyst analysis time when the pipeline runs.
"""

from __future__ import annotations

from etl_open_source_spark.plans.cron import next_run_from_cron
from etl_open_source_spark.plans.models import PipelineSpec, StepType

from datetime import datetime


def validate_spec(spec: PipelineSpec) -> list[str]:
    """Returns a list of human-readable issues; empty list = valid."""
    issues: list[str] = []
    if not spec.steps:
        issues.append("pipeline has no steps")

    orders = [s.order for s in spec.steps]
    if len(set(orders)) != len(orders):
        issues.append(f"duplicate step orders: {sorted(orders)}")

    conn_ids = {c.id for c in spec.connections}
    for c in spec.connections:
        if (c.type or "").lower() == "jdbc" and not c.params.get("url"):
            issues.append(f"jdbc connection {c.id!r} missing 'url' in params")
    for s in spec.steps:
        if s.connection_id is not None and s.connection_id not in conn_ids:
            issues.append(f"step {s.name!r} references unknown connection {s.connection_id!r}")

    ordered = spec.ordered_steps()
    if ordered and ordered[0].step_type != StepType.EXTRACT:
        issues.append(
            f"first step {ordered[0].name!r} is {ordered[0].step_type.value}, expected extract"
        )

    for s in ordered:
        cfg = s.config
        if s.step_type == StepType.EXTRACT:
            conn = spec.connection(s.connection_id)
            if conn is not None and (conn.type or "").lower() == "jdbc":
                # a jdbc extract that reaches the runner without query/table
                # raises a raw KeyError mid-run; catch it at validation
                if not (cfg.get("query") or cfg.get("table")):
                    issues.append(
                        f"jdbc extract step {s.name!r} needs 'query' or 'table'"
                    )
            elif not (cfg.get("query") or cfg.get("table") or cfg.get("path")):
                issues.append(f"extract step {s.name!r} needs 'query', 'table' or 'path'")
            if cfg.get("watermark_col") and not cfg.get("state_path"):
                # incremental extract with nowhere to persist the watermark
                # would re-read everything every run, silently
                issues.append(
                    f"incremental extract step {s.name!r} has 'watermark_col' "
                    f"but no 'state_path'"
                )
        if s.step_type == StepType.TRANSFORM:
            kind = cfg.get("type", "sql")
            if kind == "sql" and not cfg.get("sql"):
                issues.append(f"sql transform step {s.name!r} missing 'sql'")
            if kind == "python" and not cfg.get("fn"):
                issues.append(f"python transform step {s.name!r} missing 'fn'")
            if kind == "operator":
                from etl_open_source_spark.plans.operator_steps import OPERATOR_STEPS

                op = OPERATOR_STEPS.get(cfg.get("name"))
                if op is None:
                    issues.append(
                        f"operator step {s.name!r} has unknown operator "
                        f"{cfg.get('name')!r} (available: {sorted(OPERATOR_STEPS)})"
                    )
                else:
                    missing = [k for k in op.required if k not in cfg]
                    if missing:
                        issues.append(
                            f"operator step {s.name!r} ({cfg['name']}) missing "
                            f"config keys {missing}"
                        )
            if kind == "expect":
                _REQUIRED = {
                    "not_null": ("col",),
                    "unique": ("col",),
                    "in_range": ("col", "lo", "hi"),
                    "accepted": ("col", "values"),
                    "min_rows": ("n",),
                }
                checks = cfg.get("checks")
                if not checks:
                    issues.append(f"expect step {s.name!r} has no 'checks'")
                for c in checks or []:
                    ck = c.get("kind")
                    if ck not in _REQUIRED:
                        issues.append(
                            f"expect step {s.name!r} has unknown check kind {ck!r}"
                        )
                    else:
                        missing = [f for f in _REQUIRED[ck] if f not in c]
                        if missing:
                            issues.append(
                                f"expect step {s.name!r} check {ck!r} missing {missing}"
                            )
        if s.step_type == StepType.LOAD:
            conn = spec.connection(s.connection_id)
            if conn is not None and (conn.type or "").lower() == "jdbc":
                if not cfg.get("table"):
                    issues.append(f"jdbc load step {s.name!r} missing 'table'")
            elif not cfg.get("path"):
                issues.append(f"load step {s.name!r} missing 'path'")
            if cfg.get("mode") == "overwrite_partitions":
                fmt = (
                    (conn.type if conn is not None else None)
                    or cfg.get("format", "parquet")
                ).lower()
                if fmt != "parquet":
                    # only the parquet writer implements dynamic overwrite;
                    # csv/json/jdbc would die mid-pipeline with a mode error
                    issues.append(
                        f"load step {s.name!r} uses mode "
                        f"'overwrite_partitions' but format {fmt!r} does not "
                        f"support it (parquet only)"
                    )
                if not cfg.get("partition_by"):
                    # without partition_by, dynamic overwrite degenerates to
                    # a full truncate — the exact data-loss the mode exists
                    # to prevent; fail at validate time, not mid-write
                    issues.append(
                        f"load step {s.name!r} uses mode 'overwrite_partitions' "
                        f"but has no 'partition_by'"
                    )

    try:
        next_run_from_cron(spec.cron, datetime(2026, 1, 1))
    except Exception as ex:  # noqa: BLE001 — report, don't raise
        issues.append(f"invalid cron {spec.cron!r}: {ex}")

    return issues
