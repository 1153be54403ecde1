"""Cron next-run computation — parity with the reference's parser
(reference scheduler/cron_parser.py:4-42), which supports exactly three
forms of the minute field with all other fields '*':

  "* * * * *"     → next minute boundary
  "*/N * * * *"   → next minute divisible by N
  "M * * * *"     → next occurrence of minute M (hourly)

Anything else raises (the reference raises NotImplementedError). We keep
that contract and extend it with fixed-hour support ("M H * * *") — a
documented superset.
"""

from __future__ import annotations

from datetime import datetime, timedelta


def next_run_from_cron(cron_expr: str, now: datetime) -> datetime:
    parts = cron_expr.split()
    if len(parts) != 5:
        raise ValueError(f"invalid cron expression: {cron_expr!r}")
    minute, hour, dom, month, dow = parts
    if (dom, month, dow) != ("*", "*", "*"):
        raise NotImplementedError(f"unsupported cron expression: {cron_expr!r}")

    base = now.replace(second=0, microsecond=0)

    if hour == "*":
        if minute == "*":
            return base + timedelta(minutes=1)
        if minute.startswith("*/"):
            n = int(minute[2:])
            if n <= 0:
                raise ValueError(f"invalid step: {cron_expr!r}")
            nxt = base + timedelta(minutes=1)
            while nxt.minute % n != 0:
                nxt += timedelta(minutes=1)
            return nxt
        m = int(minute)
        if not 0 <= m <= 59:
            raise ValueError(f"invalid minute: {cron_expr!r}")
        nxt = base.replace(minute=m)
        if nxt <= now:
            nxt += timedelta(hours=1)
        return nxt

    # extension: fixed "M H * * *" daily schedule. Both fields must be
    # literal: real cron reads "* H * * *" as every-minute-during-hour-H,
    # and silently mapping '*' to :00 would fire 1/day instead of 60 —
    # unsupported forms must raise per the module contract.
    if minute == "*":
        raise NotImplementedError(
            f"unsupported cron (wildcard minute with fixed hour): {cron_expr!r}"
        )
    h = int(hour)
    m = int(minute)
    if not (0 <= h <= 23 and 0 <= m <= 59):
        raise ValueError(f"invalid time: {cron_expr!r}")
    nxt = base.replace(hour=h, minute=m)
    if nxt <= now:
        nxt += timedelta(days=1)
    return nxt
