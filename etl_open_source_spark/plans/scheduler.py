"""Polling scheduler — parity with the reference's daemon-thread scheduler
(reference scheduler/scheduler.py:14-88: 30 s poll; first sighting only
schedules; fires when now >= cached next-run) and per-task worker
(scheduler/worker.py:8-25: one thread per firing, exceptions logged and
swallowed).

Runs on the Spark driver; each fired pipeline is a Spark job.
"""

from __future__ import annotations

import logging
import threading
from datetime import datetime

from etl_open_source_spark.plans.cron import next_run_from_cron
from etl_open_source_spark.plans.models import PipelineSpec
from etl_open_source_spark.plans.runner import PipelineRunner

log = logging.getLogger(__name__)


class Scheduler:
    def __init__(
        self,
        runner: PipelineRunner,
        specs: list[PipelineSpec],
        check_interval_seconds: int = 30,
        clock=datetime.now,
    ):
        self.runner = runner
        self.specs = {s.id: s for s in specs}
        self.check_interval_seconds = check_interval_seconds
        self.clock = clock
        self.next_runs: dict[str, datetime] = {}
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # ------------------------------------------------------------- loop

    def start(self) -> None:
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)

    def _loop(self) -> None:
        while not self._stop.wait(self.check_interval_seconds):
            try:
                self.poll_once()
            except Exception:  # noqa: BLE001 — scheduler must survive task errors
                log.exception("scheduler poll failed")

    # ------------------------------------------------------------- tick

    def poll_once(self, now: datetime | None = None) -> list[str]:
        """One scheduling tick; returns ids of fired pipelines. First
        sighting of a task only schedules it (reference behavior:
        scheduler.py:67-72 — a task never fires earlier than one poll
        after startup)."""
        now = now or self.clock()
        fired: list[str] = []
        for task_id, spec in self.specs.items():
            if not spec.enabled:
                continue
            if task_id not in self.next_runs:
                self.next_runs[task_id] = next_run_from_cron(spec.cron, now)
                continue
            if now >= self.next_runs[task_id]:
                self.next_runs[task_id] = next_run_from_cron(spec.cron, now)
                self._fire(spec)
                fired.append(task_id)
        return fired

    def _fire(self, spec: PipelineSpec) -> None:
        def run():
            try:
                self.runner.run(spec)
            except Exception:  # noqa: BLE001 — worker swallows after logging
                log.exception("pipeline %s failed", spec.id)

        threading.Thread(target=run, daemon=True).start()
