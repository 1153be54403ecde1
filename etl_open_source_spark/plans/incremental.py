"""Incremental (high-watermark) extraction — the ETL pattern the
reference's full-table extract can't do (core/extractors/sqlserver.py:52
re-reads the whole result set every run).

State: a tiny JSON file per (pipeline, source) holding the last-seen
watermark value; each run reads only rows with watermark_col > last, then
advances the state. The filter is a plain Catalyst predicate, so it pushes
into the parquet scan / JDBC query — an incremental run touches only new
row groups.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class WatermarkStore:
    """File-backed high-watermark registry (timestamps stored as ISO
    strings, numerics as-is)."""

    def __init__(self, path: str):
        self.path = Path(path)

    def _load(self) -> dict:
        if self.path.exists():
            return json.loads(self.path.read_text())
        return {}

    def get(self, key: str):
        return self._load().get(key)

    def set(self, key: str, value) -> None:
        state = self._load()
        state[key] = value
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.path.write_text(json.dumps(state, indent=2, default=str))


def incremental_read(
    df: DataFrame,
    watermark_col: str,
    store: WatermarkStore,
    key: str,
) -> tuple[DataFrame, object]:
    """Filter ``df`` to rows strictly after the stored watermark and return
    (delta, new_watermark). Call ``store.set(key, new_watermark)`` AFTER the
    delta has been durably written — advancing first would drop rows on a
    failed run (at-least-once, the safe default)."""
    last = store.get(key)
    delta = df if last is None else df.filter(F.col(watermark_col) > F.lit(last))
    row = delta.agg(F.max(watermark_col).alias("wm")).collect()[0]
    new_wm = row.wm if row.wm is not None else last
    return delta, new_wm
