"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic event generator, batch + streaming.

This is the engine's extensibility proof for the reference's
extractor-plugin architecture (core/extractors/base.py, a 0-byte stub —
the plug-in point existed only as intent): a new source is a class
registered with ``spark.dataSource.register``; `spark.read.format(name)`
and `spark.readStream.format(name)` then work like any built-in.

Determinism: rows derive from an LCG seeded by (seed, partition, row) —
same options ⇒ identical data, across runs and across batch/streaming.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
_TYPES = ["view", "click", "purchase", "signup", "error"]
_BASE_TS = datetime(2024, 1, 1)


def _lcg(x: int) -> int:
    return (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)


def _row(seed: int, i: int):
    h = _lcg(seed * 1_000_003 + i)
    return (
        i,
        _BASE_TS + timedelta(seconds=i * 37 + h % 29),
        h % 50,
        _TYPES[(h >> 8) % len(_TYPES)],
        round(((h >> 16) % 100_000) / 100.0, 2),
    )


class SyntheticEventsDataSource(DataSource):
    """Options: rows (total), partitions, seed, stream_batch_size."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema):
        return _BatchReader(self.options)

    def simpleStreamReader(self, schema):
        return _StreamReader(self.options)


class _Part(InputPartition):
    def __init__(self, index: int, start: int, end: int):
        self.index, self.start, self.end = index, start, end


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        per = -(-self.rows // self.n_parts)
        return [
            _Part(i, i * per, min((i + 1) * per, self.rows))
            for i in range(self.n_parts)
            if i * per < self.rows
        ]

    def read(self, partition: _Part):
        for i in range(partition.start, partition.end):
            yield _row(self.seed, i)


class _StreamReader(SimpleDataSourceStreamReader):
    """Finite stream: emits the same deterministic rows in micro-batches of
    ``stream_batch_size`` until ``rows`` are delivered, then reports no new
    data (so processAllAvailable terminates)."""

    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.batch = int(options.get("stream_batch_size", 100))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        pos = start["pos"]
        end = min(pos + self.batch, self.rows)
        rows = iter([_row(self.seed, i) for i in range(pos, end)])
        return rows, {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(self.seed, i) for i in range(start["pos"], end["pos"])])

    def commit(self, end: dict) -> None:
        pass
