"""Query registry — the contract behind ``__spark_entry__``.

Every operator from SURVEY.md §2 registers here as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) an
equivalent ANSI-SQL oracle string for the driver's DuckDB differential check.

Determinism rule for oracle parity: double-typed aggregates are computed
through ``DECIMAL(18,4)`` (exact, order-independent in both engines) and cast
back to double, so Spark's nondeterministic partition-sum order can never
drift from DuckDB's result. Helpers in ``functions.numeric``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None = None  # ANSI SQL for DuckDB; None → rows-only check
    bench: bool = False  # include in bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, bench: bool = False, tags: tuple[str, ...] = ()):
    """Decorator: register a query implementation under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, bench=bench, tags=tags)
        return fn

    return deco


def get_registry() -> dict[str, QueryDef]:
    """Import all query modules (side effect: registration) and return the
    full registry."""
    from etl_open_source_spark import queries as _queries  # noqa: F401

    _queries.load_all()
    return REGISTRY
