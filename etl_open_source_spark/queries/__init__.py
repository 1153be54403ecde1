"""Query modules — importing each module registers its queries.

Keep this list in sync with SURVEY.md §2's inventory sections.
"""

from __future__ import annotations

import importlib

_MODULES = [
    "aggregates",
    "scans",
    "filters",
    "setops",
    "scalar",
    "joins",
    "windows",
    "stream_windows",
    "llm",
    "udfs",
    "catalog_q",
    "tpch",
    "timeseries",
    "scale",
    "scalar2",
    "misc",
    "sampling",
    "quality_q",
    "tpch2",
]

_loaded = False


def load_all() -> None:
    global _loaded
    if _loaded:
        return
    for m in _MODULES:
        importlib.import_module(f"{__name__}.{m}")
    _loaded = True
