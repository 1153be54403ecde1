"""Registry-wide guard: no Python in the hot path.

"UDFs are the slow path" is a design rule, not a hope — this test scans
EVERY registered query's analyzed plan for Python-evaluation nodes and
fails if one appears outside the sanctioned set:

* the four UDF-surface demos (queries/udfs.py) whose PURPOSE is the
  Python hop (scalar udf, Arrow pandas_udf, grouped pandas UDAF, UDTF);
* the multimodal family, whose binary decode stages are Arrow-batched
  ``mapInPandas`` by design (batch-level hop, never per-row — the
  sanctioned pattern for work Spark's builtins cannot express).

A new query that sneaks in a convenience ``@udf`` — 10-100× slower than
the equivalent builtin at 100 TB — turns this red immediately.

Known cost: building a query's DataFrame requires calling ``fn``, and the
sink/maintenance queries execute their write stage eagerly while doing so
(at sf0.001 — a few seconds across the registry). Accepted: the plan is
only materialized per-query here, and the same fns are exercised anyway
by the parity suite.
"""

from __future__ import annotations

import pytest

from etl_open_source_spark.registry import get_registry

REGISTRY = get_registry()

_PY_MARKERS = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "AggregateInPandas",
    "PythonUDTF",
)

# name -> markers it is allowed to plan (exact, so an upgrade that also
# removes the hop forces this list to shrink)
_SANCTIONED = {
    "q_udf_scalar": {"BatchEvalPython"},
    "q_udf_pandas": {"ArrowEvalPython"},
    "q_udaf_pandas": {"FlatMapGroupsInPandas"},
    "q_udtf": {"BatchEvalPython", "PythonUDTF"},
    "q_multimodal_meta": {"MapInPandas"},
    "q_multimodal_decode": {"MapInPandas"},
    "q_multimodal_resize": {"MapInPandas"},
    "q_multimodal_audio_chunks": {"MapInPandas"},
}


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_python_in_hot_path(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("extended")
    )
    found = {m for m in _PY_MARKERS if m in plan}
    allowed = _SANCTIONED.get(name, set())
    assert found <= allowed, (
        f"{name} plans Python-eval node(s) {sorted(found - allowed)} — "
        f"replace with pyspark.sql.functions builtins / higher-order "
        f"functions, or (for genuinely inexpressible work) an Arrow-batched "
        f"mapInPandas added to the sanctioned list with justification"
    )
    if allowed:
        # sanctioned queries must still plan their hop — if the hop is
        # gone, remove the sanction so the guard stays tight
        assert found == allowed, (
            f"{name} no longer plans {sorted(allowed - found)}; "
            f"shrink _SANCTIONED"
        )


def test_no_forced_broadcast_hints_in_source():
    """No ``.hint("broadcast")`` anywhere in the engine source (VERDICT
    r6). A *forced* broadcast of an unbounded-cardinality side (a corpus
    vocabulary, a fact-derived aggregate) OOMs the driver at 100 TB where
    an unhinted join lets AQE broadcast only when the runtime size
    qualifies and degrade to a shuffle join when it doesn't. Explicit
    ``F.broadcast()`` calls on dimension-sized/model-sized frames remain
    allowed — this guard targets the string-hint form, which history
    shows is how the unbounded ones sneak in (q_text_lm_score, the
    frequent-shingle join). Add an allowlist entry here only with a
    written cardinality bound."""
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parents[1] / "etl_open_source_spark"
    offenders = []
    for p in root.rglob("*.py"):
        for i, line in enumerate(p.read_text().splitlines(), 1):
            if re.search(r"""\.hint\(\s*['"]broadcast['"]""", line):
                offenders.append(f"{p.relative_to(root.parent)}:{i}")
    assert not offenders, (
        f"forced broadcast hint(s) found: {offenders} — drop the hint and "
        f"let AQE choose, or use F.broadcast() with a documented bound"
    )
