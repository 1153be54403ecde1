"""Driver-mirror parity test: every registered query vs its DuckDB oracle.

This is the local pre-flight for the driver's t2 correctness gate — same
tables, same comparison semantics (row count + columns + order-insensitive
values), run at sf0.001 for speed (driver uses sf0.01).
"""

from __future__ import annotations

import pytest

from etl_open_source_spark.registry import get_registry
from tests.oracle_utils import assert_frames_match, run_oracle

REGISTRY = get_registry()

# Queries whose floats are legitimately not bit-identical between engines
# (documented per-query); value → decimal places to round to before compare.
FLOAT_ROUND: dict[str, int] = {}


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_parity(spark, sf_dir, name):
    qd = REGISTRY[name]
    sdf = qd.fn(spark, sf_dir)
    spdf = sdf.toPandas()
    if qd.oracle is None:
        # rows-only contract: must run and return a stable schema
        assert spdf.shape[1] > 0
        return
    odf = run_oracle(qd.oracle, sf_dir)
    assert_frames_match(spdf, odf, float_decimals=FLOAT_ROUND.get(name))
