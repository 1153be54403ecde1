"""Empty-input differential axis (round 10).

Every prior axis varies the CONTENT of the rows (ties, NULL keys,
boundary values, hostile plans); none varied the row COUNT down to zero.
Yet "an empty table" is the input every scheduled 100 TB pipeline
eventually meets — the empty day/partition after a late upstream, a
filter that matched nothing, a brand-new tenant — and the randomized
generators all draw >= 3 rows, so the class was structurally invisible
to every existing suite.

This axis writes an sf-dir in which EVERY table has zero rows but the
exact production schema (taken from the real sf0.001 parquet footers,
so types can never drift from the fixtures), then re-runs the whole
registry: oracled queries against their DuckDB oracles through the
driver-faithful comparator, rows-only queries for
crash-freedom.

First-run catches (all fixed, contracts in the affected docstrings):
- q_graph_pagerank: ZeroDivisionError on the teleport base with zero
  vertices — now returns an empty (v, r) frame (operators/graph.py).
- q_scan_partition_pruned / q_sink_partition_overwrite: partitioned
  write of zero rows creates NO partition directories, so the
  schema-inferring read-back raised UNABLE_TO_INFER_SCHEMA — both now
  pass the source schema explicitly (the same fix the plain
  parquet/ORC roundtrips got in round 8).
- q_agg_rollup / q_agg_cube / q_agg_groupingsets / q_ts_rollup: Spark's
  Expand+keyed hash aggregate emits NO rows over an empty table where
  ANSI emits the () grand-total grouping-set row (DuckDB does) — pinned
  oracle-side with HAVING COUNT(*) > 0, a no-op on non-empty input.
- q_quality_fk: a bare SUM(CASE ...) orphan count is NULL over an empty
  child table where the engine's count(when(...)) is 0 — oracle now
  COALESCEs to 0 (0 orphans IS the right audit answer for no rows).
- q_compact_files: Spark's FileFormatWriter emits exactly one
  schema-carrying empty part file for an empty frame, so on-disk file
  counts floor at 1 — oracle now GREATEST(1, LEAST(n, rows)).
- q_sim_ann / q_sim_pq / q_sim_ivfpq: the ADVICE-r9 named
  empty-training-set ValueError leaked through the query surface —
  queries now answer empty-in/empty-out like q_sim_topk. Since r11 the
  emptiness check IS the fit's first-row probe (EmptyTrainingSet caught
  at the query layer, ADVICE r10) — no separate isEmpty() action; the
  operator-level raise stays for explicit fit calls on nothing.

No composition with the hostile plan: with zero rows there is no
partition order, batch split, or shuffle fan-in to vary — the composed
run would re-test plan construction only, which test_partition_hostility
already covers on data that exercises it.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # soak/axis tier: run with `pytest -m slow`


import pyarrow.parquet as pq
from etl_open_source_spark.registry import get_registry
from tests.oracle_utils import TABLES, assert_frames_match, run_oracle

REGISTRY = get_registry()

# The trained-quantizer ANN queries short-circuit on an empty corpus by
# contract (empty-in/empty-out, no fit) — assert that shape explicitly.
EMPTY_BY_CONTRACT = {"q_sim_ann", "q_sim_pq", "q_sim_ivfpq"}


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory, sf_dir):
    """Every fixture table at zero rows, schemas copied from the real
    parquet footers so column names/types are production-exact."""
    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        schema = pq.read_schema(f"{sf_dir}/{t}.parquet")
        pq.write_table(schema.empty_table(), d / f"{t}.parquet")
    return str(d)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_empty_input(spark, empty_dir, name):
    qd = REGISTRY[name]
    res = qd.fn(spark, empty_dir).toPandas()
    if qd.oracle is not None:
        assert_frames_match(res, run_oracle(qd.oracle, empty_dir))
    elif name in EMPTY_BY_CONTRACT:
        assert len(res) == 0, (
            f"{name}: empty corpus must produce an empty result by the "
            f"empty-in/empty-out contract, got {len(res)} rows"
        )


def test_fk_audit_empty_parent_null_children(spark, tmp_path, sf_dir):
    """Deterministic pin of the zero-floor soak catch: with an EMPTY
    parent table, SQL's `x NOT IN (empty set)` is TRUE even for x = NULL
    (no comparisons happen), so a bare NOT IN oracle counts NULL child
    keys as orphans — violating the engine's documented MATCH SIMPLE
    contract (a NULL FK is never an orphan). The oracle now guards each
    orphan predicate with `child IS NOT NULL`; this fixture (empty
    customer, orders with 2 NULL + 3 non-NULL custkeys) diverges 5 vs 7
    without the guard."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "fk_empty_parent"
    d.mkdir()
    for t in TABLES:
        schema = pq.read_schema(f"{sf_dir}/{t}.parquet")
        if t == "orders":
            orders = pd.DataFrame(
                {
                    "o_orderkey": [0, 1, 2, 3, 4],
                    "o_custkey": pd.array([1, 99, 0, None, None], dtype="Int64"),
                    "o_orderstatus": ["F", "O", "F", "O", "F"],
                    "o_totalprice": [10.0, 20.0, 30.0, 40.0, 50.0],
                    "o_orderdate": pd.to_datetime(["1996-01-01"] * 5),
                    "o_orderpriority": ["1-URGENT"] * 5,
                }
            )
            tbl = pa.Table.from_pandas(orders, preserve_index=False)
            # reconcile to the production schema's field order/types
            tbl = tbl.select(schema.names).cast(schema)
            pq.write_table(tbl, d / f"{t}.parquet")
        else:
            pq.write_table(schema.empty_table(), d / f"{t}.parquet")
    qd = REGISTRY["q_quality_fk"]
    got = qd.fn(spark, str(d)).toPandas()
    assert_frames_match(got, run_oracle(qd.oracle, str(d)))
    row = got[got["edge"] == "orders.o_custkey->customer"].iloc[0]
    assert int(row["n_orphans"]) == 3  # the NULL custkeys are NOT orphans


def test_fk_audit_null_parent_key(spark, tmp_path, sf_dir):
    """ADVICE-r10 pin, the dual of the empty-parent catch: a NULL value
    inside the PARENT key set makes `x NOT IN (..., NULL)` UNKNOWN for
    every genuine orphan, so an unguarded oracle undercounts orphans to
    0 while the engine's null-unsafe left-join equality (a NULL parent
    key matches nothing) correctly counts them. The oracle now filters
    `WHERE <pk> IS NOT NULL` inside each subquery; this fixture
    (customer keys {1, NULL}, orders custkeys {1, 99, NULL}) diverges
    1 vs 0 without the parent-side guard."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "fk_null_parent"
    d.mkdir()
    for t in TABLES:
        schema = pq.read_schema(f"{sf_dir}/{t}.parquet")
        if t == "customer":
            cust = pd.DataFrame(
                {
                    "c_custkey": pd.array([1, None], dtype="Int64"),
                    "c_name": ["Customer#1", "Customer#null"],
                    "c_nationkey": pd.array([None, None], dtype="Int32"),
                    "c_acctbal": [0.0, 0.0],
                    "c_mktsegment": ["BUILDING", "BUILDING"],
                }
            )
            tbl = pa.Table.from_pandas(cust, preserve_index=False)
            tbl = tbl.select(schema.names).cast(schema)
            pq.write_table(tbl, d / f"{t}.parquet")
        elif t == "orders":
            orders = pd.DataFrame(
                {
                    "o_orderkey": [0, 1, 2],
                    "o_custkey": pd.array([1, 99, None], dtype="Int64"),
                    "o_orderstatus": ["F", "O", "F"],
                    "o_totalprice": [10.0, 20.0, 30.0],
                    "o_orderdate": pd.to_datetime(["1996-01-01"] * 3),
                    "o_orderpriority": ["1-URGENT"] * 3,
                }
            )
            tbl = pa.Table.from_pandas(orders, preserve_index=False)
            tbl = tbl.select(schema.names).cast(schema)
            pq.write_table(tbl, d / f"{t}.parquet")
        else:
            pq.write_table(schema.empty_table(), d / f"{t}.parquet")
    qd = REGISTRY["q_quality_fk"]
    got = qd.fn(spark, str(d)).toPandas()
    assert_frames_match(got, run_oracle(qd.oracle, str(d)))
    row = got[got["edge"] == "orders.o_custkey->customer"].iloc[0]
    # 99 is a genuine orphan even though the parent set contains NULL;
    # the NULL child is not an orphan (MATCH SIMPLE)
    assert int(row["n_orphans"]) == 1
