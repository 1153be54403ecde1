"""NaN-ordering/grouping axis (round 11 — nominated in SURVEY §5.13 and
VERDICT r10 item 3).

Earlier axes poisoned ``events.value`` (the non-finite MEASURES axis);
this one poisons the two double SORT-KEY columns no axis has touched —
``orders.o_totalprice`` (the ORDER BY of q_window_rank / q_topk_per_group
and a filter/aggregate input across dozens of queries) and
``customer.c_acctbal`` (q_window_ntile's global sort key, TPC-H q22's
aggregate) — with NaN, ±Inf, NULL and -0.0, then replays every oracled
query differentially.

Mechanisms probed BEFORE seeding (pinned in the micro-tests below so an
engine upgrade that shifts any of them is caught):

- **Total order**: both engines sort NaN GREATER than +Inf. With the
  engine-wide NULLS LAST pins in place the full orders agree: ASC
  ``-Inf < … < +Inf < NaN < NULL(last)``, DESC ``NaN first … NULL last``.
  The engines' *defaults* differ only on NULL placement (Spark ASC =
  NULLS FIRST, DuckDB = NULLS LAST) — that is the long-pinned NULL
  contract, not a NaN one; NaN alone (no NULLs) agrees even unpinned.
- **Grouping**: NaN = NaN for GROUP BY/DISTINCT in both engines (one NaN
  group); -0.0 and 0.0 collapse to one group in both.
- **Join equality**: ``NaN = NaN`` is TRUE in both engines (Spark
  normalizes NaN in comparisons; DuckDB defines a total order).

Comparator caveat (inherited from the driver's hasher): ``canon_val``
maps NaN → None, so an "engine NaN vs oracle NULL" split is invisible to
the hash — consistent with the round-10 contract (non-finite is NULL at
the decimal boundary), but it means this axis proves *value agreement up
to NaN/NULL conflation*, same as the driver does.

First-run findings (round 11): 20 of 240 oracled queries diverged.
18 were oracle-side DECIMAL-cast crashes — DuckDB hard-errors casting
non-finite to its integer-backed decimals where Spark's ANSI cast
silently yields NULL (the r10 mechanism, reached through
o_totalprice/c_acctbal sites the events-only axis never touched):
q_agg_rollup/cube/groupingsets/having/filtered, q_agg_gini (which also
got a finite pre-filter on BOTH sides — corrupt prices have no place in
a rank-weighted concentration statistic), q_join_broadcast,
q_join_multikey, q_mv_incremental, q_rfm_segments,
q_scan_csv_permissive, q_scan_partition_pruned,
q_sink_partition_overwrite, q_sql_transform, q_subquery_correlated,
q_subquery_scalar (for these three the engine side executes SQL through
Spark SQL, which has no ISFINITE and needs none — Spark's ANSI cast
NULLs non-finite by mechanism — so the engine string stays pure ANSI
and only the DuckDB oracle twin carries the guard; a first draft rode a
portable ISNAN/ABS guard along in the engine string and measured ~1.2x
on the benched q_sql_transform for semantics the cast already had),
q_tpch_q22, q_ts_mom_change.
Plus one ENGINE crash: q_quality_benford — NaN passes `>= 1` in both
engines (NaN-high), then Spark's FLOOR(NaN) = 0 (not NULL, not an
error) drives d=0 into log10(1 + 1/d) → ANSI DIVIDE_BY_ZERO, while
FLOOR(+Inf) = Long.MAX contributes a bogus leading 9; fixed with a
finite pre-filter on both sides. And one genuine VALUE divergence:
q_udf_scalar — Python's IEEE NaN fails every `>=` so the UDF tiers NaN
'low', while SQL's NaN-high total order tiers it 'high'; contract
pinned NULL (no tier for a corrupt price) on both sides.

Fixture note: poison rows are appended via ``pa.array`` over python
lists — pandas float64 conflates NaN with missing on parquet write
(same caveat as the non-finite axis). The huge-finite sort extreme is
9.9e8, deliberately NOT larger: the first draft used 9.9e12, which
pushed one month's DECIMAL(18,4) revenue sum past the 2^53 render
boundary and reproduced the decimal axis's known 1-ulp DuckDB
divergence as a false NaN finding (tests/test_decimal_boundary.py owns
that class — and its new fixture-scale tripwire now fails loudly
before any such sweep).
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # soak/axis tier: run with `pytest -m slow`


import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from etl_open_source_spark.registry import get_registry
from tests.oracle_utils import TABLES, assert_frames_match, run_oracle

REGISTRY = get_registry()

NAN, INF, NINF = float("nan"), float("inf"), float("-inf")


def _append_rows(src_parquet: str, dst_parquet, extra: dict) -> None:
    """Append rows (python-list arrays: NaN stays a VALUE, None stays
    null) to a parquet table, preserving the production schema.

    The base table is concatenated at the ARROW level, never round-tripped
    through pandas: a pandas rewrite would conflate any pre-existing NULL
    in a base float column into a NaN VALUE (pandas NaN-as-missing) and
    widen a nullable int column to float64, silently changing the axis
    fixture if future sf fixtures gain NULLs (ADVICE r11)."""
    base = pq.read_table(src_parquet)
    poison = pa.table(
        [pa.array(list(extra[f.name]), type=f.type) for f in base.schema],
        schema=base.schema,
    )
    pq.write_table(pa.concat_tables([base, poison]), dst_parquet)


@pytest.fixture(scope="module")
def nan_dir(tmp_path_factory, sf_dir):
    """sf0.001 with poisoned SORT-KEY doubles appended: six orders whose
    o_totalprice spans NaN/+Inf/-Inf/NULL/-0.0/9.9e8 (fresh
    orderkeys, real custkeys where possible, dates inside the fixture's
    1996 domain) and four customers whose c_acctbal spans
    NaN/+Inf/NULL/-0.0."""
    d = tmp_path_factory.mktemp("nan_sf")

    o_base = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
    some_cust = int(o_base["o_custkey"].dropna().iloc[0])
    _append_rows(
        f"{sf_dir}/orders.parquet",
        d / "orders.parquet",
        {
            "o_orderkey": [9000001, 9000002, 9000003, 9000004, 9000005, 9000006],
            "o_custkey": [some_cust, some_cust, None, some_cust, some_cust, some_cust],
            "o_orderstatus": ["F", "O", "F", "O", "F", "O"],
            "o_totalprice": [NAN, INF, NINF, None, -0.0, 9.9e8],
            "o_orderdate": pd.to_datetime(
                ["1996-03-0%d" % (i + 1) for i in range(6)]
            ),
            "o_orderpriority": ["1-URGENT"] * 6,
        },
    )
    c_base = pq.read_table(f"{sf_dir}/customer.parquet").to_pandas()
    some_nat = int(c_base["c_nationkey"].dropna().iloc[0])
    _append_rows(
        f"{sf_dir}/customer.parquet",
        d / "customer.parquet",
        {
            "c_custkey": [8000001, 8000002, 8000003, 8000004],
            "c_name": ["Customer#nan", "Customer#inf", "Customer#null", "Customer#negz"],
            "c_nationkey": [some_nat, some_nat, None, some_nat],
            "c_acctbal": [NAN, INF, None, -0.0],
            "c_mktsegment": ["BUILDING", "MACHINERY", "BUILDING", "MACHINERY"],
        },
    )
    for t in TABLES:
        if t not in ("orders", "customer"):
            shutil.copyfile(f"{sf_dir}/{t}.parquet", d / f"{t}.parquet")
    # the poison must survive the write: NaN as NaN (not NULL), -0.0 signed
    back = pq.read_table(d / "orders.parquet").to_pandas()
    tail = back[back.o_orderkey >= 9000001]["o_totalprice"]
    assert tail.isna().sum() == 2 and (tail == INF).sum() == 1
    import math

    negz = back[back.o_orderkey == 9000005]["o_totalprice"].iloc[0]
    assert negz == 0.0 and math.copysign(1.0, negz) == -1.0
    return str(d)


ORACLED = sorted(n for n, qd in REGISTRY.items() if qd.oracle is not None)


@pytest.mark.parametrize("name", ORACLED)
def test_nan_sort_keys(spark, nan_dir, name):
    qd = REGISTRY[name]
    assert_frames_match(
        qd.fn(spark, nan_dir).toPandas(), run_oracle(qd.oracle, nan_dir)
    )


# ---------------------------------------------------------------------------
# Mechanism pins: the cross-engine NaN facts the axis (and the engine's
# standing NULLS-LAST policy) rest on. An engine upgrade that moves any
# of these invalidates contracts across the registry — fail loudly here.
# ---------------------------------------------------------------------------


def _nan_probe_frame(spark):
    return spark.createDataFrame(
        [(1, 1.0), (2, NAN), (3, None), (4, INF), (5, -1.0), (6, NAN)],
        "k int, x double",
    )


def test_nan_total_order_agrees_under_nulls_last(spark):
    """With NULLS LAST pinned (the engine-wide policy for nullable sort
    keys), the full ASC order agrees between the engines — including NaN
    ABOVE +Inf — so NaN needs no extra ordering pins anywhere."""
    import duckdb

    from pyspark.sql import functions as F

    df = _nan_probe_frame(spark)
    got = [r.k for r in df.orderBy(F.asc_nulls_last("x"), "k").collect()]
    assert got == [5, 1, 4, 2, 6, 3]

    con = duckdb.connect()
    want = [
        r[0]
        for r in con.sql(
            "SELECT k FROM (VALUES (1, 1.0::DOUBLE), (2, 'nan'::DOUBLE),"
            " (3, NULL::DOUBLE), (4, 'inf'::DOUBLE), (5, -1.0::DOUBLE),"
            " (6, 'nan'::DOUBLE)) t(k, x)"
            " ORDER BY x ASC NULLS LAST, k"
        ).fetchall()
    ]
    assert want == got


def test_nan_rank_ties_agree(spark):
    """DESC NULLS LAST rank over a NaN-bearing key: both engines rank the
    two NaNs tied FIRST (NaN > +Inf), the NULL row last."""
    import duckdb

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = _nan_probe_frame(spark)
    got = {
        r.k: r.rnk
        for r in df.select(
            "k", F.rank().over(Window.orderBy(F.desc_nulls_last("x"))).alias("rnk")
        ).collect()
    }
    assert got == {2: 1, 6: 1, 4: 3, 1: 4, 5: 5, 3: 6}
    con = duckdb.connect()
    want = dict(
        con.sql(
            "SELECT k, RANK() OVER (ORDER BY x DESC NULLS LAST) FROM (VALUES"
            " (1, 1.0::DOUBLE), (2, 'nan'::DOUBLE), (3, NULL::DOUBLE),"
            " (4, 'inf'::DOUBLE), (5, -1.0::DOUBLE), (6, 'nan'::DOUBLE)) t(k, x)"
        ).fetchall()
    )
    assert want == got


def test_nan_grouping_and_join_keys_agree(spark):
    """NaN = NaN for GROUP BY / DISTINCT / join equality in BOTH engines
    (one NaN group; a NaN key joins to a NaN key), and -0.0 collapses
    into the 0.0 group in both — NaN/negative-zero grouping keys need no
    engine-side normalization pins."""
    import duckdb

    from pyspark.sql import functions as F

    df = _nan_probe_frame(spark)
    counts = {
        ("nan" if r.x != r.x else r.x): r["count"]
        for r in df.groupBy("x").count().collect()
        if r.x is not None
    }
    assert counts["nan"] == 2
    assert df.select("x").distinct().count() == 5  # 1, nan, NULL, inf, -1
    pairs = (
        df.alias("a")
        .join(
            df.alias("b"),
            (F.col("a.x") == F.col("b.x")) & (F.col("a.k") < F.col("b.k")),
        )
        .select("a.k", "b.k")
        .collect()
    )
    assert [(r[0], r[1]) for r in pairs] == [(2, 6)]

    con = duckdb.connect()
    assert con.sql("SELECT 'nan'::DOUBLE = 'nan'::DOUBLE").fetchone()[0] is True
    assert (
        con.sql(
            "SELECT COUNT(*) FROM (SELECT DISTINCT x FROM (VALUES"
            " (1.0::DOUBLE), ('nan'::DOUBLE), (NULL::DOUBLE),"
            " ('inf'::DOUBLE), (-1.0::DOUBLE), ('nan'::DOUBLE)) t(x))"
        ).fetchone()[0]
        == 5
    )

    z = spark.createDataFrame([(0.0,), (-0.0,)], "x double")
    assert z.groupBy("x").count().collect()[0]["count"] == 2
    assert (
        con.sql(
            "SELECT COUNT(*) FROM (VALUES (0.0::DOUBLE), (-0.0::DOUBLE)) t(x)"
            " GROUP BY x"
        ).fetchone()[0]
        == 2
    )
