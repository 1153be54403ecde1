"""Non-finite-measures axis (round 10 — nominated and seeded the same
round).

The generators put NaN/Inf only in embedding scales; the MEASURE pools
(events.value, the money columns) never draw them — yet corrupt floats
are routine at corpus scale, and the engines disagree at the exact point
every aggregate touches them:

- **Spark's ANSI decimal cast silently NULLs non-finite doubles**
  (probed: ``CAST(NaN/±Inf AS DECIMAL)`` → NULL even with ansi on,
  while finite OUT-OF-RANGE values hard-error — two different regimes
  in one cast), so every decimal-fold query drops corrupt measures by
  mechanism.
- **DuckDB's cast hard-errors on non-finite** ("can't be cast ...
  INT64/INT128" — decimals are integer-backed), so every unguarded
  oracle crashed where the engine answered.

Contract pinned engine-wide: **non-finite measures are NULL at the
decimal boundary** — oracles mirror with ``CASE WHEN ISFINITE(x) THEN x
END`` inside the cast (13 ``CAST(value AS DECIMAL)`` sites, plus
power-level guards in q_agg_skew_kurt: the guard must sit on the POWER,
not the input, because a large finite value can overflow to Inf only at
v⁴). Three double-path queries got the same semantics explicitly
(functions/numeric.py ``finite_or_null``): q_ts_anomaly (one NaN
otherwise drags median/MAD to ±Inf differently per engine), q_quality_psi
(a NaN poisons the reference range, collapsing every bin), and
q_join_interval_overlap (±Inf window lengths hard-errored BOTH engines
inside the interval arithmetic; now the NULL window end fails the
validity predicate and the row drops — the inverted-window drop contract
extended).

First-run findings: 17 of 240 oracled queries (15 oracle crashes, the
anomaly mismatch, the interval both-crash). After the mirrors: 240/240
match on the poisoned fixture, benign sf0.001/sf0.01 parity unchanged.

DuckDB syntax caveat recorded for future oracles: a CTE cannot shadow a
same-named view (``WITH events AS (... FROM events)`` binds as a
circular reference, unlike Postgres) — clean-source CTEs must take a new
name.

Generator caveat (why this axis is pinned, not drawn): pandas float64
columns CONFLATE NaN with missing — ``Table.from_pandas`` writes NaN as
parquet NULL — so hostile NaN payloads must be built from python lists
via ``pa.array`` (as here); threading NaN through the existing
pandas-based generators would require object-dtype columns end to end.
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


@pytest.fixture(scope="module")
def nonfinite_dir(tmp_path_factory, sf_dir):
    """sf0.001 with six poisoned events appended: NaN/±Inf values across
    two users and the view/click/purchase types, timestamps inside
    January 2024. (Historical note: staying inside 2024-01 was originally
    forced by the gapfill/interpolate oracles' constant GENERATE_SERIES
    spine; those oracles derive their spine from per-user bounds since
    the r12 calendar axis, so the January confinement is now just a
    benign fixture choice.)"""
    d = tmp_path_factory.mktemp("nonfinite_sf")
    ev_schema = pq.read_schema(f"{sf_dir}/events.parquet")
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    base = {
        "event_id": [900001, 900002, 900003, 900004, 900005, 900006],
        "ts": pd.to_datetime(
            ["2024-01-15 00:%d0:00" % i for i in range(6)]
        ),
        "user_id": [9001, 9001, 9001, 9002, 9002, 9002],
        "event_type": ["view", "click", "purchase", "view", "click", "purchase"],
        "value": [NAN, INF, NINF, 1.5, NAN, 2.5],
        "props": ["{}"] * 6,
    }
    arrays = []
    for f in ev_schema:
        vals = list(ev[f.name]) + list(base[f.name])
        if pa.types.is_floating(f.type):
            # python-list path: NaN stays a VALUE, None stays null
            arrays.append(pa.array([float(v) for v in vals], type=f.type))
        else:
            arrays.append(pa.array(vals, type=f.type))
    pq.write_table(pa.table(arrays, schema=ev_schema), d / "events.parquet")
    for t in TABLES:
        if t != "events":
            shutil.copyfile(f"{sf_dir}/{t}.parquet", d / f"{t}.parquet")
    # the poison must survive the write: NaN as NaN, not NULL
    back = pq.read_table(d / "events.parquet").to_pandas()
    tail = back[back.event_id >= 900001]["value"]
    assert tail.isna().sum() == 2 and (tail == INF).sum() == 1
    return str(d)


ORACLED = sorted(n for n, qd in REGISTRY.items() if qd.oracle is not None)


@pytest.mark.parametrize("name", ORACLED)
def test_nonfinite_measures(spark, nonfinite_dir, name):
    qd = REGISTRY[name]
    assert_frames_match(
        qd.fn(spark, nonfinite_dir).toPandas(), run_oracle(qd.oracle, nonfinite_dir)
    )


def test_spark_decimal_cast_nonfinite_contract(spark):
    """The mechanism the whole axis rests on, pinned so a Spark upgrade
    that changes it is caught: ANSI cast of non-finite doubles to decimal
    yields NULL (silently — unlike finite out-of-range, which errors),
    and DuckDB's equivalent cast hard-errors unless guarded."""
    import duckdb
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(NAN,), (INF,), (NINF,), (1.5,)], "v double")
    got = [r["d"] for r in df.select(F.col("v").cast("decimal(18,4)").alias("d")).collect()]
    assert [x is None for x in got] == [True, True, True, False]
    con = duckdb.connect()
    with pytest.raises(Exception, match="can't be cast"):
        con.sql("SELECT CAST('nan'::DOUBLE AS DECIMAL(18,4))").fetchall()
    assert con.sql(
        "SELECT CAST(CASE WHEN ISFINITE('nan'::DOUBLE) THEN 'nan'::DOUBLE END"
        " AS DECIMAL(18,4))"
    ).fetchall() == [(None,)]


def test_money_path_nonfinite_contract(spark, tmp_path, sf_dir):
    """The money-column regime, pinned on a representative TPC-H shape
    rather than patching 100+ money oracles: a NaN price flows through
    the engine's decimal fold as NULL (the row silently drops from the
    sum — the sanctioned pre-filter is q_quality_checks' in_range), while
    an UNGUARDED oracle-style DuckDB cast errors. Registered money
    oracles stay unguarded because the sf fixtures and every generator
    keep prices finite; this test is the documented latent-class pin
    (same approach as the 2^53 decimal→double boundary: mechanism
    pinned, exposure measured, no blanket rewrite)."""
    import duckdb
    from pyspark.sql import functions as F

    lineitem = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pandas().head(10)
    lineitem.loc[0, "l_extendedprice"] = NAN
    schema = pq.read_schema(f"{sf_dir}/lineitem.parquet")
    arrays = []
    for f in schema:
        vals = list(lineitem[f.name])
        if pa.types.is_floating(f.type):
            arrays.append(pa.array([float(v) for v in vals], type=f.type))
        else:
            arrays.append(pa.array(vals, type=f.type))
    p = tmp_path / "lineitem.parquet"
    pq.write_table(pa.table(arrays, schema=schema), p)

    df = spark.read.parquet(str(p))
    row = df.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("s"),
        F.count("l_extendedprice").alias("n"),
    ).collect()[0]
    # NaN is NOT NULL (count sees it) but vanishes from the decimal sum
    assert row["n"] == 10
    finite_sum = sum(v for v in lineitem["l_extendedprice"][1:])
    assert abs(float(row["s"]) - finite_sum) < 1e-6
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{p}'")
    with pytest.raises(Exception, match="can't be cast"):
        con.sql(
            "SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,4))) FROM lineitem"
        ).fetchall()
