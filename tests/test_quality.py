"""Data-quality operator tests (operators/quality.py) — violation counting
on deliberately dirty data, plus the one-scan plan shape for profiling."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_open_source_spark.operators.quality import (
    accepted,
    in_range,
    not_null,
    profile_columns,
    run_checks,
    unique,
)


def _dirty(spark):
    rows = [
        (1, 10.0, "A"),
        (1, -5.0, "A"),      # dup id, out-of-range
        (None, 20.0, "B"),   # null id
        (3, None, "Z"),      # null amount (range check must NOT count it)
        (4, 99.0, "B"),
    ]
    return spark.createDataFrame(rows, "id bigint, amount double, status string")


def test_run_checks_counts_violations(spark):
    df = _dirty(spark)
    dim = spark.createDataFrame([(1,), (3,)], "k bigint")
    out = {
        r["rule"]: r["violations"]
        for r in run_checks(
            df,
            row_checks=[
                not_null("id"),
                unique("id"),
                in_range("amount", 0, 100),
                accepted("status", ["A", "B"]),
            ],
            fk_checks=[("fk(id->dim)", "id", dim, "k")],
        ).collect()
    }
    assert out["not_null(id)"] == 1
    assert out["unique(id)"] == 1          # one extra row beyond first per key
    assert out["in_range(amount,0,100)"] == 1  # -5 only; NULL not counted
    assert out["accepted(status)"] == 1    # 'Z'
    assert out["fk(id->dim)"] == 1         # id=4 orphan; NULL id excluded


def test_profile_columns_values(spark):
    df = _dirty(spark)
    prof = {r["col_name"]: r for r in profile_columns(df, ["amount"], ["status"]).collect()}
    a = prof["amount"]
    assert a["n_rows"] == 5 and a["n_nulls"] == 1 and a["n_distinct"] == 4
    assert a["min_num"] == -5.0 and a["max_num"] == 99.0
    assert a["min_str"] is None and a["max_str"] is None
    s = prof["status"]
    assert s["n_nulls"] == 0 and s["n_distinct"] == 3
    assert s["min_str"] == "A" and s["max_str"] == "Z"


def test_profile_is_single_scan(spark, sf_dir):
    """The profile of N columns must not scan the table N times — one wide
    aggregate, so exactly one scan node in the plan."""
    from etl_open_source_spark.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    plan = profile_columns(
        o, ["o_custkey", "o_totalprice"], ["o_orderstatus"]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_row_checks_single_scan(spark, sf_dir):
    from etl_open_source_spark.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    plan = (
        run_checks(o, row_checks=[not_null("o_orderkey"), unique("o_orderkey")])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1


def test_psi_hand_computed_and_single_sided_type(spark):
    """PSI on a hand-built two-type corpus: one type with a known shift
    (hand-computed PSI), one type whose data lives entirely in the
    reference half (psi must be 0 with n_bins_used 0, not NaN/Inf)."""
    import math
    from datetime import datetime

    from etl_open_source_spark.registry import get_registry
    import tempfile, os

    # build a tiny parquet fixture dir with only the events table
    tmp = tempfile.mkdtemp(prefix="psi_fix_")
    rows = []
    # type 'a': days 1..4 (ref = days 1..2, cur = days 3..4 — split at
    # min + (3//2)=1 day -> ref is day<=2). ref values in [0,10), cur
    # shifted into the top bin.
    eid = 0
    for day, vals in [(1, [0.0, 1.0]), (2, [2.0, 9.0]),
                      (3, [9.5, 9.5]), (4, [9.9, 0.5])]:
        for v in vals:
            rows.append((eid, datetime(2024, 1, day, 12, 0), 1, "a", v, "{}"))
            eid += 1
    # type 'b': a single day -> split_day = that day -> everything 'ref'
    for v in [1.0, 2.0]:
        rows.append((eid, datetime(2024, 1, 1, 12, 0), 2, "b", v, "{}"))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))

    out = {
        r.event_type: r
        for r in get_registry()["q_quality_psi"].fn(spark, tmp).collect()
    }
    b = out["b"]
    assert (b.n_ref, b.n_cur, b.n_bins_used) == (2, 0, 0)
    assert b.psi == 0.0

    a = out["a"]
    assert (a.n_ref, a.n_cur) == (4, 4)
    # ref range [0, 9]; bin width 0.9; ref bins: 0,1,2,9 -> one per bin
    # cur bins: 9.5->9(capped), 9.5->9, 9.9->9, 0.5->0
    # used bins: bin0 (p=1/4, q=1/4, contrib 0), bin9 (p=1/4, q=3/4)
    expected = round((0.75 - 0.25) * math.log(0.75 / 0.25), 8)
    assert a.n_bins_used == 2
    assert abs(a.psi - expected) < 1e-9, (a.psi, expected)
