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
