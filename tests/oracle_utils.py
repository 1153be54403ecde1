"""Local mirror of the driver's DuckDB differential check.

Runs a query's oracle SQL in DuckDB over the same parquet fixtures and
compares the Spark result: row count, column set, and order-insensitive
values. Floats are compared exactly by default — the engine aggregates
through decimal fixed-point precisely so results are bit-stable; any drift
is a bug we want to see here, not in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import atexit
import datetime
import decimal
import math
import shutil
import tempfile

import duckdb
import numpy as np
import pandas as pd


def fixture_dir(prefix: str) -> str:
    """Per-example parquet fixture dir, removed at process exit.

    The hypothesis suites create one dir per drawn example; a bare
    ``tempfile.mkdtemp`` leaked them all, and the close-of-round soak
    multiplies that by every iteration — measured at the r12 close:
    ~7,000 leaked ``randdiff_*``/``chisq_prop_*`` dirs (565 MB) in /tmp
    degraded the bench's Python-UDF-heavy queries ~14% on an otherwise
    quiet box (12.1 s vs 13.8 s totals on the identical tree) via
    tmp-directory entry pressure. atexit (not per-example rmtree) keeps
    a failing example's parquet on disk for the rest of the process —
    the falsifying draw hypothesis prints is the durable repro."""
    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    import os

    con = duckdb.connect()
    for t in TABLES:
        # synthetic differential fixtures may materialize only the tables
        # a query reads; register what exists (a query referencing a
        # missing view still fails loudly at bind time)
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.sql(sql).df()


def canon_val(v, float_decimals: int | None = None):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if v is pd.NaT:
        return None
    if isinstance(v, (np.bool_, bool)):
        return bool(v)
    if isinstance(v, (np.integer, int)):
        return int(v)
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return round(f, float_decimals) if float_decimals is not None else f
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        return v
    if isinstance(v, datetime.date):
        # Spark DATE → datetime.date; DuckDB's pandas frame gives midnight
        # datetimes. Compare at datetime granularity.
        return datetime.datetime(v.year, v.month, v.day)
    if isinstance(v, np.ndarray):
        return tuple(canon_val(x, float_decimals) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(canon_val(x, float_decimals) for x in v)
    return v


def canon_frame(df: pd.DataFrame, float_decimals: int | None = None):
    cols = sorted(df.columns)
    rows = [
        tuple(canon_val(v, float_decimals) for v in row)
        for row in df[cols].itertuples(index=False)
    ]
    rows.sort(key=lambda r: tuple((v is None, str(v)) for v in r))
    return cols, rows


def assert_frames_match(
    spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, float_decimals: int | None = None
) -> None:
    s_cols, s_rows = canon_frame(spark_pdf, float_decimals)
    o_cols, o_rows = canon_frame(oracle_pdf, float_decimals)
    assert s_cols == o_cols, f"column mismatch: spark={s_cols} oracle={o_cols}"
    assert len(s_rows) == len(o_rows), f"row count: spark={len(s_rows)} oracle={len(o_rows)}"
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        assert sr == orow, (
            f"row {i} differs:\n  spark : {sr}\n  oracle: {orow}\n"
            f"(cols {s_cols})"
        )
