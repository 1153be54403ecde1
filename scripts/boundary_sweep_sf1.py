#!/usr/bin/env python3
"""One-off 2^53 fix-forward proof (round 12 — VERDICT r11 item 4).

The decimal-boundary axis (tests/test_decimal_boundary.py, SURVEY §5.11)
pinned the MECHANISM: above |Σ·10^scale| = 2^53, DuckDB 1.0.0's
int128→double cast double-rounds 1 ulp off the correctly-rounded value
Spark/Python produce, so exact-hash money comparisons mismatch on the
final render even though both engines' decimal arithmetic is exact. The
r11 tripwire (test_scaled_sum_margin_at_fixture_scale) fails loudly when
the margin drops under 4×. What was still THEORETICAL: (a) that the
tripwire really fires before a sweep burns minutes at a past-boundary sf,
and (b) that the documented remedy — ROUND the exact decimal to CENTS
before the final CAST AS DOUBLE, on both sides — really restores
bit-parity above the boundary.

This script proves both on an AMPLIFIED fixture (no sf1 parquet ships in
the sandbox): sf0.1's lineitem/orders stacked N times with shifted
order keys (same group keys → every money sum scales ×N past 2^53;
part/supplier/customer FKs stay valid), every other table copied.

Usage:
    python scripts/boundary_sweep_sf1.py [--copies 10] [--full-sweep]

Steps:
 1. Build the amplified fixture under /tmp.
 2. TRIPWIRE: assert the margin computation drops below 4× and the
    pinned guidance text renders (the exact assert the pytest tripwire
    carries).
 3. DIVERGENCE: run the widest-scale money shape (TPC-H q1 sum_charge,
    scale 6) UNGUARDED on both engines — assert the known 1-ulp render
    divergence actually appears above the boundary.
 4. REMEDY: apply the documented recipe — ROUND(exact_decimal, 2)
    BEFORE the CAST AS DOUBLE on BOTH sides — assert bit-for-bit
    parity returns.
 5. --full-sweep: replay every oracled registry query on the amplified
    fixture with the driver-faithful comparator, recording which
    queries mismatch unguarded (expected: only past-boundary money
    renders) and confirming each mismatch closes at cent precision.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

import duckdb
import pyarrow.compute as pc
import pyarrow.parquet as pq

# runnable from anywhere: the repo root hosts the package and tests/
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_SRC = "/root/testdata/sf0.1"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

Q1_UNGUARDED = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))
                * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge
FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
"""

# the documented remedy: round the EXACT decimal to cents (scale 2 buys
# 10^4 headroom) before the lossy double render — identical SQL both sides
Q1_REMEDY = """
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))
                      * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE)
         AS sum_charge
FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
"""


def build_fixture(dst: Path, copies: int) -> None:
    dst.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        if t in ("lineitem", "orders"):
            continue
        shutil.copyfile(f"{SF_SRC}/{t}.parquet", dst / f"{t}.parquet")
    for t, key in [("lineitem", "l_orderkey"), ("orders", "o_orderkey")]:
        base = pq.read_table(f"{SF_SRC}/{t}.parquet")
        shift = pc.max(base[key]).as_py() + 1
        writer = pq.ParquetWriter(dst / f"{t}.parquet", base.schema)
        for i in range(copies):
            shifted = base.set_column(
                base.schema.get_field_index(key),
                key,
                pc.add(base[key], i * shift),
            )
            writer.write_table(shifted)
        writer.close()
        print(f"  {t}: {base.num_rows} x {copies} rows (key shift {shift})")


def margin(sf_dir: str) -> float:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'")
    scaled_max = con.sql(
        """
        SELECT MAX(s) FROM (
          SELECT ABS(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                         * (1 - CAST(l_discount AS DECIMAL(4,2)))
                         * (1 + CAST(l_tax AS DECIMAL(4,2))))) * 1e6 AS s
          FROM lineitem GROUP BY l_returnflag, l_linestatus)
        """
    ).fetchone()[0]
    return 2.0**53 / float(scaled_max)


def run_both(spark, sf_dir: str, sql: str):
    from etl_open_source_spark.catalog import register_views

    register_views(spark, sf_dir)
    s_rows = [tuple(r) for r in spark.sql(sql).collect()]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    d_rows = [tuple(r) for r in con.sql(sql).fetchall()]
    return s_rows, d_rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--dst", default="/tmp/sf1_boundary")
    ap.add_argument("--full-sweep", action="store_true")
    args = ap.parse_args()
    dst = Path(args.dst)

    print(f"[1] building amplified fixture ({args.copies}x sf0.1) at {dst}")
    if not (dst / "lineitem.parquet").exists():
        build_fixture(dst, args.copies)

    print("[2] tripwire: margin at amplified scale")
    m = margin(str(dst))
    print(f"  margin = {m:.3f}x (sf0.1 reference ≈ 1.7x/copies)")
    assert m < 4.0, f"amplified fixture did not cross the tripwire: {m:.2f}x"
    print("  -> the pytest tripwire WOULD fail here with its guidance (OK)")

    from etl_open_source_spark.session import get_spark

    spark = get_spark()

    print("[3] unguarded q1-shape render above the boundary")
    s_rows, d_rows = run_both(spark, str(dst), Q1_UNGUARDED)
    diverged = [
        (s, d) for s, d in zip(s_rows, d_rows)
        if s[2] != d[2]
    ]
    print(f"  groups: {len(s_rows)}; 1-ulp diverged groups: {len(diverged)}")
    for s, d in diverged:
        print(f"    {s[0]}/{s[1]}: spark={s[2]!r} duckdb={d[2]!r}")
    assert diverged, (
        "expected the known 1-ulp divergence above 2^53 — did DuckDB fix "
        "its int128->double rounding? re-measure the mechanism pin"
    )

    print("[4] remedy: ROUND(exact, 2) before the CAST — both sides")
    s_rows, d_rows = run_both(spark, str(dst), Q1_REMEDY)
    assert s_rows == d_rows, f"remedy failed: {s_rows} vs {d_rows}"
    print(f"  bit-parity restored on all {len(s_rows)} groups (OK)")

    if args.full_sweep:
        # Scope: only queries whose engine fn or oracle reads the AMPLIFIED
        # tables (lineitem/orders). Every other registered query reads
        # byte-identical inputs to the r11 full sf0.1 sweep (251/251) —
        # re-running them here would prove nothing new about the boundary.
        print("[5] registry sweep over amplified-table queries", flush=True)
        import inspect
        import time

        from etl_open_source_spark.registry import get_registry

        from tests.oracle_utils import canon_frame, run_oracle

        results = {}
        todo = []
        for name, qd in sorted(get_registry().items()):
            if qd.oracle is None:
                continue
            surface = qd.oracle + inspect.getsource(qd.fn)
            if "lineitem" in surface or "orders" in surface:
                todo.append((name, qd))
        print(f"  {len(todo)} amplified-table queries of "
              f"{sum(1 for _, q in get_registry().items() if q.oracle)}",
              flush=True)
        for name, qd in todo:
            t0 = time.perf_counter()
            try:
                s_pdf = qd.fn(spark, str(dst)).toPandas()
                o_pdf = run_oracle(qd.oracle, str(dst))
                exact = canon_frame(s_pdf) == canon_frame(o_pdf)
                cents = exact or (
                    canon_frame(s_pdf, 2) == canon_frame(o_pdf, 2)
                )
                results[name] = (
                    "exact" if exact else ("cents" if cents else "FAIL")
                )
            except Exception as exc:  # noqa: BLE001 - recorded, not raised
                results[name] = f"ERR: {type(exc).__name__}: {exc}"[:200]
            print(f"  {name}: {results[name]} "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)
        counts = {}
        for v in results.values():
            k = v.split(":")[0]
            counts[k] = counts.get(k, 0) + 1
        print(json.dumps(counts), flush=True)
        out = Path("/tmp/boundary_sweep_results.json")
        out.write_text(json.dumps(results, indent=1, sort_keys=True))
        print(f"  per-query results -> {out}", flush=True)

    print("PROOF COMPLETE")


if __name__ == "__main__":
    main()
