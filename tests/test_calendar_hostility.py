"""Calendar/timezone hostility axis (round 12 — VERDICT r11 item 6).

Every earlier axis poisoned VALUES (non-finite measures, NaN sort keys,
empty inputs, hostile physical plans); none touched the TIME axis. The
fixtures confine events.ts to January 2024 — no leap day, no DST
transition instant, no year/ISO-week boundary, no negative (pre-1970)
epoch, no microsecond-boundary ties. Yet calendar arithmetic is exactly
where engines classically drift (floor-vs-truncate on negative epochs,
round-vs-floor on fractional epoch casts, Sunday=0 vs Sunday=1,
end-of-month clamping).

Mechanism pins probed FIRST (cross-engine, so a Spark/DuckDB upgrade
that changes any of them fails loudly here, not in a sweep artifact):

- **Sessions run UTC wall-time**: Spark's session timezone is pinned
  UTC and events.ts is naive; DuckDB evaluates naive TIMESTAMP
  arithmetic timezone-free. A "DST transition" is therefore just a
  linear instant in both engines — pinned by probing epoch arithmetic
  across the 2024-03-31 01:00 UTC (EU) and 2024-03-10 07:00 UTC (US)
  jumps: both engines agree second-for-second (no 3600-s fold).
- **End-of-month clamping**: add_months(Jan 31, 1) = Feb 29 (leap) /
  Feb 28 (non-leap), add_months(Feb 29, 12) = Feb 28 next year — Spark
  and DuckDB ``+ INTERVAL n MONTH`` clamp identically, INCLUDING the
  round-trip asymmetry (Jan 31 + 1 month - 1 month = Jan 29, not
  Jan 31).
- **Negative-epoch truncation**: Spark's to_unix_timestamp and
  DuckDB's ``epoch_us(ts) // 1000000`` both TRUNCATE fractional
  seconds toward zero (probed: -1799.5 s → -1799 in BOTH — DuckDB's
  ``//`` is not a floor on negatives here), so the form the
  window/session oracles already use agrees with the engine on
  negative epochs. The naive ``CAST(EPOCH(ts) AS BIGINT)`` form
  instead ROUNDS (+1800.75 → +1801) and must never appear in an
  oracle. Pinned so a future oracle written that way fails here
  first.
- **date_trunc('week') is ISO-Monday in both engines**, including
  across a year boundary and on pre-1970 dates.
- **dayofweek offset**: Spark Sunday=1, DuckDB Sunday=0 — alignment
  (+1) pinned on the leap day itself.

Poison fixture: 19 events appended to sf0.001 across SEVEN new users
(tight per-user time bands, so the data-derived gapfill/interpolate
spines stay small): leap-day 2024-02-29 straddles, EU DST spring
(2024-03-31), US DST spring (2024-03-10) and fall (2024-11-03),
year/ISO-week boundary (2024-12-30 .. 2025-01-01 — 2024-12-30 is ISO
week 1 of 2025), negative epoch (1969-12-31/1970-01-01 with fractional
.5/.75 seconds), and the exact old spine edge 2024-01-31 23:59:59.999999
/ 2024-02-01. Event ids 1001+ deliberately enter the q_fn_date2
(id < 2000) and q_fn_null_pack (id < 3000) windows.

All 240 oracled queries then replay on the poisoned fixture (same
pattern as the non-finite and NaN axes).

First-run findings (round 12), both fixed before this file landed:

1. The gapfill/interpolate ORACLES' constant GENERATE_SERIES spine
   ('2024-01-01'..'2024-02-01') silently truncated every poisoned
   user — a fixture artifact of the oracle, not an engine bug; both
   oracles now derive the spine from per-user bounds (UNNEST over a
   column-arg GENERATE_SERIES), exactly like the engine's
   sequence(min, max).
2. q_ts_twap's duration arithmetic disagreed on the negative-epoch
   user THREE ways: the engine's CAST(ts AS LONG) FLOORS (-1799.5 →
   -1800), Spark's to_unix_timestamp and DuckDB's epoch_us //
   1000000 TRUNCATE (→ -1799), and DuckDB's DATE_DIFF('second') is
   neither across the epoch (3599 where floor-counting says 3600).
   Both sides now use the sanctioned truncating pair
   (to_unix_timestamp ↔ epoch_us // 1000000), the same contract
   q_window_range_frame already carried.

The other 238 oracled queries matched on first run: the floor-division
epoch forms and dayofweek/week pins written in earlier rounds hold
across leap day, DST instants, year boundaries and negative epochs.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # soak/axis tier: run with `pytest -m slow`


import shutil

from etl_open_source_spark.registry import get_registry
from tests.oracle_utils import TABLES, assert_frames_match, run_oracle

REGISTRY = get_registry()


def _duck():
    import duckdb

    return duckdb.connect()


# ---------------------------------------------------------------------------
# mechanism pins


def test_sessions_run_utc_and_dst_instants_are_linear(spark):
    """The whole axis rests on this: Spark's session tz is UTC and naive
    timestamps are wall-time in both engines, so a DST transition is a
    LINEAR instant — epoch differences across the jump are exact second
    counts, with no 3600-s fold in either engine."""
    assert spark.conf.get("spark.sql.session.timeZone") in ("UTC", "Etc/UTC")
    # 00:30 → 01:30 UTC across the EU spring-forward instant (01:00 UTC):
    # exactly 3600 s in both engines; same for the US jump.
    duck = _duck()
    for a, b in [
        ("2024-03-31 00:30:00", "2024-03-31 01:30:00"),
        ("2024-03-10 06:30:00", "2024-03-10 07:30:00"),
        ("2024-10-27 00:30:00", "2024-10-27 01:30:00"),  # EU fall-back
    ]:
        srow = spark.sql(
            f"SELECT to_unix_timestamp(TIMESTAMP '{b}') "
            f"- to_unix_timestamp(TIMESTAMP '{a}') AS d"
        ).collect()[0]
        drow = duck.sql(
            f"SELECT (epoch_us(TIMESTAMP '{b}') - epoch_us(TIMESTAMP '{a}'))"
            f" // 1000000 AS d"
        ).fetchone()
        assert srow["d"] == drow[0] == 3600, (a, b, srow["d"], drow[0])


def test_month_add_clamps_identically(spark):
    """End-of-month clamping: Spark add_months == DuckDB + INTERVAL MONTH
    on leap-day edges, including the lossy round-trip."""
    cases = [
        ("2024-01-31", 1, "2024-02-29"),   # into leap Feb
        ("2023-01-31", 1, "2023-02-28"),   # into non-leap Feb
        ("2024-02-29", 12, "2025-02-28"),  # leap day + 1 year clamps
        ("2024-03-31", -1, "2024-02-29"),  # backwards into leap Feb
        ("2024-02-29", -12, "2023-02-28"),
        ("2024-01-31", 0, "2024-01-31"),
        ("2024-02-29", 1, "2024-03-29"),   # clamped start does NOT round-trip
    ]
    duck = _duck()
    for start, n, want in cases:
        s = spark.sql(
            f"SELECT CAST(add_months(DATE '{start}', {n}) AS STRING) AS d"
        ).collect()[0]["d"]
        # ({n}) * INTERVAL: DuckDB's parser rejects INTERVAL -1 MONTH
        d = duck.sql(
            f"SELECT CAST(DATE '{start}' + ({n}) * INTERVAL 1 MONTH AS DATE)"
        ).fetchone()[0]
        assert s == str(d) == want, (start, n, s, str(d), want)


def test_negative_epoch_floor_vs_cast_round(spark):
    """Fractional-second epochs: Spark's to_unix_timestamp and DuckDB's
    epoch_us(ts) // 1000000 both TRUNCATE toward zero (-1799.5 → -1799;
    probed, NOT floor — DuckDB's // is no floor on this path), so the
    sanctioned // oracle form agrees with the engine on negative epochs
    too. DuckDB's naive CAST(EPOCH(..) AS BIGINT) instead ROUNDS
    (+1800.75 → +1801) and would diverge at every .5+ fraction. Pinned
    so the next epoch-comparing oracle is written in the // form."""
    duck = _duck()
    cases = [
        ("1969-12-31 23:30:00.500000", -1799),  # truncate(-1799.5)
        ("1969-12-31 23:30:00.750000", -1799),  # truncate(-1799.25)
        ("1970-01-01 00:30:00.750000", 1800),   # truncate(1800.75)
        ("1970-01-01 00:00:00.000000", 0),
    ]
    for ts, want in cases:
        s = spark.sql(
            f"SELECT to_unix_timestamp(TIMESTAMP '{ts}') AS e"
        ).collect()[0]["e"]
        d = duck.sql(f"SELECT epoch_us(TIMESTAMP '{ts}') // 1000000").fetchone()[0]
        assert s == d == want, (ts, s, d, want)
    # Spark's bare CAST(ts AS LONG) FLOORS instead (-1799.5 -> -1800) —
    # a DIFFERENT rule than its own to_unix_timestamp; and DuckDB's
    # DATE_DIFF('second') across the epoch is neither (3599 for
    # -1799.5 -> +1800.75 where floor-counting says 3600). Neither form
    # may appear on an epoch-comparing path (q_ts_twap's r12 finding).
    cast_floor = spark.sql(
        "SELECT CAST(TIMESTAMP '1969-12-31 23:30:00.500000' AS LONG) AS e"
    ).collect()[0]["e"]
    assert cast_floor == -1800, cast_floor
    dd = duck.sql(
        "SELECT DATE_DIFF('second', TIMESTAMP '1969-12-31 23:30:00.500000',"
        " TIMESTAMP '1970-01-01 00:30:00.750000')"
    ).fetchone()[0]
    assert dd == 3599, dd
    # the naive CAST form is NOT floor: document the divergence point
    naive = duck.sql(
        "SELECT CAST(EPOCH(TIMESTAMP '1970-01-01 00:30:00.750000') AS BIGINT)"
    ).fetchone()[0]
    assert naive == 1801, naive


def test_week_trunc_iso_monday_both_engines(spark):
    """date_trunc('week') is ISO-Monday-start in both engines — across a
    year boundary, on the leap day, and pre-1970 (floor, not
    truncate-toward-zero: 1969-12-31 must go BACK to Monday 1969-12-29)."""
    cases = [
        ("2024-02-29", "2024-02-26"),
        ("2025-01-01", "2024-12-30"),  # year boundary: week starts in 2024
        ("2024-12-30", "2024-12-30"),  # a Monday, ISO week 1 of 2025
        ("1970-01-01", "1969-12-29"),  # Thursday → pre-epoch Monday
        ("1969-12-31", "1969-12-29"),
    ]
    duck = _duck()
    for d0, want in cases:
        s = spark.sql(
            f"SELECT CAST(date_trunc('week', DATE '{d0}') AS DATE) AS w"
        ).collect()[0]["w"]
        d = duck.sql(f"SELECT DATE_TRUNC('week', DATE '{d0}')").fetchone()[0]
        assert str(s) == str(d) == want, (d0, str(s), str(d), want)


def test_dayofweek_offset_on_leap_day(spark):
    """Spark dayofweek is Sunday=1; DuckDB's is Sunday=0. The +1 alignment
    (used by q_fn_date2's oracle) holds on the leap day and pre-1970."""
    duck = _duck()
    for d0 in ["2024-02-29", "1969-12-31", "2025-01-01"]:
        s = spark.sql(f"SELECT dayofweek(DATE '{d0}') AS d").collect()[0]["d"]
        d = duck.sql(f"SELECT DAYOFWEEK(DATE '{d0}') + 1").fetchone()[0]
        assert s == d, (d0, s, d)


# ---------------------------------------------------------------------------
# poisoned fixture

_POISON_EVENTS = {
    # (event_id, ts, user_id, event_type, value, props)
    # u 9101: leap-day straddle
    1001: ("2024-02-28 23:30:00.000000", 9101, "view", 1.0),
    1002: ("2024-02-29 00:00:00.000000", 9101, "click", 2.0),
    1003: ("2024-02-29 12:00:00.000000", 9101, "purchase", 3.0),
    1004: ("2024-02-29 23:59:59.999999", 9101, "view", 4.0),
    1005: ("2024-03-01 00:00:00.000000", 9101, "click", 5.0),
    # u 9102: EU DST spring-forward (01:00 UTC on 2024-03-31)
    1006: ("2024-03-31 00:30:00.000000", 9102, "view", 1.5),
    1007: ("2024-03-31 01:00:00.000000", 9102, "click", 2.5),
    1008: ("2024-03-31 01:30:00.000000", 9102, "purchase", 3.5),
    # u 9103: US DST spring-forward (07:00 UTC on 2024-03-10)
    1009: ("2024-03-10 06:30:00.000000", 9103, "view", 1.25),
    1010: ("2024-03-10 07:00:00.000000", 9103, "error", 2.25),
    # u 9104: US fall-back (06:00 UTC on 2024-11-03)
    1011: ("2024-11-03 05:30:00.000000", 9104, "view", 0.5),
    1012: ("2024-11-03 06:30:00.000000", 9104, "signup", 0.75),
    # u 9105: year / ISO-week boundary
    1013: ("2024-12-30 12:00:00.000000", 9105, "view", 10.0),
    1014: ("2024-12-31 23:59:59.999999", 9105, "click", 11.0),
    1015: ("2025-01-01 00:00:00.000000", 9105, "purchase", 12.0),
    # u 9106: negative epoch with fractional seconds
    1016: ("1969-12-31 23:30:00.500000", 9106, "view", 6.0),
    1017: ("1970-01-01 00:30:00.750000", 9106, "click", 7.0),
    # u 9107: the OLD constant-spine edge (caught the oracle artifact)
    1018: ("2024-01-31 23:59:59.999999", 9107, "view", 8.0),
    1019: ("2024-02-01 00:00:00.000000", 9107, "click", 9.0),
}


@pytest.fixture(scope="module")
def calendar_dir(tmp_path_factory, sf_dir):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("calendar_sf")
    base = pq.read_table(f"{sf_dir}/events.parquet")
    ids = sorted(_POISON_EVENTS)
    ts_us = pa.array(
        [_POISON_EVENTS[i][0] for i in ids], type=pa.string()
    ).cast(pa.timestamp("us"))
    cols = {
        "event_id": pa.array(ids, type=pa.int64()),
        "ts": ts_us,
        "user_id": pa.array([_POISON_EVENTS[i][1] for i in ids], type=pa.int64()),
        "event_type": pa.array([_POISON_EVENTS[i][2] for i in ids]),
        "value": pa.array(
            [float(_POISON_EVENTS[i][3]) for i in ids], type=pa.float64()
        ),
        "props": pa.array(['{"k": 1}'] * len(ids)),
    }
    poison = pa.table(
        [cols[f.name] for f in base.schema], schema=base.schema
    )
    pq.write_table(pa.concat_tables([base, poison]), d / "events.parquet")
    for t in TABLES:
        if t != "events":
            shutil.copyfile(f"{sf_dir}/{t}.parquet", d / f"{t}.parquet")
    # the poison must survive the write exactly: microseconds included
    back = pq.read_table(d / "events.parquet").to_pandas()
    tail = back[back.event_id >= 1001].sort_values("event_id")
    assert len(tail) == len(ids)
    assert str(tail.iloc[3]["ts"]) == "2024-02-29 23:59:59.999999"
    assert str(tail.iloc[15]["ts"]) == "1969-12-31 23:30:00.500000"
    return str(d)


ORACLED = sorted(n for n, qd in REGISTRY.items() if qd.oracle is not None)


@pytest.mark.parametrize("name", ORACLED)
def test_calendar_hostility(spark, calendar_dir, name):
    qd = REGISTRY[name]
    assert_frames_match(
        qd.fn(spark, calendar_dir).toPandas(), run_oracle(qd.oracle, calendar_dir)
    )
