"""Randomized differential testing: hypothesis-generated event tables,
Spark vs DuckDB oracle.

The adversarial fixture (test_adversarial_parity.py) covers the hostile
classes we KNOW about; this sweep hunts the ones we don't — random tiny
events tables with heavy timestamp collisions, duplicate rows, NULL
values, and skewed user distributions, run through a handful of the most
order-sensitive registered queries and compared against their oracles on
the same parquet. Examples are few and small (each costs a Spark job);
the generator is biased hard toward ties (timestamps drawn from a 4-value
pool) because tie resolution is the historical bug source.

Row-count floors are 0 (round 10): the empty-input axis
(test_empty_input.py) proved all 240 oracled queries agree at zero rows,
so every generator may now draw empty and near-empty (n=1, n=2) tables —
folding the tiny-table class into the fresh-draw soak permanently.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # soak/axis tier: run with `pytest -m slow`


import os

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_open_source_spark.registry import get_registry
from tests.oracle_utils import assert_frames_match, fixture_dir, run_oracle

REGISTRY = get_registry()


def _write_pinned(df, path, schema_cols):
    """Write parquet with an explicit arrow schema. A hypothesis draw can
    make a string column all-NULL; plain ``to_parquet`` then writes a
    null-typed column and Spark's string comparisons blow up — the pinned
    schema keeps the declared type regardless of the draw."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema([(name, typ) for name, typ in schema_cols])
    pq.write_table(
        pa.Table.from_pandas(df, schema=schema, preserve_index=False), path
    )

# order-sensitive queries whose input is ONLY the events table
QUERIES = [
    "q_ts_sessionize",
    "q_event_transitions",
    "q_ts_twap",
    "q_gaps_islands",
    "q_ts_ewma",
    "q_retention_days",
    # the as-of/range join family: equal-timestamp ties across the
    # build/probe sides and NULL by-keys are THE as-of bug classes
    "q_join_asof",
    "q_join_asof_forward",
    "q_join_asof_nearest",
    "q_join_asof_tolerance",
    "q_join_range_bucketed",
    "q_join_interval_overlap",
    "q_window_range_frame",
    "q_cdc_apply",
]

_TYPES = ["view", "click", "purchase", "signup", "error", None, ""]
# "" is NOT NULL: an empty-string event type is a real group/path step in
# both engines (STRING_AGG of [''] is '', of [NULL] is NULL) — the two
# must never be conflated (q_path_topk catch).
# hostile props: NULL, missing key, JSON-null k, non-numeric k — and
# MALFORMED documents (r11): empty string, free text, a truncated
# object. Spark's get_json_object NULLs all three; DuckDB's
# JSON_EXTRACT_STRING hard-errors unless routed through TRY_CAST(x AS
# JSON) (the q_fn_json oracle guard this pool exists to keep honest).
_PROPS = [
    "{}", "{}", None, '{"k": 3}', '{"k": null}', '{"k": "x"}',
    "", "not json", '{"k": 1',
]


def _write_events(df, d):
    import pyarrow as pa

    _write_pinned(
        df,
        os.path.join(d, "events.parquet"),
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ],
    )


def _events_rows(draw, ts_pool):
    """Shared row builder for the events-shaped generators: only the
    timestamp pool differs between the 2024 tie-heavy table and the
    epoch-straddling variant."""
    n = draw(st.integers(0, 25))
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                draw(st.sampled_from(ts_pool)),
                # NULL user_ids: an as-of/sessionize NULL by-key must
                # never MATCH (SQL equality), even though Spark windows
                # group NULL partitions together
                draw(st.one_of(st.just(None), st.integers(1, 3))),
                draw(st.sampled_from(_TYPES)),
                draw(
                    st.one_of(
                        st.just(None),
                        st.sampled_from([0.0, -1.5, 7.0, 123.45]),
                    )
                ),
                draw(st.sampled_from(_PROPS)),
            )
        )
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df["event_id"] = df["event_id"].astype("int64")
    df["user_id"] = df["user_id"].astype("Int64")
    df["value"] = df["value"].astype("float64")
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    return df


@st.composite
def events_table(draw):
    # 6-value timestamp pool → guaranteed heavy ties; the last two fold
    # the calendar axis (r12) into every fresh draw: a leap-day instant
    # with FRACTIONAL seconds (sub-second epoch arithmetic) and a
    # microsecond-boundary tie at .999999
    ts_pool = [
        pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=m)
        for m in (0, 17, 17, 60 * 26)  # duplicate pool entry: more ties
    ] + [
        pd.Timestamp("2024-02-29 12:00:00.750000"),
        pd.Timestamp("2024-01-01 00:16:59.999999"),
    ]
    return _events_rows(draw, ts_pool)


@st.composite
def events_negepoch_table(draw):
    """events variant whose timestamps straddle the Unix epoch.

    Negative epoch seconds are THE classic bucket-arithmetic trap:
    truncate-toward-zero (CAST(x/w AS INT)*w, the sign-following %) and
    floor (Spark window(), DuckDB time_bucket) agree on every post-1970
    timestamp and disagree on every pre-1970 one that is not exactly on
    a boundary. Any engine or oracle expression that derives a window
    start, session gap, day diff or as-of distance from raw epoch
    arithmetic gets flushed out here. The pool keeps events_table's tie
    density (duplicate entry) and crosses a pre-epoch DAY boundary so
    date-granularity folds go negative too."""
    ts_pool = [
        pd.Timestamp("1969-12-30 23:59:59"),
        pd.Timestamp("1969-12-31 22:58:00"),
        pd.Timestamp("1969-12-31 23:42:17"),
        pd.Timestamp("1969-12-31 23:42:17"),  # duplicate: ties
        # FRACTIONAL pre-epoch seconds (calendar axis r12): the one
        # input where truncate-toward-zero (to_unix_timestamp,
        # epoch_us // 1e6), floor (CAST AS LONG) and DATE_DIFF all
        # disagree — q_ts_twap's duration contract lives or dies here.
        # The .500400 draw is additionally SUB-MILLISECOND, splitting
        # unix_millis (floor) from epoch_us // 1000 (truncate) for the
        # gap_ms/overlap_ms family.
        pd.Timestamp("1969-12-31 23:30:00.500400"),
        pd.Timestamp("1970-01-01 00:30:00.750000"),
        # exact epoch 0, DUPLICATED: as-of/session ties sitting ON the
        # sign boundary of every epoch-seconds expression (round-10 axis
        # seed) — 0 is the one value where truncate and floor agree but
        # any <0 / <=0 pre-epoch branch condition flips
        pd.Timestamp("1970-01-01 00:00:00"),
        pd.Timestamp("1970-01-01 00:00:00"),
        pd.Timestamp("1970-01-01 00:10:00"),
    ]
    return _events_rows(draw, ts_pool)


@given(tbl=events_table())
@settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_random_events_differential(spark_prop, tbl):
    d = fixture_dir(prefix="randdiff_")
    _write_events(tbl, d)
    for name in QUERIES:
        qd = REGISTRY[name]
        got = qd.fn(spark_prop, d).toPandas()
        want = run_oracle(qd.oracle, d)
        try:
            assert_frames_match(got, want)
        except AssertionError as ex:  # pragma: no cover - diagnostic path
            raise AssertionError(f"{name} diverged on random input:\n{ex}") from ex


TS_QUERIES = [
    # per-series timeseries/drift statistics: rolling windows, robust
    # filters, decomposition, resampling — all order-sensitive under
    # equal timestamps and NULL values/users
    "q_agg_skew_kurt",
    "q_attribution_last_touch",
    "q_fn_date2",
    "q_fn_json",
    "q_fn_null_pack",
    "q_fn_variant",
    "q_funnel",
    "q_funnel_latency",
    "q_path_topk",
    "q_quality_chisq",
    "q_quality_psi",
    "q_session_stats",
    "q_ts_anomaly",
    "q_ts_autocorr",
    "q_ts_cusum",
    "q_ts_gapfill",
    "q_ts_hampel",
    "q_ts_interpolate",
    "q_ts_resample_ohlc",
    "q_ts_rolling_median",
    "q_ts_rollup",
    "q_ts_stl_decompose",
    "q_window_distinct_rolling",
]


@given(tbl=events_table())
@settings(
    max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_random_ts_differential(spark_prop, tbl):
    """The timeseries/drift family over random events: rolling medians and
    Hampel windows on tied timestamps, STL/autocorr on constant series,
    chi-square/PSI on degenerate distributions, funnels and journeys with
    NULL users."""
    d = fixture_dir(prefix="randdiff_ts_")
    _write_events(tbl, d)
    for name in TS_QUERIES:
        qd = REGISTRY[name]
        got = qd.fn(spark_prop, d).toPandas()
        want = run_oracle(qd.oracle, d)
        try:
            assert_frames_match(got, want)
        except AssertionError as ex:  # pragma: no cover - diagnostic path
            raise AssertionError(f"{name} diverged on random input:\n{ex}") from ex


EV_MISC_QUERIES = [
    # batch-form streaming windows + event-table IO/layout
    "q_window_tumbling",
    "q_window_sliding",
    "q_window_session",
    "q_stream_dedup",
    "q_stream_interval_join",
    "q_scan_json",
    "q_sink_json_roundtrip",
    "q_layout_zorder",
]


@given(tbl=events_table())
@settings(
    max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_random_events_misc_differential(spark_prop, tbl):
    """Streaming-window expressions (batch form) and events IO/layout over
    random events: tumbling/sliding/session windows on tied timestamps,
    dedup keys with NULL users, JSON roundtrips of NULL-ridden rows."""
    d = fixture_dir(prefix="randdiff_ev_")
    _write_events(tbl, d)
    for name in EV_MISC_QUERIES:
        qd = REGISTRY[name]
        got = qd.fn(spark_prop, d).toPandas()
        want = run_oracle(qd.oracle, d)
        try:
            assert_frames_match(got, want)
        except AssertionError as ex:  # pragma: no cover - diagnostic path
            raise AssertionError(f"{name} diverged on random input:\n{ex}") from ex


# epoch-arithmetic-sensitive family: every query here derives a bucket,
# gap, day diff or time distance from the raw timestamp, so pre-1970
# (negative-epoch) rows discriminate floor from truncate-toward-zero.
# q_join_range_bucketed is excluded for cause: its bucket origin is a
# pinned 2024-01-01 constant on both sides, so pre-1970 input would only
# test the constant, not the arithmetic. q_ts_gapfill/q_cohort_retention
# are excluded because their DuckDB oracles clip to a constant 2024 spine
# (GENERATE_SERIES takes constants only).
NEG_EPOCH_QUERIES = [
    "q_window_tumbling",
    "q_window_sliding",
    "q_window_session",
    "q_stream_dedup",
    "q_stream_interval_join",
    "q_ts_sessionize",
    "q_session_stats",
    "q_event_transitions",
    "q_gaps_islands",
    "q_ts_twap",
    "q_ts_rollup",
    "q_ts_resample_ohlc",
    "q_retention_days",
    "q_ts_ewma",
    "q_join_asof",
    "q_join_asof_forward",
    "q_join_asof_nearest",
    "q_join_asof_tolerance",
    "q_join_interval_overlap",
    "q_window_range_frame",
    "q_cdc_apply",
    "q_path_topk",
    "q_funnel_latency",
    "q_attribution_last_touch",
]


def negepoch_pinned_df():
    """Deterministic worst case for the epoch-arithmetic family: every
    pool timestamp crossed with (user 1, user 2, NULL user) and a cycling
    type/value pattern, so every NEG_EPOCH query sees pre-epoch ties, a
    pre-epoch day boundary, and the 1970 crossing on every run —
    independent of what hypothesis happens to draw in a given soak
    iteration. Shared with the partition-hostility composed axis."""
    ts_pool = [
        pd.Timestamp("1969-12-30 23:59:59"),
        pd.Timestamp("1969-12-31 22:58:00"),
        pd.Timestamp("1969-12-31 23:42:17"),
        pd.Timestamp("1969-12-31 23:42:17"),
        pd.Timestamp("1970-01-01 00:00:00"),  # exact epoch 0, and
        pd.Timestamp("1970-01-01 00:00:00"),  # duplicated: epoch-0 ties
        pd.Timestamp("1970-01-01 00:10:00"),
    ]
    users = [1, 2, None]
    values = [None, 0.0, -1.5, 7.0, 123.45]
    rows = []
    i = 0
    for ts in ts_pool:
        for u in users:
            rows.append(
                (
                    i,
                    ts,
                    u,
                    _TYPES[i % len(_TYPES)],
                    values[i % len(values)],
                    _PROPS[i % len(_PROPS)],
                )
            )
            i += 1
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df["event_id"] = df["event_id"].astype("int64")
    df["user_id"] = df["user_id"].astype("Int64")
    df["value"] = df["value"].astype("float64")
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    return df


def test_negepoch_pinned_differential(spark_prop):
    df = negepoch_pinned_df()
    d = fixture_dir(prefix="negepoch_pin_")
    _write_events(df, d)
    for name in NEG_EPOCH_QUERIES:
        qd = REGISTRY[name]
        got = qd.fn(spark_prop, d).toPandas()
        want = run_oracle(qd.oracle, d)
        try:
            assert_frames_match(got, want)
        except AssertionError as ex:  # pragma: no cover - diagnostic path
            raise AssertionError(f"{name} diverged on pinned input:\n{ex}") from ex


@given(tbl=events_negepoch_table())
@settings(
    max_examples=4, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_random_negepoch_differential(spark_prop, tbl):
    """The epoch-arithmetic family over events that straddle 1970-01-01:
    tumbling/sliding/session windows, sessionize gaps, as-of distances,
    OHLC buckets and day-granularity folds must floor (never truncate
    toward zero) on negative epoch seconds, identically in both engines."""
    d = fixture_dir(prefix="randdiff_ne_")
    _write_events(tbl, d)
    for name in NEG_EPOCH_QUERIES:
        qd = REGISTRY[name]
        got = qd.fn(spark_prop, d).toPandas()
        want = run_oracle(qd.oracle, d)
        try:
            assert_frames_match(got, want)
        except AssertionError as ex:  # pragma: no cover - diagnostic path
            raise AssertionError(f"{name} diverged on random input:\n{ex}") from ex


ORDER_QUERIES = [
    "q_rfm_segments",
    "q_agg_gini",
    "q_quality_ks",
    "q_cohort_retention",
    "q_ts_mom_change",
    # window-function family over orders: frame boundaries under full-row
    # price/date ties and NULL partition keys
    "q_window_rank",
    "q_window_lag_lead",
    "q_window_first_last",
    "q_topk_per_group",
    # maintenance/merge family: upsert + diff + rollup under key ties
    "q_subquery_correlated",
    "q_merge_upsert",
    "q_snapshot_diff",
    "q_mv_incremental",
]


@st.composite
def orders_table(draw):
    n = draw(st.integers(0, 25))
    date_pool = [
        None,  # NULL dates: no cohort/activity, and a window-sort hazard
        pd.Timestamp("1995-01-01"),
        pd.Timestamp("1995-01-01"),  # duplicate: date ties
        pd.Timestamp("1995-02-15"),
        pd.Timestamp("1995-06-01"),
    ]
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                draw(st.one_of(st.just(None), st.integers(1, 3))),
                # "" is a real status group, distinct from NULL (it
                # survives string folds and groupBy where NULL may not)
                draw(st.sampled_from([None, "", "F", "O", "P"])),
                # price ties + NULLs (excluded from Gini/KS by contract)
                draw(st.sampled_from([None, 0.0, 100.0, 100.0, 250.5])),
                draw(st.sampled_from(date_pool)),
                draw(st.sampled_from([None, "", "1-URGENT", "5-LOW"])),
            )
        )
    df = pd.DataFrame(
        rows,
        columns=[
            "o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "o_orderdate", "o_orderpriority",
        ],
    )
    df["o_orderkey"] = df["o_orderkey"].astype("int64")
    df["o_custkey"] = df["o_custkey"].astype("Int64")
    df["o_orderdate"] = pd.to_datetime(df["o_orderdate"]).astype("datetime64[us]")
    return df


@given(tbl=orders_table())
@settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_random_orders_differential(spark_prop, tbl):
    """Random orders tables with NULL customer keys, full-row price/date
    ties, and single-sided status populations — the ntile/Gini/KS/cohort
    paths must stay bit-identical to their oracles."""
    import pyarrow as pa

    d = fixture_dir(prefix="randdiff_o_")
    _write_pinned(
        tbl,
        os.path.join(d, "orders.parquet"),
        [
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_orderstatus", pa.string()),
            ("o_totalprice", pa.float64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.string()),
        ],
    )
    for name in ORDER_QUERIES:
        qd = REGISTRY[name]
        got = qd.fn(spark_prop, d).toPandas()
        want = run_oracle(qd.oracle, d)
        try:
            assert_frames_match(got, want)
        except AssertionError as ex:  # pragma: no cover - diagnostic path
            raise AssertionError(f"{name} diverged on random input:\n{ex}") from ex


DOC_QUERIES = [
    "q_text_tokens",
    "q_text_stats",
    "q_text_entropy",
    "q_dedup_exact",
    "q_text_winnowing",
    "q_doc_chunk",
    # hash/tokenizer/regex surfaces over the same hostile fragments
    "q_text_fingerprint",
    "q_text_normalize_ws",
    "q_text_rep_ngram",
    "q_text_dup_ngram_frac",
    "q_text_bigrams",
    "q_text_hashvec",
    "q_text_tfidf",
    "q_text_langid",
    "q_text_quality",
    "q_pii_redact",
    "q_url_normalize",
    # dedup miners + cluster/keep over duplicate-rich random corpora
    "q_dedup_ngram",
    "q_dedup_containment",
    "q_dedup_clusters",
    "q_dedup_keep",
    "q_dedup_clusters_star",
]


@st.composite
def documents_table(draw):
    n = draw(st.integers(0, 12))
    # fragments biased toward tokenizer/hash edge content: whitespace
    # runs, unicode, punctuation, repeats, digits
    frags = [
        "", "a", "  ", "\t", "the quick fox", "é", "ß", "x x x",
        "a.b,c!", "123 456", "word " * 6, "…", "\n",
        # U+0130: Java full-case-mapping EXPANDS this to 2 chars — the
        # ascii_fold contract must keep both engines in lockstep
        "İstanbul", "MIXED Case",
        # PII- and URL-shaped fragments for the redact/normalize regexes
        "a@b.co 555-123-4567",
        "https://Ex.com:80/p?b=2&a=1#frag",
        "ip 127.0.0.1 ssn 123-45-6789",
        # supplementary-plane + combining-mark content: substring/gram/
        # length arithmetic must count CODEPOINTS identically in both
        # engines — UTF-16 code-unit (Java String.length) or byte-based
        # indexing desyncs every gram hash and chunk boundary here
        "😀🚀",
        "𝕊𝕡𝕒𝕣𝕜",
        "한국어 테스트",
        "e\u0301clair",  # NFD é: 'e' + combining U+0301, NOT equal to "é"
    ]
    rows = []
    for i in range(n):
        if draw(st.integers(0, 9)) == 0:
            text = None  # NULL documents must flow through, not crash
        else:
            text = "".join(
                draw(st.lists(st.sampled_from(frags), min_size=0, max_size=6))
            )
        rows.append(
            (
                i,
                text,
                # "" lang/source are real groups and domain keys,
                # distinct from NULL (same contract as event types)
                draw(st.sampled_from(["en", "en", "fr", None, ""])),
                draw(st.sampled_from(["src0", "src0", "src1", None, ""])),
            )
        )
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    df["doc_id"] = df["doc_id"].astype("int64")
    df["n_chars"] = df["text"].str.len().astype("Int64")
    return df


REL_QUERIES = [
    # join family under NULL keys, duplicate-key fanout, and orphans in
    # BOTH directions (custkey 7 has no orders; custkey 99 no customer)
    "q_join_inner",
    "q_join_left",
    "q_join_right",
    "q_join_full",
    "q_join_semi",
    "q_join_anti",
    "q_join_multikey",
    "q_join_theta",
    "q_tpch_q13",
    # sorts / limits / set ops under NULL sort keys and duplicate rows
    "q_sort_multi",
    "q_limit",
    "q_union_all",
    "q_union_distinct",
    "q_intersect",
    "q_except",
    "q_union_by_name",
    # grouped aggregates with NULL group keys and NULL measures
    "q_agg_distinct",
    "q_agg_having",
    "q_agg_filtered",
    "q_agg_rollup",
    "q_agg_cube",
    "q_agg_groupingsets",
    "q_agg_mode_median",
    "q_window_cume_dist",
    # three-valued NOT IN over NULL segments
    "q_filter_not_in_nulls",
]


@st.composite
def relational_tables(draw):
    """customer + orders with every hostile class the static fixture lacks:
    NULL keys on either side, duplicate customer keys (fanout), NULL
    measures/segments, and values pinned to the queries' own filter
    boundaries (5000/8000 acctbal; 100000/150000/300000/400000/1000000
    price bands)."""
    n_c = draw(st.integers(0, 10))
    c_rows = []
    for _ in range(n_c):
        c_rows.append(
            (
                draw(st.sampled_from([None, 1, 2, 2, 3, 7])),
                draw(st.sampled_from([None, "Customer#A", "Customer#A", "Cüst", ""])),
                draw(st.integers(0, 2)),
                draw(
                    st.sampled_from(
                        [None, -50.0, 0.0, 100.0, 100.0, 5000.0, 5000.5, 8000.0, 8000.5]
                    )
                ),
                draw(
                    st.sampled_from(
                        [None, "BUILDING", "BUILDING", "MACHINERY", "AUTOMOBILE"]
                    )
                ),
            )
        )
    cust = pd.DataFrame(
        c_rows,
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )
    cust["c_custkey"] = cust["c_custkey"].astype("Int64")
    cust["c_nationkey"] = cust["c_nationkey"].astype("int32")

    n_o = draw(st.integers(0, 24))
    date_pool = [
        pd.Timestamp("1995-01-01"),
        pd.Timestamp("1995-01-01"),
        pd.Timestamp("1995-03-10"),
    ]
    o_rows = []
    for i in range(n_o):
        o_rows.append(
            (
                i,  # unique: the ordered-LIMIT tiebreak key must stay total
                draw(st.sampled_from([None, 1, 1, 1, 2, 3, 99])),
                draw(st.sampled_from([None, "", "F", "F", "O", "P"])),
                draw(
                    st.sampled_from(
                        [
                            None, 0.0, 100.0, 100000.0, 150000.0, 300000.0,
                            400000.0, 400000.5, 999999.99, 1000000.0,
                        ]
                    )
                ),
                draw(st.sampled_from(date_pool)),
                draw(st.sampled_from([None, "1-URGENT", "5-LOW", "5-LOW"])),
            )
        )
    orders = pd.DataFrame(
        o_rows,
        columns=[
            "o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "o_orderdate", "o_orderpriority",
        ],
    )
    orders["o_orderkey"] = orders["o_orderkey"].astype("int64")
    orders["o_custkey"] = orders["o_custkey"].astype("Int64")
    orders["o_orderdate"] = pd.to_datetime(orders["o_orderdate"]).astype(
        "datetime64[us]"
    )
    return cust, orders


@given(tbls=relational_tables())
@settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_random_relational_differential(spark_prop, tbls):
    """Random customer+orders through the join/setop/grouped-agg core —
    NULL join keys, duplicate-key fanout, NULL group keys, NULL sort keys,
    and filter-boundary values."""
    import pyarrow as pa

    cust, orders = tbls
    d = fixture_dir(prefix="randdiff_r_")
    _write_pinned(
        cust,
        os.path.join(d, "customer.parquet"),
        [
            ("c_custkey", pa.int64()),
            ("c_name", pa.string()),
            ("c_nationkey", pa.int32()),
            ("c_acctbal", pa.float64()),
            ("c_mktsegment", pa.string()),
        ],
    )
    _write_pinned(
        orders,
        os.path.join(d, "orders.parquet"),
        [
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_orderstatus", pa.string()),
            ("o_totalprice", pa.float64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.string()),
        ],
    )
    for name in REL_QUERIES:
        qd = REGISTRY[name]
        got = qd.fn(spark_prop, d).toPandas()
        want = run_oracle(qd.oracle, d)
        try:
            assert_frames_match(got, want)
        except AssertionError as ex:  # pragma: no cover - diagnostic path
            raise AssertionError(f"{name} diverged on random input:\n{ex}") from ex


LINE_QUERIES = [
    "q_agg_groupby",
    "q_agg_global",
    "q_agg_pivot",
    "q_agg_percentile",
    "q_unpivot",
    "q_histogram",
    "q_winsorize",
    "q_tpch_q6",
]


@st.composite
def lineitem_table(draw):
    """lineitem with NULLs in every measure and group key, and values on
    the exact predicate boundaries (Q6's discount [0.05,0.07] / qty<24 /
    shipdate half-open year; Q1's shipdate <= 1998-09-02; the histogram's
    5000-wide bins and 19-cap)."""
    n = draw(st.integers(0, 20))
    ship_pool = [
        None,
        pd.Timestamp("1993-12-31"),
        pd.Timestamp("1996-01-01"),
        pd.Timestamp("1996-12-31"),
        pd.Timestamp("1998-09-02"),
        pd.Timestamp("1998-09-03"),
    ]
    rows = []
    for _ in range(n):
        rows.append(
            (
                draw(st.sampled_from([0, 1, 1, 2, 999])),
                draw(st.integers(1, 2)),
                draw(st.integers(1, 2)),
                draw(st.integers(1, 3)),
                draw(st.sampled_from([None, 0.0, 5.0, 23.99, 24.0, 50.0])),
                draw(
                    st.sampled_from(
                        [None, 0.0, 100.0, 4999.99, 5000.0, 99999.0, 100001.0]
                    )
                ),
                draw(st.sampled_from([None, 0.04, 0.05, 0.06, 0.07, 0.08])),
                draw(st.sampled_from([None, 0.0, 0.02, 0.08])),
                draw(st.sampled_from([None, "", "R", "N", "A"])),
                draw(st.sampled_from([None, "O", "F"])),
                draw(st.sampled_from(ship_pool)),
            )
        )
    df = pd.DataFrame(
        rows,
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate",
        ],
    )
    for c in ("l_orderkey", "l_partkey", "l_suppkey"):
        df[c] = df[c].astype("int64")
    df["l_linenumber"] = df["l_linenumber"].astype("int32")
    df["l_shipdate"] = pd.to_datetime(df["l_shipdate"]).astype("datetime64[us]")
    return df


@given(tbl=lineitem_table())
@settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_random_lineitem_differential(spark_prop, tbl):
    """Random lineitem with NULL measures/flags/dates and boundary values
    through the scan-agg family (Q1/Q6 shapes, pivot/unpivot, histogram,
    winsorize, exact percentiles)."""
    import pyarrow as pa

    d = fixture_dir(prefix="randdiff_l_")
    _write_pinned(
        tbl,
        os.path.join(d, "lineitem.parquet"),
        [
            ("l_orderkey", pa.int64()),
            ("l_partkey", pa.int64()),
            ("l_suppkey", pa.int64()),
            ("l_linenumber", pa.int32()),
            ("l_quantity", pa.float64()),
            ("l_extendedprice", pa.float64()),
            ("l_discount", pa.float64()),
            ("l_tax", pa.float64()),
            ("l_returnflag", pa.string()),
            ("l_linestatus", pa.string()),
            ("l_shipdate", pa.timestamp("us")),
        ],
    )
    for name in LINE_QUERIES:
        qd = REGISTRY[name]
        got = qd.fn(spark_prop, d).toPandas()
        want = run_oracle(qd.oracle, d)
        try:
            assert_frames_match(got, want)
        except AssertionError as ex:  # pragma: no cover - diagnostic path
            raise AssertionError(f"{name} diverged on random input:\n{ex}") from ex


TPCH_QUERIES = [
    "q_tpch_q2",
    "q_tpch_q3",
    "q_tpch_q4",
    "q_tpch_q5",
    "q_tpch_q6",
    "q_tpch_q7",
    "q_tpch_q8",
    "q_tpch_q9",
    "q_tpch_q10",
    "q_tpch_q11",
    "q_tpch_q12",
    "q_tpch_q13",
    "q_tpch_q14",
    "q_tpch_q15",
    "q_tpch_q16",
    "q_tpch_q17",
    "q_tpch_q18",
    "q_tpch_q19",
    "q_tpch_q20",
    "q_tpch_q21",
    "q_tpch_q22",
]


@st.composite
def tpch_database(draw):
    """A full 7-table TPC-H micro-database with the hostile classes the
    static fixtures never produce: drawn nation→region membership (which
    nations sit in ASIA/EUROPE/AMERICA varies per example), FK orphans in
    both directions, NULL keys/measures/flags/dates, and values pinned to
    every TPC-H predicate boundary — the 45-day (q12) and 90-day (q21)
    late cuts, the q19 quantity/size bands, the q6/q20 date windows, the
    q17 Brand#23/size<15 selector, and the q18 sum(qty)>150 threshold."""
    region = pd.DataFrame(
        [(0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
         (4, "MIDDLE EAST")],
        columns=["r_regionkey", "r_name"],
    )
    nation = pd.DataFrame(
        [(k, f"NATION_{k}", draw(st.integers(0, 4))) for k in range(8)],
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )

    n_p = draw(st.integers(0, 6))
    part = pd.DataFrame(
        [
            (
                k,
                draw(st.sampled_from(["cold widget", "cold widget",
                                      "Bölt  #1", "", None])),
                draw(
                    st.sampled_from(
                        ["Brand#3", "Brand#5", "Brand#14", "Brand#22",
                         "Brand#23", "Brand#23", None]
                    )
                ),
                draw(st.sampled_from(["ECONOMY", "ECONOMY", "PROMO",
                                      "PROMO PACKED", "LARGE", None])),
                draw(st.sampled_from([1, 9, 10, 14, 15, 20, 25, 50, None])),
                draw(st.sampled_from([0.0, 900.0, 900.5, None])),
            )
            for k in range(n_p)
        ],
        columns=["p_partkey", "p_name", "p_brand", "p_type", "p_size",
                 "p_retailprice"],
    )

    n_s = draw(st.integers(0, 4))
    supplier = pd.DataFrame(
        [
            (
                k,
                f"Supplier#{k}",
                draw(st.integers(0, 9)),  # 8/9: no such nation
                draw(st.sampled_from([None, -10.0, 0.0, 100.0, 100.0, 4000.0])),
            )
            for k in range(n_s)
        ],
        columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    )

    n_c = draw(st.integers(0, 7))
    customer = pd.DataFrame(
        [
            (
                k,
                draw(st.sampled_from(["Customer#A", "Customer#A", None])),
                draw(st.integers(0, 9)),
                draw(st.sampled_from([None, -1.0, 0.0, 50.0, 50.0, 7000.0])),
                # '' and whitespace-padded segments: the XML/JSON sink
                # representation classes (surrounding-space trimming,
                # ''-vs-NULL conflation) only fire if hostile values
                # actually reach the serializer (VERDICT r8 item 4)
                draw(st.sampled_from(["BUILDING", "BUILDING", "MACHINERY",
                                      None, "", " BUILDING", "MACHINERY ",
                                      "A&<B>"])),
            )
            for k in range(n_c)
        ],
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                 "c_mktsegment"],
    )

    odate_pool = [
        None,
        pd.Timestamp("1995-01-01"),
        pd.Timestamp("1996-01-01"),
        pd.Timestamp("1996-01-01"),
        pd.Timestamp("1996-06-30"),
        pd.Timestamp("1996-09-30"),
        pd.Timestamp("1996-12-31"),
        pd.Timestamp("1997-01-01"),
        pd.Timestamp("1998-03-14"),
        pd.Timestamp("1998-03-15"),
        pd.Timestamp("1999-01-01"),
    ]
    n_o = draw(st.integers(0, 12))
    orders = pd.DataFrame(
        [
            (
                k,
                draw(st.sampled_from([None, 0, 0, 1, 2, 99])),
                draw(st.sampled_from([None, "", "F", "F", "O", "P"])),
                draw(st.sampled_from([None, 0.0, 1000.0, 150000.0, 320000.0])),
                draw(st.sampled_from(odate_pool)),
                draw(st.sampled_from([None, "1-URGENT", "2-HIGH", "5-LOW",
                                      "5-LOW"])),
            )
            for k in range(n_o)
        ],
        columns=["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                 "o_orderdate", "o_orderpriority"],
    )
    orders["o_custkey"] = orders["o_custkey"].astype("Int64")
    orders["o_orderdate"] = pd.to_datetime(orders["o_orderdate"]).astype(
        "datetime64[us]"
    )

    # against o_orderdate 1996-01-01: Feb 14 = +44d, Feb 15 = +45d (q12
    # boundary), Mar 31 = +90d (q21 boundary), Apr 1 = +91d
    sdate_pool = [
        None,
        pd.Timestamp("1996-01-01"),
        pd.Timestamp("1996-02-14"),
        pd.Timestamp("1996-02-15"),
        pd.Timestamp("1996-03-31"),
        pd.Timestamp("1996-04-01"),
        pd.Timestamp("1996-06-01"),
        pd.Timestamp("1996-06-30"),
        pd.Timestamp("1996-12-31"),
        pd.Timestamp("1997-01-01"),
        pd.Timestamp("1997-06-01"),
        pd.Timestamp("1997-12-31"),
        pd.Timestamp("1998-03-15"),
        pd.Timestamp("1998-03-16"),
    ]
    n_l = draw(st.integers(0, 20))
    lineitem = pd.DataFrame(
        [
            (
                draw(st.sampled_from([None, 0, 0, 1, 1, 2, 3, 999])),
                draw(st.integers(0, n_p)),  # n_p itself: orphan part
                draw(st.integers(0, n_s)),  # n_s itself: orphan supplier
                ln + 1,
                draw(st.sampled_from([None, 1.0, 10.0, 11.0, 20.0, 24.0,
                                      30.0, 151.0])),
                draw(st.sampled_from([None, 0.0, 100.0, 5000.0, 90000.0])),
                draw(st.sampled_from([None, 0.0, 0.04, 0.05, 0.06, 0.07,
                                      0.08])),
                draw(st.sampled_from([None, 0.0, 0.02, 0.08])),
                draw(st.sampled_from([None, "", "R", "N", "A"])),
                draw(st.sampled_from([None, "O", "F"])),
                draw(st.sampled_from(sdate_pool)),
            )
            for ln in range(n_l)
        ],
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
    )
    lineitem["l_orderkey"] = lineitem["l_orderkey"].astype("Int64")
    lineitem["l_shipdate"] = pd.to_datetime(lineitem["l_shipdate"]).astype(
        "datetime64[us]"
    )
    return region, nation, customer, supplier, part, orders, lineitem


def _write_tpch(db) -> str:
    """Materialize a drawn 7-table micro-database as pinned-schema parquet."""
    import pyarrow as pa

    region, nation, customer, supplier, part, orders, lineitem = db
    d = fixture_dir(prefix="randdiff_t_")
    _write_pinned(region, os.path.join(d, "region.parquet"),
                  [("r_regionkey", pa.int32()), ("r_name", pa.string())])
    _write_pinned(nation, os.path.join(d, "nation.parquet"),
                  [("n_nationkey", pa.int32()), ("n_name", pa.string()),
                   ("n_regionkey", pa.int32())])
    _write_pinned(
        customer,
        os.path.join(d, "customer.parquet"),
        [("c_custkey", pa.int64()), ("c_name", pa.string()),
         ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
         ("c_mktsegment", pa.string())],
    )
    _write_pinned(
        supplier,
        os.path.join(d, "supplier.parquet"),
        [("s_suppkey", pa.int64()), ("s_name", pa.string()),
         ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())],
    )
    _write_pinned(
        part,
        os.path.join(d, "part.parquet"),
        [("p_partkey", pa.int64()), ("p_name", pa.string()),
         ("p_brand", pa.string()), ("p_type", pa.string()),
         ("p_size", pa.int32()), ("p_retailprice", pa.float64())],
    )
    _write_pinned(
        orders,
        os.path.join(d, "orders.parquet"),
        [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
         ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
         ("o_orderdate", pa.timestamp("us")),
         ("o_orderpriority", pa.string())],
    )
    _write_pinned(
        lineitem,
        os.path.join(d, "lineitem.parquet"),
        [("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
         ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
         ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
         ("l_discount", pa.float64()), ("l_tax", pa.float64()),
         ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
         ("l_shipdate", pa.timestamp("us"))],
    )
    return d


@given(db=tpch_database())
@settings(
    max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_random_tpch_differential(spark_prop, db):
    """Random TPC-H micro-database through all 21 registered TPC-H queries
    (Q1's shape lives in q_agg_groupby, covered by the lineitem strategy) —
    the multi-join/nested-subquery family whose static evidence never sees
    NULL keys, orphan FKs, or predicate-boundary values."""
    d = _write_tpch(db)
    for name in TPCH_QUERIES:
        qd = REGISTRY[name]
        got = qd.fn(spark_prop, d).toPandas()
        want = run_oracle(qd.oracle, d)
        try:
            assert_frames_match(got, want)
        except AssertionError as ex:  # pragma: no cover - diagnostic path
            raise AssertionError(f"{name} diverged on random input:\n{ex}") from ex


RELFN_QUERIES = [
    # filters / projections on boundary values and NULLs
    "q_filter_between",
    "q_filter_compare",
    "q_filter_compound",
    "q_filter_in",
    "q_filter_like",
    "q_filter_null",
    "q_project_select",
    "q_project_rename",
    "q_project_computed",
    # scalar-function surfaces: NULL propagation, cast edges, non-ASCII,
    # LN(0)/negative-log guards, regex over empty/None names
    "q_fn_cast",
    "q_fn_cond",
    "q_fn_date",
    "q_fn_hash",
    "q_fn_math",
    "q_fn_string",
    "q_fn_string2",
    "q_fn_regex",
    "q_fn_bitwise",
    "q_fn_lambda",
    "q_fn_map",
    "q_subquery_scalar",
    # windows over NULL order keys
    "q_window_ntile",
    "q_window_percent_rank",
    "q_window_running",
]


@given(db=tpch_database())
@settings(
    max_examples=5, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_random_relfn_differential(spark_prop, db):
    """The scalar-function/filter/window family over the random TPC-H
    micro-database: NULL propagation through every expression surface,
    boundary predicates, non-ASCII and empty strings, NULL window keys."""
    d = _write_tpch(db)
    for name in RELFN_QUERIES:
        qd = REGISTRY[name]
        got = qd.fn(spark_prop, d).toPandas()
        want = run_oracle(qd.oracle, d)
        try:
            assert_frames_match(got, want)
        except AssertionError as ex:  # pragma: no cover - diagnostic path
            raise AssertionError(f"{name} diverged on random input:\n{ex}") from ex


RELAGG_QUERIES = [
    # aggregate edges: argmax ties, n<2 corr/stddev, multiset set ops
    "q_agg_argmax",
    "q_agg_collect",
    "q_agg_corr",
    "q_agg_stats",
    "q_agg_salted",
    "q_except_all",
    "q_intersect_all",
    "q_explode_outer",
    "q_fuzzy_match",
    "q_histogram_equidepth",
    "q_join_null_safe",
    "q_join_cross",
    "q_join_broadcast",
    "q_pair_cooccurrence",
    "q_quality_benford",
    "q_quality_checks",
    "q_profile_columns",
    "q_recursive_cte",
    "q_sanitize_nulls",
    "q_scd2",
    "q_scd2_lookup",
    "q_skyline_pareto",
    "q_skew_key_stats",
    "q_graph_link_jaccard",
    "q_graph_triangles",
    "q_assoc_rules",
]


@given(db=tpch_database())
@settings(
    max_examples=5, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_random_relagg_differential(spark_prop, db):
    """The misc relational family over the random TPC-H micro-database:
    argmax/corr/stats aggregate edges, multiset EXCEPT/INTERSECT ALL with
    NULL rows, null-safe joins, SCD2 under key ties, graph miners on
    orphan-heavy edges, Benford/profile/quality on NULL-ridden columns."""
    d = _write_tpch(db)
    for name in RELAGG_QUERIES:
        qd = REGISTRY[name]
        got = qd.fn(spark_prop, d).toPandas()
        want = run_oracle(qd.oracle, d)
        try:
            assert_frames_match(got, want)
        except AssertionError as ex:  # pragma: no cover - diagnostic path
            raise AssertionError(f"{name} diverged on random input:\n{ex}") from ex


IO_QUERIES = [
    # deterministic-hash samplers under hostile keys
    "q_sample_uniform",
    "q_sample_stratified",
    "q_sample_split",
    "q_sample_reservoir",
    # scan/sink roundtrips: empty-string-vs-NULL, unicode, NULL partition
    # values, merged schemas — the serialization bug classes
    "q_scan_csv",
    "q_scan_csv_permissive",
    "q_scan_merge_schema",
    "q_scan_partition_pruned",
    "q_sink_csv_roundtrip",
    "q_sink_parquet_roundtrip",
    "q_sink_orc_roundtrip",
    "q_sink_xml_roundtrip",
    "q_sink_append",
    "q_sink_replace",
    "q_sink_partition_overwrite",
    # q_compact_files is deliberately absent: its file-count columns are
    # deterministic only when every write partition is non-empty (true at
    # sf0.001+, where the driver checks it) — at micro scale the writer's
    # empty-partition file behavior makes the layout columns fixture-
    # dependent; the data-integrity columns are covered by the sinks above
    # Python surfaces: NULL propagation through UDF/UDAF/UDTF
    "q_udf_scalar",
    "q_udf_pandas",
    "q_udaf_pandas",
    "q_udtf",
    # layout/scale operators + iterative pagerank on orphan-heavy edges
    "q_catalog_table_schema",
    "q_join_skew_salted",
    "q_join_bucketed_colocated",
    "q_graph_pagerank",
    # the FK audit is at its best on this database: orphans in both
    # directions and NULL child keys (MATCH SIMPLE: not orphans)
    "q_quality_fk",
    "q_scan_parquet",
    "q_sql_transform",
]


@given(db=tpch_database())
@settings(
    max_examples=5, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_random_io_differential(spark_prop, db):
    """The IO/sampling/UDF/maintenance family over the random TPC-H
    micro-database: format roundtrips under empty strings, non-ASCII and
    NULLs (the empty-vs-NULL CSV ambiguity), partitioned writes with NULL
    partition values, hash samplers on hostile keys, Python UDF surfaces,
    and iterative pagerank on orphan-heavy edges."""
    d = _write_tpch(db)
    for name in IO_QUERIES:
        qd = REGISTRY[name]
        got = qd.fn(spark_prop, d).toPandas()
        want = run_oracle(qd.oracle, d)
        try:
            assert_frames_match(got, want)
        except AssertionError as ex:  # pragma: no cover - diagnostic path
            raise AssertionError(f"{name} diverged on random input:\n{ex}") from ex


EMB_QUERIES = [
    "q_embedding_norm_stats",
    "q_fn_array",
    "q_vector_agg",
    "q_embedding_quantize",
    "q_sim_topk",
    "q_sim_knn_graph",
    "q_dedup_embedding_planted",
    "q_sim_pq_codes",
]

_EMB_DIM = 64  # q_vector_agg's oracle enumerates positions 1..64


@st.composite
def embeddings_table(draw):
    # Vectors are scalar multiples of 4 sparse base patterns: positive
    # multiples of the same pattern have cosine EXACTLY 1 (top-k score
    # ties — neighbor-id tiebreak must hold), negative multiples exactly
    # -1 (sign-LSH edge), scale 0 gives the zero-norm drop case, 1e-6
    # the tiny-but-nonzero case. NaN/Inf scales produce corrupt vectors
    # (0·Inf = NaN, so a sparse pattern × Inf mixes NaN and Inf
    # components) — the usable_norm drop / NULL-propagation contracts.
    # NULL embeddings, NULL labels, and NULL vec_ids exercise the
    # pinned NULL contracts.
    n = draw(st.integers(0, 10))
    pat = [
        [1.0 if j == 0 else 0.0 for j in range(_EMB_DIM)],
        [1.0 if j == 1 else 0.0 for j in range(_EMB_DIM)],
        [1.0 if j < 2 else 0.0 for j in range(_EMB_DIM)],
        [1.0] * _EMB_DIM,
    ]
    scales = [1.0, 1.0, 1.5, -2.0, 1e-6, 0.0, float("nan"), float("inf")]
    rows = []
    for i in range(n):
        kind = draw(st.integers(0, 13))
        if kind == 0:
            vec = None
        elif kind == 1:
            vec = []                     # empty array: norm 0, no positions
        elif kind == 2:
            p = draw(st.sampled_from(pat))
            vec = list(p)
            vec[draw(st.integers(0, _EMB_DIM - 1))] = None  # NULL element
        else:
            p = draw(st.sampled_from(pat))
            s = draw(st.sampled_from(scales))
            vec = [x * s for x in p]
        vec_id = None if draw(st.integers(0, 11)) == 0 else i
        label = draw(st.sampled_from([0, 1, None]))
        rows.append((vec_id, vec, label))
    df = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    df["vec_id"] = df["vec_id"].astype("Int64")
    df["label"] = df["label"].astype("Int32")
    return df


def _write_embeddings(df: pd.DataFrame, path: str) -> None:
    # explicit arrow schema: an all-NULL embedding draw must still land
    # as list<double>, not the inferred null/int type. The embedding
    # column is built from the raw python lists — Table.from_pandas
    # applies nan_as_null and silently turns NaN components into NULL
    # elements, which is a DIFFERENT hostile class than the NaN the
    # strategy planted.
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "vec_id": pa.array(
                [None if pd.isna(v) else int(v) for v in df["vec_id"]],
                type=pa.int64(),
            ),
            "embedding": pa.array(
                list(df["embedding"]), type=pa.list_(pa.float64())
            ),
            "label": pa.array(
                [None if pd.isna(v) else int(v) for v in df["label"]],
                type=pa.int32(),
            ),
        }
    )
    pq.write_table(tbl, path)


@given(tbl=embeddings_table())
@settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_random_embeddings_differential(spark_prop, tbl):
    """Random embedding tables with exact cosine score ties (scalar
    multiples), zero-norm and near-zero vectors, and NULL
    embeddings/labels/ids — the similarity/centroid/quantize paths must
    stay bit-identical to their oracles."""
    d = fixture_dir(prefix="randdiff_e_")
    _write_embeddings(tbl, os.path.join(d, "embeddings.parquet"))
    for name in EMB_QUERIES:
        qd = REGISTRY[name]
        got = qd.fn(spark_prop, d).toPandas()
        want = run_oracle(qd.oracle, d)
        try:
            assert_frames_match(got, want)
        except AssertionError as ex:  # pragma: no cover - diagnostic path
            raise AssertionError(f"{name} diverged on random input:\n{ex}") from ex


@given(tbl=documents_table())
@settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_random_documents_differential(spark_prop, tbl):
    """Random documents built from tokenizer/hash edge fragments —
    whitespace runs, multibyte chars, punctuation, repeats, newlines,
    the empty string — through the text pipeline queries."""
    d = fixture_dir(prefix="randdiff_d_")
    _write_documents(tbl, d)
    for name in DOC_QUERIES:
        qd = REGISTRY[name]
        got = qd.fn(spark_prop, d).toPandas()
        want = run_oracle(qd.oracle, d)
        try:
            assert_frames_match(got, want)
        except AssertionError as ex:  # pragma: no cover - diagnostic path
            raise AssertionError(f"{name} diverged on random input:\n{ex}") from ex


def _write_documents(df, d):
    import pyarrow as pa

    _write_pinned(
        df,
        os.path.join(d, "documents.parquet"),
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ],
    )


DOC2_QUERIES = [
    # curation / sharding / multimodal-plumbing / dedup miners over
    # documents — the families the first documents list doesn't reach
    "q_dedup_snm_multikey",
    "q_dedup_sorted_neighborhood",
    "q_dedup_winnowing",
    "q_mix_domains",
    "q_pack_concat",
    "q_multimodal_meta",
    "q_multimodal_decode",
    "q_multimodal_resize",
    "q_multimodal_framesample",
    "q_multimodal_audio_chunks",
    "q_quality_outliers",
    "q_sample_weighted",
    "q_shard_assign",
    "q_split_leakage_safe",
    "q_text_bpe_step",
    "q_text_decontaminate",
    "q_text_lm_score",
    "q_text_tf",
    "q_scan_text",
]


@given(tbl=documents_table())
@settings(
    max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_random_documents2_differential(spark_prop, tbl):
    """The curation/sharding/multimodal/dedup-miner families over the same
    hostile random documents: sorted-neighborhood and winnowing miners on
    near-identical fragments, domain mixing, deterministic sharding and
    weighted sampling, BPE steps and LM scoring on edge-fragment text."""
    d = fixture_dir(prefix="randdiff_d2_")
    _write_documents(tbl, d)
    for name in DOC2_QUERIES:
        qd = REGISTRY[name]
        got = qd.fn(spark_prop, d).toPandas()
        want = run_oracle(qd.oracle, d)
        try:
            assert_frames_match(got, want)
        except AssertionError as ex:  # pragma: no cover - diagnostic path
            raise AssertionError(f"{name} diverged on random input:\n{ex}") from ex


def test_malformed_json_extraction_contract(spark_prop):
    """Mechanism pin for the r11 _PROPS malformed entries: Spark's
    get_json_object returns NULL for unparseable JSON while DuckDB's
    JSON_EXTRACT_STRING hard-errors — the oracle-side TRY_CAST(x AS
    JSON) guard NULLs malformed and is a no-op on valid documents. Also
    pins the one known un-mirrored edge kept OUT of the pools: a JSON
    number overflowing to Infinity extracts quoted ('"Infinity"') in
    Spark but unquoted in DuckDB."""
    import duckdb
    import pytest as _pt

    from pyspark.sql import functions as F

    cases = ["", "not json", '{"k": 1', "{}", '{"k": 3}', '{"k": "x"}', None]
    df = spark_prop.createDataFrame([(c,) for c in cases], "props string")
    got = {
        r.props: r.k
        for r in df.select("props", F.get_json_object("props", "$.k").alias("k")).collect()
    }
    assert got[""] is None and got["not json"] is None and got['{"k": 1'] is None
    assert got['{"k": 3}'] == "3" and got['{"k": "x"}'] == "x"

    con = duckdb.connect()
    with _pt.raises(duckdb.InvalidInputException):
        con.sql("SELECT JSON_EXTRACT_STRING('not json', 'k')").fetchone()
    for c in cases:
        lit = "NULL" if c is None else "'" + c.replace("'", "''") + "'"
        v = con.sql(
            f"SELECT JSON_EXTRACT_STRING(TRY_CAST({lit} AS JSON), 'k')"
        ).fetchone()[0]
        assert v == got.get(c), (c, v, got.get(c))

    # the documented divergence that keeps 1e400 out of the draw pools
    sp = df.sparkSession.sql(
        """SELECT get_json_object('{"k": 1e400}', '$.k')"""
    ).collect()[0][0]
    dk = con.sql(
        """SELECT JSON_EXTRACT_STRING('{"k": 1e400}', 'k')"""
    ).fetchone()[0]
    assert sp == '"Infinity"' and dk == "Infinity" and sp != dk


def test_constant_series_autocorr_contract(spark_prop, tmp_path):
    """Deterministic pin of the r12 soak catch: a CONSTANT daily series
    has zero variance, so Pearson's denominator is 0 — Spark's built-in
    F.corr raises ANSI DIVIDE_BY_ZERO where DuckDB's corr yields NULL.
    q_ts_autocorr therefore computes the masked try_divide(covar, sd·sd)
    form (q_agg_corr's contract): both engines answer NULL acf for the
    degenerate series instead of one of them crashing."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        (i, pd.Timestamp(f"2024-01-0{i + 1} 00:00:00"), 1, "view", 5.0, "{}")
        for i in range(3)
    ]
    df = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    t = pa.table(
        {
            "event_id": pa.array(df.event_id, type=pa.int64()),
            "ts": pa.array(df.ts, type=pa.timestamp("us")),
            "user_id": pa.array(df.user_id, type=pa.int64()),
            "event_type": pa.array(df.event_type),
            "value": pa.array(df.value, type=pa.float64()),
            "props": pa.array(df.props),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    qd = REGISTRY["q_ts_autocorr"]
    got = qd.fn(spark_prop, str(tmp_path)).toPandas()
    want = run_oracle(qd.oracle, str(tmp_path))
    assert_frames_match(got, want)
    assert got["acf_lag1"].isna().all(), "constant series must yield NULL acf"
