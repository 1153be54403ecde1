"""Join operators (SURVEY.md §2.C "Joins"), over the fixture FK graph.

The reference's declared "merge" transform (structure.txt:24, stubbed) —
re-expressed as Catalyst joins. AQE picks broadcast vs shuffled-hash vs
sort-merge at runtime; the broadcast query pins the strategy explicitly for
the dimension chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from etl_open_source_spark.catalog import load_table, load_tables
from etl_open_source_spark.functions.numeric import dsum, sql_dsum, sql_dsum_finite
from etl_open_source_spark.operators.asof import asof_join
from etl_open_source_spark.registry import query


@query(
    "q_join_inner",
    oracle="""
SELECT o.o_orderkey, o.o_totalprice, c.c_custkey, c.c_name, c.c_mktsegment
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
""",
    bench=True,
    tags=("join",),
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join orders⋈customer. At 100 TB: both sides shuffle on the
    key unless one side broadcasts — AQE decides from runtime sizes."""
    o, c = load_tables(spark, sf_dir, "orders", "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "q_join_left",
    oracle="""
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
FROM customer c LEFT JOIN orders o
  ON c.c_custkey = o.o_custkey AND o.o_totalprice > 300000
""",
    tags=("join",),
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with an extra join-side predicate (kept in the ON
    clause — moving it to WHERE would silently turn the join inner)."""
    c, o = load_tables(spark, sf_dir, "customer", "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_totalprice > 300000)
    return c.join(o, cond, "left").select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@query(
    "q_join_right",
    oracle="""
SELECT o.o_orderkey, o.o_totalprice, c.c_custkey, c.c_name
FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
""",
    tags=("join",),
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join: every right row survives, unmatched left side
    null-padded — planner mirrors it to a left join on the swapped build
    side at scale."""
    o, c = load_tables(spark, sf_dir, "orders", "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name"
    )


@query(
    "q_join_full",
    oracle="""
SELECT f.o_orderkey, f.o_custkey, b.c_custkey, b.c_acctbal
FROM (SELECT o_orderkey, o_custkey FROM orders WHERE o_orderstatus = 'P') f
FULL JOIN (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 8000) b
  ON f.o_custkey = b.c_custkey
""",
    tags=("join",),
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with unmatched rows on BOTH sides."""
    o, c = load_tables(spark, sf_dir, "orders", "customer")
    f = o.filter(F.col("o_orderstatus") == "P").select("o_orderkey", "o_custkey")
    b = c.filter(F.col("c_acctbal") > 8000).select("c_custkey", "c_acctbal")
    return f.join(b, f.o_custkey == b.c_custkey, "full").select(
        "o_orderkey", "o_custkey", "c_custkey", "c_acctbal"
    )


@query(
    "q_join_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
""",
    tags=("join",),
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-style semi join — right side never duplicates left rows and
    only the join key is shuffled (no payload)."""
    c, o = load_tables(spark, sf_dir, "customer", "orders")
    big = o.filter(F.col("o_totalprice") > 400000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "q_join_anti",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = customer.c_custkey)
""",
    tags=("join",),
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT-EXISTS anti join — customers with no orders at all."""
    c, o = load_tables(spark, sf_dir, "customer", "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "q_join_cross",
    oracle="""
SELECT r.r_name, n.n_name
FROM region r CROSS JOIN nation n
""",
    tags=("join",),
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product — only ever sane between small dims (5×25 here);
    Spark plans a broadcast nested-loop join."""
    r, n = load_tables(spark, sf_dir, "region", "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "q_join_broadcast",
    oracle=f"""
SELECT r.r_name, {sql_dsum_finite('o.o_totalprice')} AS revenue, COUNT(*) AS order_cnt
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
ORDER BY r.r_name
""",
    bench=True,
    tags=("join",),
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-join revenue rollup with explicit broadcast hints on the
    dimension chain: the orders fact NEVER shuffles for the dim joins —
    the one pattern that matters most at 100 TB."""
    o, c, n, r = load_tables(spark, sf_dir, "orders", "customer", "nation", "region")
    return (
        o.join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(dsum("o_totalprice").alias("revenue"), F.count(F.lit(1)).alias("order_cnt"))
        .orderBy("r_name")
    )


@query(
    "q_join_multikey",
    oracle=f"""
WITH seg AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS grp_cnt, {sql_dsum_finite('o_totalprice')} AS grp_total
  FROM orders GROUP BY o_orderstatus, o_orderpriority
)
SELECT o.o_orderkey, o.o_orderstatus, o.o_orderpriority, s.grp_cnt, s.grp_total
FROM orders o JOIN seg s
  ON o.o_orderstatus = s.o_orderstatus AND o.o_orderpriority = s.o_orderpriority
""",
    tags=("join",),
)
def q_join_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key equi join (both keys in one shuffle partitioning)."""
    o = load_table(spark, sf_dir, "orders")
    seg = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("grp_cnt"), dsum("o_totalprice").alias("grp_total")
    )
    return o.join(seg, ["o_orderstatus", "o_orderpriority"]).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "grp_cnt", "grp_total"
    )


@query(
    "q_join_theta",
    oracle="""
WITH bands(band, lo, hi) AS (
  VALUES ('small', 0.0, 100000.0), ('mid', 100000.0, 300000.0), ('large', 300000.0, 1000000.0)
)
SELECT o.o_orderkey, o.o_totalprice, b.band
FROM orders o JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
""",
    tags=("join",),
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range-band) join — broadcast nested-loop against a tiny
    banding table. For large-×-large range joins, bucket both sides to turn
    the theta join into an equi join on the bucket id."""
    o = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("small", 0.0, 100000.0), ("mid", 100000.0, 300000.0), ("large", 300000.0, 1000000.0)],
        "band string, lo double, hi double",
    )
    cond = (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi)
    return o.join(broadcast(bands), cond).select("o_orderkey", "o_totalprice", "band")


@query(
    "q_join_asof",
    oracle="""
WITH views AS (
  SELECT user_id, ts, MAX(value) AS view_value
  FROM events WHERE event_type = 'view'
  GROUP BY user_id, ts
),
purchases AS (
  SELECT event_id, user_id, ts AS purchase_ts, value AS purchase_value
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.purchase_ts, p.purchase_value,
       v.ts AS view_ts, v.view_value
FROM purchases p
ASOF LEFT JOIN views v
  ON p.user_id = v.user_id AND p.purchase_ts >= v.ts
""",
    bench=True,
    tags=("join", "asof"),
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent earlier
    (or simultaneous) view. Custom operator — see operators/asof.py.
    Validated against DuckDB's native ASOF LEFT JOIN."""
    e = load_table(spark, sf_dir, "events")
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))  # dedupe equal-ts ties deterministically
        .withColumnRenamed("ts", "view_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return asof_join(
        purchases,
        views,
        by=["user_id"],
        left_on="purchase_ts",
        right_on="view_ts",
        right_values=["view_value"],
    )


@query(
    "q_join_range_bucketed",
    oracle="""
WITH iv AS (
  SELECT i AS interval_id,
         TIMESTAMP '2024-01-01 00:00:00' + (i * 30 + (i * 7) % 24) * INTERVAL '1 hour' AS win_start,
         TIMESTAMP '2024-01-01 00:00:00' + (i * 30 + (i * 7) % 24 + (i % 5 + 1) * 6) * INTERVAL '1 hour' AS win_end
  FROM GENERATE_SERIES(0, 23) AS t(i)
)
SELECT e.event_id, e.user_id, e.ts, iv.interval_id, iv.win_start, iv.win_end
FROM events e JOIN iv ON e.ts >= iv.win_start AND e.ts < iv.win_end
""",
    tags=("join", "range"),
)
def q_join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: events matched to every maintenance window
    containing them — via the bucketed equi-join decomposition
    (operators/rangejoin.py), NOT a theta join. The oracle runs the naive
    range join over the same 24 deterministic windows; results must agree
    exactly, including events inside several overlapping windows."""
    from etl_open_source_spark.operators.rangejoin import range_join_bucketed

    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    iv = spark.range(24).select(
        F.col("id").cast("int").alias("interval_id"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + (F.col("id") * 30 + (F.col("id") * 7) % 24)
            * F.expr("INTERVAL 1 HOUR")
        ).alias("win_start"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + (F.col("id") * 30 + (F.col("id") * 7) % 24 + (F.col("id") % 5 + 1) * 6)
            * F.expr("INTERVAL 1 HOUR")
        ).alias("win_end"),
    )
    return range_join_bucketed(
        e, iv, point_ts="ts", start_col="win_start", end_col="win_end",
        bucket_seconds=6 * 3600,
    )


@query(
    "q_join_asof_forward",
    oracle="""
WITH views AS (
  SELECT user_id, ts AS view_ts, MAX(value) AS view_value
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
),
purchases AS (
  SELECT event_id, user_id, ts AS purchase_ts, value AS purchase_value
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.purchase_ts, p.purchase_value,
       v.view_ts, v.view_value
FROM purchases p
ASOF LEFT JOIN views v
  ON p.user_id = v.user_id AND p.purchase_ts <= v.view_ts
""",
    tags=("join", "asof"),
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each purchase matched to the user's earliest
    view at-or-after it (the look-ahead direction — label joins, next-
    quote joins). Same one-shuffle union+window shape as backward; the
    forward carry is first-over-following (operators/asof.py direction=
    'forward'). Oracle: DuckDB ASOF with the <= inequality."""
    e = load_table(spark, sf_dir, "events")
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
        .withColumnRenamed("ts", "view_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return asof_join(
        purchases,
        views,
        by=["user_id"],
        left_on="purchase_ts",
        right_on="view_ts",
        right_values=["view_value"],
        direction="forward",
    )


@query(
    "q_join_null_safe",
    oracle="""
WITH a AS (
  SELECT p_partkey, NULLIF(p_size % 5, 0) AS k FROM part
),
b AS (
  SELECT NULLIF(p_size % 5, 0) AS k, COUNT(*) AS grp_n
  FROM part GROUP BY NULLIF(p_size % 5, 0)
)
SELECT a.p_partkey, a.k, b.grp_n
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
""",
    tags=("join",),
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys match
    each other instead of silently dropping — the semantics a plain
    equi-join gets wrong when the join key is derived and nullable (here
    NULLIF carves a NULL group out of p_size). Spark plans eqNullSafe as
    a hash join on a null-wrapped key, so it stays an equi-join (no
    nested-loop fallback) at any scale."""
    p = load_table(spark, sf_dir, "part")
    k = F.nullif(F.col("p_size") % 5, F.lit(0))
    a = p.select("p_partkey", k.alias("k"))
    b = p.select(k.alias("k")).groupBy("k").agg(F.count(F.lit(1)).alias("grp_n"))
    return a.join(b, a["k"].eqNullSafe(b["k"]), "inner").select(
        a["p_partkey"], a["k"].alias("k"), b["grp_n"]
    )


@query(
    "q_join_asof_nearest",
    oracle="""
WITH views AS (
  SELECT user_id, ts, MAX(value) AS view_value
  FROM events WHERE event_type = 'view'
  GROUP BY user_id, ts
),
purchases AS (
  SELECT event_id, user_id, ts AS purchase_ts, value AS purchase_value
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.purchase_ts, p.purchase_value,
       v.ts AS view_ts, v.view_value
FROM purchases p
LEFT JOIN LATERAL (
  SELECT v.ts, v.view_value
  FROM views v
  WHERE v.user_id = p.user_id
  ORDER BY ABS(epoch(p.purchase_ts) - epoch(v.ts)),
           CASE WHEN v.ts <= p.purchase_ts THEN 0 ELSE 1 END
  LIMIT 1
) v ON TRUE
""",
    tags=("join", "asof"),
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join: each purchase matched to the
    temporally CLOSEST view by the same user, in either direction, with
    exact-distance ties resolving backward (pandas merge_asof
    direction='nearest' semantics) — completes the registered as-of
    family (backward / forward / tolerance / nearest), all four on the
    same operator (operators/asof.py).

    Shape is unchanged from the single-direction joins: ONE union + ONE
    (user)-partitioned window pass computing BOTH carries (the second
    direction is an extra in-partition sort, never an extra shuffle),
    then a per-row distance comparison. The oracle is an independent
    LATERAL nearest-1 formulation with the same backward tiebreak.
    Equal-timestamp views pre-dedup to MAX(value) per instant on both
    sides, as in q_join_asof."""
    e = load_table(spark, sf_dir, "events")
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
        .withColumnRenamed("ts", "view_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return asof_join(
        purchases,
        views,
        by=["user_id"],
        left_on="purchase_ts",
        right_on="view_ts",
        right_values=["view_value"],
        direction="nearest",
    ).select(
        "event_id",
        "user_id",
        "purchase_ts",
        "purchase_value",
        F.col("view_ts").alias("view_ts"),
        "view_value",
    )
