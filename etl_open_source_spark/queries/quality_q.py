"""Data-quality queries: one-pass column profiling + expectation checks.

Completes the reference's 0-byte `services/validation_service.py` stub
(SURVEY.md §2.B) as engine-native operators — see operators/quality.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_open_source_spark.catalog import load_table, load_tables
from etl_open_source_spark.operators.quality import (
    accepted,
    in_range,
    not_null,
    profile_columns,
    run_checks,
    unique,
)
from etl_open_source_spark.registry import query

_PROFILE_COL = """
SELECT '{c}' AS col_name,
       COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       {min_num} AS min_num, {max_num} AS max_num,
       {min_str} AS min_str, {max_str} AS max_str
FROM orders"""


def _profile_sql(c: str, numeric: bool) -> str:
    if numeric:
        return _PROFILE_COL.format(
            c=c,
            min_num=f"CAST(MIN({c}) AS DOUBLE)",
            max_num=f"CAST(MAX({c}) AS DOUBLE)",
            min_str="CAST(NULL AS VARCHAR)",
            max_str="CAST(NULL AS VARCHAR)",
        )
    return _PROFILE_COL.format(
        c=c,
        min_num="CAST(NULL AS DOUBLE)",
        max_num="CAST(NULL AS DOUBLE)",
        min_str=f"MIN({c})",
        max_str=f"MAX({c})",
    )


@query(
    "q_profile_columns",
    oracle="\nUNION ALL".join(
        [
            _profile_sql("o_custkey", True),
            _profile_sql("o_totalprice", True),
            _profile_sql("o_orderstatus", False),
            _profile_sql("o_orderpriority", False),
        ]
    ),
    tags=("quality",),
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile four orders columns (rows/nulls/distinct/min/max) in a
    single scan — one wide aggregate unpivoted with stack, not one scan
    per column."""
    o = load_table(spark, sf_dir, "orders")
    return profile_columns(
        o, numeric_cols=["o_custkey", "o_totalprice"], string_cols=["o_orderstatus", "o_orderpriority"]
    )


@query(
    "q_quality_checks",
    oracle="""
SELECT 'not_null(o_orderkey)' AS rule,
       CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations
FROM orders
UNION ALL
SELECT 'unique(o_orderkey)',
       CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT)
FROM orders
UNION ALL
SELECT 'in_range(o_totalprice,0,1000000.0)',
       CAST(SUM(CASE WHEN NOT (o_totalprice BETWEEN 0 AND 1000000.0) THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'accepted(o_orderstatus)',
       CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F','P','O') THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'fk(o_custkey->customer)', CAST(COUNT(*) AS BIGINT)
FROM orders o
WHERE o_custkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
""",
    tags=("quality",),
)
def q_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five expectations over orders: the four row-local rules fold into
    ONE aggregate pass; the FK-integrity rule is a broadcast anti-join
    count against customer."""
    o, c = load_tables(spark, sf_dir, "orders", "customer")
    return run_checks(
        o,
        row_checks=[
            not_null("o_orderkey"),
            unique("o_orderkey"),
            in_range("o_totalprice", 0, 1000000.0),
            accepted("o_orderstatus", ["F", "P", "O"]),
        ],
        fk_checks=[("fk(o_custkey->customer)", "o_custkey", c, "c_custkey")],
    )


@query(
    "q_quality_outliers",
    oracle="""
WITH stats AS (
  SELECT lang,
         COUNT(*) AS n,
         CAST(SUM(CAST(LENGTH(text) AS DECIMAL(18,0))) AS DOUBLE) AS s,
         CAST(SUM(CAST(LENGTH(text) AS DECIMAL(18,0)) * CAST(LENGTH(text) AS DECIMAL(18,0))) AS DOUBLE) AS sq
  FROM documents GROUP BY lang
)
SELECT d.doc_id, d.lang,
       CAST(LENGTH(d.text) AS BIGINT) AS n_chars,
       ROUND((LENGTH(d.text) - s / n)
             / NULLIF(SQRT((sq - s * s / n) / NULLIF(n - 1, 0)), 0), 4) AS z,
       (ABS((LENGTH(d.text) - s / n)
            / NULLIF(SQRT((sq - s * s / n) / NULLIF(n - 1, 0)), 0)) > 2.0) AS is_outlier
FROM documents d JOIN stats USING (lang)
""",
    tags=("quality",),
)
def q_quality_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group outlier flagging: z-score of document length within its
    language, |z| > 2 marked. The moments come from DECIMAL-exact integer
    sums (Σx, Σx²) so mean/variance are bit-identical across engines —
    avg()/stddev() aggregate in engine-specific order and would drift in
    the last ulps, flipping rows sitting near the threshold. One shuffle
    (the per-lang stats) + a broadcast-sized join back.

    Degenerate groups get z = NULL (is_outlier NULL with it): a single-
    member group has no sample variance (n-1 = 0) and a constant-length
    group has variance 0 — try_divide here, NULLIF in the oracle (caught
    by the adversarial fixture suite)."""
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    x = F.length("text").cast("decimal(18,0)")
    stats = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("s"),
        F.sum(x * x).cast("double").alias("sq"),
    )
    z = F.try_divide(
        F.length("text") - F.col("s") / F.col("n"),
        F.sqrt(
            F.try_divide(
                F.col("sq") - F.col("s") * F.col("s") / F.col("n"),
                F.col("n") - 1,
            )
        ),
    )
    return (
        d.join(F.broadcast(stats), "lang")
        .select(
            "doc_id",
            "lang",
            F.length("text").cast("bigint").alias("n_chars"),
            F.round(z, 4).alias("z"),
            (F.abs(z) > 2.0).alias("is_outlier"),
        )
    )


@query(
    "q_quality_fk",
    oracle="""
SELECT 'lineitem.l_orderkey->orders' AS edge,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT l_orderkey) AS n_keys,
       CAST(COALESCE(SUM(CASE WHEN l_orderkey IS NOT NULL AND l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL) THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_orphans
FROM lineitem
UNION ALL
SELECT 'lineitem.l_partkey->part',
       COUNT(*), COUNT(DISTINCT l_partkey),
       CAST(COALESCE(SUM(CASE WHEN l_partkey IS NOT NULL AND l_partkey NOT IN (SELECT p_partkey FROM part WHERE p_partkey IS NOT NULL) THEN 1 ELSE 0 END), 0) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem.l_suppkey->supplier',
       COUNT(*), COUNT(DISTINCT l_suppkey),
       CAST(COALESCE(SUM(CASE WHEN l_suppkey IS NOT NULL AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey IS NOT NULL) THEN 1 ELSE 0 END), 0) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'orders.o_custkey->customer',
       COUNT(*), COUNT(DISTINCT o_custkey),
       CAST(COALESCE(SUM(CASE WHEN o_custkey IS NOT NULL AND o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL) THEN 1 ELSE 0 END), 0) AS BIGINT)
FROM orders
UNION ALL
SELECT 'customer.c_nationkey->nation',
       COUNT(*), COUNT(DISTINCT c_nationkey),
       CAST(COALESCE(SUM(CASE WHEN c_nationkey IS NOT NULL AND c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_nationkey IS NOT NULL) THEN 1 ELSE 0 END), 0) AS BIGINT)
FROM customer
UNION ALL
SELECT 'supplier.s_nationkey->nation',
       COUNT(*), COUNT(DISTINCT s_nationkey),
       CAST(COALESCE(SUM(CASE WHEN s_nationkey IS NOT NULL AND s_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_nationkey IS NOT NULL) THEN 1 ELSE 0 END), 0) AS BIGINT)
FROM supplier
UNION ALL
SELECT 'nation.n_regionkey->region',
       COUNT(*), COUNT(DISTINCT n_regionkey),
       CAST(COALESCE(SUM(CASE WHEN n_regionkey IS NOT NULL AND n_regionkey NOT IN (SELECT r_regionkey FROM region WHERE r_regionkey IS NOT NULL) THEN 1 ELSE 0 END), 0) AS BIGINT)
FROM nation
""",
    tags=("quality",),
)
def q_quality_fk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the whole FK manifest
    (catalog.FK_GRAPH — the engine analog of the reference's
    sys.foreign_keys walk, core/extractors/sqlserver.py:155-198): per
    edge, row/key counts and orphan rows whose FK value has no parent.

    ONE pass per edge: the distinct parent keys broadcast onto a LEFT
    join and the row count / distinct-key count / orphan count all fold
    in the same aggregate — the fact side is scanned once per edge and
    never shuffled. A NULL child key is NOT an orphan (SQL MATCH SIMPLE
    FK semantics, and what the oracle's three-valued NOT IN computes) —
    the orphan predicate requires the child key non-null, which the
    adversarial fixture's NULL o_custkey row pins. Empty-child-table
    contract: 0 orphans, not NULL — the engine's count(when(...)) is 0
    over zero rows where a bare SUM(CASE...) is NULL, so the oracle
    wraps each orphan sum in COALESCE(..., 0) (empty-input axis).
    Empty-PARENT-table contract (zero-floor soak catch): the oracle's
    NOT IN needs an explicit IS NOT NULL guard on the child key —
    `NULL NOT IN (empty set)` is TRUE in SQL (no comparisons happen),
    so a bare NOT IN counts NULL children as orphans exactly when the
    parent table is empty, violating MATCH SIMPLE; the guard restores
    the contract for every parent cardinality. NULL-PARENT-key contract
    (ADVICE r10): a NULL inside the parent key set makes `x NOT IN
    (..., NULL)` UNKNOWN for every true orphan, so the oracle also
    filters `WHERE <pk> IS NOT NULL` inside each subquery — matching
    the engine's null-unsafe join equality, where a NULL parent key
    matches nothing and genuine orphans still count
    (tests/test_quality.py pins it with a NULL-parent fixture)."""
    from pyspark.sql import functions as F

    from etl_open_source_spark.catalog import FK_GRAPH

    parts = []
    for fk in FK_GRAPH:
        child = load_table(spark, sf_dir, fk["table"])
        parent = (
            load_table(spark, sf_dir, fk["ref_table"])
            .select(F.col(fk["ref_column"]).alias("__pk"))
            .distinct()
        )
        edge = f"{fk['table']}.{fk['column']}->{fk['ref_table']}"
        parts.append(
            child.join(
                F.broadcast(parent), child[fk["column"]] == F.col("__pk"), "left"
            )
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct(fk["column"]).alias("n_keys"),
                F.count(
                    F.when(
                        F.col("__pk").isNull()
                        & F.col(fk["column"]).isNotNull(),
                        1,
                    )
                )
                .cast("bigint")
                .alias("n_orphans"),
            )
            .select(F.lit(edge).alias("edge"), "n_rows", "n_keys", "n_orphans")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


@query(
    "q_winsorize",
    oracle="""
WITH pct AS (
  SELECT l_returnflag,
         ROUND(QUANTILE_CONT(l_extendedprice, 0.05), 6) AS p05,
         ROUND(QUANTILE_CONT(l_extendedprice, 0.95), 6) AS p95
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       COUNT(*) AS n,
       CAST(SUM(CAST(LEAST(GREATEST(l.l_extendedprice, p.p05), p.p95) AS DECIMAL(18,4))) AS DOUBLE) AS sum_winsorized,
       CAST(SUM(CASE WHEN l.l_extendedprice < p.p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_low,
       CAST(SUM(CASE WHEN l.l_extendedprice > p.p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_high
FROM lineitem l JOIN pct p USING (l_returnflag)
GROUP BY l.l_returnflag
""",
    tags=("quality",),
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization — clamp each value into its group's [P05, P95] band
    before aggregating, the standard robust pre-processing step for
    noisy numeric features (vs dropping outliers, which loses rows).

    Exact interpolating percentiles computed per group, then broadcast
    back onto the scan: the stats frame is group-cardinality-sized, so
    the corpus is scanned twice and shuffled never. At 100 TB swap in
    approx_percentile for the first pass and it becomes one pass, still
    map-side-combinable.

    Boundary contract (round-9 soak catch): the clamp boundaries are
    ROUNDED TO 6 DECIMALS on both sides. F.percentile interpolates as
    lo + d*(hi-lo) (exact when lo == hi); DuckDB 1.0.0 QUANTILE_CONT
    evaluates the un-factored lo + d*hi - d*lo, whose cancellation error
    is magnitude-dependent — on a group of three equal 100001.0 values
    its p05 returns 100001.00000000001, which strict-< clamp counting
    then reads as "every value is below the low boundary". Rounding both
    engines' boundaries to 6 retires the artifact class (same contract
    as q_agg_percentile / q_histogram_equidepth outputs)."""
    from pyspark.sql import functions as F

    l = load_table(spark, sf_dir, "lineitem")
    pct = l.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", 0.05), 6).alias("p05"),
        F.round(F.percentile("l_extendedprice", 0.95), 6).alias("p95"),
    )
    clamped = F.least(F.greatest(F.col("l_extendedprice"), F.col("p05")), F.col("p95"))
    return (
        l.join(F.broadcast(pct), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(clamped.cast("decimal(18,4)")).cast("double").alias("sum_winsorized"),
            F.sum(
                F.when(F.col("l_extendedprice") < F.col("p05"), 1).otherwise(0)
            ).cast("bigint").alias("n_clamped_low"),
            F.sum(
                F.when(F.col("l_extendedprice") > F.col("p95"), 1).otherwise(0)
            ).cast("bigint").alias("n_clamped_high"),
        )
    )
