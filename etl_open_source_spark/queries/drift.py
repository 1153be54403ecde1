"""Distribution-drift and higher-moment diagnostics.

[EXT] per SURVEY.md §2 — completes the drift-monitoring family around
q_quality_psi: a two-sample Kolmogorov-Smirnov test (continuous drift,
no binning choice to tune), a chi-square homogeneity test (categorical
mix drift), and exact skewness/kurtosis per group (the shape diagnostics
that tell you WHICH way a distribution moved). All three are
aggregate-only shapes — no fact-table self-joins anywhere — and follow
the house exactness discipline: order-sensitive float summation never
crosses an aggregate boundary (KS is pure integer arithmetic until the
final division; chi-square and moment contributions round per-row/
per-cell and sum as DECIMAL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_open_source_spark.catalog import load_table
from etl_open_source_spark.functions.numeric import finite_or_null
from etl_open_source_spark.registry import query


@query(
    "q_quality_ks",
    oracle="""
WITH pts AS (
  SELECT o_orderpriority AS prio, o_totalprice AS x,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS c_f,
         CAST(SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS c_o
  FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1, 2
),
cum AS (
  SELECT prio, x, c_f, c_o,
         SUM(c_f) OVER (PARTITION BY prio ORDER BY x
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_f,
         SUM(c_o) OVER (PARTITION BY prio ORDER BY x
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_o,
         SUM(c_f) OVER (PARTITION BY prio) AS n_f,
         SUM(c_o) OVER (PARTITION BY prio) AS n_o
  FROM pts
)
SELECT prio,
       CAST(MAX(n_f) AS BIGINT) AS n_f,
       CAST(MAX(n_o) AS BIGINT) AS n_o,
       CAST(MAX(ABS(n_o * cum_f - n_f * cum_o)) AS BIGINT) AS ks_scaled,
       ROUND(CAST(MAX(ABS(n_o * cum_f - n_f * cum_o)) AS DOUBLE)
             / NULLIF(CAST(MAX(n_f) * MAX(n_o) AS DOUBLE), 0), 8) AS ks
FROM cum GROUP BY prio
""",
    tags=("quality", "analytics"),
)
def q_quality_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic per order priority:
    D = max_x |ECDF_F(x) - ECDF_other(x)| between finished ('F') and
    everything-else order totals — the binning-free complement to
    q_quality_psi (PSI needs a decile choice; KS does not, so it catches
    drift concentrated between bin edges).

    Exactness: the statistic stays INTEGER until the very end —
    D_scaled = max |n_o·cumF - n_f·cumO| over per-distinct-value
    cumulative counts (ties aggregated per x first, so both ECDFs jump
    together), then one division. No float ever enters a window or an
    aggregate, so engines agree bit-for-bit. A priority with either
    population empty yields ks = NULL (try_divide / NULLIF).

    Shape: one (prio, x) pre-aggregate (map-side combinable — the fact
    table never reaches the window), one prio-partitioned cumulative
    window over DISTINCT values, one final per-prio max. At 100 TB the
    distinct-value set per group is what the window sorts — for
    continuous doubles cap it by pre-rounding x (ECDF on a 1e-2 grid
    changes D by at most the grid mass), the same quantize-then-exact
    trade as q_sim_pq. NULL prices are not sample points (an ECDF has no
    NULL abscissa) and are excluded on both sides — the NULL group's
    cumulative position otherwise differs with the engines' NULL sort
    defaults (caught by the randomized orders differential)."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    )
    pts = (
        o.groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.col("o_totalprice").alias("x"),
        )
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("bigint")
            .alias("c_f"),
            F.sum(F.when(F.col("o_orderstatus") != "F", 1).otherwise(0))
            .cast("bigint")
            .alias("c_o"),
        )
    )
    wcum = (
        Window.partitionBy("prio")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("prio")
    cum = pts.select(
        "prio",
        F.sum("c_f").over(wcum).alias("cum_f"),
        F.sum("c_o").over(wcum).alias("cum_o"),
        F.sum("c_f").over(wall).alias("n_f"),
        F.sum("c_o").over(wall).alias("n_o"),
    )
    d_scaled = F.abs(F.col("n_o") * F.col("cum_f") - F.col("n_f") * F.col("cum_o"))
    return (
        cum.select("prio", "n_f", "n_o", d_scaled.alias("d"))
        .groupBy("prio")
        .agg(
            F.max("n_f").cast("bigint").alias("n_f"),
            F.max("n_o").cast("bigint").alias("n_o"),
            F.max("d").cast("bigint").alias("ks_scaled"),
            F.round(
                F.try_divide(
                    F.max("d").cast("double"),
                    (F.max("n_f") * F.max("n_o")).cast("double"),
                ),
                8,
            ).alias("ks"),
        )
    )


@query(
    "q_quality_chisq",
    oracle="""
WITH e AS (
  SELECT event_type, CAST(DATE_TRUNC('day', ts) AS DATE) AS day FROM events
),
bounds AS (
  SELECT MIN(day) + CAST(DATE_DIFF('day', MIN(day), MAX(day)) // 2 AS BIGINT)
           * INTERVAL 1 DAY AS split_day
  FROM e
),
cells AS (
  SELECT e.event_type,
         CAST(SUM(CASE WHEN e.day <= b.split_day THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
         CAST(SUM(CASE WHEN e.day >  b.split_day THEN 1 ELSE 0 END) AS BIGINT) AS c_cur
  FROM e CROSS JOIN bounds b
  GROUP BY e.event_type
),
tot AS (
  SELECT SUM(c_ref) AS n_ref, SUM(c_cur) AS n_cur, SUM(c_ref + c_cur) AS n
  FROM cells
),
contrib AS (
  SELECT c.event_type, c.c_ref, c.c_cur,
         CAST(ROUND(
           POWER(c.c_ref - CAST((c.c_ref + c.c_cur) * t.n_ref AS DOUBLE) / t.n, 2)
             / NULLIF(CAST((c.c_ref + c.c_cur) * t.n_ref AS DOUBLE) / t.n, 0)
           + POWER(c.c_cur - CAST((c.c_ref + c.c_cur) * t.n_cur AS DOUBLE) / t.n, 2)
             / NULLIF(CAST((c.c_ref + c.c_cur) * t.n_cur AS DOUBLE) / t.n, 0)
         , 8) AS DECIMAL(18,8)) AS contrib
  FROM cells c CROSS JOIN tot t
)
SELECT event_type, c_ref, c_cur,
       CAST(contrib AS DOUBLE) AS contrib,
       CAST(SUM(contrib) OVER () AS DOUBLE) AS chi2
FROM contrib
""",
    tags=("quality", "analytics"),
)
def q_quality_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square homogeneity test on the event-type mix: did the
    CATEGORY distribution shift between the first and second half of the
    timeline? (PSI/KS watch a numeric column; this watches the label
    mix — the drift that silently rebalances a training corpus.) Emits
    one row per event type with its contribution and the shared chi2
    total (dof = n_types - 1).

    Parity design: expected counts come from exact integer products
    divided once ((rowtot·n_ref)/n), per-cell contributions round to 8
    places and SUM as DECIMAL — float order never crosses the aggregate.
    A half with zero rows yields NULL contributions (try_divide /
    NULLIF), not a crash. Shape: one global split-day aggregate
    broadcast back, one per-type cell aggregate (map-side combinable),
    then window arithmetic over the n_types-row cell frame — the events
    table is scanned twice (split-day probe + cells, same as
    q_quality_psi) and shuffled once."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    )
    bounds = e.agg(
        F.date_add(
            F.min("day"),
            F.floor(F.datediff(F.max("day"), F.min("day")) / 2).cast("int"),
        ).alias("split_day")
    )
    cells = (
        e.crossJoin(F.broadcast(bounds))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("day") <= F.col("split_day"), 1).otherwise(0))
            .cast("bigint")
            .alias("c_ref"),
            F.sum(F.when(F.col("day") > F.col("split_day"), 1).otherwise(0))
            .cast("bigint")
            .alias("c_cur"),
        )
    )
    # totals as windows over the n_types-row cells frame — a separate
    # cells.agg() would RE-BUILD the cells subtree and scan events a
    # third time (caught in the plan audit); the single-partition window
    # is over event-type-cardinality rows, never facts
    wall = Window.partitionBy()
    n_ref = F.sum("c_ref").over(wall)
    n_cur = F.sum("c_cur").over(wall)
    n_all = F.sum(F.col("c_ref") + F.col("c_cur")).over(wall)
    rowtot = F.col("c_ref") + F.col("c_cur")
    e_ref = (rowtot * n_ref).cast("double") / n_all
    e_cur = (rowtot * n_cur).cast("double") / n_all
    contrib = F.round(
        F.try_divide(F.pow(F.col("c_ref") - e_ref, 2), e_ref)
        + F.try_divide(F.pow(F.col("c_cur") - e_cur, 2), e_cur),
        8,
    ).cast("decimal(18,8)")
    per_cell = cells.select(
        "event_type", "c_ref", "c_cur", contrib.alias("contrib")
    )
    return per_cell.select(
        "event_type",
        "c_ref",
        "c_cur",
        F.col("contrib").cast("double").alias("contrib"),
        F.sum("contrib").over(Window.partitionBy()).cast("double").alias("chi2"),
    )


@query(
    "q_agg_skew_kurt",
    oracle="""
WITH p AS (
  SELECT event_type,
         CAST(CASE WHEN ISFINITE(value) THEN value END AS DECIMAL(18,4)) AS v1,
         CAST(CASE WHEN ISFINITE(value * value)
              THEN ROUND(value * value, 4) END AS DECIMAL(38,4)) AS v2,
         CAST(CASE WHEN ISFINITE((value * value) * value)
              THEN ROUND((value * value) * value, 4) END AS DECIMAL(38,4)) AS v3,
         CAST(CASE WHEN ISFINITE((value * value) * (value * value))
              THEN ROUND((value * value) * (value * value), 4) END AS DECIMAL(38,4)) AS v4
  FROM events
),
s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v1) AS DOUBLE) AS s1,
         CAST(SUM(v2) AS DOUBLE) AS s2,
         CAST(SUM(v3) AS DOUBLE) AS s3,
         CAST(SUM(v4) AS DOUBLE) AS s4
  FROM p GROUP BY event_type
)
SELECT event_type, n,
       ROUND(s1 / n, 6) AS mean,
       ROUND(SQRT(GREATEST(s2 / n - (s1 / n) * (s1 / n), 0)), 6) AS stddev_pop,
       ROUND((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
             / NULLIF(POWER(SQRT(GREATEST(s2 / n - (s1 / n) * (s1 / n), 0)), 3), 0), 6) AS skewness,
       ROUND((s4 / n - 4 * (s1 / n) * (s3 / n)
              + 6 * (s1 / n) * (s1 / n) * (s2 / n)
              - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
             / NULLIF(POWER(GREATEST(s2 / n - (s1 / n) * (s1 / n), 0), 2), 0) - 3, 6) AS kurtosis_excess
FROM s
""",
    tags=("agg", "quality"),
)
def q_agg_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact population skewness and excess kurtosis of `value` per event
    type — the shape diagnostics behind every drift alarm (PSI says the
    distribution moved; these say whether it grew a tail). Built from raw
    power sums, not Spark's skewness()/kurtosis() aggregates, whose
    float accumulation order is engine- and partition-dependent.

    Exactness: per-row powers are computed in IEEE double with a PINNED
    association — v2 = v·v, v3 = (v·v)·v, v4 = (v·v)·(v·v), identical
    text on both engines — rounded to 4 places and summed as DECIMAL, so
    the only inexact steps are bit-identical per-row ops and the final
    closed-form moment arithmetic on identical inputs. A zero-variance
    group (constant series) yields NULL skewness/kurtosis via
    try_divide/NULLIF, pinned by the adversarial fixture's constant-value
    user. Shape: ONE map-side-combinable aggregate — no window, no join,
    no second scan; the canonical 100 TB-safe statistic."""
    e = load_table(spark, sf_dir, "events")
    v = F.col("value")
    p = e.select(
        "event_type",
        v.cast("decimal(18,4)").alias("v1"),
        F.round(v * v, 4).cast("decimal(38,4)").alias("v2"),
        F.round((v * v) * v, 4).cast("decimal(38,4)").alias("v3"),
        F.round((v * v) * (v * v), 4).cast("decimal(38,4)").alias("v4"),
    )
    s = p.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v1").cast("double").alias("s1"),
        F.sum("v2").cast("double").alias("s2"),
        F.sum("v3").cast("double").alias("s3"),
        F.sum("v4").cast("double").alias("s4"),
    )
    n = F.col("n")
    m = F.col("s1") / n
    # clamp at 0: a constant series at a NON-dyadic value (e.g. 123.45)
    # yields var = -1.8e-12 from float cancellation in the identical
    # arithmetic on both engines — DuckDB SQRT(negative) HARD-errors and
    # Spark returns NaN, neither the documented NULL. GREATEST(...,0)
    # pins the contract: degenerate variance → sd 0 → moments NULL
    # (caught by self-review; the adversarial constants 4.25/7.0 are
    # dyadic so their variance cancels exactly and masked this)
    var = F.greatest(F.col("s2") / n - m * m, F.lit(0.0))
    sd = F.sqrt(var)
    skew = F.try_divide(
        F.col("s3") / n - F.lit(3) * m * (F.col("s2") / n) + F.lit(2) * m * m * m,
        F.pow(sd, 3),
    )
    kurt = (
        F.try_divide(
            F.col("s4") / n
            - F.lit(4) * m * (F.col("s3") / n)
            + F.lit(6) * m * m * (F.col("s2") / n)
            - F.lit(3) * m * m * m * m,
            F.pow(var, 2),
        )
        - F.lit(3)
    )
    return s.select(
        "event_type",
        "n",
        F.round(m, 6).alias("mean"),
        F.round(sd, 6).alias("stddev_pop"),
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("kurtosis_excess"),
    )


@query(
    "q_agg_gini",
    oracle="""
WITH ranked AS (
  SELECT o_orderpriority AS prio,
         CAST(o_totalprice AS DECIMAL(18,4)) AS x,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                 ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS i
  FROM orders WHERE o_totalprice IS NOT NULL AND ISFINITE(o_totalprice)
),
s AS (
  SELECT prio,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS total,
         SUM(i * x) AS weighted
  FROM ranked GROUP BY prio
)
SELECT prio, n,
       CAST(total AS DOUBLE) AS total,
       ROUND(CAST(2 * weighted - (n + 1) * total AS DOUBLE)
             / NULLIF(CAST(n * total AS DOUBLE), 0), 8) AS gini
FROM s
""",
    tags=("agg", "quality", "analytics"),
)
def q_agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of order totals per priority — the concentration
    diagnostic (0 = perfectly even spend, →1 = one order dominates) that
    complements the moment diagnostics: skewness says the tail's SHAPE,
    Gini says how much of the mass it holds. Same statistic a corpus
    pipeline runs on tokens-per-document to detect a few giant docs
    dominating a shard.

    Exactness: the rank formulation G = (2·Σi·xᵢ − (n+1)·Σx)/(n·Σx) runs
    entirely in DECIMAL (Σi·x with i ≤ n fits DECIMAL(38,4) comfortably)
    with ONE final double division — and the statistic is tie-order
    invariant (equal x values contribute x·Σi over the tie block no
    matter how row_number breaks the tie), so the key tiebreak is for
    discipline, not correctness. An all-zero group → NULL (try_divide /
    NULLIF). Shape: one per-group ranking window + one aggregate; the
    window's sort is per-priority (bounded partitions), and at 100 TB
    the same formula runs on pre-binned value counts (Σ over distinct
    values of rank-weighted mass) to avoid ranking raw facts. NULL
    prices are excluded on BOTH sides before ranking: a NULL contributes
    nothing to Σx, but its row_number position differs between Spark's
    NULLS FIRST and DuckDB's NULLS LAST, shifting every non-NULL rank
    (caught by the randomized orders differential). Non-finite prices
    are excluded the same way (NaN-axis r11): a corrupt price has no
    place in a concentration statistic, and leaving it in would count it
    in n while contributing nothing to the sums."""
    o = load_table(spark, sf_dir, "orders").filter(
        finite_or_null("o_totalprice").isNotNull()
    )
    wr = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    ranked = o.select(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").cast("decimal(18,4)").alias("x"),
        F.row_number().over(wr).cast("bigint").alias("i"),
    )
    s = ranked.groupBy("prio").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("total"),
        F.sum(F.col("i") * F.col("x")).alias("weighted"),
    )
    n, total, weighted = F.col("n"), F.col("total"), F.col("weighted")
    return s.select(
        "prio",
        "n",
        total.cast("double").alias("total"),
        F.round(
            F.try_divide(
                (F.lit(2) * weighted - (n + 1) * total).cast("double"),
                (n * total).cast("double"),
            ),
            8,
        ).alias("gini"),
    )


@query(
    "q_histogram_equidepth",
    oracle="""
WITH edges AS (
  SELECT l_returnflag,
         ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS e1,
         ROUND(quantile_cont(l_extendedprice, 0.50), 6) AS e2,
         ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS e3
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       CAST(1 + (l.l_extendedprice > e.e1)::INT + (l.l_extendedprice > e.e2)::INT
              + (l.l_extendedprice > e.e3)::INT AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       e.e1 AS q25, e.e2 AS q50, e.e3 AS q75
FROM lineitem l JOIN edges e USING (l_returnflag)
GROUP BY l.l_returnflag, bucket, e.e1, e.e2, e.e3
""",
    tags=("agg", "analytics"),
)
def q_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram: quartile edges per return flag, then row
    counts per quantile bucket — the histogram an optimizer or drift
    monitor actually wants (equi-WIDTH bins, q_histogram, put 90% of a
    skewed column in one bin; equi-depth bins hold ~n/4 each by
    construction, so a drifted bucket count IS the drift signal).

    Parity: edges round to 6dp before bucketing on BOTH sides, and
    bucket = 1 + Σ(x > eᵢ) is pure comparison arithmetic — a row equal
    to an edge goes left deterministically in both engines. Shape: one
    exact-percentile aggregate (group-bounded sort — the
    approx_percentile swap is the 100 TB path, as in q_agg_percentile)
    whose group-count-sized result broadcasts back onto one corpus scan;
    the final aggregate is map-side combinable."""
    l = load_table(spark, sf_dir, "lineitem")
    edges = l.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 6).alias("e1"),
        F.round(F.percentile("l_extendedprice", F.lit(0.50)), 6).alias("e2"),
        F.round(F.percentile("l_extendedprice", F.lit(0.75)), 6).alias("e3"),
    )
    x = F.col("l_extendedprice")
    bucket = (
        F.lit(1)
        + (x > F.col("e1")).cast("int")
        + (x > F.col("e2")).cast("int")
        + (x > F.col("e3")).cast("int")
    ).cast("bigint")
    return (
        l.join(F.broadcast(edges), "l_returnflag")
        .groupBy("l_returnflag", bucket.alias("bucket"), "e1", "e2", "e3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .select(
            "l_returnflag",
            "bucket",
            "cnt",
            F.col("e1").alias("q25"),
            F.col("e2").alias("q50"),
            F.col("e3").alias("q75"),
        )
    )
