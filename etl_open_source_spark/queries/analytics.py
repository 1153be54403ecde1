"""Behavioral-analytics queries: market-basket co-occurrence, event
transitions, RFM segmentation.

[EXT] per SURVEY.md §2 — the reference's transform vocabulary stops at
filter/map/merge (structure.txt:24); these are the standard BI/feature ops
a warehouse team runs on the same star schema. All exact-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_open_source_spark.catalog import load_table
from etl_open_source_spark.registry import query


@query(
    "q_pair_cooccurrence",
    oracle="""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       COUNT(*) AS support
FROM items a JOIN items b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY a.l_partkey, b.l_partkey
HAVING COUNT(*) >= 2
""",
    tags=("analytics", "join"),
)
def q_pair_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: parts that co-occur in the same order,
    with their support count (pairs ordered part_a < part_b so each pair
    counts once; support >= 2 filters the long unique tail).

    Shape (operators/baskets.py): ONE shuffle on the basket key —
    collect_set gathers each basket's distinct items, pairs generate
    scan-local from the array via nested higher-order functions (no
    self-join: a join formulation either re-shuffles or duplicates the
    dedup subtree), then the pair-count aggregate. Per-basket work is
    O(basket²) but ``max_basket_size=64`` drops degenerate baskets whole
    (no effect on this data, baskets <= ~13 items) — the same
    skew-over-completeness guard as the LSH hot-bucket cap
    (operators/dedup.py), pinned by a property test."""
    from etl_open_source_spark.operators.baskets import cooccurring_pairs

    items = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return cooccurring_pairs(
        items, "l_orderkey", "l_partkey", min_support=2, max_basket_size=64
    )


@query(
    "q_event_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, COUNT(*) AS n,
       ROUND(COUNT(*) / SUM(COUNT(*)) OVER (PARTITION BY prev_type), 6) AS p
FROM seq
WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
""",
    tags=("analytics", "timeseries"),
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-transition matrix (Markov counts): for each
    consecutive pair of events per user, count prev→next transitions and
    the per-source transition probability — the building block of
    journey/funnel analysis beyond the fixed-order q_funnel.

    Shape: one (user)-partitioned window for the lag, one global
    transition aggregate (event-type² cells — tiny), one type-cardinality
    window for the probabilities. The corpus shuffles once, on user_id;
    event_id tiebreaks equal timestamps so the sequence is
    deterministic."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = F.sum("n").over(Window.partitionBy("prev_type"))
    return counts.select(
        "prev_type", "next_type", "n", F.round(F.col("n") / total, 6).alias("p")
    )


@query(
    "q_rfm_segments",
    oracle="""
WITH base AS (
  SELECT o_custkey,
         MAX(o_orderdate) AS last_order,
         COUNT(*) AS freq,
         SUM(CAST(CASE WHEN ISFINITE(o_totalprice) THEN o_totalprice END AS DECIMAL(18,4))) AS monetary
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey,
       CAST(NTILE(4) OVER (ORDER BY last_order DESC, o_custkey ASC NULLS LAST) AS BIGINT) AS r_bucket,
       CAST(NTILE(4) OVER (ORDER BY freq DESC, o_custkey ASC NULLS LAST) AS BIGINT) AS f_bucket,
       CAST(NTILE(4) OVER (ORDER BY monetary DESC, o_custkey ASC NULLS LAST) AS BIGINT) AS m_bucket,
       CAST(monetary AS DOUBLE) AS monetary
FROM base
""",
    tags=("analytics", "window"),
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: every customer scored into recency / frequency /
    monetary quartiles (1 = best) — the classic lifecycle-marketing
    segmentation. NTILE over (metric DESC, custkey NULLS LAST) —
    identical bucket-boundary semantics in both engines once the order
    is made total by the key tiebreak; without it quartile membership at
    metric ties is engine-dependent, and the NULLS placement must be
    pinned too (Spark ASC defaults nulls-first, DuckDB nulls-last — a
    NULL customer key shifts every ntile boundary; caught by the
    adversarial fixture suite).

    Shape: one per-customer aggregate, then three global NTILE windows.
    The global sort is the scale caveat: at 100 TB replace exact NTILE
    with approx_percentile bucket edges broadcast back (one aggregate +
    scan-local bucketing, as in q_histogram) — exact quartile ranks are
    rarely worth a total order."""
    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("monetary"),
    )
    nt = lambda col: F.ntile(4).over(  # noqa: E731
        Window.orderBy(F.col(col).desc(), F.col("o_custkey").asc_nulls_last())
    )
    return base.select(
        "o_custkey",
        nt("last_order").cast("bigint").alias("r_bucket"),
        nt("freq").cast("bigint").alias("f_bucket"),
        nt("monetary").cast("bigint").alias("m_bucket"),
        F.col("monetary").cast("double").alias("monetary"),
    )


@query(
    "q_embedding_norm_stats",
    oracle="""
WITH norms AS (
  -- list_reduce, NOT LIST_SUM: LIST_SUM skips NULL elements (treating a
  -- partially-NULL vector as a shorter one) while Spark's fold
  -- propagates NULL — the fold is the pinned semantics. Empty arrays
  -- fold to the engine's 0.0 init (list_reduce errors on []).
  SELECT label,
         SQRT(CASE WHEN embedding IS NULL THEN NULL
                   WHEN LEN(embedding) = 0 THEN 0.0
                   ELSE list_reduce(LIST_TRANSFORM(embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                          (x, y) -> x + y) END) AS nrm,
         LEN(embedding) AS dim
  FROM embeddings
)
SELECT label,
       COUNT(*) AS n,
       CAST(MIN(dim) AS BIGINT) AS min_dim, CAST(MAX(dim) AS BIGINT) AS max_dim,
       CAST(SUM(CASE WHEN isfinite(nrm) THEN CAST(nrm AS DECIMAL(18,6)) END) AS DOUBLE) AS sum_norm,
       CAST(SUM(CASE WHEN nrm < 1e-6 OR NOT isfinite(nrm) THEN 1 ELSE 0 END) AS BIGINT) AS n_degenerate
FROM norms
GROUP BY label
""",
    tags=("analytics", "llm"),
)
def q_embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-table quality audit: per label, row count, dimension
    bounds (a ragged dim is a broken export), exact decimal sum of L2
    norms, and degenerate (near-zero) vector count — the sanity pass
    every similarity/dedup pipeline runs before trusting cosine math
    (q_sim_*, q_dedup_embedding assume unit-ish, fixed-dim vectors).

    Scan-local arithmetic via fold over the array column (no explode
    round-trip — same zero-exchange design as q_vector_agg), then one
    label-sized aggregate. Norms fold through DECIMAL(18,6) so the
    per-label sum is order-independent and bit-identical to DuckDB's.
    Non-finite norms (NaN/Inf components) count as degenerate — they
    are exactly what this audit exists to surface — and are excluded
    from the decimal sum explicitly (DuckDB hard-errors NaN→DECIMAL
    where Spark yields NULL; neither default is trusted)."""
    emb = load_table(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = F.sqrt(sq)
    finite = (~F.isnan(F.col("nrm"))) & (F.col("nrm") != F.lit(float("inf")))
    return (
        emb.select("label", nrm.alias("nrm"), F.size("embedding").alias("dim"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("dim").cast("bigint").alias("min_dim"),
            F.max("dim").cast("bigint").alias("max_dim"),
            F.sum(F.when(finite, F.col("nrm").cast("decimal(18,6)")))
            .cast("double")
            .alias("sum_norm"),
            F.sum(F.when((F.col("nrm") < 1e-6) | ~finite, 1).otherwise(0))
            .cast("bigint")
            .alias("n_degenerate"),
        )
    )


@query(
    "q_skyline_pareto",
    oracle="""
SELECT p.p_partkey, p.p_retailprice, p.p_size
FROM part p
WHERE p.p_retailprice IS NOT NULL AND p.p_size IS NOT NULL
  AND NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice
    AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)
ORDER BY p.p_partkey
""",
    tags=("analytics", "dominance"),
)
def q_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) of part on (minimize p_retailprice,
    maximize p_size): the multi-objective shortlist no single ORDER BY can
    produce. Oracle = the textbook O(n²) NOT EXISTS dominance self-join;
    engine = the two-phase partition-prune-merge skyline in
    operators/dominance.py — one balanced shuffle over the input, then
    dimension-table-sized work, no quadratic candidate join at any scale."""
    p = load_table(spark, sf_dir, "part")
    from etl_open_source_spark.operators.dominance import skyline_2d

    return skyline_2d(
        p.select("p_partkey", "p_retailprice", "p_size"),
        minimize="p_retailprice",
        maximize="p_size",
        keys=["p_partkey"],
    ).orderBy("p_partkey")


@query(
    "q_retention_days",
    oracle="""
WITH firsts AS (
  SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id
),
flags AS (
  SELECT f.user_id,
         MAX(CASE WHEN e.ts >= f.first_ts + INTERVAL 1 DAY
                   AND e.ts <  f.first_ts + INTERVAL 2 DAY THEN 1 ELSE 0 END) AS d1,
         MAX(CASE WHEN e.ts >= f.first_ts + INTERVAL 7 DAY
                   AND e.ts <  f.first_ts + INTERVAL 8 DAY THEN 1 ELSE 0 END) AS d7,
         MAX(CASE WHEN e.ts >= f.first_ts + INTERVAL 30 DAY
                   AND e.ts <  f.first_ts + INTERVAL 31 DAY THEN 1 ELSE 0 END) AS d30
  FROM firsts f JOIN events e USING (user_id)
  GROUP BY f.user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(d1) AS BIGINT) AS d1_retained,
       CAST(SUM(d7) AS BIGINT) AS d7_retained,
       CAST(SUM(d30) AS BIGINT) AS d30_retained,
       ROUND(CAST(SUM(d1) AS DOUBLE) / COUNT(*), 6) AS d1_rate,
       ROUND(CAST(SUM(d7) AS DOUBLE) / COUNT(*), 6) AS d7_rate,
       ROUND(CAST(SUM(d30) AS DOUBLE) / COUNT(*), 6) AS d30_rate
FROM flags
""",
    tags=("analytics", "timeseries"),
)
def q_retention_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic D1/D7/D30 retention: a user counts as day-N retained iff
    they have ANY event inside the [first_ts + N days, first_ts + N+1
    days) window — day N inclusive at its start, the standard
    product-analytics convention (the adversarial fixture's
    exactly-+7-days event pins the boundary side)
    (cohort_retention's month triangle answers a different question:
    activity in ANY later month).

    Shape: per-user first-event aggregate, then ONE more pass over
    events joined back on user_id — both keyed on user_id so AQE reuses
    the exchange; the flags fold map-side (MAX of 0/1). No windows, no
    per-day explode. Day arithmetic is interval comparison on raw
    timestamps — identical in both engines, no date-truncation edge."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(F.min("ts").alias("first_ts"))

    def day_flag(n):
        lo = F.col("first_ts") + F.expr(f"INTERVAL {n} DAY")
        hi = F.col("first_ts") + F.expr(f"INTERVAL {n + 1} DAY")
        return F.max(
            F.when((F.col("ts") >= lo) & (F.col("ts") < hi), 1).otherwise(0)
        )

    flags = (
        firsts.join(e, "user_id")
        .groupBy("user_id")
        .agg(
            day_flag(1).alias("d1"),
            day_flag(7).alias("d7"),
            day_flag(30).alias("d30"),
        )
    )
    n = F.count(F.lit(1))
    return flags.agg(
        n.cast("bigint").alias("n_users"),
        F.sum("d1").cast("bigint").alias("d1_retained"),
        F.sum("d7").cast("bigint").alias("d7_retained"),
        F.sum("d30").cast("bigint").alias("d30_retained"),
        F.round(F.sum("d1").cast("double") / n, 6).alias("d1_rate"),
        F.round(F.sum("d7").cast("double") / n, 6).alias("d7_rate"),
        F.round(F.sum("d30").cast("double") / n, 6).alias("d30_rate"),
    )
