"""Deterministic sampling queries — training-corpus downsampling ops.

[EXT] per SURVEY.md §2: the reference ships no sampling (transform
vocabulary is filter/map/merge only, structure.txt:24); these are the
driver-mandated LLM-pipeline additions. Every query keys off the pure-
arithmetic hash in operators/sampling.py, so the DuckDB oracle reproduces
the exact same sample — determinism is the point, not a test convenience.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_open_source_spark.catalog import load_table
from etl_open_source_spark.operators.sampling import (
    sample_stratified,
    sample_uniform,
    sample_weighted,
    sql_det_hash,
    train_test_split,
)
from etl_open_source_spark.registry import query

_H_LI = sql_det_hash("l_orderkey", "l_linenumber")
_H_ORD = sql_det_hash("o_orderkey")
_H_DOC = sql_det_hash("doc_id")


@query(
    "q_sample_uniform",
    oracle=f"""
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE ({_H_LI}) % 10000 < 500
""",
    tags=("sampling", "llm"),
)
def q_sample_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5% deterministic Bernoulli sample of lineitem. Scan-local filter —
    pushes to the parquet scan, zero shuffles at any scale."""
    l = load_table(spark, sf_dir, "lineitem")
    return sample_uniform(l, ["l_orderkey", "l_linenumber"], 0.05).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@query(
    "q_sample_stratified",
    oracle=f"""
SELECT o_orderpriority, o_orderkey
FROM (
  SELECT o_orderpriority, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY h ASC, o_orderkey ASC) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM (SELECT o_orderpriority, o_orderkey, ({_H_ORD}) AS h FROM orders)
) t
WHERE rn <= CEIL(n * 0.1)
""",
    tags=("sampling", "llm"),
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional 10% per-priority sample of orders: exactly ceil(0.1*n_g)
    rows per stratum, chosen by hash order. One shuffle (the stratum
    window) — the minimum for exact per-group quotas."""
    o = load_table(spark, sf_dir, "orders")
    return sample_stratified(o, ["o_orderpriority"], ["o_orderkey"], 0.1).select(
        "o_orderpriority", "o_orderkey"
    )


@query(
    "q_sample_weighted",
    oracle=f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE (({_H_DOC}) % 10000) / 10000.0 < LEAST(1.0, n_chars / 2000.0)
""",
    tags=("sampling", "llm"),
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus sampling: acceptance probability scales with
    document length (longer docs kept more often) — the standard mix-
    reweighting op for training-data pipelines. Deterministic coin =
    key hash in [0,1); scan-local."""
    d = load_table(spark, sf_dir, "documents")
    weight = F.col("n_chars") / F.lit(2000.0)
    return sample_weighted(d, ["doc_id"], weight).select("doc_id", "lang", "n_chars")


@query(
    "q_sample_split",
    oracle=f"""
SELECT split, COUNT(*) AS n
FROM (
  SELECT CASE WHEN b < 8000 THEN 'train'
              WHEN b < 9000 THEN 'val'
              ELSE 'test' END AS split
  FROM (SELECT ({_H_LI}) % 10000 AS b FROM lineitem) h
) s
GROUP BY split
ORDER BY split
""",
    tags=("sampling", "llm"),
)
def q_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split of lineitem, verified by
    split counts. Rows never migrate between splits on re-runs or corpus
    growth — the bucket is a pure function of the row key."""
    l = load_table(spark, sf_dir, "lineitem")
    split = train_test_split(
        l, ["l_orderkey", "l_linenumber"], {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return (
        split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).orderBy("split")
    )


@query(
    "q_sample_reservoir",
    oracle=f"""
SELECT o_orderpriority, o_orderkey, o_totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY h ASC, o_orderkey ASC) AS rn
  FROM (SELECT o_orderpriority, o_orderkey, o_totalprice, ({_H_ORD}) AS h
        FROM orders)
) t
WHERE rn <= 20
""",
    tags=("sampling", "llm"),
)
def q_sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-k (k=20) uniform sample per order priority — the bounded-
    output reservoir twin of q_sample_stratified's proportional quota.
    Hash-order top-k per stratum: deterministic across runs, engines and
    partitionings, and the rank<=k predicate pushes into the window sort
    (WindowGroupLimit) so post-shuffle state is capped at k per stratum
    regardless of input scale."""
    o = load_table(spark, sf_dir, "orders")
    from etl_open_source_spark.operators.sampling import sample_fixed_k

    return sample_fixed_k(
        o, ["o_orderpriority"], ["o_orderkey"], 20
    ).select("o_orderpriority", "o_orderkey", "o_totalprice")
