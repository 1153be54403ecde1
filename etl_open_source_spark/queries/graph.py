"""Graph queries over the trade network distilled from the star schema.

[EXT] per SURVEY.md §2 — iterative graph analytics (the other half of the
iterative family next to label-propagation dedup clustering,
operators/dedup.py). The nation-level trade graph (supplier nation →
customer nation, weight = lineitem count) is the canonical
fact-table-to-entity-graph distillation.

The PageRank oracle is generated: one CTE per iteration, each performing
the exact same scaled-integer update as the engine loop
(operators/graph.py) — truncating integer division keeps both engines
bit-identical with no float-order sensitivity anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_open_source_spark.catalog import load_table
from etl_open_source_spark.operators.graph import SCALE, pagerank_integer
from etl_open_source_spark.registry import query

_ITERS = 5


def _pagerank_oracle(iters: int = _ITERS, scale: int = SCALE) -> str:
    parts = [
        f"""
WITH edges AS (
  SELECT CAST(s.s_nationkey AS BIGINT) AS src,
         CAST(c.c_nationkey AS BIGINT) AS dst,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
),
nodes AS (SELECT CAST(n_nationkey AS BIGINT) AS v FROM nation),
nn AS (SELECT COUNT(*) AS n FROM nodes),
e AS (SELECT src, dst, w, SUM(w) OVER (PARTITION BY src) AS wout FROM edges),
r0 AS (SELECT v, CAST({scale} // (SELECT n FROM nn) AS BIGINT) AS r FROM nodes)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
r{i} AS (
  SELECT n.v,
         CAST((SELECT ({15 * scale} // (100 * n)) FROM nn)
              + ((85 * COALESCE(c.s, 0)) // 100) AS BIGINT) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS v, SUM((p.r * e.w) // e.wout) AS s
    FROM r{i - 1} p JOIN e ON p.v = e.src
    GROUP BY e.dst
  ) c ON n.v = c.v
)"""
        )
    parts.append(
        f"""
SELECT n.n_nationkey, n.n_name, r.r AS pagerank
FROM r{iters} r JOIN nation n ON r.v = CAST(n.n_nationkey AS BIGINT)
ORDER BY pagerank DESC, n.n_nationkey"""
    )
    return "".join(parts)


@query(
    "q_graph_pagerank",
    oracle=_pagerank_oracle(),
    tags=("graph", "iterative"),
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 5 fixed iterations, scaled-integer exact)
    over the nation trade graph. The fact tables are touched exactly once
    (the edge aggregation); iterations run on the persisted entity-sized
    edge list with one dst-keyed shuffle each. At 100 TB the edge build is
    the only heavy stage and it is an ordinary groupBy — the iterate-on-
    the-distilled-graph shape is what makes iterative analytics viable at
    fact scale."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .groupBy(
            s["s_nationkey"].cast("bigint").alias("src"),
            c["c_nationkey"].cast("bigint").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    nodes = n.select(F.col("n_nationkey").cast("bigint").alias("v"))
    ranks = pagerank_integer(nodes, edges, iters=_ITERS)
    return (
        ranks.join(n, ranks["v"] == n["n_nationkey"].cast("bigint"))
        .select("n_nationkey", "n_name", F.col("r").alias("pagerank"))
        .orderBy(F.desc("pagerank"), "n_nationkey")
    )
