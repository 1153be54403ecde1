"""Iterative graph operators — fixed-point PageRank in exact integer
arithmetic.

[EXT] per SURVEY.md §2 — the reference has no graph ops (transform
vocabulary filter/map/merge, structure.txt:24); label-propagation
connected components already live in operators/dedup.py, and PageRank is
the other canonical iterative-on-Spark algorithm (importance scoring over
an entity graph distilled from the fact tables).

Cross-engine exactness: floating-point PageRank is order-sensitive (the
per-node sum of incoming contributions depends on partition order), so
ranks are kept as **scaled bigints** (1.0 ≡ ``scale``) and every step is
integer multiply / integer divide / integer sum — associative,
commutative, bit-identical in any engine. The update per iteration is

    r'(v) = (15·scale) div (100·N)  +  (85 · Σ_u (r(u)·w(u,v)) div W(u)) div 100

i.e. damping 0.85 with weighted edge split, truncating division (all
values non-negative). Overflow-safe by construction: r < scale = 1e9 and
edge weights are fact-table row counts, so r·w < 1e9·1e10 < 2^63 even at
100 TB fact scale (nation-level graph).

Scale shape: the fact-table work is the ONE edge-aggregation at build
time; iterations touch only the (entity × entity) edge list, persisted
and reused, with a per-iteration shuffle keyed on dst. ``nodes.count()``
is the vertex-universe cardinality — dimension-table sized by
construction (driver-sized collect, same class as the BPE vocab winner,
operators/bpe.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCALE = 1_000_000_000


def pagerank_integer(
    nodes: DataFrame, edges: DataFrame, iters: int = 5, scale: int = SCALE
) -> DataFrame:
    """Fixed-iteration PageRank over ``nodes`` (column ``v``: bigint) and
    weighted ``edges`` (``src``, ``dst``, ``w``: bigint). Returns
    ``(v, r)`` with r the scaled-integer rank after ``iters`` rounds.
    Nodes with no out-edges leak their mass (standard non-teleporting
    dangling behavior) — identical in the SQL oracle."""
    n = nodes.count()
    base = (15 * scale) // (100 * n)
    e = edges.withColumn(
        "wout", F.sum("w").over(Window.partitionBy("src"))
    ).persist()
    ranks = nodes.select("v", F.lit(scale // n).cast("bigint").alias("r"))
    for _ in range(iters):
        contrib = (
            ranks.join(e, ranks["v"] == e["src"])
            .select(F.col("dst").alias("v"), F.expr("(r * w) div wout").alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contrib, "v", "left").select(
            "v",
            (
                F.lit(base)
                + F.expr("(85 * coalesce(s, CAST(0 AS BIGINT))) div 100")
            )
            .cast("bigint")
            .alias("r"),
        )
    return ranks
