"""Pattern-mining queries: association rules, sorted-neighborhood dedup,
neighbor-set link prediction.

[EXT] per SURVEY.md §2 — the reference's transform vocabulary stops at
filter/map/merge (structure.txt:24); these are the standard mining passes
a curation/recommendation team runs on the same tables. All exact-oracled:
the rate math is pure IEEE division in identical operand order on both
engines, rounded to 6 places.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_open_source_spark.catalog import load_table
from etl_open_source_spark.operators.text import ascii_fold
from etl_open_source_spark.registry import query


@query(
    "q_assoc_rules",
    oracle="""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
),
nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM items),
supp AS (SELECT l_partkey, COUNT(*) AS s FROM items GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS support
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= 2
),
rules AS (
  SELECT pa AS antecedent, pb AS consequent, support FROM pairs
  UNION ALL
  SELECT pb AS antecedent, pa AS consequent, support FROM pairs
)
SELECT antecedent, consequent, support,
       ROUND(CAST(support AS DOUBLE) / sa.s, 6) AS confidence,
       ROUND(CAST(support AS DOUBLE) / sa.s * nb.n / sb.s, 6) AS lift
FROM rules
JOIN supp sa ON rules.antecedent = sa.l_partkey
JOIN supp sb ON rules.consequent = sb.l_partkey
CROSS JOIN nb
""",
    tags=("mining", "analytics"),
)
def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed association rules over order baskets: for every
    co-occurring part pair (support >= 2), both rule directions with
    confidence (= P(consequent | antecedent)) and lift (= confidence over
    the consequent's base rate) — the step after q_pair_cooccurrence that
    turns raw supports into rankable recommendations.

    Shape (operators/baskets.py): the single-shuffle pair mine, one
    item-support aggregate joined back on the item key, and the 1-row
    basket count broadcast. ``max_basket_size=64`` is the degenerate-
    basket guard (no effect on this data — baskets <= ~13 items).
    NULL basket keys and NULL items are excluded from every universe on
    both sides — a NULL key is not a basket under SQL equality (pinned
    by the randomized relational-agg differential)."""
    from etl_open_source_spark.operators.baskets import association_rules

    items = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return association_rules(
        items, "l_orderkey", "l_partkey", min_support=2, max_basket_size=64
    )


@query(
    "q_dedup_sorted_neighborhood",
    oracle="""
WITH base AS (
  SELECT doc_id AS id,
         SUBSTR(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), 1, 16) AS sk,
         LIST_DISTINCT(STRING_SPLIT(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS toks
  FROM documents
),
ranked AS (
  SELECT id, sk, toks, SUBSTR(sk, 1, 2) AS blk,
         ROW_NUMBER() OVER (PARTITION BY SUBSTR(sk, 1, 2) ORDER BY sk, id) AS rn
  FROM base
),
pairs AS (
  SELECT a.id AS ia, b.id AS ib, a.toks AS ta, b.toks AS tb
  FROM ranked a JOIN ranked b
    ON a.blk = b.blk AND b.rn - a.rn BETWEEN 1 AND 3
)
SELECT id_a, id_b, jaccard FROM (
  SELECT LEAST(ia, ib) AS id_a, GREATEST(ia, ib) AS id_b,
         ROUND(CAST(LEN(LIST_INTERSECT(ta, tb)) AS DOUBLE)
               / (LEN(ta) + LEN(tb) - LEN(LIST_INTERSECT(ta, tb))), 6) AS jaccard
  FROM pairs
) WHERE jaccard >= 0.3
""",
    bench=True,
    tags=("mining", "llm", "dedup"),
)
def q_dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood near-dup pass: sort documents by a 16-char
    lowercased prefix key inside 2-char blocks, compare each doc with its
    next 3 neighbors in sort order, keep token-set Jaccard >= 0.3 — the
    predictable-cost (O(n·w) candidates) complement to the hash-based
    blockers (q_dedup_near / q_dedup_simhash / q_dedup_ngram).

    Shape (operators/neighborhood.py): ONE shuffle (per-block window
    sort); pairs come from scan-local ``lead`` columns, never a
    self-join. Cross-block pairs are missed by design — the standard
    blocked-SNM trade-off, remedied by a second pass on a different key
    exactly as multi-band LSH reruns with another band seed."""
    from etl_open_source_spark.operators.neighborhood import (
        sorted_neighborhood_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    return sorted_neighborhood_pairs(
        d, "doc_id", "text", key_len=16, block_len=2, window=4, threshold=0.3
    )


@query(
    "q_graph_link_jaccard",
    oracle="""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
e AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= 2
),
adj AS (SELECT src AS v, dst AS nbr FROM e UNION ALL SELECT dst AS v, src AS nbr FROM e),
deg AS (SELECT v, COUNT(*) AS deg FROM adj GROUP BY v),
pivots AS (
  SELECT adj.v, adj.nbr FROM adj JOIN deg d ON adj.nbr = d.v WHERE d.deg <= 64
),
common AS (
  SELECT a.v AS id_a, b.v AS id_b, COUNT(*) AS common
  FROM pivots a JOIN pivots b ON a.nbr = b.nbr AND a.v < b.v
  GROUP BY 1, 2
),
ne AS (
  SELECT common.* FROM common
  LEFT JOIN e ON common.id_a = e.src AND common.id_b = e.dst
  WHERE e.src IS NULL
)
SELECT id_a, id_b, common, jaccard FROM (
  SELECT ne.id_a, ne.id_b, ne.common,
         ROUND(CAST(ne.common AS DOUBLE)
               / (da.deg + db.deg - ne.common), 6) AS jaccard
  FROM ne
  JOIN deg da ON ne.id_a = da.v
  JOIN deg db ON ne.id_b = db.v
) WHERE jaccard >= 0.2
""",
    tags=("mining", "graph"),
)
def q_graph_link_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the part co-purchase graph (edges = part pairs
    bought together in >= 2 orders): for non-adjacent parts sharing a
    co-purchase neighbor, the neighbor-set Jaccard score — 'parts that
    should sell together but haven't yet'.

    Shape (operators/graph.py::link_prediction_jaccard): candidates only
    from the common-neighbor join (distance-2 pairs, never |V|²); hub
    pivots above degree 64 excluded (skew guard, mirrored in the
    oracle); every join keyed on node ids."""
    from etl_open_source_spark.operators.baskets import cooccurring_pairs
    from etl_open_source_spark.operators.graph import link_prediction_jaccard

    items = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = cooccurring_pairs(
        items, "l_orderkey", "l_partkey", min_support=2
    ).selectExpr("part_a AS src", "part_b AS dst")
    return link_prediction_jaccard(edges, max_degree=64, threshold=0.2)


@query(
    "q_dedup_snm_multikey",
    oracle="""
WITH base AS (
  SELECT doc_id AS id,
         LIST_DISTINCT(STRING_SPLIT(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS toks,
         SUBSTR(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), 1, 16) AS sk1,
         SUBSTR(REVERSE(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')), 1, 16) AS sk2
  FROM documents
),
r1 AS (
  SELECT id, toks, SUBSTR(sk1, 1, 2) AS blk,
         ROW_NUMBER() OVER (PARTITION BY SUBSTR(sk1, 1, 2) ORDER BY sk1, id) AS rn
  FROM base
),
r2 AS (
  SELECT id, toks, SUBSTR(sk2, 1, 2) AS blk,
         ROW_NUMBER() OVER (PARTITION BY SUBSTR(sk2, 1, 2) ORDER BY sk2, id) AS rn
  FROM base
),
p1 AS (
  SELECT a.id AS ia, b.id AS ib, a.toks AS ta, b.toks AS tb
  FROM r1 a JOIN r1 b ON a.blk = b.blk AND b.rn - a.rn BETWEEN 1 AND 3
),
p2 AS (
  SELECT a.id AS ia, b.id AS ib, a.toks AS ta, b.toks AS tb
  FROM r2 a JOIN r2 b ON a.blk = b.blk AND b.rn - a.rn BETWEEN 1 AND 3
),
scored AS (
  SELECT LEAST(ia, ib) AS id_a, GREATEST(ia, ib) AS id_b,
         ROUND(CAST(LEN(LIST_INTERSECT(ta, tb)) AS DOUBLE)
               / (LEN(ta) + LEN(tb) - LEN(LIST_INTERSECT(ta, tb))), 6) AS jaccard
  FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
)
SELECT DISTINCT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.3
""",
    tags=("mining", "llm", "dedup"),
)
def q_dedup_snm_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-pass sorted-neighborhood dedup: the documented remedy for
    blocked SNM's cross-block misses — run the window once on the prefix
    key and once on the REVERSED-text prefix (docs differing only at the
    start sort far apart on pass 1 but adjacent on pass 2), then union
    the verified pairs. The multi-key union is to SNM what multi-band
    hashing is to LSH: each extra pass trades one more O(n·w) sweep for
    recall.

    Shape: two single-exchange window passes + a distinct on the pair
    key (jaccard is pair-determined, so the distinct never merges
    conflicting scores)."""
    from pyspark.sql import functions as F

    from etl_open_source_spark.operators.neighborhood import (
        sorted_neighborhood_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    common = dict(key_len=16, block_len=2, window=4, threshold=0.3)
    p1 = sorted_neighborhood_pairs(d, "doc_id", "text", **common)
    p2 = sorted_neighborhood_pairs(
        d, "doc_id", "text",
        key=F.reverse(ascii_fold("text")),
        **common,
    )
    return p1.unionAll(p2).distinct()
