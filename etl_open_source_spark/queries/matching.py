"""Fuzzy matching / entity resolution: the block-then-verify pattern.

The reference's declared-but-stubbed "Filtre, map, merge" transformer
vocabulary (structure.txt:24) never reaches approximate matching; this is
[EXT] surface a real data-integration pipeline needs — finding records
that refer to the same entity despite typos or variant spellings.

Scale shape (same as the dedup family, operators/dedup.py): a cheap
blocking key bounds the quadratic — candidates only form inside a block,
and the exact edit-distance verify runs on candidates only. Block choice
is data-dependent: production keys are high-cardinality (zip+phonetic,
rare character q-grams, sorted-neighborhood windows); the synthetic part
names have an 8-noun vocabulary, so the block here is (noun, length) and
pairs whose names differ in the noun or in length are missed by design —
exactly the recall trade every blocking scheme makes, mirrored in the
oracle so parity is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_open_source_spark.catalog import load_table
from etl_open_source_spark.registry import query

# Maximum edit distance for a match: catches modifier substitutions of the
# same length ("red bolt" ~ "hot bolt") without collapsing distinct nouns.
_MAX_EDIT = 3


@query(
    "q_fuzzy_match",
    oracle=f"""
WITH blocked AS (
  SELECT p_partkey, p_name,
         STRING_SPLIT(p_name, ' ')[2] AS blk_word,
         LENGTH(p_name) AS blk_len
  FROM part
)
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
       a.p_name AS name_a, b.p_name AS name_b,
       CAST(LEVENSHTEIN(a.p_name, b.p_name) AS INT) AS edit_dist
FROM blocked a JOIN blocked b
  ON a.blk_word = b.blk_word AND a.blk_len = b.blk_len
 AND a.p_partkey < b.p_partkey
WHERE a.p_name <> b.p_name
  AND LEVENSHTEIN(a.p_name, b.p_name) <= {_MAX_EDIT}
""",
    tags=("matching", "fuzzy"),
)
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-match over part names: block on (second word,
    length), verify candidates with exact Levenshtein <= 3, drop identical
    names (those are q_dedup_exact's job).

    One shuffle on the block key; the in-block self-join is the only
    quadratic term and the block key bounds it. The Spark side uses the
    thresholded ``levenshtein(l, r, threshold)`` form — the banded O(k*n)
    algorithm that bails out past the threshold instead of filling the
    full O(n^2) DP matrix; the returned distance is identical to the
    unbounded one whenever it is <= threshold, which the filter
    guarantees, so the oracle (unbounded LEVENSHTEIN) matches exactly."""
    p = load_table(spark, sf_dir, "part")
    blk = p.select(
        "p_partkey",
        "p_name",
        # F.get, not getItem: a one-word name has no second token, and
        # ANSI getItem raises INVALID_ARRAY_INDEX where DuckDB's list
        # index yields NULL (caught by the randomized differential)
        F.get(F.split("p_name", " "), 1).alias("blk_word"),
        F.length("p_name").alias("blk_len"),
    )
    a = blk.select(
        F.col("p_partkey").alias("id_a"),
        F.col("p_name").alias("name_a"),
        "blk_word",
        "blk_len",
    )
    b = blk.select(
        F.col("p_partkey").alias("id_b"),
        F.col("p_name").alias("name_b"),
        "blk_word",
        "blk_len",
    )
    dist = F.levenshtein("name_a", "name_b", _MAX_EDIT)
    return (
        a.join(b, ["blk_word", "blk_len"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.col("name_a") != F.col("name_b"))
        .withColumn("edit_dist", dist)
        .filter(F.col("edit_dist") >= 0)
        .select("id_a", "id_b", "name_a", "name_b", "edit_dist")
    )
