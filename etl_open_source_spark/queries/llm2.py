"""Second LLM-data-pipeline batch: document chunking, concat-and-chunk
sequence packing, PII redaction, corpus n-gram statistics.

These are the pre-training data-prep steps that sit between dedup/quality
(queries/llm.py) and the trainer: chunk long documents for embedding or
context windows, pack short documents into fixed token budgets, strip PII,
and build corpus-level n-gram tables. All pure built-in column expressions
— no Python crossing anywhere; every query has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_open_source_spark.catalog import load_table
from etl_open_source_spark.registry import query

# Chunking parameters: 32-word windows advancing 24 words (8-word overlap),
# the shape an embedding pipeline uses so no sentence is lost at a boundary.
_CHUNK = 32
_STRIDE = 24

# Packing budget: words per training sequence.
_BUDGET = 256


@query(
    "q_doc_chunk",
    oracle=f"""
SELECT doc_id,
       CAST((s - 1) // {_STRIDE} AS INT) AS chunk_id,
       ARRAY_TO_STRING(w[s:s + {_CHUNK - 1}], ' ') AS chunk_text,
       CAST(LEN(w[s:s + {_CHUNK - 1}]) AS INT) AS n_words
FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents)
CROSS JOIN UNNEST(GENERATE_SERIES(1, LEN(w), {_STRIDE})) AS t(s)
""",
    tags=("llm", "chunk"),
)
def q_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: each doc's word list is cut into
     32-word chunks every 24 words (8-word overlap). One narrow projection +
    explode — fully scan-local, no shuffle at all; output rows stream out of
    the generator so a 100 TB corpus chunks at scan speed.

    The reference has no text operators (its transformers are 0-byte stubs,
    core/transformers/*.py); this is the [EXT] LLM-pipeline surface."""
    d = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    return (
        d.select("doc_id", w.alias("w"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.size("w") - 1, F.lit(_STRIDE))
            ).alias("start"),
            "w",
        )
        .select(
            "doc_id",
            F.floor(F.col("start") / _STRIDE).cast("int").alias("chunk_id"),
            F.array_join(
                F.slice("w", F.col("start") + 1, _CHUNK), " "
            ).alias("chunk_text"),
            F.least(F.size("w") - F.col("start"), F.lit(_CHUNK))
            .cast("int")
            .alias("n_words"),
        )
    )


@query(
    "q_pack_concat",
    oracle=f"""
SELECT doc_id, source, n_words,
       CAST((cum - n_words) // {_BUDGET} AS BIGINT) AS bin_id,
       CAST((cum - n_words) % {_BUDGET} AS BIGINT) AS bin_offset
FROM (
  SELECT doc_id, source, n_words,
         SUM(n_words) OVER (PARTITION BY source ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM (SELECT doc_id, source, LEN(STRING_SPLIT(text, ' ')) AS n_words
        FROM documents)
)
""",
    tags=("llm", "pack"),
)
def q_pack_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: within each source shard,
    documents are concatenated in doc_id order and split into fixed
    256-word training sequences; each doc is assigned the bin where it
    starts plus its offset inside that bin. This is the standard LLM
    pre-training packing layout (docs → contiguous token stream → fixed
    context windows).

    Scale: the running sum partitions by ``source`` (the shard key), so no
    global sort exists — each shard's prefix sum is one partitioned window.
    At 100 TB the shard count is large and bins never cross shards, exactly
    how packing shards are produced in practice."""
    d = load_table(spark, sf_dir, "documents")
    n_words = F.size(F.split(F.col("text"), " "))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.select("doc_id", "source", n_words.alias("n_words"))
        .withColumn("cum", F.sum("n_words").over(w))
        .select(
            "doc_id",
            "source",
            "n_words",
            F.floor((F.col("cum") - F.col("n_words")) / _BUDGET)
            .cast("bigint")
            .alias("bin_id"),
            ((F.col("cum") - F.col("n_words")) % _BUDGET)
            .cast("bigint")
            .alias("bin_offset"),
        )
    )


# PII patterns restricted to syntax both regex engines (Java util.regex,
# DuckDB RE2) treat identically: character classes, bounded repetition, \d.
_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PHONE = r"\+\d[\d-]{7,}\d"


@query(
    "q_pii_redact",
    oracle=f"""
SELECT doc_id,
       REGEXP_REPLACE(
         REGEXP_REPLACE(
           REGEXP_REPLACE(
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail.example.com from 10.0.'
                  || CAST(doc_id % 256 AS VARCHAR)
                  || '.7 call +1-555-000-1234',
             '{_EMAIL}', '[EMAIL]', 'g'),
           '{_IPV4}', '[IP]', 'g'),
         '{_PHONE}', '[PHONE]', 'g') AS redacted_text
FROM documents
""",
    tags=("llm", "pii"),
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: emails, IPv4 addresses, and phone numbers replaced by
    typed placeholder tokens. The fixture corpus carries no PII, so each row
    plants a deterministic email/IP/phone triple first (both engines build
    the identical input), then redacts — the registered query demonstrates
    the actual scrubbing, not a no-op pass over clean text.

    Pure regexp_replace chain: scan-local, JVM-side, zero shuffles; at
    100 TB this runs at scan speed as a map stage."""
    d = load_table(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 call +1-555-000-1234"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(planted, _EMAIL, "[EMAIL]"), _IPV4, "[IP]"
        ),
        _PHONE,
        "[PHONE]",
    )
    return d.select("doc_id", redacted.alias("redacted_text"))


@query(
    "q_text_bigrams",
    oracle="""
SELECT w[s] || ' ' || w[s + 1] AS bigram, COUNT(*) AS cnt
FROM (SELECT STRING_SPLIT(text, ' ') AS w FROM documents)
CROSS JOIN UNNEST(GENERATE_SERIES(1, LEN(w) - 1)) AS t(s)
GROUP BY 1
ORDER BY cnt DESC, bigram
LIMIT 50
""",
    tags=("llm", "text"),
)
def q_text_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram table, top 50 by frequency (ties broken by bigram text
    so the cut is deterministic). Adjacent-word pairs come from zipping the
    word array with itself shifted by one — array ops only, no
    self-join, no window; then one groupBy with map-side partial
    aggregation and a TakeOrdered(50) instead of a global sort."""
    d = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    pairs = F.zip_with(
        F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))),
        F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        d.select(F.explode(pairs).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "bigram")
        .limit(50)
    )
