"""Scalar function packs (SURVEY.md §2.C "Scalar functions").

All built-in `pyspark.sql.functions` — JVM-side, inside whole-stage codegen;
no Python in the hot path. Integer-valued function outputs are cast to
BIGINT on both sides (DuckDB's scalar functions default to BIGINT where
Spark returns INT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_open_source_spark.catalog import load_table
from etl_open_source_spark.registry import query


@query(
    "q_fn_string",
    oracle="""
SELECT p_partkey,
       UPPER(p_type) AS type_upper,
       LOWER(p_brand) AS brand_lower,
       TRIM(p_name) AS name_trim,
       SUBSTRING(p_name, 1, 8) AS name_prefix,
       p_brand || ':' || p_type AS brand_type,
       CAST(LENGTH(p_name) AS BIGINT) AS name_len,
       CAST(LEN(STRING_SPLIT(p_name, ' ')) AS BIGINT) AS name_words,
       REGEXP_REPLACE(p_name, 'a', '@', 'g') AS name_sub,
       LPAD(p_brand, 12, '*') AS brand_pad
FROM part
""",
    tags=("fn",),
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core string-function pack (upper/lower/length/substr/concat/trim
    family) — all codegen'd JVM builtins, scan-local.

    The oracle concatenates with ``||``, not CONCAT: Spark's concat
    propagates NULL while DuckDB's CONCAT skips NULL arguments — ``||``
    NULL-propagates in both engines (caught by the randomized scalar-fn
    differential)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_type").alias("type_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.trim("p_name").alias("name_trim"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.size(F.split("p_name", " ")).cast("bigint").alias("name_words"),
        F.regexp_replace("p_name", "a", "@").alias("name_sub"),
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
    )


@query(
    "q_fn_date",
    oracle="""
SELECT o_orderkey,
       CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
       CAST(MONTH(o_orderdate) AS BIGINT) AS order_month,
       CAST(DAY(o_orderdate) AS BIGINT) AS order_day,
       DATE_TRUNC('month', o_orderdate) AS order_month_start,
       CAST(DATEDIFF('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT) AS days_since_95,
       o_orderdate + INTERVAL 3 MONTH AS plus_3_months,
       CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS order_date_only,
       CAST(epoch_us(o_orderdate) // 1000000 AS BIGINT) AS epoch_sec
FROM orders
""",
    tags=("fn",),
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core date/time pack (trunc, extract, add/diff) — codegen'd
    builtins over the timestamp column; scan-local. The oracle's
    epoch_sec uses the sanctioned epoch_us // 1000000 form (truncates
    like Spark's unix_timestamp); the earlier CAST(EPOCH(..) AS BIGINT)
    ROUNDS fractional seconds — benign on these midnight-aligned dates
    but outlawed by the calendar axis (tests/test_calendar_hostility)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("bigint").alias("order_year"),
        F.month(d).cast("bigint").alias("order_month"),
        F.dayofmonth(d).cast("bigint").alias("order_day"),
        F.date_trunc("month", d).alias("order_month_start"),
        F.datediff(F.to_date(d), F.lit("1995-01-01").cast("date")).cast("bigint").alias("days_since_95"),
        (d + F.expr("INTERVAL 3 MONTH")).alias("plus_3_months"),
        # DATE output cast back to timestamp: Spark's toPandas yields
        # datetime.date for DateType while DuckDB yields midnight
        # Timestamps — a value-compare hazard, not a semantics difference
        F.to_date(d).cast("timestamp").alias("order_date_only"),
        F.unix_timestamp(d).cast("bigint").alias("epoch_sec"),
    )


@query(
    "q_fn_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice, 1) AS price_round,
       ABS(l_discount - 0.05) AS disc_dev,
       CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
       CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
       POW(l_quantity, 2) AS qty_sq,
       SQRT(l_extendedprice) AS price_sqrt,
       CASE WHEN l_extendedprice > 0 THEN ROUND(LN(l_extendedprice), 6) END AS price_ln,
       CAST(((CAST(l_orderkey AS BIGINT) % 7) + 7) % 7 AS BIGINT) AS key_mod7,
       CAST(SIGN(l_discount - 0.05) AS BIGINT) AS disc_sign
FROM lineitem
""",
    tags=("fn",),
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic/rounding pack (abs/ceil/floor/round/pow/mod) —
    codegen'd builtins; decimal casts where cross-engine exactness
    matters."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_round"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        # rounded: Java Math.log vs libm log differ in the last ulp.
        # Guarded: ln(<=0) is NULL by contract on both sides — Spark's
        # log already returns NULL there but DuckDB's LN(0) is a hard
        # error, so the oracle needs the explicit CASE (adversarial
        # fixture has a zero-price row)
        F.when(
            F.col("l_extendedprice") > 0,
            F.round(F.log(F.col("l_extendedprice")), 6),
        ).alias("price_ln"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("bigint").alias("key_mod7"),
        F.signum(F.col("l_discount") - 0.05).cast("bigint").alias("disc_sign"),
    )


@query(
    "q_fn_cond",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 300000 THEN 'high'
            WHEN o_totalprice >= 100000 THEN 'mid'
            ELSE 'low' END AS price_tier,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
       LEAST(o_totalprice, 250000.0) AS capped_price,
       GREATEST(o_totalprice, 1000.0) AS floored_price
FROM orders
""",
    tags=("fn",),
)
def q_fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional pack (CASE WHEN / coalesce / nullif / least /
    greatest) — branch-free codegen expressions, scan-local."""
    o = load_table(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(tp >= 300000, "high").when(tp >= 100000, "mid").otherwise("low").alias("price_tier"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias("status_label"),
        F.least(tp, F.lit(250000.0)).alias("capped_price"),
        F.greatest(tp, F.lit(1000.0)).alias("floored_price"),
    )


@query(
    "q_fn_cast",
    oracle="""
SELECT l_orderkey,
       CAST(l_quantity AS BIGINT) AS qty_int,
       CAST(l_orderkey AS VARCHAR) AS key_str,
       CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) AS key_back,
       CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec_str,
       CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dbl,
       CAST('1997-06-15 12:30:00' AS TIMESTAMP) AS const_ts,
       CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS ship_date
FROM lineitem
""",
    tags=("fn",),
)
def q_fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast lattice: numeric↔string, double↔decimal, string→timestamp,
    timestamp→date. (double→string is deliberately absent: Java and DuckDB
    render doubles differently; the engine treats that as formatting, not
    casting — use format_number for display.)"""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        F.col("l_quantity").cast("bigint").alias("qty_int"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_orderkey").cast("string").cast("bigint").alias("key_back"),
        # decimal rendered as string (scale-2 text is identical in both
        # engines; raw DECIMAL arrives as Decimal objects from Spark but
        # float64 from DuckDB's pandas bridge — a compare hazard)
        F.col("l_extendedprice").cast("decimal(12,2)").cast("string").alias("price_dec_str"),
        F.col("l_extendedprice").cast("decimal(12,2)").cast("double").alias("price_dbl"),
        F.lit("1997-06-15 12:30:00").cast("timestamp").alias("const_ts"),
        F.col("l_shipdate").cast("date").cast("timestamp").alias("ship_date"),
    )


@query(
    "q_fn_array",
    oracle="""
SELECT vec_id,
       CAST(GENERATE_SUBSCRIPTS(embedding, 1) - 1 AS BIGINT) AS pos,
       CAST(UNNEST(embedding) AS DOUBLE) AS val,
       CAST(LEN(embedding) AS BIGINT) AS dim
FROM embeddings
WHERE vec_id < 20
""",
    tags=("fn", "array"),
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface: posexplode over the embedding vectors (plus size).
    Lateral explode is the row-generation primitive for vector columns.
    The oracle unnests the ACTUAL array (lockstep UNNEST +
    GENERATE_SUBSCRIPTS), not a fixed 1..64 series: a NULL or empty
    vector explodes to zero rows in both engines (posexplode semantics;
    caught by the randomized embeddings differential on degenerate
    vectors)."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    return e.select(
        "vec_id",
        F.posexplode("embedding").alias("pos", "val"),
        F.size("embedding").alias("dim"),
    ).select(
        "vec_id",
        F.col("pos").cast("bigint").alias("pos"),
        F.col("val").cast("double").alias("val"),
        F.col("dim").cast("bigint").alias("dim"),
    )


@query(
    "q_fn_json",
    oracle="""
SELECT event_id,
       TRY_CAST(JSON_EXTRACT_STRING(TRY_CAST(props AS JSON), 'k') AS BIGINT) AS k_val,
       JSON_EXTRACT_STRING(TRY_CAST(props AS JSON), 'k') AS k_str
FROM events
""",
    tags=("fn", "json"),
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props string column. The numeric
    view is TRY_CAST on both sides: a non-numeric "k" must yield NULL,
    not an ANSI CAST_INVALID_INPUT error — extracted JSON is untrusted
    input by definition (caught by the randomized events differential).
    MALFORMED-JSON contract (r11): Spark's get_json_object returns NULL
    for any unparseable document ('', truncated objects, free text)
    while DuckDB's JSON_EXTRACT_STRING hard-errors at bind — the oracle
    routes through TRY_CAST(props AS JSON), which NULLs malformed input
    and changes nothing on valid JSON (probed; the randomized props
    pool now draws malformed documents). Known un-mirrored edge, pinned
    in tests/test_random_differential.py: a JSON number overflowing to
    Infinity ({"k": 1e400}) extracts as the quoted string '"Infinity"'
    in Spark but unquoted 'Infinity' in DuckDB — absurd-overflow
    literals stay out of the draw pools."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        k.try_cast("bigint").alias("k_val"),
        k.alias("k_str"),
    )


@query(
    "q_fn_hash",
    oracle="""
SELECT o_orderkey,
       MD5(CONCAT_WS('|', CAST(o_orderkey AS VARCHAR), o_orderstatus, o_orderpriority)) AS row_md5
FROM orders
""",
    tags=("fn", "hash"),
)
def q_fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable row hash — the driver's own value-hash methodology, as an
    engine primitive (dedup keys, change detection)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.md5(
            F.concat_ws(
                "|",
                F.col("o_orderkey").cast("string"),
                F.col("o_orderstatus"),
                F.col("o_orderpriority"),
            )
        ).alias("row_md5"),
    )
