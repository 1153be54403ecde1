"""DECIMAL precision-boundary axis (VERDICT r9 item 3's last candidate,
seeded round 10).

The fixture and generator draws keep money values inside the TPC-H-ish
domain (prices < 10^6), far from the engine's canonical money type
``DECIMAL(12,2)`` (functions/numeric.py). That leaves the TYPE boundary
unproven: does the money → rate → sum arithmetic stay exact — and
cross-engine identical — at the largest values the type admits?

The axis's first run caught a real latent class: **the 2^53
decimal→double cast boundary**. Every oracle ends in
``CAST(exact decimal AS DOUBLE)`` and every engine query in
``.cast("double")`` — bit-identical across engines ONLY while the
decimal's scaled integer |value·10^scale| stays under 2^53. Above it
DuckDB 1.0.0's int128→double conversion double-rounds (1 ulp off the
correctly-rounded value Spark and Python produce). Measured margins:
the sf0.01 driver gate's largest scaled sum (q1 sum_charge, scale 6)
is 17× below 2^53; at sf0.1 only 1.7× — a sf1 correctness run WOULD
cross it. No engine fix required (the decimal arithmetic is exact on
both sides; only the final rendering's last ulp diverges); the
boundary tests compare at cent precision and the mechanism is pinned
in ``test_decimal_to_double_cast_rounding_divergence``.

Structural analysis (recorded in SURVEY §5.11's round-11 nomination,
proven here):

1. **SUM is safe by headroom.** Spark sums DECIMAL(18,4) into
   DECIMAL(28,4) (precision+10) and DuckDB into (38,4); in-domain data
   cannot overflow either even at 100 TB row counts, and boundary-value
   rows stay exact (`test_sum_headroom_at_decimal_boundary`).
2. **The engine's money products are safe through the FULL type
   range.** money(12,2) × rate(4,2) chains widen per SQL rules —
   (16,4) then (20,6) — and the int64 magnitudes DuckDB computes with
   (≤ 10^12 · 199 · 199 < 2^63) cannot overflow, so every registered
   money query is exact at the DECIMAL(12,2) maximum, not just in
   domain (`test_money_queries_exact_at_type_boundary`).
3. **The probe-worthy class is DECIMAL(18,4) products.** DuckDB 1.0.0
   multiplies in the RESULT width's storage before range-checking:
   (18,4)×(5,4) at near-max values overflows the int64 intermediate
   and hard-errors, while Spark widens to (25,8)/(32,12) and stays
   exact. No registered oracle multiplies (18,4) casts today (they
   only SUM them; products go through the narrow money type) — the
   pinned recipe for any future one is an explicit pre-widening cast,
   which reproduces Spark bit-for-bit
   (`test_duckdb_narrow_decimal_multiply_contract`).
4. **Above-range money casts hard-error on BOTH engines.** The engine
   runs under ANSI mode (Spark 4.x default, not overridden by the
   session factory), so a price ≥ 10^10 raises
   NUMERIC_VALUE_OUT_OF_RANGE rather than silently becoming NULL;
   DuckDB's cast errors too. The sanctioned pre-filter for corrupt
   prices is q_quality_checks' in_range rule
   (`test_money_cast_above_range_contract`).
5. **Past precision 38 Spark trades scale for magnitude**
   (allowPrecisionLoss default): a (42,20)-shaped product clamps to
   (38,16) by rounding the scale away, never NULLing the value —
   pinned so a config/version change that flips this to NULL/error is
   caught (`test_spark_precision38_clamp_semantics`).
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pytest

from etl_open_source_spark.registry import get_registry
from tests.oracle_utils import assert_frames_match, run_oracle
from tests.test_partition_hostility import hostile_conf  # noqa: F401

REGISTRY = get_registry()

# The exact DECIMAL(12,2) maximum — the engine's canonical money type.
MONEY_MAX = 9999999999.99


def _lineitem_boundary() -> pd.DataFrame:
    d96 = dt.datetime(1996, 6, 15)
    rows = [
        # four boundary-price lines through q1's group (R, F) and q6's
        # filter window (1996 shipdate, 0.05-0.07 discount, qty < 24)
        (0, 1, 1, 1, 10.0, MONEY_MAX, 0.06, 0.08, "R", "F", d96),
        (0, 1, 1, 2, 10.0, MONEY_MAX, 0.06, 0.08, "R", "F", d96),
        (0, 2, 1, 3, 23.0, MONEY_MAX, 0.05, 0.99, "R", "F", d96),
        (1, 2, 2, 1, 1.0, 9999999999.98, 0.07, 0.00, "N", "O", d96),
        # negative boundary: exact large-magnitude cancellation inside
        # the decimal SUM (a double accumulator would lose the 100.0)
        (2, 3, 2, 1, 5.0, -MONEY_MAX, 0.07, 0.02, "A", "F", dt.datetime(1996, 3, 1)),
        (2, 3, 2, 2, 5.0, 100.0, 0.00, 0.00, "A", "F", dt.datetime(1996, 3, 1)),
        # NULL price rides the money chain (SUM skips on both engines)
        (3, 4, 3, 1, 2.0, None, 0.05, 0.01, "N", "O", d96),
    ]
    df = pd.DataFrame(
        rows,
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate",
        ],
    )
    for c in ("l_orderkey", "l_partkey", "l_suppkey"):
        df[c] = df[c].astype("int64")
    df["l_linenumber"] = df["l_linenumber"].astype("int32")
    df["l_shipdate"] = pd.to_datetime(df["l_shipdate"]).astype("datetime64[us]")
    return df


@pytest.fixture(scope="module")
def decmax_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("decimal_boundary_sf")
    _lineitem_boundary().to_parquet(d / "lineitem.parquet", engine="pyarrow", index=False)
    return str(d)


# lineitem-only consumers of the money/dsum arithmetic.
MONEY_QUERIES = ["q_agg_groupby", "q_agg_global", "q_tpch_q6", "q_unpivot", "q_histogram"]


@pytest.mark.parametrize("name", MONEY_QUERIES)
def test_money_queries_exact_at_type_boundary(spark, decmax_dir, name):
    """Registered money queries vs their registered oracles on rows AT the
    DECIMAL(12,2) maximum (±), incl. exact large-magnitude cancellation
    and a NULL through the money chain — proving the full type range,
    not just the fixture domain.

    Compared at 2 decimals (cent precision), NOT bit-exact: this axis's
    first run caught the 2^53 cast class — the DECIMAL pipeline is exact
    on both engines, but the final CAST(decimal AS DOUBLE) is only
    cross-engine bit-identical while |value|·10^scale < 2^53 (DuckDB
    1.0.0 double-rounds the int128→double conversion above it; Spark
    correctly rounds — see test_decimal_to_double_cast_rounding below).
    Boundary-priced sums at scale 6 cross 2^53 by construction, so the
    last ulp (~2e-6 at 1e10 magnitude) may differ; cents cannot."""
    qd = REGISTRY[name]
    got = qd.fn(spark, decmax_dir).toPandas()
    assert_frames_match(got, run_oracle(qd.oracle, decmax_dir), float_decimals=2)


def test_decimal_to_double_cast_rounding_divergence():
    """The mechanism pin for the 2^53 cast class (this axis's first-run
    catch). The exact decimal -9485999899.990514 (a boundary-fixture
    sum_charge group: scaled integer 9485999899990514 > 2^53) sits
    7.6e-7 below one representable double and 1.2e-6 above the next;
    correct rounding picks the closer (…515 — Python strtod and Spark's
    BigDecimal cast agree), while DuckDB 1.0.0's int128 decimal→double
    double-rounds and returns …513, one ulp off. Below 2^53 the int
    converts exactly and the single divide is correctly rounded, so
    both engines agree bit-for-bit — measured margins: the sf0.01
    driver gate's largest scaled sum is 17× below 2^53; sf0.1 is only
    1.7× below. If a DuckDB upgrade starts rounding correctly, this
    pin flags the contract for re-tightening."""
    from decimal import Decimal

    exact = Decimal("-9485999899.990514")
    correctly_rounded = float(exact)
    assert repr(correctly_rounded) == "-9485999899.990515"
    got = duckdb.sql(
        "SELECT CAST(CAST('-9485999899.990514' AS DECIMAL(20,6)) AS DOUBLE)"
    ).fetchone()[0]
    assert repr(got) == "-9485999899.990513"  # 1 ulp below correct

    # below 2^53 both paths are exact-then-one-rounding: bit-identical
    small = duckdb.sql(
        "SELECT CAST(CAST('-985999899.990514' AS DECIMAL(20,6)) AS DOUBLE)"
    ).fetchone()[0]
    assert small == float(Decimal("-985999899.990514"))


@pytest.mark.parametrize("name", MONEY_QUERIES)
def test_money_boundary_under_hostile_plan(hostile_conf, decmax_dir, name):
    """Composed axis: boundary DATA × hostile PLAN (64 KB scan splits,
    3-way shuffle fan-in, AQE off, 2-row Arrow batches). Decimal sums
    are associative-exact, so ANY partition order must produce the same
    result — this is the pin that the boundary values' exactness does
    not depend on accumulation order, which is precisely what changes
    between local[32] and a 1000-executor cluster."""
    qd = REGISTRY[name]
    got = qd.fn(hostile_conf, decmax_dir).toPandas()
    assert_frames_match(got, run_oracle(qd.oracle, decmax_dir), float_decimals=2)


def test_sum_headroom_at_decimal_boundary(spark, decmax_dir):
    """SUM(DECIMAL(18,4)) of boundary values stays exact in both engines:
    Spark's (28,4) accumulator and DuckDB's (38,4) have ≥10 digits of
    headroom over the element type — unreachable even at 100 TB row
    counts with in-domain values."""
    from pyspark.sql import functions as F

    n = 1000
    df = spark.range(n).select(F.lit(MONEY_MAX).cast("decimal(18,4)").alias("v"))
    got = df.agg(F.sum("v").alias("s")).collect()[0]["s"]
    want = duckdb.sql(
        f"SELECT SUM(CAST({MONEY_MAX!r} AS DECIMAL(18,4))) FROM range({n})"
    ).fetchone()[0]
    assert got == want  # both Decimal('9999999999990.0000'-scaled) exact


def test_duckdb_narrow_decimal_multiply_contract(spark):
    """The (18,4)×(5,4) product class: Spark widens to (25,8) and is
    exact at near-max values; DuckDB 1.0.0 computes the product in the
    unwidened storage first and hard-errors (Out of Range). The pinned
    oracle recipe — pre-widen the cast — reproduces Spark bit-for-bit.
    If a DuckDB upgrade changes the narrow behavior, this pin flags it
    for contract review."""
    from pyspark.sql import functions as F

    p, d = "99999999999999.9999", "0.0500"
    row = (
        spark.range(1)
        .select(
            (
                F.lit(p).cast("decimal(18,4)")
                * (F.lit(1).cast("decimal(5,4)") - F.lit(d).cast("decimal(5,4)"))
            ).alias("m1")
        )
        .collect()[0]
    )
    assert str(row["m1"]) == "94999999999999.99990500"  # exact (25,8)

    with pytest.raises(duckdb.OutOfRangeException):
        duckdb.sql(
            f"SELECT CAST('{p}' AS DECIMAL(18,4))"
            f" * (CAST(1 AS DECIMAL(5,4)) - CAST('{d}' AS DECIMAL(5,4)))"
        ).fetchall()

    widened = duckdb.sql(
        f"SELECT CAST(CAST('{p}' AS DECIMAL(18,4)) AS DECIMAL(25,4))"
        f" * (CAST(1 AS DECIMAL(5,4)) - CAST('{d}' AS DECIMAL(5,4)))"
    ).fetchone()[0]
    assert str(widened) == "94999999999999.99990500"


def test_money_cast_above_range_contract(spark):
    """Above DECIMAL(12,2)'s range BOTH engines hard-error — Spark runs
    under ANSI mode (the 4.x default; the session factory does not
    override it), raising NUMERIC_VALUE_OUT_OF_RANGE, and DuckDB's cast
    raises a conversion error. No silent NULL, no silent row drop: a
    corrupt price ≥ 10^10 kills the job loudly on either engine, and
    the sanctioned pre-filter is q_quality_checks' in_range rule. Pinned
    so an ANSI-mode config change (which would flip Spark to silent
    NULL + SUM skipping the row) is caught."""
    from etl_open_source_spark.functions.numeric import money
    from pyspark.sql import utils as _  # noqa: F401

    over = 10000000000.00  # 10^10: one cent past the type maximum
    df = spark.createDataFrame([(over,), (100.0,)], "l_extendedprice double")
    with pytest.raises(Exception, match="NUMERIC_VALUE_OUT_OF_RANGE"):
        df.select(money("l_extendedprice").alias("m")).collect()

    with pytest.raises(duckdb.ConversionException):
        duckdb.sql(f"SELECT CAST({over!r} AS DECIMAL(12,2))").fetchall()


def test_spark_precision38_clamp_semantics(spark):
    """A product whose SQL-rule shape exceeds precision 38 — (18,4) times
    four (5,4) factors is (42,20) — clamps to (38,16) under the default
    allowPrecisionLoss: the scale is rounded away, the value survives.
    Pinned on a hand-computable input (2.0000 × 1.1^4 = 2.9282) so a
    session-config or Spark-version change that turns this into NULL or
    an error is caught by value, not only by dtype."""
    from pyspark.sql import functions as F

    f = F.lit("1.1000").cast("decimal(5,4)")
    expr = F.lit("2.0000").cast("decimal(18,4)") * f * f * f * f
    df = spark.range(1).select(expr.alias("x"))
    assert df.schema["x"].dataType.simpleString() == "decimal(38,16)"
    assert str(df.collect()[0]["x"]) == "2.9282000000000000"


def test_scaled_sum_margin_at_fixture_scale(sf_dir):
    """The scale TRIPWIRE (VERDICT r10 item 4): nothing previously
    asserted the 2^53 margin at the scale actually being run, so the
    first sf1 correctness sweep would have failed on DuckDB's
    double-rounded int128→double cast with no pointer to the known
    cause. This computes the largest |Σ·10^scale| the money-oracle
    family produces on THE fixture under test (the widest-scale shape is
    TPC-H q1's sum_charge: money×rate×rate at scale 6; the grand total
    over the whole lineitem table upper-bounds every per-group sum of
    every registered money oracle) and fails with the pinned explanation
    when the margin drops under 4×.

    Measured margins (2^53 / scaled max): sf0.001 ≈ 170x, sf0.01 ≈ 17x
    (the driver gate), sf0.1 ≈ 1.7x — so pytest's default sf0.001 run
    passes, and pointing SPARK_GRAFT_TEST_SF_DIR at sf0.1 or beyond
    trips the wire BEFORE a differential sweep burns minutes producing
    an unexplained 1-ulp hash mismatch. The remedies, when it trips:
    render money results at cent precision (scale 2 buys 10^4 headroom)
    or compare those oracles at rounded precision — the arithmetic
    itself is exact on both engines (see
    test_decimal_to_double_cast_rounding_divergence); only the final
    double RENDER diverges past 2^53."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    # the widest-scale money render the registry actually emits: the
    # q1-shape's per-(returnflag, linestatus) sum_charge at scale 6 (its
    # grouping is the coarsest any scale-6 oracle uses, so its largest
    # group upper-bounds every scale-6 sum a registered oracle renders;
    # scale-4 shapes carry 100x more headroom and global sums are
    # narrow-scale — see q_agg_global/q_tpch_q6)
    scaled_max = con.sql(
        """
        SELECT MAX(s) FROM (
          SELECT ABS(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                         * (1 - CAST(l_discount AS DECIMAL(4,2)))
                         * (1 + CAST(l_tax AS DECIMAL(4,2))))) * 1e6 AS s
          FROM lineitem
          GROUP BY l_returnflag, l_linestatus
        )
        """
    ).fetchone()[0]
    margin = 2.0**53 / float(scaled_max)
    assert margin >= 4.0, (
        f"2^53 decimal->double render margin is {margin:.2f}x at {sf_dir} "
        f"(largest scaled money sum {float(scaled_max):.3e} vs 2^53 = "
        f"{2.0 ** 53:.3e}). Past 2^53, DuckDB 1.0.0's int128->double cast "
        "double-rounds 1 ulp off Spark/Python's correctly-rounded value, so "
        "exact-hash money comparisons at THIS scale will mismatch on the "
        "final double render even though both engines' decimal arithmetic "
        "is exact (mechanism: test_decimal_to_double_cast_rounding_"
        "divergence). Fix forward: render/compare money results at cent "
        "precision (scale 2 = 10^4 more headroom), or exclude the widest-"
        "scale oracles from exact-hash comparison at this sf."
    )
