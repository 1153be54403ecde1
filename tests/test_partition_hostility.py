"""Partition-hostility differential: every query re-proven under a
deliberately different physical plan.

Why this suite exists: the driver fixtures and the default test session
read each table as a handful of input splits and shuffle into 8
partitions. A 1000-executor cluster reading 100 TB does neither — scans
split into tens of thousands of tasks, shuffles fan out to thousands of
partitions, and AQE rewrites the plan at runtime. Any query whose RESULT
depends on the physical partitioning (partition-merge order, per-partition
tiebreaks, unordered limits, collect order, first/last without a frame)
passes the default-config parity suite deterministically every time, yet
becomes run-to-run flaky the day it executes on a real cluster. This
suite pins the engine contract directly: result values are a pure
function of the input DATA, never of the plan that computed them.

Mechanics: re-run each registered query under a hostile runtime config —
64 KB input splits with zero file-open cost (every fixture table scans as
many partitions as Spark will give it), ``shuffle.partitions=3`` (a
different, odd merge fan-in than the suite-wide 8), and AQE OFF (every
other suite runs AQE on, so the physical operators themselves differ) —
then compare against the same DuckDB oracle with the driver-faithful
comparator. The oracle is plan-independent by construction, so any
partition sensitivity surfaces as a value mismatch. Rows-only queries
(no SQL oracle) instead self-differentiate: hostile run vs default run,
exact canonical-frame equality.

Queries that are plan-sensitive BY DESIGN are listed in PLAN_SENSITIVE
with the reason; they still must hold schema + row-count under the
hostile plan (the weak contract the driver's rows-only check enforces).
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # soak/axis tier: run with `pytest -m slow`


from etl_open_source_spark.registry import get_registry
from tests.oracle_utils import assert_frames_match, canon_frame, run_oracle
from tests.test_adversarial_parity import (  # noqa: F401  (adv_dir is a fixture)
    ADVERSARIAL_QUERIES,
    adv_dir,
)

REGISTRY = get_registry()

# A physical plan as unlike the default-session one as runtime conf allows:
# many tiny input splits, a different shuffle fan-in, no adaptive re-plan,
# and 2-row Arrow batches — mapInPandas receives ARBITRARY batch splits,
# so an operator that aggregates across rows inside one pandas batch is
# batch-size-dependent and this flushes it out (applyInPandas groups are
# exempt: they always arrive whole).
HOSTILE_CONFS = {
    "spark.sql.files.maxPartitionBytes": str(64 * 1024),
    "spark.sql.files.openCostInBytes": "0",
    "spark.sql.shuffle.partitions": "3",
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "2",
}

# Plan-sensitive by design (reason per entry). These hold the weak
# contract only: same columns, same row count under the hostile plan.
PLAN_SENSITIVE: dict[str, str] = {
    # QuantileSummaries compaction is merge-order dependent: the estimate
    # moves (within eps) when the partition fan-in changes. The accuracy
    # invariant is pinned in the adversarial suite instead.
    "q_agg_approx_percentile": "approx_percentile merge-order estimate drift",
    # KMeans|| seeding samples per-partition, so trained centroids (and
    # therefore bucket/code assignments) legitimately shift with input
    # splits. The recall floors are pinned in planted-recall tests.
    "q_sim_ann": "KMeans|| centroid training is partition-seeded",
    "q_sim_pq": "KMeans|| codebook training is partition-seeded",
    "q_sim_ivfpq": "KMeans|| coarse+PQ training is partition-seeded",
}


@pytest.fixture
def hostile_conf(spark):
    old = {k: spark.conf.get(k, None) for k in HOSTILE_CONFS}
    for k, v in HOSTILE_CONFS.items():
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_partition_hostility(hostile_conf, spark, sf_dir, name):
    qd = REGISTRY[name]
    if qd.oracle is not None:
        # Oracle is plan-independent: hostile Spark run vs DuckDB directly.
        hostile = qd.fn(spark, sf_dir).toPandas()
        assert_frames_match(hostile, run_oracle(qd.oracle, sf_dir))
        return
    hostile = qd.fn(spark, sf_dir).toPandas()
    # Run the same query under the default session config for comparison.
    saved = {k: spark.conf.get(k, None) for k in HOSTILE_CONFS}
    for k in HOSTILE_CONFS:
        spark.conf.unset(k)
    try:
        default = qd.fn(spark, sf_dir).toPandas()
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
    if name in PLAN_SENSITIVE:
        # Weak contract: the hostile plan may move estimates/assignments
        # but never the shape of the result.
        h_cols, h_rows = canon_frame(hostile)
        d_cols, d_rows = canon_frame(default)
        assert h_cols == d_cols, f"column drift under hostile plan: {h_cols} vs {d_cols}"
        assert len(h_rows) == len(d_rows), (
            f"row-count drift under hostile plan: {len(h_rows)} vs {len(d_rows)}"
        )
        return
    # Rows-only but still required deterministic: hostile run must equal
    # the default-config run exactly (self-differential).
    assert_frames_match(hostile, default)


@pytest.fixture(scope="module")
def negepoch_dir(tmp_path_factory):
    """The pinned epoch-straddling events table (pre-1970 ties, pre-epoch
    day boundary, the 1970 crossing) written once for the composed axis.
    It cannot live inside the shared adversarial fixture: q_ts_gapfill's
    DuckDB oracle clips its spine to a constant 2024 GENERATE_SERIES, so
    pre-1970 events are exercised through their own query list instead."""
    from tests.test_random_differential import _write_events, negepoch_pinned_df

    d = str(tmp_path_factory.mktemp("negepoch_hostile"))
    _write_events(negepoch_pinned_df(), d)
    return d


def _negepoch_queries():
    from tests.test_random_differential import NEG_EPOCH_QUERIES

    return NEG_EPOCH_QUERIES


@pytest.mark.parametrize("name", _negepoch_queries())
def test_partition_hostility_negepoch(hostile_conf, spark, negepoch_dir, name):
    """Composed axis: hostile PLAN over epoch-straddling DATA. Window
    starts, session gaps and as-of distances on negative epochs must not
    shift when the scan splits into 64 KB tasks, the shuffle fans into 3,
    AQE is off and Arrow batches hold 2 rows."""
    qd = REGISTRY[name]
    hostile = qd.fn(spark, negepoch_dir).toPandas()
    assert_frames_match(hostile, run_oracle(qd.oracle, negepoch_dir))


@pytest.mark.parametrize("name", ADVERSARIAL_QUERIES)
def test_partition_hostility_adversarial(hostile_conf, spark, adv_dir, name):
    """The composed axes: hostile PLAN over hostile DATA. Partition-order
    bugs manifest exactly where sort keys tie and group keys are NULL —
    inputs the benign sf fixtures never contain — so running the
    adversarial fixture under the hostile plan is the direct test of
    every "this ORDER BY carries a key tiebreak" claim: with 3-way
    shuffle fan-in and no AQE, an untied window or top-k boundary row
    lands on a different partition than the default plan and the oracle
    comparison flags it."""
    qd = REGISTRY[name]
    hostile = qd.fn(spark, adv_dir).toPandas()
    assert_frames_match(hostile, run_oracle(qd.oracle, adv_dir))
