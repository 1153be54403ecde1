"""Spec-driven DBMS→transform→DBMS pipeline against a LIVE JDBC source —
the reference's core end-to-end workflow (extract SQL from one DBMS, load
into another: core/engine.py:28-96 + core/extractors/sqlserver.py:46-55 +
core/loaders/sqlserver.py:244-288), run by our PipelineRunner against
embedded Derby with no mocks anywhere.
"""

from __future__ import annotations

import pytest

from etl_open_source_spark.plans.models import (
    ConnectionConfig,
    PipelineSpec,
    Step,
    StepType,
)
from etl_open_source_spark.plans.runner import PipelineRunner

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    return f"jdbc:derby:{tmp_path_factory.mktemp('derby_plans') / 'db'};create=true"


def _seed(spark, sf_dir, url):
    from etl_open_source_spark.catalog import load_table
    from etl_open_source_spark.sources.writers import write_jdbc

    src = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .limit(1000)
    )
    write_jdbc(
        src,
        url=url,
        table="orders_src",
        mode="replace",
        column_types={"o_orderstatus": "VARCHAR(2)"},
        driver=DRIVER,
    )
    return src


def test_jdbc_to_jdbc_pipeline(spark, sf_dir, derby_url):
    """JDBC query-pushdown extract → Spark SQL transform → JDBC load, all
    through the spec/runner layer; target verified by reading it back."""
    src = _seed(spark, sf_dir, derby_url)
    spec = PipelineSpec(
        id="t1",
        name="derby-roundtrip",
        connections=[
            ConnectionConfig(
                id="derby",
                name="derby",
                type="jdbc",
                params={"url": derby_url, "driver": DRIVER},
            )
        ],
        steps=[
            Step(
                id="s1",
                name="extract",
                step_type=StepType.EXTRACT,
                order=1,
                connection_id="derby",
                # pushdown: the GROUP BY runs inside Derby (quoted idents:
                # Spark's writer creates case-exact columns)
                config={
                    "query": 'SELECT "o_orderstatus" AS status, '
                    'COUNT(*) AS cnt, SUM("o_totalprice") AS total '
                    'FROM orders_src GROUP BY "o_orderstatus"'
                },
            ),
            Step(
                id="s2",
                name="transform",
                step_type=StepType.TRANSFORM,
                order=2,
                config={
                    "type": "sql",
                    "sql": "SELECT status, cnt, ROUND(total / cnt, 2) AS avg_price "
                    "FROM input",
                },
            ),
            Step(
                id="s3",
                name="load",
                step_type=StepType.LOAD,
                order=3,
                connection_id="derby",
                config={
                    "table": "order_rollup",
                    "mode": "replace",
                    "column_types": {"status": "VARCHAR(2)"},
                },
            ),
        ],
    )
    out = PipelineRunner(spark).run(spec)
    assert out is not None and out.count() == src.select("o_orderstatus").distinct().count()

    from etl_open_source_spark.sources.readers import read_jdbc

    back = read_jdbc(spark, url=derby_url, table="order_rollup", driver=DRIVER)
    got = {r[0]: (r[1], float(r[2])) for r in back.collect()}
    expected = {
        r["o_orderstatus"]: r["cnt"]
        for r in src.groupBy("o_orderstatus").count().withColumnRenamed("count", "cnt").collect()
    }
    assert set(got) == set(expected)
    for status, cnt in expected.items():
        assert got[status][0] == cnt


def test_jdbc_partitioned_extract_step(spark, sf_dir, derby_url):
    """The spec's extract step can request a partitioned parallel read —
    the cluster-scale extract topology, spec-declared."""
    _seed(spark, sf_dir, derby_url)
    spec = PipelineSpec(
        id="t2",
        name="parallel-extract",
        connections=[
            ConnectionConfig(
                id="derby", name="derby", type="jdbc",
                params={"url": derby_url, "driver": DRIVER},
            )
        ],
        steps=[
            Step(
                id="s1", name="extract", step_type=StepType.EXTRACT, order=1,
                connection_id="derby",
                config={
                    "table": "orders_src",
                    "partition_column": "o_orderkey",
                    "lower_bound": 0,
                    "upper_bound": 60_000,
                    "num_partitions": 4,
                },
            ),
        ],
    )
    out = PipelineRunner(spark).run(spec)
    assert out.rdd.getNumPartitions() == 4
    assert out.count() == 1000


def test_jdbc_spec_json_roundtrip(tmp_path, derby_url):
    """JDBC connections and steps survive the JSON spec round-trip (the
    reference persists specs; storage parity)."""
    spec = PipelineSpec(
        id="t3",
        name="json-rt",
        connections=[
            ConnectionConfig(id="db", name="db", type="jdbc",
                             params={"url": derby_url, "driver": DRIVER})
        ],
        steps=[
            Step(id="s1", name="e", step_type=StepType.EXTRACT, order=1,
                 connection_id="db", config={"table": "t"}),
            Step(id="s2", name="l", step_type=StepType.LOAD, order=2,
                 connection_id="db", config={"table": "t2", "mode": "append"}),
        ],
    )
    p = tmp_path / "spec.json"
    p.write_text(spec.to_json())
    back = PipelineSpec.from_json(p.read_text())
    assert back.connection("db").params["url"] == derby_url
    assert back.ordered_steps()[1].config["table"] == "t2"


def test_jdbc_spec_validation(derby_url):
    """JDBC load steps validate on 'table' (no 'path'); a jdbc load
    missing its table is flagged; the shipped example spec is clean."""
    from etl_open_source_spark.plans.validation import validate_spec

    spec = PipelineSpec.load("examples/jdbc_rollup.json")
    assert validate_spec(spec) == []
    spec.ordered_steps()[2].config.pop("table")
    issues = validate_spec(spec)
    assert any("missing 'table'" in i for i in issues)


def test_example_spec_runs_via_cli(spark, sf_dir, tmp_path):
    """The shipped examples/jdbc_rollup.json is actually runnable: seed
    the source table, patch the DB path into a tmp copy, run it through
    the real CLI subprocess, and verify the target table landed."""
    import json
    import os
    import subprocess
    import sys

    url = f"jdbc:derby:{tmp_path}/demo_db;create=true"
    _seed(spark, sf_dir, url)

    def _derby_shutdown():
        # embedded Derby is single-JVM: release the DB so the CLI
        # subprocess can boot it (shutdown always raises SQLException)
        try:
            spark._jvm.java.sql.DriverManager.getConnection(
                f"jdbc:derby:{tmp_path}/demo_db;shutdown=true"
            )
        except Exception:
            pass

    _derby_shutdown()
    spec = json.loads(open("examples/jdbc_rollup.json").read())
    spec["connections"][0]["params"]["url"] = url
    spec_path = tmp_path / "spec.json"
    spec_path.write_text(json.dumps(spec))
    env = dict(
        os.environ,
        PYTHONPATH=os.path.dirname(os.path.dirname(__file__)),
        SPARK_GRAFT_CPUS="4",
    )
    proc = subprocess.run(
        [sys.executable, "-m", "etl_open_source_spark", "run", str(spec_path)],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    assert proc.returncode == 0, proc.stdout[-500:] + proc.stderr[-1500:]

    from etl_open_source_spark.sources.readers import read_jdbc

    back = read_jdbc(spark, url=url, table="order_rollup", driver=DRIVER)
    assert back.count() >= 1
