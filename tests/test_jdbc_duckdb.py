"""Second live JDBC dialect: DuckDB over its JDBC driver.

Complements tests/test_jdbc_live.py (embedded Derby, Spark's bundled
driver) with an *analytical* DBMS: python-duckdb writes a database file,
Spark reads it through the real JDBC relation with predicate pushdown.
This is the "Spark-JDBC-over-DuckDB shim" end-to-end proof — the exact
extract topology the reference runs against SQL Server
(core/extractors/sqlserver.py:46-55), against a columnar engine instead.

The driver jar must be on ``spark.jars`` before the JVM starts, so this
runs in a subprocess with its own SparkSession rather than the shared
session fixture. Skipped when no DuckDB JDBC jar is present on disk.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import textwrap

import pytest

_JAR_CANDIDATES = glob.glob(
    os.path.expanduser("~/.cache/coursier/**/duckdb_jdbc*.jar"), recursive=True
) + glob.glob("/opt/**/duckdb_jdbc*.jar", recursive=True)

pytestmark = pytest.mark.skipif(
    not _JAR_CANDIDATES, reason="no DuckDB JDBC driver jar available offline"
)


def test_duckdb_jdbc_read_pushdown(tmp_path, sf_dir):
    script = textwrap.dedent(
        f"""
        import duckdb, sys
        db = {str(tmp_path / "live.db")!r}
        con = duckdb.connect(db)
        con.execute("CREATE TABLE nation AS SELECT * FROM '{{}}/nation.parquet'".format({sf_dir!r}))
        con.close()

        from etl_open_source_spark.session import get_spark
        from etl_open_source_spark.sources.readers import read_jdbc
        spark = get_spark(app_name="duckdb-jdbc-test",
                          extra_conf={{"spark.jars": {_JAR_CANDIDATES[0]!r}}})
        df = read_jdbc(spark, url="jdbc:duckdb:" + db, table="nation",
                       driver="org.duckdb.DuckDBDriver")
        assert df.count() == 25, df.count()
        q = df.filter("n_regionkey = 2").select("n_name")
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "EqualTo" in plan, plan
        assert q.count() == 5, q.count()
        spark.stop()
        print("DUCKDB_JDBC_OK")
        """
    )
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    assert "DUCKDB_JDBC_OK" in proc.stdout, proc.stdout + "\n" + proc.stderr[-2000:]
