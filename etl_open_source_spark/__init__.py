"""etl_open_source_spark — a PySpark-native analytics/ETL engine.

A from-scratch engine with the query and data-processing capabilities of the
reference (philippeJeremy/ETL-open-source, a desktop ETL orchestrator that
delegates all query execution to the source DBMS — see SURVEY.md), rebuilt
Spark-first: the logical plan is declared with the DataFrame / Spark SQL API
and Catalyst + Tungsten own optimization and physical execution.

Layers
------
- ``session``     — SparkSession factory (AQE, skew-join, sane defaults).
- ``catalog``     — fixture tables, temp-view registration, FK manifest.
- ``registry``    — the query registry backing ``__spark_entry__``.
- ``operators/``  — relational + custom operators (as-of join, dedup, ANN).
- ``sources/``    — readers (parquet/csv/json/jdbc) and writers/sinks.
- ``functions/``  — scalar function packs and vector/text helpers.
- ``plans/``      — pipeline-spec layer: models, runner, cron, scheduler
                    (parity with the reference's Task/Step/Connection model).
- ``streaming/``  — Structured Streaming: windows, watermarks, dedup.
"""

__version__ = "0.1.0"
