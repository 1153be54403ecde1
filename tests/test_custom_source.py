"""Custom Python DataSource tests: batch determinism, partitioning,
streaming parity with batch.
"""

from __future__ import annotations

import os
import tempfile

import pytest

from etl_open_source_spark.sources.synthetic import SyntheticEventsDataSource


@pytest.fixture(scope="module", autouse=True)
def register(spark):
    spark.dataSource.register(SyntheticEventsDataSource)


def test_batch_read_deterministic(spark):
    opts = {"rows": "500", "partitions": "4", "seed": "7"}
    a = spark.read.format("synthetic_events").options(**opts).load()
    b = spark.read.format("synthetic_events").options(**opts).load()
    assert a.count() == 500
    assert a.schema.simpleString() == (
        "struct<event_id:bigint,ts:timestamp,user_id:bigint,event_type:string,value:double>"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_batch_partition_split(spark):
    df = spark.read.format("synthetic_events").options(rows="100", partitions="8").load()
    assert df.rdd.getNumPartitions() == 8
    assert df.select("event_id").distinct().count() == 100


def test_stream_matches_batch(spark):
    """The streaming reader must deliver exactly the batch dataset, split
    into micro-batches, then terminate."""
    opts = {"rows": "300", "stream_batch_size": "80", "seed": "11"}
    batch = spark.read.format("synthetic_events").options(**opts, partitions="2").load()
    ckpt = tempfile.mkdtemp(prefix="synth_ckpt_")
    q = (
        spark.readStream.format("synthetic_events")
        .options(**opts)
        .load()
        .writeStream.format("memory")
        .queryName("synth_stream_out")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(ckpt, "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(map(tuple, spark.sql("SELECT * FROM synth_stream_out").collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want
