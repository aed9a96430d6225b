"""Streaming incremental read of the timeline table
(streaming/incremental.py): a consumer tailing ``deltas/`` sees each
commit's changed records exactly once, resumes via source checkpointing,
and never touches snapshot files."""

from __future__ import annotations

from pyspark.sql import Row

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import TimelineTable
from aws_glue_streaming_etl_with_apache_hudi_spark.streaming.incremental import read_incremental_stream


def _rows(spark, data):
    return spark.createDataFrame(
        [Row(k=k, part=p, v=v, ver=ver) for (k, p, v, ver) in data]
    )


def test_stream_follows_commits(spark, tmp_path):
    table = TimelineTable(
        spark=spark,
        path=str(tmp_path / "tl"),
        keys=["k"],
        precombine="ver",
        partition_by=["part"],
    )
    table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)]))

    stream = read_incremental_stream(spark, table)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("inc_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.k, r._commit_id) for r in spark.sql("SELECT * FROM inc_sink").collect()
        }
        assert got == {(1, 1), (2, 1)}

        # two more commits while the consumer is live
        table.upsert(_rows(spark, [(1, "a", "x2", 2)]))
        table.upsert(_rows(spark, [(3, "b", "z", 1)]))
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM inc_sink").collect()
        got = {(r.k, r.v, r._commit_id) for r in rows}
        assert got == {
            (1, "x", 1),
            (2, "y", 1),
            (1, "x2", 2),
            (3, "z", 3),
        }
        # exactly-once: no record delivered twice
        assert len(rows) == len(got)
    finally:
        q.stop()


def test_stream_accepts_path_and_requires_commits(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError):
        read_incremental_stream(spark, str(tmp_path / "missing"))

    table = TimelineTable(
        spark=spark, path=str(tmp_path / "flat"), keys=["k"], precombine="ver"
    )
    table.upsert(spark.createDataFrame([Row(k=1, v="a", ver=1)]))
    stream = read_incremental_stream(spark, str(tmp_path / "flat"))
    assert "_commit_id" in stream.columns
