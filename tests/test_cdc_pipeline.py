"""End-to-end CDC pipeline: events stream -> foreachBatch upsert into a
TimelineTable (one commit per micro-batch) -> downstream consumer tails
the commit deltas as a stream and reconstructs the table's latest state.
This is the full ingest -> table -> derive fan-out the reference's
architecture implies (Kinesis -> Hudi -> downstream SQL/consumers)."""

from __future__ import annotations

import glob
import os
import shutil
from datetime import datetime, timedelta

from pyspark.sql import Row
from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import COMMIT_COL, TimelineTable
from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import upsert_dataframe
from aws_glue_streaming_etl_with_apache_hudi_spark.sources.readers import EVENTS_SCHEMA
from aws_glue_streaming_etl_with_apache_hudi_spark.streaming.pipeline import StreamingUpsertPipeline


def _mk_events(spark, rows):
    return spark.createDataFrame(
        [
            Row(event_id=i, ts=ts, user_id=uid, event_type=et, value=v, props="{}")
            for i, (ts, uid, et, v) in rows
        ],
        schema=EVENTS_SCHEMA,
    )


def _drop_file(spark, src, i, batch):
    batch.coalesce(1).write.mode("overwrite").parquet(f"{src}/_stage{i}")
    (part,) = glob.glob(f"{src}/_stage{i}/*.parquet")
    shutil.move(part, f"{src}/b{i}.parquet")
    shutil.rmtree(f"{src}/_stage{i}")


def test_apply_change_feed_replica_with_deletes(spark, tmp_path):
    """Live replication: source timeline table -> incremental stream ->
    apply_change_feed into a replica UpsertTable. The replica must track
    upserts, partition migrations of the merge, AND deletes — and a
    same-batch upsert+delete of one key must not resurrect the row."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import apply_change_feed
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import UpsertTable
    from aws_glue_streaming_etl_with_apache_hudi_spark.streaming.incremental import read_incremental_stream

    src = TimelineTable(
        spark=spark,
        path=str(tmp_path / "src_tl"),
        keys=["k"],
        precombine="ver",
        partition_by=["part"],
    )
    rows = lambda data: spark.createDataFrame(  # noqa: E731
        [Row(k=k, part=p, v=v, ver=ver) for (k, p, v, ver) in data]
    )
    src.upsert(rows([(1, "a", "x", 1), (2, "b", "y", 1)]))

    replica = UpsertTable(
        spark=spark,
        path=str(tmp_path / "replica"),
        keys=["k"],
        precombine="ver",
        partition_by=["part"],
    )
    stream = read_incremental_stream(spark, src)
    q = (
        stream.writeStream.foreachBatch(lambda df, _id: apply_change_feed(replica, df))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        assert {r.k: (r.part, r.v) for r in replica.read().collect()} == {
            1: ("a", "x"),
            2: ("b", "y"),
        }
        # upsert commit + delete commit, drained TOGETHER in one batch:
        # key 3 is created then deleted -> must not exist in the replica
        src.upsert(rows([(3, "a", "z", 1), (1, "a", "x2", 2)]))
        src.delete(spark.createDataFrame([Row(k=3, part="a", ver=2)]))
        q.processAllAvailable()
        assert {r.k: (r.part, r.v) for r in replica.read().collect()} == {
            1: ("a", "x2"),
            2: ("b", "y"),
        }
    finally:
        q.stop()


def test_stream_to_timeline_to_replica(spark, tmp_path):
    t0 = datetime(2024, 1, 1, 0, 0)
    src = str(tmp_path / "src")
    os.makedirs(src)
    batches = [
        _mk_events(
            spark,
            [
                (1, (t0, 10, "click", 1.0)),
                (2, (t0 + timedelta(minutes=1), 20, "view", 2.0)),
            ],
        ),
        _mk_events(
            spark,
            [
                (3, (t0 + timedelta(hours=1), 10, "click", 5.0)),  # update u10
                (4, (t0 + timedelta(hours=1), 30, "click", 3.0)),  # insert u30
            ],
        ),
        _mk_events(
            spark,
            [(5, (t0 - timedelta(hours=9), 20, "view", 99.0))],  # stale: loses
        ),
    ]
    for i, b in enumerate(batches):
        _drop_file(spark, src, i, b)

    table = TimelineTable(
        spark=spark,
        path=str(tmp_path / "tl"),
        keys=["user_id"],
        precombine="ts",
        partition_by=["event_type"],
    )
    pipe = StreamingUpsertPipeline(
        spark,
        source_dir=src,
        schema=EVENTS_SCHEMA,
        table=table,
        checkpoint=str(tmp_path / "ckpt"),
    )
    pipe.run_available()

    # one timeline instant per micro-batch file
    assert table.last_commit() == 3
    state = {r.user_id: (r.event_id, r.value) for r in table.read().collect()}
    assert state == {10: (3, 5.0), 20: (2, 2.0), 30: (4, 3.0)}

    # downstream replica: tail the deltas as a stream, merge latest-wins
    from aws_glue_streaming_etl_with_apache_hudi_spark.streaming.incremental import read_incremental_stream

    stream = read_incremental_stream(spark, table)
    q = (
        stream.writeStream.format("memory")
        .queryName("cdc_replica_feed")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        feed = spark.sql("SELECT * FROM cdc_replica_feed")
        # every commit's changed records arrived
        assert {r._commit_id for r in feed.select(COMMIT_COL).collect()} == {1, 2, 3}
        replica = upsert_dataframe(
            None,
            feed.drop(COMMIT_COL).withColumn("event_type_key", F.col("event_type")),
            keys=["event_type_key", "user_id"],
            precombine="ts",
        ).drop("event_type_key")
        rep = {r.user_id: (r.event_id, r.value) for r in replica.collect()}
        # replica equals the table's live state (stale u20 record lost in
        # the replica merge exactly as it lost in the table merge)
        assert rep == state
    finally:
        q.stop()
