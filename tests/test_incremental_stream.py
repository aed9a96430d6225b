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


def test_stream_reopen_picks_up_evolved_schema(spark, tmp_path):
    """A restarted consumer re-pins the schema from the latest instant:
    columns added by later commits appear (nulls for older deltas), and
    already-seen files are not re-delivered (checkpoint continuity)."""
    table = TimelineTable(
        spark=spark, path=str(tmp_path / "ev"), keys=["k"], precombine="ver"
    )
    table.upsert(spark.createDataFrame([Row(k=1, v="a", ver=1)]))

    ck = str(tmp_path / "ck")

    def drain(name):
        rows = []
        q = (
            read_incremental_stream(spark, table)
            .writeStream.foreachBatch(lambda df, _id: rows.extend(df.collect()))
            .option("checkpointLocation", ck)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return rows

    first = drain("ev_sink_1")
    assert {r.k for r in first} == {1}
    assert "extra" not in first[0].asDict()

    # commit with a NEW column, then reopen the consumer
    table.upsert(spark.createDataFrame([Row(k=2, v="b", ver=1, extra="E")]))
    second = drain("ev_sink_2")
    got = {r.k: r.asDict().get("extra") for r in second}
    assert got == {2: "E"}  # only the new commit, with the new column


def test_multilevel_partition_timeline(spark, tmp_path):
    """Two-level partition paths: ownership, pruned incremental reads,
    and time travel all key on the full partition tuple."""
    t = TimelineTable(
        spark=spark,
        path=str(tmp_path / "ml"),
        keys=["k"],
        precombine="ver",
        partition_by=["region", "day"],
    )
    rows = lambda data: spark.createDataFrame(  # noqa: E731
        [Row(k=k, region=rg, day=d, v=v, ver=ver) for (k, rg, d, v, ver) in data]
    )
    t.upsert(rows([(1, "eu", 1, "x", 1), (2, "us", 1, "y", 1)]))
    t.upsert(rows([(1, "eu", 1, "x2", 2), (3, "eu", 2, "z", 1)]))

    state = {r.k: (r.region, r.day, r.v) for r in t.read().collect()}
    assert state == {1: ("eu", 1, "x2"), 2: ("us", 1, "y"), 3: ("eu", 2, "z")}
    assert {r.k for r in t.read(as_of=1).collect()} == {1, 2}
    # commit 2 touched only (eu,1) and (eu,2): us/1 still owned by c1
    import os

    assert sorted(os.listdir(t._snapshot_dir(2))) [0].startswith("region=eu")
    assert not os.path.isdir(os.path.join(t._snapshot_dir(2), "region=us"))


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


def test_mor_stream_follows_commits_and_skips_compaction(spark, tmp_path):
    """MOR streaming incremental: every upsert arrives exactly once
    tagged with its commit, and a COMPACTION emits nothing (it writes
    base files, not log files) — followers see no duplicates when the
    table compacts."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.mor import CompactionPolicy, MergeOnReadTable
    from aws_glue_streaming_etl_with_apache_hudi_spark.streaming.incremental import read_mor_incremental_stream

    table = MergeOnReadTable(
        spark=spark,
        path=str(tmp_path / "mor"),
        keys=["k"],
        precombine="ver",
        policy=CompactionPolicy(max_delta_commits=100),
    )
    table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)]))  # commit 1

    stream = read_mor_incremental_stream(spark, table)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("mor_inc_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.k, r._commit_id)
            for r in spark.sql("SELECT * FROM mor_inc_sink").collect()
        }
        assert got == {(1, 1), (2, 1)}

        table.upsert(_rows(spark, [(1, "a", "x2", 2)]))  # commit 2
        q.processAllAvailable()
        table.compact()  # folds 2 — must emit NOTHING on the stream
        q.processAllAvailable()
        table.upsert(_rows(spark, [(3, "b", "z", 1)]))  # commit 3
        q.processAllAvailable()

        rows = spark.sql("SELECT * FROM mor_inc_sink").collect()
        got = {(r.k, r.v, r._commit_id) for r in rows}
        assert got == {
            (1, "x", 1),
            (2, "y", 1),
            (1, "x2", 2),
            (3, "z", 3),
        }
        assert len(rows) == len(got)  # exactly-once across the compaction
    finally:
        q.stop()


def test_mor_stream_starts_on_fully_cleaned_log(spark, tmp_path):
    """A stream opened while the retained window is EMPTY (everything
    cleaned, next commit not yet written) must be valid and pick up the
    next commit — the partition column is declared, not inferred, so an
    empty log cannot fail column resolution."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.mor import CompactionPolicy, MergeOnReadTable
    from aws_glue_streaming_etl_with_apache_hudi_spark.streaming.incremental import read_mor_incremental_stream

    table = MergeOnReadTable(
        spark=spark,
        path=str(tmp_path / "mor"),
        keys=["k"],
        precombine="ver",
        policy=CompactionPolicy(max_delta_commits=100),
    )
    table.upsert(_rows(spark, [(1, "a", "x", 1)]))
    table.clean(through=table._compacted_through())  # empty retained window

    stream = read_mor_incremental_stream(spark, table)
    q = (
        stream.writeStream.format("memory")
        .queryName("mor_cleaned_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM mor_cleaned_sink").count() == 0
        table.upsert(_rows(spark, [(2, "a", "y", 1)]))  # commit 2
        q.processAllAvailable()
        got = {
            (r.k, r._commit_id)
            for r in spark.sql("SELECT * FROM mor_cleaned_sink").collect()
        }
        assert got == {(2, 2)}
    finally:
        q.stop()


def test_medallion_chain_bronze_to_silver(spark, sf_dir, tmp_path):
    """End-to-end medallion composition: file stream -> bronze
    TimelineTable (commit per micro-batch) -> incremental stream over the
    bronze commit log -> silver UpsertTable. The silver state must equal
    the batch-derived latest-event-per-user, and a second wave of source
    files must flow through BOTH hops via their checkpoints without
    reprocessing the first wave."""
    import os

    from pyspark.sql import functions as F

    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import UpsertTable
    from aws_glue_streaming_etl_with_apache_hudi_spark.sources.readers import EVENTS_SCHEMA, load_table
    from aws_glue_streaming_etl_with_apache_hudi_spark.streaming.pipeline import StreamingUpsertPipeline

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    os.makedirs(src)
    wave1 = events.filter("event_id % 2 = 0")
    wave2 = events.filter("event_id % 2 = 1")
    wave1.coalesce(1).write.parquet(src + "/_w")
    import glob
    import shutil

    shutil.move(glob.glob(src + "/_w/*.parquet")[0], src + "/w1.parquet")
    shutil.rmtree(src + "/_w")

    bronze = TimelineTable(
        spark=spark,
        path=str(tmp_path / "bronze"),
        keys=["event_id"],
        precombine="ts",
    )
    silver = UpsertTable(
        spark,
        str(tmp_path / "silver"),
        keys=["user_id"],
        precombine="ts",
    )

    def run_bronze():
        StreamingUpsertPipeline(
            spark,
            source_dir=src,
            schema=EVENTS_SCHEMA,
            table=bronze,
            checkpoint=str(tmp_path / "ckpt_bronze"),
        ).run_available()

    def run_silver():
        stream = read_incremental_stream(spark, bronze)
        q = (
            stream.drop("_deleted")
            .writeStream.foreachBatch(
                lambda df, _bid: None if df.isEmpty() else silver.upsert(df)
            )
            .option("checkpointLocation", str(tmp_path / "ckpt_silver"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    def expected(upto):
        return (
            upto.groupBy("user_id")
            .agg(F.max_by(F.struct("ts", "event_id", "value"), F.struct("ts", "event_id")).alias("r"))
            .select("user_id", "r.ts", "r.event_id", "r.value")
        )

    run_bronze()
    run_silver()
    got1 = silver.read().select("user_id", "ts", "event_id", "value")
    want1 = expected(wave1)
    assert got1.exceptAll(want1).isEmpty() and want1.exceptAll(got1).isEmpty()

    # wave 2: only the new commits travel the chain
    wave2.coalesce(1).write.parquet(src + "/_w")
    shutil.move(glob.glob(src + "/_w/*.parquet")[0], src + "/w2.parquet")
    shutil.rmtree(src + "/_w")
    n_commits_before = len(bronze.commits())
    run_bronze()
    run_silver()
    assert len(bronze.commits()) == n_commits_before + 1
    got2 = silver.read().select("user_id", "ts", "event_id", "value")
    want2 = expected(events)
    assert got2.exceptAll(want2).isEmpty() and want2.exceptAll(got2).isEmpty()
