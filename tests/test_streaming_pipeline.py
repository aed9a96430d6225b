"""End-to-end streaming pipeline (SURVEY.md §7 minimum slice + §5.3):
replay ``events`` as a file stream -> foreachBatch upsert -> assert upsert
semantics, restart-from-checkpoint idempotence, and SQL queryability."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import UpsertTable
from aws_glue_streaming_etl_with_apache_hudi_spark.sources.readers import EVENTS_SCHEMA, load_table
from aws_glue_streaming_etl_with_apache_hudi_spark.streaming.pipeline import StreamingUpsertPipeline


def _write_event_files(spark, sf_dir, out_dir, n_files=3):
    """Split the events fixture into n files -> n micro-batches."""
    events = load_table(spark, sf_dir, "events")
    for i in range(n_files):
        (
            events.filter(F.pmod("event_id", F.lit(n_files)) == i)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"chunk={i}"))
        )
    # flatten: move part files up so the stream sees individual files
    import glob
    import shutil

    for i, f in enumerate(glob.glob(os.path.join(out_dir, "chunk=*", "*.parquet"))):
        shutil.move(f, os.path.join(out_dir, f"batch_{i}.parquet"))
    for d in glob.glob(os.path.join(out_dir, "chunk=*")):
        shutil.rmtree(d)


def test_stream_upsert_end_to_end(spark, sf_dir, tmp_path):
    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    _write_event_files(spark, sf_dir, src, n_files=3)

    table = UpsertTable(
        spark,
        str(tmp_path / "user_state"),
        keys=["user_id"],
        precombine="ts",
        partition_by=["event_type"],
        table_name="user_state",
    )
    pipe = StreamingUpsertPipeline(
        spark,
        source_dir=src,
        schema=EVENTS_SCHEMA,
        table=table,
        checkpoint=str(tmp_path / "ckpt"),
    )
    pipe.run_available()
    assert len(pipe.batches_seen) >= 1

    # Expected state: latest event per (event_type, user_id) — the upsert
    # table's identity is partition path + record key (Hudi non-global).
    events = load_table(spark, sf_dir, "events")
    expected = (
        events.groupBy("event_type", "user_id")
        .agg(F.max_by(F.struct("ts", "event_id", "value"), F.struct("ts", "event_id")).alias("r"))
        .select("event_type", "user_id", "r.ts", "r.event_id", "r.value")
    )
    got = table.read().select("event_type", "user_id", "ts", "event_id", "value")
    assert got.count() == expected.count()
    assert got.exceptAll(expected).isEmpty() and expected.exceptAll(got).isEmpty()

    # SQL surface over the synced table (A11): aggregate the merged state
    agg = spark.sql(
        "SELECT event_type, count(*) AS n, round(sum(value), 2) AS total "
        "FROM user_state GROUP BY event_type ORDER BY event_type"
    )
    assert agg.count() > 0

    # Restart from checkpoint with no new files: no reprocessing, same state
    before = sorted(map(tuple, got.collect()))
    pipe2 = StreamingUpsertPipeline(
        spark,
        source_dir=src,
        schema=EVENTS_SCHEMA,
        table=table,
        checkpoint=str(tmp_path / "ckpt"),
    )
    pipe2.run_available()
    assert pipe2.batches_seen == []
    after = sorted(map(tuple, table.read().select("event_type", "user_id", "ts", "event_id", "value").collect()))
    assert before == after


def test_stream_to_mor_table_with_midstream_compaction(spark, sf_dir, tmp_path):
    """The canonical Hudi STREAMING ingest shape the reference's COW job
    doesn't show: micro-batches append MOR delta commits, the compaction
    policy fires mid-stream, and the merged read equals the COW answer.
    (The reference pins COW — glue_job_script.py:54 — so this is the
    beyond-reference MOR leg of A2/A8 under a live stream.)"""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.mor import CompactionPolicy, MergeOnReadTable

    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    _write_event_files(spark, sf_dir, src, n_files=3)

    table = MergeOnReadTable(
        spark=spark,
        path=str(tmp_path / "mor_state"),
        keys=["user_id"],
        precombine="ts",
        partition_by=["event_type"],
        policy=CompactionPolicy(max_delta_commits=2),  # fires mid-stream
    )
    pipe = StreamingUpsertPipeline(
        spark,
        source_dir=src,
        schema=EVENTS_SCHEMA,
        table=table,
        checkpoint=str(tmp_path / "ckpt_mor"),
    )
    pipe.run_available()
    assert len(pipe.batches_seen) == 3

    # compaction really fired under the stream: base exists and the
    # unfolded log is shorter than the number of delta commits
    assert table._compacted_through() > 0
    assert len(table._log_commits()) < 3

    events = load_table(spark, sf_dir, "events")
    expected = (
        events.groupBy("event_type", "user_id")
        .agg(F.max_by(F.struct("ts", "event_id", "value"), F.struct("ts", "event_id")).alias("r"))
        .select("event_type", "user_id", "r.ts", "r.event_id", "r.value")
    )
    got = table.read().select("event_type", "user_id", "ts", "event_id", "value")
    assert got.count() == expected.count()
    assert got.exceptAll(expected).isEmpty() and expected.exceptAll(got).isEmpty()

    # read-optimized view: only compacted state, a subset of the full merge
    ro = table.read_optimized().select("event_type", "user_id", "ts", "event_id", "value")
    assert ro.exceptAll(got).isEmpty()


def test_run_pipeline_cli_dedup_gate(spark, tmp_path):
    """CLI wiring of the continuous-ingestion near-dup gate: a documents
    source with an exact duplicate drains through run_pipeline with
    --dedup_index_dir; the duplicate is dropped before the upsert and
    its signature never enters the index."""
    import run_pipeline
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup_index import LSHDedupIndex

    src = str(tmp_path / "docs_src")
    os.makedirs(src)
    spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven"),
            (3, "alpha beta gamma delta epsilon zeta"),
        ],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(src)

    run_pipeline.main(
        [
            "--source_dir", src,
            "--table_path", str(tmp_path / "tbl"),
            "--checkpoint_path", str(tmp_path / "ckpt"),
            "--record_key", "doc_id",
            "--precombine", "doc_id",
            "--partition_fields", "",
            "--table_name", "cli_dedup_tbl",
            "--once", "true",
            "--infer_schema", "true",
            "--dedup_index_dir", str(tmp_path / "idx"),
        ]
    )
    got = sorted(r.doc_id for r in spark.table("cli_dedup_tbl").collect())
    assert got == [1, 2]
    assert LSHDedupIndex(spark, str(tmp_path / "idx")).size() == 2


def test_stream_upsert_with_bloom_index_end_to_end(spark, sf_dir, tmp_path):
    """The full stream->foreachBatch->upsert path with bloom_index on
    (round 7): identical final state to the plain table, sidecar
    present, and replay-from-checkpoint still a no-op."""
    import json

    src = str(tmp_path / "stream_src_b")
    os.makedirs(src)
    _write_event_files(spark, sf_dir, src, n_files=3)

    table = UpsertTable(
        spark,
        str(tmp_path / "user_state_bloom"),
        keys=["user_id"],
        precombine="ts",
        partition_by=["event_type"],
        bloom_index=True,
    )
    pipe = StreamingUpsertPipeline(
        spark, source_dir=src, schema=EVENTS_SCHEMA, table=table,
        checkpoint=str(tmp_path / "ckpt_b"),
    )
    pipe.run_available()

    events = load_table(spark, sf_dir, "events")
    expected = (
        events.groupBy("event_type", "user_id")
        .agg(F.max_by(F.struct("ts", "event_id", "value"), F.struct("ts", "event_id")).alias("r"))
        .select("event_type", "user_id", "r.ts", "r.event_id", "r.value")
    )
    got = table.read().select("event_type", "user_id", "ts", "event_id", "value")
    assert got.exceptAll(expected).isEmpty() and expected.exceptAll(got).isEmpty()

    blooms = table._bloom_load()  # all shards (one per event_type partition)
    assert blooms
    assert set(blooms) == {
        table._stat_key((r.event_type,))
        for r in events.select("event_type").distinct().collect()
    }


def test_run_pipeline_cli_plumbs_bloom_index(spark, tmp_path, monkeypatch):
    """--bloom_index true reaches the UpsertTable the CLI constructs
    (A13 parameterization parity for the round-7 index)."""
    import run_pipeline

    captured = {}
    real = run_pipeline.UpsertTable

    def spy(*a, **kw):
        captured.update(kw)
        return real(*a, **kw)

    monkeypatch.setattr(run_pipeline, "UpsertTable", spy)

    class _NoopPipe:
        def __init__(self, *a, **kw):
            pass

        def run_available(self):
            return None

        def start(self):
            class _Q:
                def awaitTermination(self):
                    return None

            return _Q()

    monkeypatch.setattr(run_pipeline, "StreamingUpsertPipeline", _NoopPipe)
    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, "login", 10)], "user_id long, event_type string, ts long"
    ).coalesce(1).write.mode("append").parquet(src)
    run_pipeline.main([
        "--source_dir", src,
        "--table_path", str(tmp_path / "tbl"),
        "--checkpoint_path", str(tmp_path / "ck"),
        "--record_key", "user_id", "--precombine", "ts",
        "--partition_fields", "event_type",
        "--bloom_index", "true", "--once", "false",
    ])
    assert captured.get("bloom_index") is True
