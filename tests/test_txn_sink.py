"""Batch-id ledger (streaming/txn_sink.py): exactly-once side effects for
non-idempotent foreachBatch sinks."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.streaming.txn_sink import BatchIdLedger


def test_replayed_batch_id_is_skipped(spark, tmp_path):
    ledger = BatchIdLedger(str(tmp_path / "ledger"))
    out = str(tmp_path / "out")
    df = spark.range(5)

    def append(batch_df):
        batch_df.write.mode("append").parquet(out)

    assert ledger.run_once(df, 0, append) is True
    # crash-replay of the SAME batch id: the non-idempotent append must
    # NOT run again
    assert ledger.run_once(df, 0, append) is False
    assert spark.read.parquet(out).count() == 5
    # a new batch id runs
    assert ledger.run_once(df, 1, append) is True
    assert spark.read.parquet(out).count() == 10


def test_commit_is_single_winner(tmp_path):
    ledger = BatchIdLedger(str(tmp_path / "ledger"))
    assert ledger.commit(7) is True
    assert ledger.commit(7) is False  # O_EXCL: one winner per id
    assert ledger.committed(7)


def test_streaming_foreachbatch_with_ledger_no_duplicates(spark, tmp_path):
    """End-to-end: file stream -> foreachBatch(run_once(append)) with a
    RESTART mid-stream — the append sink receives every row exactly once
    even though the checkpoint replays the foreachBatch calls."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    os.makedirs(src)
    ledger = BatchIdLedger(str(tmp_path / "ledger"))

    def sink(batch_df, batch_id):
        ledger.run_once(
            batch_df, batch_id, lambda d: d.write.mode("append").parquet(out)
        )

    def start():
        return (
            spark.readStream.schema("id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )

    spark.range(0, 3).coalesce(1).write.mode("append").parquet(src)
    q = start()
    q.processAllAvailable()
    q.stop()
    # restart: same checkpoint; add more data
    spark.range(3, 7).coalesce(1).write.mode("append").parquet(src)
    q = start()
    q.processAllAvailable()
    q.stop()

    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == list(range(7)), got


def test_streaming_dq_monitor_in_post_commit(spark, tmp_path):
    """The DQ gate as a streaming monitor: every committed micro-batch
    runs the declarative expectations in post_commit and appends a
    per-batch metrics ledger row — the continuously-ingesting pipeline's
    alerting feed, built from the same operators the batch gate uses."""
    import os

    from pyspark.sql import Row

    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.expectations import (
        in_range,
        not_null,
        run_expectations,
    )
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import UpsertTable
    from aws_glue_streaming_etl_with_apache_hudi_spark.streaming.pipeline import StreamingUpsertPipeline

    src = str(tmp_path / "src")
    metrics_dir = str(tmp_path / "dq_metrics")
    os.makedirs(src)
    table = UpsertTable(
        spark, str(tmp_path / "tbl"), keys=["k"], precombine="ver",
    )
    checks = [not_null("v"), in_range("v", 0.0, 100.0)]
    seen_batches = []

    def dq_monitor(batch_df):
        report = run_expectations(batch_df, checks)
        report.write.mode("append").parquet(metrics_dir)
        seen_batches.append(1)

    pipe = StreamingUpsertPipeline(
        spark,
        source_dir=src,
        schema=None,
        table=table,
        checkpoint=str(tmp_path / "ckpt"),
        post_commit=dq_monitor,
    )
    # batch 1: clean; batch 2: one null + one out-of-range
    spark.createDataFrame(
        [Row(k=1, ver=1, v=5.0), Row(k=2, ver=1, v=50.0)]
    ).coalesce(1).write.mode("append").parquet(src)
    pipe.run_available()
    spark.createDataFrame(
        [Row(k=3, ver=1, v=None), Row(k=4, ver=1, v=999.0)]
    ).coalesce(1).write.mode("append").parquet(src)
    pipe.run_available()

    assert len(seen_batches) == 2
    metrics = spark.read.parquet(metrics_dir)
    # 2 batches x 2 checks
    assert metrics.count() == 4
    total_violations = {
        r.check: r.s
        for r in metrics.groupBy("check")
        .agg(F.sum("n_violations").alias("s"))
        .collect()
    }
    assert total_violations["not_null(v)"] == 1
    assert total_violations["in_range(v, 0.0, 100.0)"] == 1


# -- VERDICT r5 task 2: object-store-safe marker writers -------------------

import threading

import pytest

from aws_glue_streaming_etl_with_apache_hudi_spark.streaming.txn_sink import (
    ExclMarkerWriter,
    StagedRenameMarkerWriter,
)

WRITERS = [ExclMarkerWriter, StagedRenameMarkerWriter]


@pytest.mark.parametrize("writer_cls", WRITERS)
def test_concurrent_replay_race_single_winner(tmp_path, writer_cls):
    """Two attempts of the same batch both pass the committed() check and
    both commit — exactly ONE must win, identically for the POSIX O_EXCL
    writer and the stage-and-rename writer (the ledger's semantics must
    not depend on O_EXCL)."""
    ledger = BatchIdLedger(str(tmp_path / "ledger"), marker_writer=writer_cls())
    n = 8
    barrier = threading.Barrier(n)
    results: list[bool] = []
    lock = threading.Lock()

    def attempt():
        barrier.wait()
        won = ledger.commit(42)
        with lock:
            results.append(won)

    threads = [threading.Thread(target=attempt) for _ in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sum(results) == 1, f"{writer_cls.__name__}: winners={sum(results)}"
    assert ledger.committed(42)


@pytest.mark.parametrize("writer_cls", WRITERS)
def test_writer_variants_agree_on_ledger_contract(tmp_path, writer_cls):
    ledger = BatchIdLedger(str(tmp_path / "ledger"), marker_writer=writer_cls())
    assert not ledger.committed(0)
    assert ledger.commit(0) is True
    assert ledger.commit(0) is False
    assert ledger.committed(0)
    assert not ledger.committed(1)


def test_rename_writer_crash_leaves_only_staging_and_fsck_sweeps(tmp_path, monkeypatch):
    """Crash between stage and link: the live marker never appears
    half-written; only an orphaned staging file remains, which fsck
    removes, after which the batch commits normally."""
    path = str(tmp_path / "ledger")
    ledger = BatchIdLedger(path, marker_writer=StagedRenameMarkerWriter())

    real_link = os.link
    monkeypatch.setattr(os, "link", lambda *a: (_ for _ in ()).throw(OSError("crash")))
    monkeypatch.setattr(os, "unlink", lambda *a: None)  # crash: no cleanup either
    with pytest.raises(OSError):
        ledger.commit(5)
    monkeypatch.setattr(os, "link", real_link)
    monkeypatch.undo()

    assert not ledger.committed(5)  # marker never half-appeared
    leftovers = [n for n in os.listdir(path) if ".staging-" in n]
    assert len(leftovers) == 1
    assert ledger.fsck() == leftovers
    assert os.listdir(path) == []
    assert ledger.commit(5) is True  # clean retry wins
    assert ledger.committed(5)


def test_rename_writer_stages_durably_no_excl_on_final_path(tmp_path):
    """The rename writer must never O_EXCL-open the final marker path —
    its exclusivity comes from the atomic no-overwrite move."""
    recorded: list[tuple[str, int]] = []
    real_open = os.open

    def spy_open(path, flags, *a, **kw):
        recorded.append((str(path), flags))
        return real_open(path, flags, *a, **kw)

    import unittest.mock as mock

    with mock.patch.object(os, "open", side_effect=spy_open):
        ledger = BatchIdLedger(str(tmp_path / "ledger"), marker_writer=StagedRenameMarkerWriter())
        assert ledger.commit(3) is True
    final = ledger._marker(3)
    for path, flags in recorded:
        if path == final:
            assert not (flags & os.O_EXCL), "O_EXCL used on the final marker"
