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
