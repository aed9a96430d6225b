"""Custom Python DataSource (sources/pydatasource.py): deterministic
synthetic event generation, batch + streaming, partition-invariant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.sources import pydatasource


@pytest.fixture(scope="module", autouse=True)
def _registered(spark):
    pydatasource.register(spark)


def test_batch_read_counts_schema_and_bounds(spark):
    df = (
        spark.read.format("graft_events")
        .option("rows", 500)
        .option("numUsers", 7)
        .load()
    )
    assert df.count() == 500
    assert [f.name for f in df.schema.fields] == [
        "event_id", "ts", "user_id", "event_type", "value", "props",
    ]
    row = df.agg(
        F.count_distinct("event_id").alias("ids"),
        F.max("user_id").alias("max_u"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    ).collect()[0]
    assert row.ids == 500 and row.max_u <= 6
    assert 0.0 <= row.min_v and row.max_v < 1000.0


def test_batch_read_is_partition_invariant_and_seeded(spark):
    def frame(parts, seed):
        return sorted(
            map(
                tuple,
                spark.read.format("graft_events")
                .option("rows", 200)
                .option("numPartitions", parts)
                .option("seed", seed)
                .load()
                .collect(),
            )
        )

    base = frame(1, "graft")
    assert frame(4, "graft") == base and frame(13, "graft") == base
    assert frame(4, "other") != base  # the seed is a real lever


def test_batch_read_parallelism_matches_option(spark):
    df = (
        spark.read.format("graft_events")
        .option("rows", 100)
        .option("numPartitions", 8)
        .load()
    )
    # one spark partition per generator split
    assert df.select(F.spark_partition_id()).distinct().count() == 8


def test_stream_reader_advances_and_caps(spark, tmp_path):
    q = (
        spark.readStream.format("graft_events")
        .option("rows", 250)
        .option("rowsPerBatch", 100)
        .load()
        .writeStream.format("memory")
        .queryName("graft_stream_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d "
                        "FROM graft_stream_sink").collect()[0]
        # capped at rows, no duplicates across micro-batches
        assert got.n == 250 and got.d == 250
    finally:
        q.stop()


def test_stream_rows_match_batch_rows(spark, tmp_path):
    """The stream is the batch frame released incrementally: same seed,
    same rows -> identical row set."""
    q = (
        spark.readStream.format("graft_events")
        .option("rows", 120)
        .option("rowsPerBatch", 50)
        .option("seed", "paritycheck")
        .load()
        .writeStream.format("memory")
        .queryName("graft_parity_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = sorted(
            map(tuple, spark.sql("SELECT * FROM graft_parity_sink").collect())
        )
    finally:
        q.stop()
    batch = sorted(
        map(
            tuple,
            spark.read.format("graft_events")
            .option("rows", 120)
            .option("seed", "paritycheck")
            .load()
            .collect(),
        )
    )
    assert streamed == batch


def test_cli_pipeline_drains_generator_source(spark, tmp_path):
    """run_pipeline --source_format graft_events: the reference demo
    end-to-end with NO files and no broker — generator stream ->
    foreachBatch -> upsert table; a once-run drains the full row
    budget."""
    import run_pipeline

    run_pipeline.main(
        [
            "--source_dir", str(tmp_path / "unused"),
            "--table_path", str(tmp_path / "tbl"),
            "--checkpoint_path", str(tmp_path / "ckpt"),
            "--record_key", "event_id",
            "--precombine", "ts",
            "--partition_fields", "",
            "--table_name", "gen_cli_tbl",
            "--once", "true",
            "--source_format", "graft_events",
            "--gen_rows", "300",
            "--gen_seed", "cli",
        ]
    )
    got = spark.table("gen_cli_tbl")
    assert got.count() == 300
    assert got.select(F.count_distinct("event_id")).collect()[0][0] == 300


def test_writer_two_phase_commit(spark, tmp_path):
    """df.write.format("graft_events"): staged files promote on commit,
    a _SUCCESS manifest lists exactly the promoted files, and orphaned
    staging files (lost speculative attempts) are never promoted."""
    import json
    import os

    from aws_glue_streaming_etl_with_apache_hudi_spark.sources.pydatasource import register

    register(spark)
    out = str(tmp_path / "ledger")
    df = spark.range(0, 100, numPartitions=4).selectExpr(
        "id AS event_id", "timestamp'2024-01-01' AS ts", "id % 7 AS user_id",
        "'view' AS event_type", "1.5 AS value", "'{}' AS props"
    )
    # plant an orphan staging file BEFORE the write: a lost speculative
    # attempt's leftovers must not be promoted
    os.makedirs(os.path.join(out, "_staging"), exist_ok=True)
    orphan = os.path.join(out, "_staging", "part-99999-0.jsonl")
    with open(orphan, "w") as f:
        f.write('{"event_id": -1}\n')

    df.write.format("graft_events").option("path", out).mode("append").save()

    with open(os.path.join(out, "_SUCCESS")) as f:
        manifest = json.load(f)
    assert manifest["rows"] == 100
    promoted = [n for n in os.listdir(out) if n.endswith(".jsonl")]
    assert sorted(promoted) == manifest["files"]
    assert "part-99999-0.jsonl" not in manifest["files"]
    assert os.path.exists(orphan)  # untouched, never promoted
    total = 0
    for name in promoted:
        with open(os.path.join(out, name)) as f:
            total += sum(1 for _ in f)
    assert total == 100


def test_writer_overwrite_replaces_committed_files(spark, tmp_path):
    import json
    import os

    from aws_glue_streaming_etl_with_apache_hudi_spark.sources.pydatasource import register

    register(spark)
    out = str(tmp_path / "ledger2")
    base = spark.range(0, 50, numPartitions=2).selectExpr(
        "id AS event_id", "timestamp'2024-01-01' AS ts", "id AS user_id",
        "'view' AS event_type", "1.0 AS value", "'{}' AS props"
    )
    base.write.format("graft_events").option("path", out).mode("append").save()
    base.limit(10).repartition(1).write.format("graft_events").option(
        "path", out
    ).mode("overwrite").save()
    with open(os.path.join(out, "_SUCCESS")) as f:
        manifest = json.load(f)
    assert manifest["rows"] == 10
    total = 0
    for name in os.listdir(out):
        if name.endswith(".jsonl"):
            with open(os.path.join(out, name)) as f:
                total += sum(1 for _ in f)
    assert total == 10


def test_writer_requires_path(spark):
    import pytest as _pytest

    from aws_glue_streaming_etl_with_apache_hudi_spark.sources.pydatasource import register

    register(spark)
    df = spark.range(3).selectExpr(
        "id AS event_id", "timestamp'2024-01-01' AS ts", "id AS user_id",
        "'view' AS event_type", "1.0 AS value", "'{}' AS props"
    )
    with _pytest.raises(Exception):
        df.write.format("graft_events").mode("append").save()


def test_stream_writer_per_batch_manifests(spark, tmp_path):
    """writeStream.format("graft_events"): each micro-batch promotes its
    files under an atomic _batch_N manifest; a replayed batch id is a
    no-op (exactly-once by idempotent manifest rename)."""
    import json
    import os

    from aws_glue_streaming_etl_with_apache_hudi_spark.sources.pydatasource import register

    register(spark)
    src = str(tmp_path / "in")
    out = str(tmp_path / "ledger_stream")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def _feed(name, lo, hi):
        rows = spark.range(lo, hi).selectExpr(
            "id AS event_id", "timestamp'2024-01-01' AS ts", "id AS user_id",
            "'view' AS event_type", "1.0 AS value", "'{}' AS props"
        )
        rows.coalesce(1).write.mode("overwrite").json(os.path.join(src, name))

    _feed("b0", 0, 40)
    q = (
        spark.readStream.schema(schema).json(src + "/*")
        .writeStream.format("graft_events")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    _feed("b1", 40, 70)
    q = (
        spark.readStream.schema(schema).json(src + "/*")
        .writeStream.format("graft_events")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    manifests = sorted(n for n in os.listdir(out) if n.startswith("_batch_"))
    assert len(manifests) == 2
    total = 0
    for mname in manifests:
        with open(os.path.join(out, mname)) as f:
            m = json.load(f)
        for fname in m["files"]:
            with open(os.path.join(out, fname)) as f:
                assert sum(1 for _ in f) > 0
        total += m["rows"]
    assert total == 70
    # replay protection: re-promoting an existing batch id is a no-op
    from aws_glue_streaming_etl_with_apache_hudi_spark.sources.pydatasource import GraftLedgerStreamWriter, _StagedFile
    w = GraftLedgerStreamWriter({"path": out})
    ghost = os.path.join(out, "_staging", "ghost.jsonl")
    os.makedirs(os.path.dirname(ghost), exist_ok=True)
    with open(ghost, "w") as f:
        f.write('{"event_id": -1}\n')
    w.commit([_StagedFile(ghost, 1)], batchId=0)
    with open(os.path.join(out, "_batch_0")) as f:
        assert json.load(f)["rows"] != 1  # original manifest untouched
    assert not os.path.exists(ghost)  # re-staged files cleaned, not promoted
