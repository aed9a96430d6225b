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
