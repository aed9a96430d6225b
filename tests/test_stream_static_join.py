"""Stream-static join (dimension enrichment) and checkpoint pickup of
files that arrive after a restart — the remaining streaming surface."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import UpsertTable
from aws_glue_streaming_etl_with_apache_hudi_spark.sources.readers import EVENTS_SCHEMA, load_table
from aws_glue_streaming_etl_with_apache_hudi_spark.streaming.pipeline import StreamingUpsertPipeline


def test_stream_static_dim_enrichment(spark, sf_dir, tmp_path):
    """A streaming source joined to a static broadcast dim — the standard
    enrichment shape (stream shuffles nothing; dim broadcast per batch)."""
    src = str(tmp_path / "src")
    load_table(spark, sf_dir, "events").limit(200).coalesce(1).write.parquet(src)

    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    stream = (
        spark.readStream.format("parquet").schema(EVENTS_SCHEMA).load(src)
        .join(F.broadcast(dim), "user_id", "left")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM enriched").collect()
    assert sum(r.n for r in rows) == 200
    # user_ids are a small range -> all enriched (no null segment rows)
    assert all(r.c_mktsegment is not None for r in rows)


def test_restart_picks_up_new_files(spark, sf_dir, tmp_path):
    """A12: stop, add data, restart with the same checkpoint — only the
    new file is processed and the table advances."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    events = load_table(spark, sf_dir, "events")
    events.filter("event_id % 2 = 0").coalesce(1).write.parquet(src + "/_s0")
    import glob
    import shutil

    shutil.move(glob.glob(src + "/_s0/*.parquet")[0], src + "/a.parquet")
    shutil.rmtree(src + "/_s0")

    def mk_pipe():
        return StreamingUpsertPipeline(
            spark,
            source_dir=src,
            schema=EVENTS_SCHEMA,
            table=UpsertTable(
                spark, str(tmp_path / "tbl"), keys=["user_id"], precombine="ts"
            ),
            checkpoint=str(tmp_path / "ckpt"),
        )

    p1 = mk_pipe()
    p1.run_available()
    n1 = spark.read.parquet(str(tmp_path / "tbl")).count()
    assert n1 > 0

    events.filter("event_id % 2 = 1").coalesce(1).write.parquet(src + "/_s1")
    shutil.move(glob.glob(src + "/_s1/*.parquet")[0], src + "/b.parquet")
    shutil.rmtree(src + "/_s1")

    p2 = mk_pipe()
    p2.run_available()
    assert len(p2.batches_seen) == 1  # only the new file

    # final state equals the single-pass latest-per-user over ALL events
    got = spark.read.parquet(str(tmp_path / "tbl")).count()
    expected = events.select("user_id").distinct().count()
    assert got == expected
