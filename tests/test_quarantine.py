"""Corrupt-record quarantine (sources/quarantine.py): malformed JSON
payloads are preserved raw and replayable; clean rows flow through."""

from __future__ import annotations

import os

from pyspark.sql import types as T

from aws_glue_streaming_etl_with_apache_hudi_spark.sources.quarantine import quarantine_batch, read_json_with_quarantine

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ]
)

GOOD = ['{"id": 1, "name": "a"}', '{"id": 2, "name": "b"}']
BAD = ['{"id": 3, "name": ', "not json at all"]


def _write_lines(p, lines):
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_split_clean_and_corrupt(spark, tmp_path):
    src = str(tmp_path / "in" / "data.json")
    _write_lines(src, GOOD + BAD)

    clean, corrupt = read_json_with_quarantine(spark, src, SCHEMA)
    assert {(r.id, r.name) for r in clean.collect()} == {(1, "a"), (2, "b")}
    raws = {r.raw for r in corrupt.collect()}
    assert raws == set(BAD)  # original payloads preserved byte-for-byte
    assert clean.columns == ["id", "name"]  # corrupt column not leaked


def test_quarantine_batch_writes_dlq_and_replays(spark, tmp_path):
    src = str(tmp_path / "in" / "data.json")
    _write_lines(src, GOOD + BAD)
    dlq = str(tmp_path / "dlq")

    clean = quarantine_batch(spark, src, SCHEMA, dlq, batch_id=7)
    assert clean.count() == 2
    # quarantined payloads are on disk, replayable as text
    saved = spark.read.text(os.path.join(dlq, "batch=7"))
    assert {r.value for r in saved.collect()} == set(BAD)

    # replay after "fixing the parser": a looser schema recovers one row
    looser = T.StructType([T.StructField("id", T.LongType())])
    replayed, still_bad = read_json_with_quarantine(
        spark, os.path.join(dlq, "batch=7"), looser
    )
    assert still_bad.count() == 2  # both are truly malformed JSON


def test_streaming_pipeline_with_json_quarantine(spark, tmp_path):
    """End to end: a JSON stream containing malformed payloads upserts
    the clean rows and dead-letters the rest, per micro-batch."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import UpsertTable
    from aws_glue_streaming_etl_with_apache_hudi_spark.streaming.pipeline import StreamingUpsertPipeline

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("ver", T.LongType()),
        ]
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_lines(
        os.path.join(src, "b0.json"),
        ['{"id": 1, "name": "a", "ver": 1}', "BROKEN {", '{"id": 2, "name": "b", "ver": 1}'],
    )
    dlq = str(tmp_path / "dlq")
    table = UpsertTable(
        spark=spark, path=str(tmp_path / "t"), keys=["id"], precombine="ver"
    )
    pipe = StreamingUpsertPipeline(
        spark,
        source_dir=src,
        schema=schema,
        table=table,
        checkpoint=str(tmp_path / "ck"),
        source_format="json",
        quarantine_dir=dlq,
    )
    pipe.run_available()

    assert {r.id for r in table.read().collect()} == {1, 2}
    saved = spark.read.text(os.path.join(dlq, "batch=0"))
    assert [r.value for r in saved.collect()] == ["BROKEN {"]


def test_all_clean_writes_nothing(spark, tmp_path):
    src = str(tmp_path / "in" / "data.json")
    _write_lines(src, GOOD)
    dlq = str(tmp_path / "dlq2")
    clean = quarantine_batch(spark, src, SCHEMA, dlq, batch_id=0)
    assert clean.count() == 2
    assert not os.path.isdir(os.path.join(dlq, "batch=0"))
