"""Streaming schema-inference bootstrap (SURVEY.md §2 A1 — the
reference's ``{"inferSchema": "true"}``, glue_job_script.py:42).

``StreamingUpsertPipeline(schema=None)`` infers the stream schema from
the files present at start, pins it for the run, and lets columns that
appear later evolve the table additively (A7) at the next restart —
the reference's per-batch-inference behavior at per-run granularity.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import UpsertTable
from aws_glue_streaming_etl_with_apache_hudi_spark.streaming.pipeline import StreamingUpsertPipeline


def _write_batch(spark, src_dir: str, rows, batch_name: str) -> None:
    """Drop one flat parquet file into the watched directory (file
    streaming sources pick up files, not subdirectories)."""
    import glob
    import shutil

    tmp = os.path.join(src_dir, f"_tmp_{batch_name}")
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "*.parquet"))[0]
    shutil.move(part, os.path.join(src_dir, f"{batch_name}.parquet"))
    shutil.rmtree(tmp)


@pytest.fixture()
def dirs(tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    return {
        "src": src,
        "table": str(tmp_path / "table"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _pipeline(spark, dirs) -> StreamingUpsertPipeline:
    table = UpsertTable(
        spark, dirs["table"], keys=["name"], precombine="date"
    )
    return StreamingUpsertPipeline(
        spark=spark,
        source_dir=dirs["src"],
        schema=None,  # <- bootstrap: no schema declared anywhere
        table=table,
        checkpoint=dirs["ckpt"],
    )


def test_bootstrap_infers_and_upserts(spark, dirs):
    _write_batch(
        spark,
        dirs["src"],
        [Row(name="a", date="2024-01-01", v=1), Row(name="b", date="2024-01-01", v=2)],
        "b1",
    )
    p = _pipeline(spark, dirs)
    p.run_available()
    out = {r["name"]: r.asDict() for r in p.table.read().collect()}
    assert out["a"]["v"] == 1 and out["b"]["v"] == 2


def test_bootstrap_evolves_on_restart(spark, dirs):
    _write_batch(
        spark,
        dirs["src"],
        [Row(name="a", date="2024-01-01", v=1)],
        "b1",
    )
    _pipeline(spark, dirs).run_available()

    # a NEW column appears in later files; a restarted pipeline
    # re-bootstraps, processes only the unseen files (checkpoint), and
    # the upsert evolves the table additively (A7)
    _write_batch(
        spark,
        dirs["src"],
        [Row(name="b", date="2024-01-02", v=2, extra="x")],
        "b2",
    )
    p2 = _pipeline(spark, dirs)
    p2.run_available()
    out = {r["name"]: r.asDict() for r in p2.table.read().collect()}
    assert out["b"]["extra"] == "x"
    assert out["a"]["v"] == 1 and out["a"].get("extra") is None
    # replay safety: running again is a no-op (checkpoint + idempotence)
    _pipeline(spark, dirs).run_available()
    assert p2.table.read().count() == 2


def test_bootstrap_empty_source_raises(spark, dirs):
    p = _pipeline(spark, dirs)
    with pytest.raises(Exception):
        p.run_available()


def test_bootstrap_json_source(spark, dirs, tmp_path):
    import json

    os.makedirs(os.path.join(dirs["src"]), exist_ok=True)
    with open(os.path.join(dirs["src"], "b1.json"), "w") as f:
        f.write(json.dumps({"name": "a", "date": "2024-01-01", "v": 7}) + "\n")
    table = UpsertTable(spark, dirs["table"], keys=["name"], precombine="date")
    p = StreamingUpsertPipeline(
        spark=spark,
        source_dir=dirs["src"],
        schema=None,
        table=table,
        checkpoint=dirs["ckpt"],
        source_format="json",
    )
    p.run_available()
    assert {r["name"]: r["v"] for r in table.read().collect()} == {"a": 7}
