"""Sinks (partitioned write, compaction, Hudi gate) and job config (A13)."""

from __future__ import annotations

import glob
import os

import pytest

from aws_glue_streaming_etl_with_apache_hudi_spark.config import PipelineConfig, resolve_options
from aws_glue_streaming_etl_with_apache_hudi_spark.sources import readers as R
from aws_glue_streaming_etl_with_apache_hudi_spark.sources.sinks import (
    compact_partitions,
    hudi_available,
    write_hudi,
    write_partitioned,
)


def test_write_partitioned_layout(spark, sf_dir, tmp_path):
    out = str(tmp_path / "p")
    events = R.load_table(spark, sf_dir, "events")
    write_partitioned(events, out, ["event_type"])
    assert os.path.isdir(os.path.join(out, "event_type=click"))
    assert spark.read.parquet(out).count() == events.count()


def test_compaction_reduces_files(spark, sf_dir, tmp_path):
    out = str(tmp_path / "c")
    events = R.load_table(spark, sf_dir, "events").repartition(16)
    write_partitioned(events, out, ["event_type"])
    before = len(glob.glob(os.path.join(out, "*", "*.parquet")))
    n_before = spark.read.parquet(out).count()
    compact_partitions(spark, out, ["event_type"], target_file_bytes=256 * 1024 * 1024)
    after = len(glob.glob(os.path.join(out, "*", "*.parquet")))
    assert after < before
    assert spark.read.parquet(out).count() == n_before


def test_hudi_gate(spark, sf_dir):
    """The bench image has no Hudi jars: the gate must report that and
    write_hudi must refuse cleanly (the pure-Spark UpsertTable is the
    primary path)."""
    events = R.load_table(spark, sf_dir, "events")
    if hudi_available(spark):
        pytest.skip("hudi present in this environment")
    with pytest.raises(RuntimeError, match="UpsertTable"):
        write_hudi(events, "/tmp/never", "t", "user_id", "ts", ["event_type"])


def test_resolve_options_reference_shape():
    argv = ["job.py", "--table_path", "/t", "--checkpoint_path", "/c",
            "--window_size", "5 seconds", "--flag"]
    opts = resolve_options(argv, ["table_path", "checkpoint_path"])
    assert opts["table_path"] == "/t" and opts["window_size"] == "5 seconds"
    with pytest.raises(KeyError, match="missing"):
        resolve_options(argv, ["not_there"])


def test_pipeline_config_from_argv():
    cfg = PipelineConfig.from_argv(
        ["--table_path", "/t", "--checkpoint_path", "/c",
         "--partition_fields", "year,month", "--record_key", "user_id"]
    )
    assert cfg.partition_fields == ["year", "month"]
    assert cfg.record_key == "user_id"
    assert cfg.window_size == "10 seconds"  # reference default


def test_table_schema_probe(spark, sf_dir):
    R.register_views(spark, sf_dir, ("region",))
    schema = R.table_schema(spark, "region")
    assert [f.name for f in schema.fields] == ["r_regionkey", "r_name"]


def test_write_sized_bounds_records_per_file(spark, sf_dir, tmp_path):
    from aws_glue_streaming_etl_with_apache_hudi_spark.sources.readers import load_table
    from aws_glue_streaming_etl_with_apache_hudi_spark.sources.sinks import write_sized

    orders = load_table(spark, sf_dir, "orders").coalesce(1)
    out = str(tmp_path / "sized")
    write_sized(orders, out, [], target_records_per_file=100)
    import glob

    files = glob.glob(out + "/*.parquet")
    n = orders.count()
    assert len(files) >= n // 100  # rollover happened
    import pyarrow.parquet as pq

    assert max(pq.ParquetFile(f).metadata.num_rows for f in files) <= 100
    assert spark.read.parquet(out).count() == n


def test_run_pipeline_help_prints_usage(tmp_path):
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "/root/repo/run_pipeline.py", "--help"],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 0
    assert "Required: --source_dir" in r.stdout


def test_run_query_cli_list_and_unknown(tmp_path):
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "/root/repo/run_query.py", "--list"],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0 and "q1_pricing_summary" in r.stdout
    r2 = subprocess.run(
        [sys.executable, "/root/repo/run_query.py", "definitely_not_a_query"],
        capture_output=True, text=True, timeout=120,
    )
    assert r2.returncode == 2 and "unknown query" in r2.stdout


def test_table_type_parameter_parses_and_validates():
    """--table_type cow|mor (the reference's hoodie write.table.type job
    parameter; the CFN template exposes the choice the job pins)."""
    import pytest

    from aws_glue_streaming_etl_with_apache_hudi_spark.config import PipelineConfig

    base = ["--table_path", "/t", "--checkpoint_path", "/c"]
    assert PipelineConfig.from_argv(base).table_type == "cow"
    assert PipelineConfig.from_argv(base + ["--table_type", "mor"]).table_type == "mor"
    assert PipelineConfig.from_argv(base + ["--table_type", "MOR"]).table_type == "mor"
    with pytest.raises(ValueError):
        PipelineConfig.from_argv(base + ["--table_type", "iceberg"])
