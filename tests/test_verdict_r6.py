"""Round-6 VERDICT regressions (VERDICT r5 "Next round" tasks 3 and 6).

Task 3: the near-dup gate's replay safety rests on its id column being
the upsert record key — a mismatch must fail BEFORE the stream starts.
Task 6: the ts-nanos source probe must log why it skipped instead of
swallowing every exception silently.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import run_pipeline


class _PipeStub:
    """Records construction; never touches Spark streaming."""

    instances: list["_PipeStub"] = []

    def __init__(self, *a, **kw):
        self.kwargs = kw
        _PipeStub.instances.append(self)

    def run_available(self):
        return None

    def start(self):
        class _Query:
            def awaitTermination(self):
                return None

        return _Query()


@pytest.fixture(autouse=True)
def _stub_pipeline(monkeypatch):
    _PipeStub.instances = []
    monkeypatch.setattr(run_pipeline, "StreamingUpsertPipeline", _PipeStub)
    yield


def _events_src(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(
        [(1, "login", 10, "hello world text")],
        "user_id long, event_type string, ts long, text string",
    ).coalesce(1).write.mode("append").parquet(src)
    return src


def _argv(src, tmp_path, *extra):
    return [
        "--source_dir", src,
        "--table_path", str(tmp_path / "tbl"),
        "--checkpoint_path", str(tmp_path / "ckpt"),
        "--record_key", "user_id",
        "--precombine", "ts",
        *extra,
    ]


def test_dedup_gate_key_mismatch_raises_before_stream(spark, tmp_path):
    """--dedup_id_field != --record_key must raise at startup: a crash
    replay through a mismatched gate inserts duplicate table rows that
    the gate then vouches for forever (VERDICT r5 task 3)."""
    with pytest.raises(ValueError, match="replay safety"):
        run_pipeline.main(
            _argv(
                _events_src(spark, tmp_path),
                tmp_path,
                "--dedup_index_dir", str(tmp_path / "idx"),
                "--dedup_id_field", "doc_id",
            )
        )
    assert _PipeStub.instances == []  # failed before the pipeline existed


def test_dedup_gate_key_mismatch_explicit_override(spark, tmp_path):
    """--dedup_allow_key_mismatch true acknowledges an independently
    unique id column and lets the pipeline start."""
    run_pipeline.main(
        _argv(
            _events_src(spark, tmp_path),
            tmp_path,
            "--dedup_index_dir", str(tmp_path / "idx"),
            "--dedup_id_field", "doc_id",
            "--dedup_allow_key_mismatch", "true",
            "--once", "false",
        )
    )
    assert len(_PipeStub.instances) == 1


def test_dedup_gate_matching_key_passes(spark, tmp_path):
    run_pipeline.main(
        _argv(
            _events_src(spark, tmp_path),
            tmp_path,
            "--dedup_index_dir", str(tmp_path / "idx"),
            "--once", "false",
        )
    )
    (pipe,) = _PipeStub.instances
    assert pipe.kwargs["post_commit"] is not None  # gate wired post-commit


def test_malformed_source_probe_logs_skip(spark, tmp_path, capsys):
    """A garbage .parquet in the source dir must produce a diagnosable
    log line from the ts-nanos probe, not a silent pass (task 6)."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(os.path.join(src, "junk.parquet"), "wb") as f:
        f.write(b"this is not a parquet file")

    run_pipeline.main(_argv(src, tmp_path, "--once", "false"))
    err = capsys.readouterr().err
    assert "ts-nanos probe skipped" in err
    assert len(_PipeStub.instances) == 1  # declared-schema fallback proceeds


def test_missing_ts_field_probe_logs_skip(spark, tmp_path, capsys):
    """A well-formed parquet without a `ts` field takes the KeyError
    branch and logs it."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame([(1, "a")], "user_id long, event_type string") \
        .coalesce(1).write.mode("append").parquet(src)
    # the fixture writer adds _SUCCESS etc.; the probe globs *.parquet
    run_pipeline.main(_argv(src, tmp_path, "--once", "false"))
    err = capsys.readouterr().err
    assert "ts-nanos probe skipped" in err and "KeyError" in err
