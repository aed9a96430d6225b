"""RollupMVStore (operators/rollupmv.py): commit-watermarked retractable
rollup maintenance — state-transition feeds (stale upserts are
no-ops), exactly-once by watermark, crash-safe pointer swap."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.rollupmv import RollupMVStore
from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import TimelineTable

SCHEMA = "user_id long, g string, value double, ts long"


def _tbl(spark, path):
    return TimelineTable(spark, str(path), keys=["user_id"], precombine="ts")


def _counts(store):
    return {
        r.g: (r.n_rows, round(float(r.total_value), 2))
        for r in store.counts().collect()
    }


def test_fold_update_delete_and_replay(spark, tmp_path):
    t = _tbl(spark, tmp_path / "t")
    s = RollupMVStore(spark, str(tmp_path / "mv"), "g", "value")
    t.upsert(spark.createDataFrame(
        [(1, "a", 10.0, 1), (2, "a", 20.0, 1), (3, "b", 5.0, 1)], SCHEMA))
    s.fold_through(t)
    assert _counts(s) == {"a": (2, 30.0), "b": (1, 5.0)}
    # group-moving update + plain update
    t.upsert(spark.createDataFrame([(1, "b", 7.0, 2), (2, "a", 25.0, 2)], SCHEMA))
    s.fold_through(t)
    assert _counts(s) == {"a": (1, 25.0), "b": (2, 12.0)}
    # delete user 3; replay fold must be a no-op
    t.delete(spark.createDataFrame([(3, 9)], "user_id long, ts long"))
    s.fold_through(t)
    s.fold_through(t)  # replay: watermark already at latest
    assert _counts(s) == {"a": (1, 25.0), "b": (1, 7.0)}
    assert s.folded_through() == t.last_commit()


def test_stale_upsert_is_state_neutral(spark, tmp_path):
    """A delta row that LOSES the precombine merge must not perturb the
    rollup (the raw-record feed would retract the winner and add the
    loser — the bug class the state-transition feed exists to prevent)."""
    t = _tbl(spark, tmp_path / "t")
    s = RollupMVStore(spark, str(tmp_path / "mv"), "g", "value")
    t.upsert(spark.createDataFrame([(1, "a", 10.0, 5)], SCHEMA))
    s.fold_through(t)
    t.upsert(spark.createDataFrame([(1, "z", 99.0, 3)], SCHEMA))  # stale: ts 3 < 5
    s.fold_through(t)
    assert _counts(s) == {"a": (1, 10.0)}


def test_emptied_group_drops_and_unseen_delete_noop(spark, tmp_path):
    t = _tbl(spark, tmp_path / "t")
    s = RollupMVStore(spark, str(tmp_path / "mv"), "g", "value")
    t.upsert(spark.createDataFrame([(1, "a", 10.0, 1)], SCHEMA))
    s.fold_through(t)
    t.delete(spark.createDataFrame([(1, 9), (77, 9)], "user_id long, ts long"))
    s.fold_through(t)
    assert _counts(s) == {}


def test_crash_before_pointer_swap_refolds(spark, tmp_path):
    """A crash AFTER the state write but BEFORE the pointer swap leaves
    the watermark unmoved; the next fold redoes the same range onto the
    OLD state — no double counting because the pointer is the commit
    point."""
    t = _tbl(spark, tmp_path / "t")
    s = RollupMVStore(spark, str(tmp_path / "mv"), "g", "value")
    t.upsert(spark.createDataFrame([(1, "a", 10.0, 1)], SCHEMA))
    s.fold_through(t)
    ptr = open(s._pointer).read()
    t.upsert(spark.createDataFrame([(2, "a", 20.0, 2)], SCHEMA))
    s.fold_through(t)
    # simulate the crash: roll the pointer back (state_v2 already written)
    with open(s._pointer, "w") as f:
        f.write(ptr)
    s.fold_through(t)  # refold commit 2 from state_v1
    assert _counts(s) == {"a": (2, 30.0)}


def test_corrupt_pointer_refuses(spark, tmp_path):
    import pytest

    s = RollupMVStore(spark, str(tmp_path / "mv"), "g", "value")
    with open(s._pointer, "w") as f:
        f.write("garbage")
    with pytest.raises(RuntimeError, match="corrupt rollup MV pointer"):
        s.folded_through()
