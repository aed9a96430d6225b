"""Regression tests for the round-1/round-2 ADVICE defects:

1. locking.py stale-lock break TOCTOU — breaking must never delete a
   FRESH lock, and release must never delete a lock it no longer owns.
2. timeline.py time travel below the clean horizon must raise, not
   silently return partial data.
3. upsert.py global-index touched-partition handling must survive a mix
   of None and str partition values (sorted() used to TypeError).
4. upsert.py read_key must probe the RIGHT record-index bucket for
   null/boolean key parts (the driver-side md5 replica used to diverge
   from concat_ws semantics).
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import Row

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.locking import CommitLock, CommitLockTimeout
from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import TimelineTable
from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import UpsertTable


# -- 1. locking -------------------------------------------------------------


def test_stale_lock_is_broken_and_reacquired(tmp_path):
    path = str(tmp_path)
    stale = CommitLock(path, ttl_s=0.05)
    assert stale._try_acquire()
    time.sleep(0.1)
    with CommitLock(path, timeout_s=2.0, ttl_s=0.05) as lk:
        assert os.path.exists(lk.lock_path)
    assert not os.path.exists(stale.lock_path)


def test_fresh_lock_never_broken(tmp_path):
    path = str(tmp_path)
    holder = CommitLock(path, ttl_s=3600.0)
    assert holder._try_acquire()
    waiter = CommitLock(path, timeout_s=0.3, ttl_s=3600.0)
    with pytest.raises(CommitLockTimeout):
        waiter.__enter__()
    # the holder's lock survived the waiter's staleness checks
    assert holder._owns_lock_on_disk()
    holder.__exit__(None, None, None)
    assert not os.path.exists(holder.lock_path)


def test_release_does_not_delete_successors_lock(tmp_path):
    """A writer whose lock was broken (it overran the TTL) must not evict
    the successor that acquired after the break — the second half of the
    round-1 TOCTOU."""
    path = str(tmp_path)
    overrunner = CommitLock(path, ttl_s=3600.0)
    assert overrunner._try_acquire()
    # simulate: overrunner's lock was broken as stale, successor acquired
    os.remove(overrunner.lock_path)
    successor = CommitLock(path, ttl_s=3600.0)
    assert successor._try_acquire()
    # overrunner finishes its (over-long) commit and releases
    overrunner.__exit__(None, None, None)
    # successor still holds the lock — identity check prevented the delete
    assert successor._owns_lock_on_disk()
    successor.__exit__(None, None, None)


def test_break_is_rename_based_not_delete(tmp_path):
    """Two waiters both observing staleness: only one can win the rename;
    the loser's break is a no-op (no queued delete of a path that may
    by then hold a fresh lock)."""
    path = str(tmp_path)
    stale = CommitLock(path, ttl_s=0.0)
    assert stale._try_acquire()
    w1 = CommitLock(path, ttl_s=0.0)
    w2 = CommitLock(path, ttl_s=0.0)
    w1._break_if_stale()
    # lock gone; second breaker must tolerate the missing file
    w2._break_if_stale()
    assert not os.path.exists(stale.lock_path)


# -- 2. timeline clean horizon ----------------------------------------------


def _rows(spark, data):
    return spark.createDataFrame(
        [Row(k=k, part=p, v=v, ver=ver) for (k, p, v, ver) in data]
    )


def test_time_travel_below_clean_horizon_raises(spark, tmp_path):
    t = TimelineTable(
        spark=spark,
        path=str(tmp_path / "tl"),
        keys=["k"],
        precombine="ver",
        partition_by=["part"],
    )
    t.upsert(_rows(spark, [(1, "a", "x", 1)]))          # c1
    t.upsert(_rows(spark, [(1, "a", "x2", 2)]))          # c2
    t.upsert(_rows(spark, [(1, "a", "x3", 3)]))          # c3
    t.upsert(_rows(spark, [(1, "a", "x4", 4)]))          # c4
    removed = t.clean(keep_last=2)
    assert removed["deltas"], "clean should have vacuumed old deltas"
    horizon = t.clean_horizon()
    assert horizon == 3

    with pytest.raises(ValueError, match="clean horizon"):
        t.read(as_of=1)
    with pytest.raises(ValueError, match="clean horizon"):
        t.incremental(0, 2)
    with pytest.raises(ValueError, match="clean horizon"):
        t.rollback(1)
    # at/above the horizon still works
    assert {r.v for r in t.read(as_of=3).collect()} == {"x3"}
    assert {r.v for r in t.read().collect()} == {"x4"}
    # horizon marker must not pollute the instant list
    assert [c["commit"] for c in t.commits()] == [1, 2, 3, 4]


def test_clean_horizon_only_advances(spark, tmp_path):
    t = TimelineTable(
        spark=spark,
        path=str(tmp_path / "tl2"),
        keys=["k"],
        precombine="ver",
        partition_by=["part"],
    )
    for i in range(1, 6):
        t.upsert(_rows(spark, [(1, "a", f"v{i}", i)]))
    t.clean(keep_last=2)
    h1 = t.clean_horizon()
    t.clean(keep_last=4)  # looser retention must not move the floor back
    assert t.clean_horizon() == h1


# -- 3. None-safe touched-partition handling --------------------------------


def test_global_index_merge_with_null_partition_values(spark, tmp_path):
    t = UpsertTable(
        spark=spark,
        path=str(tmp_path / "nullpart"),
        keys=["k"],
        precombine="ver",
        partition_by=["part"],
        global_index=True,
    )
    t.upsert(
        spark.createDataFrame(
            [Row(k=1, part=None, v="x", ver=1), Row(k=2, part="b", v="y", ver=1)]
        )
    )
    # key 1 migrates null -> "c"; touched mixes None with str (used to
    # TypeError inside sorted())
    t.upsert(spark.createDataFrame([Row(k=1, part="c", v="x2", ver=2)]))
    state = {r.k: r.part for r in t.read().collect()}
    assert state == {1: "c", 2: "b"}


# -- 4. RLI bucket parity for null/bool key parts ----------------------------


def test_read_key_with_bool_and_null_key_parts(spark, tmp_path):
    t = UpsertTable(
        spark=spark,
        path=str(tmp_path / "rlikeys"),
        keys=["k1", "k2"],
        precombine="ver",
        partition_by=["part"],
        global_index=True,
        record_index=True,
        rli_buckets=16,
    )
    df = spark.createDataFrame(
        [
            Row(k1=True, k2="x", part="a", v=1, ver=1),
            Row(k1=False, k2=None, part="b", v=2, ver=1),
            Row(k1=None, k2="z", part="c", v=3, ver=1),
        ]
    )
    t.upsert(df)
    # boolean part: Spark renders 'true', Python str() renders 'True' —
    # the old driver-side replica hashed the wrong string
    assert [r.v for r in t.read_key((True, "x")).collect()] == [1]
    # null part: concat_ws DROPS nulls; the replica inserted "" + separator
    assert [r.v for r in t.read_key((False, None)).collect()] == [2]
    assert [r.v for r in t.read_key((None, "z")).collect()] == [3]
    # absent key still resolves to empty, not an error
    assert t.read_key((True, "nope")).count() == 0
