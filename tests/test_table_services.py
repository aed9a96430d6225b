"""Table services: clustering rewrite on UpsertTable and the optimistic
commit lock (operators/locking.py + TimelineTable.lock_commits)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.locking import CommitLock, CommitLockTimeout
from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import TimelineTable
from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import UpsertTable


def test_cluster_rewrites_layout_preserves_state(spark, tmp_path):
    t = UpsertTable(
        spark=spark,
        path=str(tmp_path / "cl"),
        keys=["k"],
        precombine="ver",
        partition_by=["part"],
        stats_columns=["x"],
    )
    rows = [
        Row(k=i, part="ab"[i % 2], x=(i * 37) % 100, y=(i * 91) % 100, ver=1)
        for i in range(400)
    ]
    t.upsert(spark.createDataFrame(rows))
    before = {(r.k): (r.part, r.x, r.y) for r in t.read().collect()}

    t.cluster(["x", "y"], n_files=4)

    after = {(r.k): (r.part, r.x, r.y) for r in t.read().collect()}
    assert after == before  # content invariant
    # layout actually changed: multiple files per partition, each covering
    # a narrow x-range (Z-order tightens per-file min/max spans)
    import glob

    files = glob.glob(os.path.join(t.path, "part=a", "*.parquet"))
    assert len(files) > 1
    spans = (
        t.read()
        .withColumn("_file", F.input_file_name())
        .groupBy("_file")
        .agg((F.max("x") - F.min("x")).alias("span"))
        .collect()
    )
    assert min(r.span for r in spans) < 99  # some file is range-tight
    # stats index survived (per-partition min/max unchanged by reorder)
    skipped = {r.k for r in t.read_skipping("x", 0, 10).collect()}
    assert skipped == {k for k, (_p, x, _y) in before.items() if x <= 10}


def test_commit_lock_mutual_exclusion(tmp_path):
    path = str(tmp_path / "tbl")
    with CommitLock(path, timeout_s=0.3, poll_s=0.05):
        with pytest.raises(CommitLockTimeout):
            with CommitLock(path, timeout_s=0.3, poll_s=0.05):
                pass
    # released -> acquirable again
    with CommitLock(path, timeout_s=0.3):
        assert os.path.exists(os.path.join(path, "_commit.lock"))
    assert not os.path.exists(os.path.join(path, "_commit.lock"))


def test_stale_lock_broken_by_ttl(tmp_path):
    path = str(tmp_path / "tbl2")
    os.makedirs(path)
    lock_file = os.path.join(path, "_commit.lock")
    with open(lock_file, "w") as f:
        f.write("dead-writer")
    old = os.path.getmtime(lock_file) - 10_000
    os.utime(lock_file, (old, old))
    with CommitLock(path, timeout_s=2.0, ttl_s=3600.0):  # 10ks-old lock broken
        pass


def test_concurrent_writers_no_lost_commits(spark, tmp_path):
    """Two writers upserting the same timeline table concurrently: the
    commit lock must serialize the read-merge-write sections so every
    commit lands (without it, both writers can read last_commit=N and
    both write instant N+1 — one commit silently lost)."""
    import threading

    t = TimelineTable(
        spark=spark,
        path=str(tmp_path / "mw"),
        keys=["k"],
        precombine="ver",
        lock_commits=True,
    )
    t.upsert(spark.createDataFrame([Row(k=0, v="seed", ver=1)]))
    errors = []

    def writer(offset):
        try:
            for i in range(4):
                t.upsert(
                    spark.createDataFrame(
                        [Row(k=offset + i, v=f"w{offset}-{i}", ver=1)]
                    )
                )
        except Exception as e:  # pragma: no cover - surfaced via assert
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(off,)) for off in (100, 200)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()

    assert not errors
    assert t.last_commit() == 9  # 1 seed + 8 writer commits, none lost
    keys = {r.k for r in t.read().collect()}
    assert keys == {0, *range(100, 104), *range(200, 204)}


def test_timeline_commits_under_lock(spark, tmp_path):
    t = TimelineTable(
        spark=spark,
        path=str(tmp_path / "tl"),
        keys=["k"],
        precombine="ver",
        lock_commits=True,
    )
    t.upsert(spark.createDataFrame([Row(k=1, v="a", ver=1)]))
    t.upsert(spark.createDataFrame([Row(k=1, v="b", ver=2)]))
    assert {r.v for r in t.read().collect()} == {"b"}
    # lock is not left behind
    assert not os.path.exists(os.path.join(t.path, "_commit.lock"))
