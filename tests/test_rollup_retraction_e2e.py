"""Streamed delete-aware IVM end to end (VERDICT r11 task 6): the
`_hoodie_is_deleted` soft-delete marker (operators/timeline.py — Hudi's
public per-record delete field, the only delete channel a foreachBatch
stream has), mixed insert+update+delete micro-batches feeding a
RollupMVStore from the post_commit hook, and the crash/replay legs —
crash BETWEEN upsert and fold, replayed batches, stale deletes.

Exactness oracle throughout: the rollup state must equal a full
re-aggregation of the table's live snapshot after EVERY fold.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.rollupmv import RollupMVStore
from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import TimelineTable
from aws_glue_streaming_etl_with_apache_hudi_spark.streaming.pipeline import StreamingUpsertPipeline

SCHEMA = "user_id long, event_id long, grp string, ts timestamp, value double, _hoodie_is_deleted boolean"


def _batch(spark, rows):
    # rows: (user_id, event_id, grp, ts_sec, value, deleted)
    return spark.createDataFrame(
        [
            (u, e, g, f"2024-01-01 00:00:{s:02d}", v, d)
            for u, e, g, s, v, d in rows
        ],
        "user_id long, event_id long, grp string, ts string, value double, "
        "_hoodie_is_deleted boolean",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _recompute(tbl):
    return {
        (r.grp): (r.n, round(r.s, 2))
        for r in tbl.read()
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("s"),
        )
        .collect()
    }


def _state(store):
    return {
        r.grp: (r.n_rows, round(r.total_value, 2)) for r in store.counts().collect()
    }


def test_soft_delete_marker_single_commit(spark, tmp_path):
    """A mixed batch (upserts + marker-true tombstones) lands as ONE
    commit; tombstone winners vanish from the snapshot."""
    tbl = TimelineTable(spark, str(tmp_path / "t"), keys=["user_id"], precombine="ts")
    tbl.upsert(_batch(spark, [
        (1, 10, "a", 1, 5.0, False),
        (2, 11, "a", 1, 7.0, False),
        (3, 12, "b", 1, 9.0, False),
    ]))
    before = tbl.last_commit()
    tbl.upsert(_batch(spark, [
        (4, 13, "b", 2, 3.0, False),   # insert
        (1, 14, "a", 2, 6.0, False),   # update
        (2, 15, "a", 2, 0.0, True),    # delete (marker)
    ]))
    assert tbl.last_commit() == before + 1  # one mixed commit, not two
    live = {r.user_id: (r.grp, r.value) for r in tbl.read().collect()}
    assert live == {1: ("a", 6.0), 3: ("b", 9.0), 4: ("b", 3.0)}


def test_stale_soft_delete_loses_precombine(spark, tmp_path):
    """A marker-true row with an OLDER precombine value than the stored
    row deletes nothing (Hudi tombstone ordering — replay order cannot
    corrupt state)."""
    tbl = TimelineTable(spark, str(tmp_path / "t"), keys=["user_id"], precombine="ts")
    tbl.upsert(_batch(spark, [(1, 10, "a", 30, 5.0, False)]))
    tbl.upsert(_batch(spark, [(1, 11, "a", 10, 0.0, True)]))  # stale tombstone
    assert [r.user_id for r in tbl.read().collect()] == [1]


def test_marker_false_and_absent_are_plain_upserts(spark, tmp_path):
    tbl = TimelineTable(spark, str(tmp_path / "t"), keys=["user_id"], precombine="ts")
    tbl.upsert(_batch(spark, [(1, 10, "a", 1, 5.0, False)]))
    # marker column entirely absent — the pre-r12 batch shape
    tbl.upsert(
        _batch(spark, [(2, 11, "b", 1, 2.0, False)]).drop("_hoodie_is_deleted")
    )
    assert sorted(r.user_id for r in tbl.read().collect()) == [1, 2]


def test_fold_exact_after_every_mixed_commit(spark, tmp_path):
    """Insert -> update-across-groups -> delete commits; after each
    fold the retraction-maintained state equals full recompute."""
    tbl = TimelineTable(spark, str(tmp_path / "t"), keys=["user_id"], precombine="ts")
    store = RollupMVStore(spark, str(tmp_path / "mv"), "grp", "value")
    batches = [
        [(1, 10, "a", 1, 5.0, False), (2, 11, "a", 1, 7.25, False),
         (3, 12, "b", 1, 9.0, False)],
        # user 1 moves a->b with a new value; user 4 inserts
        [(1, 13, "b", 2, 6.5, False), (4, 14, "a", 2, 3.0, False)],
        # mixed: user 2 deleted, user 5 inserted, user 3 updated in place
        [(2, 15, "a", 3, 0.0, True), (5, 16, "b", 3, 1.75, False),
         (3, 17, "b", 3, 8.0, False)],
        # delete the whole remaining "a" group
        [(4, 18, "a", 4, 0.0, True)],
    ]
    for rows in batches:
        tbl.upsert(_batch(spark, rows))
        store.fold_through(tbl)
        assert _state(store) == _recompute(tbl)
    # emptied group dropped from the live view
    assert "a" not in _state(store)


def test_crash_between_upsert_and_fold_replay_converges(spark, tmp_path):
    """The pipeline's crash window: batch upserted, crash BEFORE
    post_commit folds. The streaming replay re-delivers the batch — the
    re-upsert is a no-op by precombine, and the fold then catches up
    through BOTH commits in one pass. State must equal recompute, and a
    second fold (the replayed hook itself) is a structural no-op."""
    tbl = TimelineTable(spark, str(tmp_path / "t"), keys=["user_id"], precombine="ts")
    store = RollupMVStore(spark, str(tmp_path / "mv"), "grp", "value")
    tbl.upsert(_batch(spark, [(1, 10, "a", 1, 5.0, False), (2, 11, "b", 1, 7.0, False)]))
    store.fold_through(tbl)
    # -- crash leg: commit lands (mixed upsert+delete), fold never runs
    crashed = _batch(spark, [(1, 12, "a", 2, 6.0, False), (2, 13, "b", 2, 0.0, True)])
    tbl.upsert(crashed)
    # -- replay: the SAME batch re-delivered by the checkpoint
    tbl.upsert(crashed)
    store.fold_through(tbl)  # the replayed hook's fold
    assert _state(store) == _recompute(tbl) == {"a": (1, 6.0)}
    wm = store.folded_through()
    assert store.fold_through(tbl) == wm  # idempotent at the watermark


def test_streamed_pipeline_mixed_batches_e2e(spark, tmp_path):
    """Full A1->A12 composition: three micro-batch files (the last one
    mixed upsert+delete) through StreamingUpsertPipeline with the fold
    in post_commit; final state exact, replay fold a no-op."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    batches = [
        [(1, 10, "a", 1, 5.0, False), (2, 11, "a", 1, 7.0, False),
         (3, 12, "b", 1, 9.0, False)],
        [(1, 13, "b", 2, 6.0, False), (4, 14, "a", 2, 3.0, False)],
        [(3, 15, "b", 3, 0.0, True), (5, 16, "b", 3, 2.5, False)],
    ]
    for i, rows in enumerate(batches):
        stage = str(tmp_path / f"stage_{i}")
        _batch(spark, rows).coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(src, f"batch_{i}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    tbl = TimelineTable(spark, str(tmp_path / "t"), keys=["user_id"], precombine="ts")
    store = RollupMVStore(spark, str(tmp_path / "mv"), "grp", "value")
    pipe = StreamingUpsertPipeline(
        spark,
        source_dir=src,
        schema=_batch(spark, batches[0][:1]).schema,
        table=tbl,
        checkpoint=str(tmp_path / "ckpt"),
        post_commit=lambda _df: store.fold_through(tbl),
    )
    pipe.run_available()
    assert tbl.last_commit() == 3  # one commit per micro-batch file
    assert _state(store) == _recompute(tbl) == {
        "a": (2, 10.0),            # users 2 and 4
        "b": (2, 8.5),             # users 1 (moved) and 5; user 3 deleted
    }
    wm = store.folded_through()
    assert store.fold_through(tbl) == wm
    # restart the drained stream: checkpoint replays nothing new
    pipe2 = StreamingUpsertPipeline(
        spark,
        source_dir=src,
        schema=_batch(spark, batches[0][:1]).schema,
        table=tbl,
        checkpoint=str(tmp_path / "ckpt"),
        post_commit=lambda _df: store.fold_through(tbl),
    )
    pipe2.run_available()
    assert tbl.last_commit() == 3
    assert _state(store) == _recompute(tbl)


def test_soft_delete_marker_partitioned_table(spark, tmp_path):
    """Partitioned TimelineTable: identity = partition path + key (Hudi
    delete records carry their partition path), so a tombstone deletes
    the row in ITS partition and leaves a same-key row in another
    partition alone."""
    tbl = TimelineTable(
        spark, str(tmp_path / "t"), keys=["user_id"], precombine="ts",
        partition_by=["grp"],
    )
    tbl.upsert(_batch(spark, [
        (1, 10, "a", 1, 5.0, False),
        (1, 11, "b", 1, 6.0, False),   # same key, different partition
        (2, 12, "a", 1, 7.0, False),
    ]))
    tbl.upsert(_batch(spark, [
        (1, 13, "a", 2, 0.0, True),    # delete key 1 in partition a ONLY
        (2, 14, "a", 2, 7.5, False),
    ]))
    live = sorted((r.user_id, r.grp, r.value) for r in tbl.read().collect())
    assert live == [(1, "b", 6.0), (2, "a", 7.5)]
