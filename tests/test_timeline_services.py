"""Timeline table services: rollback (savepoint/restore) and the
cleaner (bounded history retention) — operators/timeline.py."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import TimelineTable


def _rows(spark, data):
    return spark.createDataFrame(
        [Row(k=k, part=p, v=v, ver=ver) for (k, p, v, ver) in data]
    )


@pytest.fixture
def table(spark, tmp_path):
    return TimelineTable(
        spark=spark,
        path=str(tmp_path / "svc"),
        keys=["k"],
        precombine="ver",
        partition_by=["part"],
    )


def _state(t, **kw):
    return {r.k: (r.part, r.v, r.ver) for r in t.read(**kw).collect()}


def test_rollback_restores_previous_state(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)]))
    table.upsert(_rows(spark, [(1, "a", "x2", 2)]))
    table.upsert(_rows(spark, [(3, "c", "z", 1)]))

    assert table.rollback(to_commit=1) == 2
    assert table.last_commit() == 1
    assert _state(table) == {1: ("a", "x", 1), 2: ("b", "y", 1)}
    # rolled-back instants are physically gone
    assert not os.path.isdir(table._snapshot_dir(2))
    assert not os.path.isdir(table._delta_dir(3))

    # table keeps working: next commit gets id 2
    assert table.upsert(_rows(spark, [(4, "a", "w", 1)])) == 2
    assert _state(table)[4] == ("a", "w", 1)

    with pytest.raises(ValueError):
        table.rollback(0)
    with pytest.raises(ValueError):
        table.rollback(99)


def test_clean_removes_old_deltas_keeps_live_snapshots(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)]))  # c1
    table.upsert(_rows(spark, [(1, "a", "x2", 2)]))                    # c2: a
    table.upsert(_rows(spark, [(1, "a", "x3", 3)]))                    # c3: a
    table.upsert(_rows(spark, [(3, "c", "z", 1)]))                     # c4: c

    removed = table.clean(keep_last=2)  # horizon = c3
    # c1 still owns part=b in every retained as_of -> snapshot kept
    assert 1 not in removed["snapshots"]
    assert os.path.isdir(table._snapshot_dir(1))
    # c2's snapshot of part=a was superseded by c3 before the horizon
    assert removed["snapshots"] == [2]
    assert not os.path.isdir(table._snapshot_dir(2))
    # pre-horizon deltas are gone
    assert removed["deltas"] == [1, 2]

    # current + retained time-travel reads still correct
    assert _state(table) == {
        1: ("a", "x3", 3),
        2: ("b", "y", 1),
        3: ("c", "z", 1),
    }
    assert _state(table, as_of=3) == {1: ("a", "x3", 3), 2: ("b", "y", 1)}
    # incremental within the retained window still works
    inc = {r.k for r in table.incremental(begin=3).collect()}
    assert inc == {3}


def test_clean_noop_when_history_short(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1)]))
    table.upsert(_rows(spark, [(1, "a", "x2", 2)]))
    assert table.clean(keep_last=5) == {"snapshots": [], "deltas": []}
    with pytest.raises(ValueError):
        table.clean(keep_last=0)


def test_compact_collapses_read_plan(table, spark):
    """After compact(), a snapshot read stitches ONE commit's snapshot
    dir; state is unchanged; history still serves time travel; the
    incremental feed sees no phantom records from the compaction."""
    table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)]))   # c1
    table.upsert(_rows(spark, [(1, "a", "x2", 2)]))                     # c2
    table.upsert(_rows(spark, [(3, "c", "z", 1)]))                      # c3
    before = _state(table)

    c = table.compact()                                                 # c4
    assert c == 4
    assert _state(table) == before
    # ownership collapsed: every partition owned by the compaction commit
    files = table.read().inputFiles()
    assert files and all(f"commit={c}" in f for f in files)
    # time travel below the compaction still works (history intact)
    assert _state(table, as_of=2)[1] == ("a", "x2", 2)
    # compaction added no records to the incremental feed
    inc = table.incremental(3, 4)
    assert inc.count() == 0
    # and the table keeps working after compaction
    table.upsert(_rows(spark, [(4, "d", "w", 1)]))
    assert _state(table)[4] == ("d", "w", 1)
    # post-compaction clean can drop all pre-compaction snapshots
    removed = table.clean(keep_last=2)
    assert set(removed["snapshots"]) == {1, 2, 3}


# -- savepoints (Hudi savepoint/restore parity) -----------------------------


def test_savepoint_pins_history_from_clean(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1)]))            # c1
    table.upsert(_rows(spark, [(1, "a", "x2", 2)]))           # c2
    table.upsert(_rows(spark, [(2, "b", "y", 1)]))            # c3
    table.upsert(_rows(spark, [(1, "a", "x4", 4)]))           # c4
    before = _state(table, as_of=2)

    assert table.savepoint(2, name="pre-migration") == 2
    assert [s["name"] for s in table.savepoints()] == ["pre-migration"]

    # aggressive retention: without the savepoint the horizon would be 4
    table.clean(keep_last=1)
    assert table.clean_horizon() <= 2
    # the pinned instant stays fully readable
    assert _state(table, as_of=2) == before


def test_clean_without_savepoint_vacuums_same_history(spark, tmp_path):
    t = TimelineTable(
        spark=spark, path=str(tmp_path / "nosp"), keys=["k"],
        precombine="ver", partition_by=["part"],
    )
    t.upsert(_rows(spark, [(1, "a", "x", 1)]))
    t.upsert(_rows(spark, [(1, "a", "x2", 2)]))
    t.upsert(_rows(spark, [(1, "a", "x3", 3)]))
    t.clean(keep_last=1)
    assert t.clean_horizon() == 3
    with pytest.raises(ValueError):
        t.read(as_of=2)


def test_restore_to_savepoint(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)]))  # c1
    table.upsert(_rows(spark, [(1, "a", "x2", 2)]))                    # c2
    table.savepoint(name="stable")                                     # sp@2
    table.upsert(_rows(spark, [(3, "c", "z", 1)]))                     # c3
    expected = _state(table, as_of=2)

    assert table.restore(2) == 1
    assert table.last_commit() == 2
    assert _state(table) == expected
    # the savepoint survives its own restore
    assert [s["commit"] for s in table.savepoints()] == [2]


def test_restore_blocked_by_later_savepoint(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1)]))   # c1
    table.savepoint(1)
    table.upsert(_rows(spark, [(2, "b", "y", 1)]))   # c2
    table.savepoint(2)

    with pytest.raises(ValueError, match="block restore"):
        table.restore(1)
    with pytest.raises(ValueError, match="block rollback"):
        table.rollback(1)

    table.delete_savepoint(2)
    assert table.restore(1) == 1
    assert _state(table) == {1: ("a", "x", 1)}


def test_savepoint_validation(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1)]))
    with pytest.raises(ValueError, match="unknown instant"):
        table.savepoint(7)
    with pytest.raises(ValueError, match="no savepoint"):
        table.restore(1)
    with pytest.raises(ValueError, match="no savepoint"):
        table.delete_savepoint(1)
    # below the clean horizon -> refuse to promise unservable restores
    table.upsert(_rows(spark, [(1, "a", "x2", 2)]))
    table.upsert(_rows(spark, [(1, "a", "x3", 3)]))
    table.clean(keep_last=1)
    with pytest.raises(ValueError, match="below the clean horizon"):
        table.savepoint(1)


# -- fsck: partial-write reclamation ----------------------------------------


def test_fsck_removes_unreferenced_dirs_only(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1)]))    # c1
    table.upsert(_rows(spark, [(2, "b", "y", 1)]))    # c2
    before = _state(table)

    # simulate a crash between data write and instant save: data dirs for
    # a commit 3 that never reached the timeline, plus a stale tmp file
    orphan_snap = table._snapshot_dir(3)
    orphan_delta = table._delta_dir(3)
    _rows(spark, [(9, "c", "zz", 1)]).write.parquet(orphan_snap)
    _rows(spark, [(9, "c", "zz", 1)]).write.parquet(orphan_delta)
    tmp = os.path.join(table._timeline_dir, "000003.json.tmp")
    with open(tmp, "w") as f:
        f.write("{")

    removed = table.fsck()
    assert sorted(removed["dirs"]) == sorted([orphan_snap, orphan_delta])
    assert removed["tmp_files"] == [tmp]
    assert not os.path.isdir(orphan_snap) and not os.path.exists(tmp)
    # referenced data untouched; next commit proceeds normally with id 3
    assert _state(table) == before
    assert table.upsert(_rows(spark, [(3, "c", "z", 1)])) == 3
    assert _state(table)[3] == ("c", "z", 1)


def test_fsck_noop_on_clean_table(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1)]))
    assert table.fsck() == {"dirs": [], "tmp_files": []}


# -- timeline archival (round 7) ---------------------------------------------


def test_archive_moves_dead_instants_only(table, spark):
    # 6 commits: a touched at 1,3,5; b at 2,4,6
    for i in range(1, 7):
        part = "a" if i % 2 == 1 else "b"
        table.upsert(_rows(spark, [(i, part, f"v{i}", i)]))
    before = _state(table)
    table.clean(keep_last=2)  # horizon = commit 5
    assert table.clean_horizon() == 5

    rep = table.archive_timeline()
    # Liveness mirrors clean() (ADVICE r7 #2): per partition keep every
    # owner > horizon plus the NEWEST owner <= horizon. a: owners 1,3,5
    # -> 5 stays (newest <= 5), 1,3 dead. b: owners 2,4,6 -> 6 stays
    # (> horizon) AND 4 stays (newest <= horizon: read(as_of=5) resolves
    # b through it — the instant the old global-last-owner rule archived,
    # silently dropping b from that valid time-travel read). => {1,2,3}
    assert rep["archived"] == [1, 2, 3]
    assert [c["commit"] for c in table.commits()] == [4, 5, 6]
    assert _state(table) == before
    # retained as_ofs still read — INCLUDING partition b via commit 4
    at5 = _state(table, as_of=5)
    assert at5 != {}
    assert any(p == "b" for (p, _v, _ver) in at5.values())
    import pytest as _pytest

    with _pytest.raises(ValueError, match="clean horizon"):
        table.read(as_of=3)
    # idempotent
    assert table.archive_timeline() == {"archived": []}
    # full history still queryable through the archive
    hist = table.history(include_archived=True)
    assert [r.commit for r in hist.orderBy("commit").collect()] == [1, 2, 3, 4, 5, 6]
    assert table.history().count() == 3
    # new commits keep monotone ids (last_commit from the active tail)
    c7 = table.upsert(_rows(spark, [(7, "a", "v7", 7)]))
    assert c7 == 7


def test_archive_keeps_live_owner_below_horizon(table, spark):
    # partition c is touched ONCE, early; later commits touch only a/b,
    # so c's owning snapshot (and metadata) must survive archival even
    # though it is below the horizon
    table.upsert(_rows(spark, [(1, "c", "keep", 1)]))      # commit 1 owns c
    for i in range(2, 7):
        part = "a" if i % 2 == 0 else "b"
        table.upsert(_rows(spark, [(i, part, f"v{i}", i)]))
    table.clean(keep_last=2)
    assert table.clean_horizon() == 5
    rep = table.archive_timeline()
    assert 1 not in rep["archived"]  # live owner of partition c
    active = [c["commit"] for c in table.commits()]
    assert 1 in active
    got = _state(table)
    assert got[1] == ("c", "keep", 1)


def test_archive_keeps_rename_instants(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1)]))          # 1: owner until 5
    rename_c = table.rename_column("v", "v2")                # 2: mapping
    for i in range(3, 7):
        table.upsert(
            spark.createDataFrame([Row(k=i, part="a", v2=f"v{i}", ver=i)])
        )
    table.clean(keep_last=2)
    assert table.clean_horizon() == 5
    rep = table.archive_timeline()
    assert rename_c not in rep["archived"]  # mapping still consulted
    assert "v2" in table.read().columns


def test_archive_crash_window_dedupes(table, spark):
    import json as _json
    import os as _os

    for i in range(1, 5):
        table.upsert(_rows(spark, [(i, "a" if i % 2 else "b", f"v{i}", i)]))
    table.clean(keep_last=2)
    table.archive_timeline()
    arch = table.archived()
    # simulate the crash window: an archived instant's active file was
    # never deleted -> re-archive appends nothing new, readers dedupe
    ghost = arch[0]
    path = _os.path.join(table._timeline_dir, f"{ghost['commit']:06d}.json")
    with open(path, "w") as f:
        _json.dump(ghost, f)
    rep = table.archive_timeline()
    assert ghost["commit"] in rep["archived"]  # file re-swept
    assert not _os.path.exists(path)
    assert [a["commit"] for a in table.archived()] == [a["commit"] for a in arch]
    assert table.history(include_archived=True).count() == 4


# -- CDC before images (round 7) ---------------------------------------------


def test_changes_images_carry_before_values(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)]))   # c1
    table.upsert(_rows(spark, [(1, "a", "x2", 2), (3, "a", "z", 1)]))  # c2
    table.delete(spark.createDataFrame([Row(k=2, part="b", ver=3)]))   # c3

    feed = {r.k: r for r in table.changes_images(begin=1).collect()}
    assert feed[1]._change_type == "update"
    assert feed[1].v == "x2" and feed[1].before_v == "x"
    assert feed[3]._change_type == "insert"
    assert feed[3].before_v is None
    assert feed[2]._change_type == "delete"
    assert feed[2].before_v == "y"  # the erased value rides the tombstone

    # begin=0: everything is an insert/delete with null before images
    full = {r.k: r for r in table.changes_images(begin=0).collect()}
    assert full[3]._change_type == "insert" and full[3].before_v is None
