"""Commit timeline: time travel, incremental pull, CDC feed, file-group
reuse (operators/timeline.py — Hudi's timeline query types over the COW
upsert table; COW merge semantics themselves are test_upsert.py)."""

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
        path=str(tmp_path / "tl"),
        keys=["k"],
        precombine="ver",
        partition_by=["part"],
    )


def _state(df):
    return {r.k: (r.part, r.v, r.ver) for r in df.collect()}


def test_snapshot_and_time_travel(table, spark):
    c1 = table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)]))
    c2 = table.upsert(_rows(spark, [(1, "a", "x2", 2), (3, "a", "z", 1)]))
    c3 = table.upsert(_rows(spark, [(2, "b", "OLD", 0)]))  # stale: loses merge

    assert (c1, c2, c3) == (1, 2, 3)
    # latest snapshot
    assert _state(table.read()) == {
        1: ("a", "x2", 2),
        2: ("b", "y", 1),
        3: ("a", "z", 1),
    }
    # travel to each instant
    assert _state(table.read(as_of=1)) == {1: ("a", "x", 1), 2: ("b", "y", 1)}
    assert _state(table.read(as_of=2)) == {
        1: ("a", "x2", 2),
        2: ("b", "y", 1),
        3: ("a", "z", 1),
    }
    with pytest.raises(ValueError):
        table.read(as_of=0)


def test_untouched_partition_not_rewritten(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)]))
    table.upsert(_rows(spark, [(1, "a", "x2", 2)]))  # touches only part=a

    # commit 2's snapshot holds ONLY partition a; b is still owned by c1
    c2_parts = os.listdir(table._snapshot_dir(2))
    assert any(d == "part=a" for d in c2_parts)
    assert not any(d == "part=b" for d in c2_parts)
    assert _state(table.read()) == {1: ("a", "x2", 2), 2: ("b", "y", 1)}


def test_incremental_and_cdc(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)]))
    table.upsert(_rows(spark, [(1, "a", "x2", 2), (3, "a", "z", 1)]))
    table.upsert(_rows(spark, [(3, "a", "z2", 2)]))

    inc = table.incremental(begin=1)  # commits 2..3
    got = {(r.k): (r.v, r.ver, r._commit_id) for r in inc.collect()}
    # key 3 upserted in both commits -> latest (commit 3) state wins
    assert got == {1: ("x2", 2, 2), 3: ("z2", 2, 3)}

    cdc = table.changes(begin=1)
    kinds = {r.k: r._change_type for r in cdc.collect()}
    assert kinds == {1: "update", 3: "insert"}

    with pytest.raises(ValueError):
        table.incremental(begin=3)


def test_incremental_scans_only_deltas(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1)]))
    table.upsert(_rows(spark, [(2, "b", "y", 1)]))
    files = table.incremental(begin=1).inputFiles()
    assert files and all("/deltas/" in f for f in files)
    assert not any("/snapshots/" in f for f in files)


def test_schema_evolution_across_commits(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1)]))
    batch2 = spark.createDataFrame([Row(k=2, part="a", v="y", ver=1, extra="E")])
    table.upsert(batch2)

    cur = {r.k: r.asDict().get("extra") for r in table.read().collect()}
    assert cur == {1: None, 2: "E"}
    # time travel predates the column -> old schema (no 'extra')
    assert "extra" not in table.read(as_of=1).columns


def test_timeline_metadata_and_ts_lookup(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1)]))
    table.upsert(_rows(spark, [(1, "a", "x2", 2)]))
    commits = table.commits()
    assert [c["commit"] for c in commits] == [1, 2]
    assert commits[0]["ts"] <= commits[1]["ts"]
    assert table.instant_for_ts(commits[0]["ts"]) == 1
    assert table.instant_for_ts(commits[1]["ts"] + 1) == 2
    assert table.instant_for_ts(commits[0]["ts"] - 1) is None


def test_history(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)]))
    table.upsert(_rows(spark, [(1, "a", "x2", 2)]))
    table.delete(spark.createDataFrame([Row(k=2, part="b", ver=2)]))
    h = {r.commit: (r.operation, r.n_partitions) for r in table.history().collect()}
    assert h == {1: ("upsert", 2), 2: ("upsert", 1), 3: ("delete", 1)}


def test_unpartitioned_table(spark, tmp_path):
    t = TimelineTable(
        spark=spark, path=str(tmp_path / "flat"), keys=["k"], precombine="ver"
    )
    t.upsert(spark.createDataFrame([Row(k=1, v="a", ver=1)]))
    t.upsert(spark.createDataFrame([Row(k=1, v="b", ver=2), Row(k=2, v="c", ver=1)]))
    assert {r.k: r.v for r in t.read().collect()} == {1: "b", 2: "c"}
    assert {r.k: r.v for r in t.read(as_of=1).collect()} == {1: "a"}


def test_catalog_sync(spark, tmp_path):
    t = TimelineTable(
        spark=spark,
        path=str(tmp_path / "cat"),
        keys=["k"],
        precombine="ver",
        table_name="tl_cat",
    )
    t.upsert(spark.createDataFrame([Row(k=1, v="a", ver=1)]))
    assert spark.sql("SELECT v FROM tl_cat").collect()[0].v == "a"


def test_insert_overwrite_replaces_touched_partition_only(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 5), (2, "b", "y", 5)]))
    # replacecommit on partition a: stored row k=1 (ver=5) is DISCARDED,
    # not merged — the stale ver=1 replacement row wins because replace
    # never consults stored state; partition b keeps its owner
    c2 = table.insert_overwrite(_rows(spark, [(3, "a", "new", 1)]))
    assert c2 == 2
    assert _state(table.read()) == {3: ("a", "new", 1), 2: ("b", "y", 5)}
    # time travel below the replace still sees the replaced rows
    assert _state(table.read(as_of=1)) == {1: ("a", "x", 5), 2: ("b", "y", 5)}
    assert table.commits()[-1]["operation"] == "replace"


def test_insert_overwrite_precombines_within_batch(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1)]))
    table.insert_overwrite(
        _rows(spark, [(1, "a", "v1", 1), (1, "a", "v2", 2)])
    )
    assert _state(table.read()) == {1: ("a", "v2", 2)}


def test_insert_overwrite_rollback_restores_replaced_rows(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)]))
    table.insert_overwrite(_rows(spark, [(9, "a", "swap", 1)]))
    table.rollback(to_commit=1)
    assert _state(table.read()) == {1: ("a", "x", 1), 2: ("b", "y", 1)}


def test_insert_overwrite_incremental_shows_new_rows(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1)]))
    c2 = table.insert_overwrite(_rows(spark, [(7, "a", "r", 1)]))
    inc = table.incremental(begin=c2 - 1, end=c2)
    assert {r.k for r in inc.collect()} == {7}


def test_delete_partition_drops_whole_partition(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1), (3, "a", "z", 1)]))
    c2 = table.delete_partition([{"part": "a"}])
    assert c2 == 2
    assert _state(table.read()) == {2: ("b", "y", 1)}
    # time travel below the delete still sees the dropped rows
    assert _state(table.read(as_of=1)) == {
        1: ("a", "x", 1),
        2: ("b", "y", 1),
        3: ("a", "z", 1),
    }
    assert table.commits()[-1]["operation"] == "delete_partition"


def test_delete_partition_rollback_restores(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)]))
    table.delete_partition([{"part": "a"}])
    table.rollback(to_commit=1)
    assert _state(table.read()) == {1: ("a", "x", 1), 2: ("b", "y", 1)}


def test_delete_partition_incremental_sees_no_records(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1)]))
    c2 = table.delete_partition([{"part": "a"}])
    inc = table.incremental(begin=c2 - 1, end=c2)
    assert inc.count() == 0


def test_delete_partition_then_reinsert(table, spark):
    # the partition comes back when a later commit writes into it
    table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)]))
    table.delete_partition([{"part": "a"}])
    table.upsert(_rows(spark, [(9, "a", "back", 1)]))
    assert _state(table.read()) == {9: ("a", "back", 1), 2: ("b", "y", 1)}


def test_delete_partition_multi_and_validation(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1), (3, "c", "z", 1)]))
    table.delete_partition([{"part": "a"}, {"part": "c"}])
    assert _state(table.read()) == {2: ("b", "y", 1)}
    with pytest.raises(ValueError):
        table.delete_partition([{"wrong_col": "a"}])
    with pytest.raises(ValueError):
        table.delete_partition([])


def test_delete_partition_then_compact_keeps_it_empty(table, spark):
    # compaction rewrites live state only; the deleted partition stays
    # owned-with-no-files and must not resurface
    table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)]))
    table.delete_partition([{"part": "a"}])
    table.compact()
    assert _state(table.read()) == {2: ("b", "y", 1)}


def test_delete_partition_survives_clean(table, spark):
    # cleaning history must not resurrect the dropped partition: the
    # pre-delete snapshot that still holds its rows is vacuumed or
    # orphaned, and ownership stays with the (file-less) delete commit
    table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)]))
    table.delete_partition([{"part": "a"}])
    table.upsert(_rows(spark, [(2, "b", "y2", 2)]))
    table.clean(keep_last=1)
    assert _state(table.read()) == {2: ("b", "y2", 2)}


def test_incremental_spanning_delete_partition_commit(table, spark):
    # an incremental pull whose range INCLUDES the delete commit sees
    # only real record changes (the empty delta contributes nothing)
    table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)]))
    table.delete_partition([{"part": "a"}])
    table.upsert(_rows(spark, [(3, "b", "z", 1)]))
    inc = table.incremental(begin=1, end=3)
    assert {r.k for r in inc.collect()} == {3}


def test_delete_partition_requires_partitioned_table(spark, tmp_path):
    t = TimelineTable(
        spark=spark, path=str(tmp_path / "flat"), keys=["k"], precombine="ver"
    )
    t.upsert(spark.createDataFrame([Row(k=1, v="a", ver=1)]))
    with pytest.raises(ValueError):
        t.delete_partition([{"part": "a"}])


def test_rename_column_maps_old_files_forward(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)]))
    c2 = table.rename_column("v", "payload")
    assert c2 == 2
    got = {r.k: r.payload for r in table.read().collect()}
    assert got == {1: "x", 2: "y"}  # old files read THROUGH the mapping
    # new writes use the new name and merge with mapped old rows
    table.upsert(
        spark.createDataFrame([Row(k=1, part="a", payload="x2", ver=2)])
    )
    got = {r.k: r.payload for r in table.read().collect()}
    assert got == {1: "x2", 2: "y"}
    # time travel below the rename still shows the OLD name
    old = table.read(as_of=1)
    assert "v" in old.columns and "payload" not in old.columns


def test_rename_column_incremental_and_rollback(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1)]))
    table.rename_column("v", "payload")
    table.upsert(spark.createDataFrame([Row(k=2, part="a", payload="z", ver=1)]))
    inc = table.incremental(begin=0, end=3)
    assert {r.k: r.payload for r in inc.collect()} == {1: "x", 2: "z"}
    # rollback across the rename restores the old name
    table.rollback(to_commit=1)
    assert "v" in table.read().columns


def test_rename_column_validation(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1)]))
    with pytest.raises(ValueError):
        table.rename_column("k", "key2")  # record key
    with pytest.raises(ValueError):
        table.rename_column("part", "p2")  # partition column
    with pytest.raises(ValueError):
        table.rename_column("ver", "version")  # precombine
    with pytest.raises(ValueError):
        table.rename_column("nope", "x")
    with pytest.raises(ValueError):
        table.rename_column("v", "ver")  # collision


def test_rename_column_unpartitioned_owner(spark, tmp_path):
    # a rename as the LAST instant must not shadow the unpartitioned
    # table's data (metadata-only instants own nothing)
    t_ = TimelineTable(
        spark=spark, path=str(tmp_path / "flat"), keys=["k"], precombine="ver"
    )
    t_.upsert(spark.createDataFrame([Row(k=1, v="a", ver=1)]))
    t_.rename_column("v", "val")
    assert [(r.k, r.val) for r in t_.read().collect()] == [(1, "a")]


def test_rename_column_chained_renames(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1)]))
    table.rename_column("v", "v2")
    table.upsert(spark.createDataFrame([Row(k=2, part="b", v2="y", ver=1)]))
    table.rename_column("v2", "v3")
    got = {r.k: r.v3 for r in table.read().collect()}
    assert got == {1: "x", 2: "y"}  # both generations map to the latest name


def test_drop_column_metadata_only(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)]))
    c2 = table.drop_column("v")
    assert c2 == 2
    cur = table.read()
    assert "v" not in cur.columns
    assert {r.k: r.ver for r in cur.collect()} == {1: 1, 2: 1}
    # time travel below the drop still shows the column
    assert "v" in table.read(as_of=1).columns
    # rollback restores it
    table.rollback(to_commit=1)
    assert "v" in table.read().columns


def test_drop_column_unpartitioned_and_validation(spark, tmp_path):
    t_ = TimelineTable(
        spark=spark, path=str(tmp_path / "flat"), keys=["k"], precombine="ver"
    )
    t_.upsert(spark.createDataFrame([Row(k=1, v="a", extra=7, ver=1)]))
    t_.drop_column("extra")
    got = t_.read()
    assert "extra" not in got.columns
    assert [(r.k, r.v) for r in got.collect()] == [(1, "a")]
    with pytest.raises(ValueError):
        t_.drop_column("k")
    with pytest.raises(ValueError):
        t_.drop_column("ver")
    with pytest.raises(ValueError):
        t_.drop_column("missing")


def test_drop_then_rename_chain(table, spark):
    # mapping ops compose: rename v -> payload, then drop payload
    table.upsert(_rows(spark, [(1, "a", "x", 1)]))
    table.rename_column("v", "payload")
    table.drop_column("payload")
    cur = table.read()
    assert "v" not in cur.columns and "payload" not in cur.columns
    assert {r.k for r in cur.collect()} == {1}


def test_insert_overwrite_table_restates_everything(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 5), (2, "b", "y", 5), (3, "c", "z", 5)]))
    # full-table restatement: only partition a survives, b and c are
    # disowned by the same instant (ownership with no files)
    c2 = table.insert_overwrite_table(_rows(spark, [(9, "a", "only", 1)]))
    assert c2 == 2
    assert _state(table.read()) == {9: ("a", "only", 1)}
    # time travel below the restatement sees the old world
    assert _state(table.read(as_of=1)) == {
        1: ("a", "x", 5), 2: ("b", "y", 5), 3: ("c", "z", 5),
    }
    table.rollback(to_commit=1)
    assert len(_state(table.read())) == 3


def test_insert_overwrite_table_unpartitioned(spark, tmp_path):
    t_ = TimelineTable(
        spark=spark, path=str(tmp_path / "flat"), keys=["k"], precombine="ver"
    )
    t_.upsert(spark.createDataFrame([Row(k=1, v="a", ver=1), Row(k=2, v="b", ver=1)]))
    t_.insert_overwrite_table(spark.createDataFrame([Row(k=7, v="new", ver=1)]))
    assert {r.k: r.v for r in t_.read().collect()} == {7: "new"}


def test_upsert_occ_sequential_equals_upsert(table, spark):
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import CommitConflict  # noqa: F401

    table.upsert_occ(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)]))
    table.upsert_occ(_rows(spark, [(1, "a", "x2", 2), (3, "c", "z", 1)]))
    assert _state(table.read()) == {
        1: ("a", "x2", 2), 2: ("b", "y", 1), 3: ("c", "z", 1),
    }
    assert [c["commit"] for c in table.commits()] == [1, 2]


def test_upsert_occ_disjoint_writers_both_commit(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)]))
    base = table.last_commit()
    # two writers that both started at base=1 touch DISJOINT partitions:
    # X publishes first; Y's validation still passes
    table.upsert_occ(_rows(spark, [(1, "a", "xx", 2)]), base=base)
    table.upsert_occ(_rows(spark, [(2, "b", "yy", 2)]), base=base)
    assert _state(table.read()) == {1: ("a", "xx", 2), 2: ("b", "yy", 2)}


def test_upsert_occ_overlap_conflicts_and_retry_succeeds(table, spark):
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import CommitConflict

    table.upsert(_rows(spark, [(1, "a", "x", 1)]))
    base = table.last_commit()
    table.upsert_occ(_rows(spark, [(1, "a", "won", 2)]), base=base)
    # the slower writer on the SAME partition must NOT silently clobber
    with pytest.raises(CommitConflict):
        table.upsert_occ(_rows(spark, [(9, "a", "lost", 1)]), base=base)
    assert _state(table.read()) == {1: ("a", "won", 2)}
    # retry from a fresh read merges both writers' intents
    table.upsert_occ(_rows(spark, [(9, "a", "retry", 1)]))
    assert _state(table.read()) == {1: ("a", "won", 2), 9: ("a", "retry", 1)}


def test_upsert_occ_conflict_cleans_staging_and_fsck_sweeps_crashes(table, spark):
    import os

    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import CommitConflict

    table.upsert(_rows(spark, [(1, "a", "x", 1)]))
    base = table.last_commit()
    table.upsert_occ(_rows(spark, [(1, "a", "w", 2)]), base=base)
    with pytest.raises(CommitConflict):
        table.upsert_occ(_rows(spark, [(8, "a", "l", 1)]), base=base)
    occ_root = os.path.join(table.path, "_occ_staging")
    assert not os.path.isdir(occ_root) or os.listdir(occ_root) == []
    # a crashed writer's staging (no publish) is swept by fsck
    os.makedirs(os.path.join(occ_root, "deadbeef"), exist_ok=True)
    rep = table.fsck()
    assert any("deadbeef" in d for d in rep["dirs"])


def test_upsert_occ_threaded_disjoint_race(table, spark):
    """Two real threads race the full OCC path on disjoint partitions:
    both must publish (distinct instants), final state merges both."""
    import threading

    table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)]))
    base = table.last_commit()
    errs = []

    def w(part, key, val):
        try:
            table.upsert_occ(
                _rows(spark, [(key, part, val, 2)]), base=base
            )
        except Exception as e:  # pragma: no cover - surfaced below
            errs.append(e)

    t1 = threading.Thread(target=w, args=("a", 1, "xa"))
    t2 = threading.Thread(target=w, args=("b", 2, "yb"))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert errs == []
    assert [c["commit"] for c in table.commits()] == [1, 2, 3]
    assert _state(table.read()) == {1: ("a", "xa", 2), 2: ("b", "yb", 2)}


# -- r10: partition-token render parity (the ADVICE-r9 _part_str class) -----


def test_boolean_partition_merge_keeps_stored_rows(spark, tmp_path):
    """_part_token must render booleans as Spark's cast-to-string does
    ('true', not Python's 'True'): the merge path selects the touched
    partitions' STORED rows via cast("string") == token — a render
    mismatch matched nothing, excluded the stored rows from the merge,
    and the new snapshot silently dropped them."""
    t = TimelineTable(
        spark=spark,
        path=str(tmp_path / "bool_tl"),
        keys=["k"],
        precombine="ver",
        partition_by=["flag"],
    )

    def df(rows):
        return spark.createDataFrame(rows, "k long, flag boolean, ver long, v string")

    t.upsert(df([(1, True, 1, "a"), (2, True, 1, "b"), (3, False, 1, "c")]))
    t.upsert(df([(2, True, 2, "b2")]))  # merge commit into flag=true
    got = {r.k: (r.flag, r.ver, r.v) for r in t.read().collect()}
    assert got == {1: (True, 1, "a"), 2: (True, 2, "b2"), 3: (False, 1, "c")}


def test_fractional_timestamp_partition_merge_keeps_stored_rows(spark, tmp_path):
    """Same law for fractional-second timestamp partitions (str(datetime)
    renders '.500000' where Spark renders '.5')."""
    import datetime

    ts1 = datetime.datetime(2021, 1, 1, 0, 0, 0, 500000)
    ts2 = datetime.datetime(2021, 1, 2, 6, 30, 0)
    t = TimelineTable(
        spark=spark,
        path=str(tmp_path / "ts_tl"),
        keys=["k"],
        precombine="ver",
        partition_by=["day"],
    )

    def df(rows):
        return spark.createDataFrame(rows, "k long, day timestamp, ver long, v string")

    t.upsert(df([(1, ts1, 1, "a"), (2, ts1, 1, "b"), (3, ts2, 1, "c")]))
    t.upsert(df([(2, ts1, 2, "b2")]))
    got = {r.k: (r.ver, r.v) for r in t.read().collect()}
    assert got == {1: (1, "a"), 2: (2, "b2"), 3: (1, "c")}
