"""Systematic crash-injection sweep across the storage services
(VERDICT r5 task 5).

Every durable-write boundary of UpsertTable / TimelineTable /
MergeOnReadTable / LSHDedupIndex gets a fault injected (monkeypatch
raises at the boundary), and the suite asserts the documented recovery
contract:

  1. CONSISTENT AFTER CRASH — the table reads as if the crashed
     operation never happened (or, for the COW upsert, the streaming
     replay of the same batch converges);
  2. FSCK-RECOVERABLE — the service's fsck() sweeps/promotes the
     partial-write leftovers;
  3. RETRY CONVERGES — re-running the operation cleanly lands the
     intended final state.

The round-4/5 crash-window defects (lock clobber, index overwrite,
replay loss) were each found ad hoc; this suite is the generalization
the r5 verdict asked for. Writing it surfaced a NEW one: MOR restore's
delete-then-rename base swap could lose the base entirely (now an
aside-rename, case ``mor_restore_mid_swap``).
"""

from __future__ import annotations

import os
import shutil
import unittest.mock as mock

import pytest
from pyspark.sql import Row

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.mor import CompactionPolicy, MergeOnReadTable
from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import TimelineTable
from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import UpsertTable


class InjectedCrash(RuntimeError):
    pass


SCHEMA = "k long, p string, ver long, v double"
B1 = [(1, "a", 1, 10.0), (2, "b", 1, 20.0)]
B2 = [(2, "b", 2, 21.0), (3, "a", 1, 30.0)]
AFTER_B2 = sorted([(1, "a", 1, 10.0), (2, "b", 2, 21.0), (3, "a", 1, 30.0)])


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _snap(table):
    return sorted((r.k, r.p, r.ver, r.v) for r in table.read().collect())


def _never():
    return CompactionPolicy(max_delta_commits=None, max_log_bytes=None)


# --------------------------------------------------------------------------
# fault-point runners: build -> crash -> consistent -> fsck -> retry
# --------------------------------------------------------------------------


def tl_upsert_before_instant(spark, path):
    t = TimelineTable(spark, path, keys=["k"], precombine="ver", partition_by=["p"])
    t.upsert(_df(spark, B1))
    before = _snap(t)
    with mock.patch.object(TimelineTable, "_save_instant", side_effect=InjectedCrash):
        with pytest.raises(InjectedCrash):
            t.upsert(_df(spark, B2))
    assert _snap(t) == before  # no instant -> crashed data invisible
    rep = t.fsck()
    assert any("commit=2" in d for d in rep["dirs"])
    t.upsert(_df(spark, B2))
    assert _snap(t) == AFTER_B2
    assert [c["commit"] for c in t.commits()] == [1, 2]


def tl_compact_before_instant(spark, path):
    t = TimelineTable(spark, path, keys=["k"], precombine="ver", partition_by=["p"])
    t.upsert(_df(spark, B1))
    t.upsert(_df(spark, B2))
    with mock.patch.object(TimelineTable, "_save_instant", side_effect=InjectedCrash):
        with pytest.raises(InjectedCrash):
            t.compact()
    assert _snap(t) == AFTER_B2
    rep = t.fsck()
    assert any("commit=3" in d for d in rep["dirs"])
    t.compact()
    assert _snap(t) == AFTER_B2
    assert t.commits()[-1]["operation"] == "replacecommit"


def tl_delete_partition_before_instant(spark, path):
    t = TimelineTable(spark, path, keys=["k"], precombine="ver", partition_by=["p"])
    t.upsert(_df(spark, B1))
    t.upsert(_df(spark, B2))
    with mock.patch.object(TimelineTable, "_save_instant", side_effect=InjectedCrash):
        with pytest.raises(InjectedCrash):
            t.delete_partition([{"p": "a"}])
    assert _snap(t) == AFTER_B2  # no instant -> partition still owned/visible
    rep = t.fsck()
    assert any("commit=3" in d for d in rep["dirs"])  # orphaned empty delta
    t.delete_partition([{"p": "a"}])
    assert _snap(t) == [(2, "b", 2, 21.0)]
    assert [c["commit"] for c in t.commits()] == [1, 2, 3]


def tl_savepoint_before_rename(spark, path):
    t = TimelineTable(spark, path, keys=["k"], precombine="ver", partition_by=["p"])
    t.upsert(_df(spark, B1))
    with mock.patch("os.replace", side_effect=InjectedCrash):
        with pytest.raises(InjectedCrash):
            t.savepoint()
    assert t.savepoints() == []  # half-written savepoint invisible
    rep = t.fsck()
    assert rep["tmp_files"]
    t.savepoint()
    assert [s["commit"] for s in t.savepoints()] == [1]


def tl_clean_after_horizon_before_deletes(spark, path):
    t = TimelineTable(spark, path, keys=["k"], precombine="ver", partition_by=["p"])
    t.upsert(_df(spark, B1))
    t.upsert(_df(spark, B2))
    t.upsert(_df(spark, [(1, "a", 2, 11.0), (2, "b", 3, 22.0)]))
    latest = _snap(t)
    with mock.patch("shutil.rmtree", side_effect=InjectedCrash):
        with pytest.raises(InjectedCrash):
            t.clean(keep_last=1)
    # horizon persisted FIRST: reads below it conservatively refuse,
    # the latest snapshot still serves
    assert _snap(t) == latest
    assert t.clean_horizon() == 3
    with pytest.raises(ValueError):
        t.read(as_of=1)
    removed = t.clean(keep_last=1)  # retry finishes the deletions
    assert removed["deltas"]
    assert _snap(t) == latest


def mor_bootstrap_before_meta(spark, path):
    t = MergeOnReadTable(spark, path, keys=["k"], precombine="ver",
                         partition_by=["p"], policy=_never())
    with mock.patch.object(MergeOnReadTable, "_save_meta", side_effect=InjectedCrash):
        with pytest.raises(InjectedCrash):
            t.upsert(_df(spark, B1))
    assert not t.exists()
    rep = t.fsck()
    assert rep["dirs"]  # orphan base + commit=1 swept
    t.upsert(_df(spark, B1))
    assert _snap(t) == sorted(B1)


def mor_upsert_before_meta(spark, path):
    """r12 contract change (single-writer upsert claims and publishes
    through the NBCC marker path): the COMPLETED marker, not the meta
    save, is the commit point. A crash between publish and the meta
    merge leaves the commit durable and VISIBLE — exactly an NBCC
    publish crash — and the streaming replay of the same batch lands
    in a fresh slot whose rows precombine away."""
    t = MergeOnReadTable(spark, path, keys=["k"], precombine="ver",
                         partition_by=["p"], policy=_never())
    t.upsert(_df(spark, B1))
    with mock.patch.object(MergeOnReadTable, "_save_meta", side_effect=InjectedCrash):
        with pytest.raises(InjectedCrash):
            t.upsert(_df(spark, B2))
    assert _snap(t) == AFTER_B2  # published => durable at the marker
    rep = t.fsck()  # nothing to sweep: the commit is live
    assert not any("commit=2" in d for d in rep["dirs"])
    assert _snap(t) == AFTER_B2
    t.upsert(_df(spark, B2))  # checkpoint replay: converges, no dupes
    assert _snap(t) == AFTER_B2


def mor_upsert_before_publish(spark, path):
    """Crash BEFORE the completed marker (claim + delta dir on disk,
    unpublished): invisible to readers, swept by fsck, retry lands it."""
    t = MergeOnReadTable(spark, path, keys=["k"], precombine="ver",
                         partition_by=["p"], policy=_never())
    t.upsert(_df(spark, B1))
    real_replace = os.replace

    def crash_on_done(src, dst):
        if dst.endswith(".completed"):
            raise InjectedCrash()
        return real_replace(src, dst)

    with mock.patch("aws_glue_streaming_etl_with_apache_hudi_spark.operators.mor.os.replace",
                    side_effect=crash_on_done):
        with pytest.raises(InjectedCrash):
            t.upsert(_df(spark, B2))
    assert _snap(t) == sorted(B1)  # unpublished claim invisible
    rep = t.fsck()
    assert any("commit=2" in d for d in rep["dirs"])
    t.upsert(_df(spark, B2))
    assert _snap(t) == AFTER_B2


def mor_compact_before_meta(spark, path):
    t = MergeOnReadTable(spark, path, keys=["k"], precombine="ver",
                         partition_by=["p"], policy=_never())
    t.upsert(_df(spark, B1))
    t.upsert(_df(spark, B2))
    with mock.patch.object(MergeOnReadTable, "_save_meta", side_effect=InjectedCrash):
        with pytest.raises(InjectedCrash):
            t.compact()
    # base rewritten but compacted_through not advanced: replaying the
    # log onto the already-merged base is idempotent (same max_by winner)
    assert _snap(t) == AFTER_B2
    t.fsck()
    assert _snap(t) == AFTER_B2
    assert t.compact() == 1  # one pending delta (bootstrap self-compacted)
    assert t._compacted_through() == 2
    assert sorted((r.k, r.p, r.ver, r.v) for r in t.read_optimized().collect()) == AFTER_B2


def _mor_rebuild_restore_setup(spark, path):
    t = MergeOnReadTable(spark, path, keys=["k"], precombine="ver",
                         partition_by=["p"], policy=_never())
    t.upsert(_df(spark, B1))
    sp = t.savepoint()
    t.upsert(_df(spark, B2))
    t.compact()  # restore target now below compacted_through -> rebuild path
    return t, sp, _snap(t)


def mor_restore_before_aside_rename(spark, path):
    """Crash at the base->aside rename: the intent marker still says
    phase=begin, so the pre-restore base is authoritative — fsck rolls
    BACK (drops staging + intent) and the retry converges."""
    t, sp, pre_restore = _mor_rebuild_restore_setup(spark, path)

    with mock.patch("os.rename", side_effect=InjectedCrash):
        with pytest.raises(InjectedCrash):
            t.restore(sp)
    rep = t.fsck()
    assert t._restore_intent() is None
    assert not os.path.isdir(t._base + ".restore_tmp")
    assert _snap(t) == pre_restore  # pre-restore read intact
    assert rep["dirs"] or rep["restored"]
    t.restore(sp)  # clean retry
    assert _snap(t) == sorted(B1)


def mor_restore_mid_swap(spark, path):
    """THE r6 finding: crash between base->aside and staged->base
    renames. Either full copy must survive. The intent marker has
    already flipped to phase=swapped here (the flip sits between the
    two renames), so fsck rolls FORWARD: it promotes the staged base
    AND finishes the meta update — no hybrid read, no re-run needed
    (the r6 ADVICE defect was fsck leaving meta stale here)."""
    t, sp, pre_restore = _mor_rebuild_restore_setup(spark, path)

    real_rename = os.rename
    calls = {"n": 0}

    def flaky(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:  # after base->aside, before staged->base
            raise InjectedCrash()
        return real_rename(src, dst)

    with mock.patch("os.rename", side_effect=flaky):
        with pytest.raises(InjectedCrash):
            t.restore(sp)
    assert calls["n"] == 2
    assert not os.path.isdir(os.path.join(path, "base"))
    rep = t.fsck()
    assert rep["restored"]  # rolled forward from the staged copy
    assert t._restore_intent() is None
    meta = t._meta()
    assert meta["next_seq"] == sp + 1 and meta["compacted_through"] == sp
    assert _snap(t) == sorted(B1)  # the restored state, meta consistent
    assert meta["timeline"][-1]["action"] == "restore"


def mor_restore_swapped_before_meta(spark, path):
    """The r6 ADVICE case proper: base swap COMPLETED, crash before the
    meta update. Without the intent marker fsck used to see 'base
    present', drop the aside copy, and leave meta stale — post-
    compaction logs merged onto the rolled-back base (hybrid read) with
    the only consistent copy gone. Now fsck finishes the restore."""
    t, sp, pre_restore = _mor_rebuild_restore_setup(spark, path)

    with mock.patch.object(
        MergeOnReadTable, "_finish_restore", side_effect=InjectedCrash
    ):
        with pytest.raises(InjectedCrash):
            t.restore(sp)
    rep = t.fsck()
    assert t._restore_intent() is None
    meta = t._meta()
    assert meta["next_seq"] == sp + 1 and meta["compacted_through"] == sp
    assert _snap(t) == sorted(B1)
    assert not os.path.isdir(t._base + ".restore_old")
    assert rep["restored"]
    # retry path: a fresh commit lands at the reclaimed sequence number
    t.upsert(_df(spark, B2))
    assert _snap(t) == AFTER_B2


def mor_restore_forward_from_staging(spark, path):
    """Legacy delete-then-rename crash shape (base gone, only the staged
    restore copy on disk): fsck rolls FORWARD — the restored base plus
    the still-present newer logs merge back to the pre-restore state."""
    t = MergeOnReadTable(spark, path, keys=["k"], precombine="ver",
                         partition_by=["p"], policy=_never())
    t.upsert(_df(spark, B1))
    t.upsert(_df(spark, B2))
    pre = _snap(t)
    base = os.path.join(path, "base")
    os.rename(base, base + ".restore_tmp")  # simulate the legacy crash
    rep = t.fsck()
    assert rep["restored"] == [base + ".restore_tmp"]
    assert _snap(t) == pre


def cow_upsert_replay_converges(spark, path):
    """COW upsert's recovery is the streaming replay contract, not fsck:
    data merged but meta stale -> re-delivering the same batch converges."""
    t = UpsertTable(spark, path, keys=["k"], precombine="ver", partition_by=["p"])
    t.upsert(_df(spark, B1))
    with mock.patch.object(UpsertTable, "_save_meta", side_effect=InjectedCrash):
        with pytest.raises(InjectedCrash):
            t.upsert(_df(spark, B2))
    t.upsert(_df(spark, B2))  # checkpoint replay of the same batch
    assert _snap(t) == AFTER_B2


def cow_cluster_crash_before_manifest(spark, path):
    """Rewrite itself dies: no manifest -> table untouched, staging swept."""
    t = UpsertTable(spark, path, keys=["k"], precombine="ver", partition_by=["p"])
    t.upsert(_df(spark, B1))

    def fake_cluster_write(df, tmp, *a, **kw):
        os.makedirs(tmp, exist_ok=True)
        with open(os.path.join(tmp, "part-00000.parquet"), "wb") as f:
            f.write(b"partial garbage")
        raise InjectedCrash()

    import aws_glue_streaming_etl_with_apache_hudi_spark.operators.clustering as clustering_mod

    with mock.patch.object(clustering_mod, "cluster_write", side_effect=fake_cluster_write):
        with pytest.raises(InjectedCrash):
            t.cluster(["v"])
    rep = t.fsck()
    assert not rep["promoted"] and rep["removed"]
    assert _snap(t) == sorted(B1)
    t.cluster(["v"])  # clean retry
    assert _snap(t) == sorted(B1)


def cow_cluster_crash_mid_delete(spark, path):
    """Manifest written, crash at the start of the swap (all old data
    deleted, nothing moved): fsck rolls FORWARD from the staged copy."""
    t = UpsertTable(spark, path, keys=["k"], precombine="ver", partition_by=["p"])
    t.upsert(_df(spark, B1))
    t.upsert(_df(spark, B2))
    before = _snap(t)

    real_replace = os.replace
    calls = {"n": 0}

    def flaky(src, dst):
        calls["n"] += 1
        if calls["n"] >= 2:  # 1st = manifest tmp->final; 2nd = first data move
            raise InjectedCrash()
        return real_replace(src, dst)

    with mock.patch("os.replace", side_effect=flaky):
        with pytest.raises(InjectedCrash):
            t.cluster(["v"])
    assert os.path.exists(os.path.join(path, "_clustering_manifest.json"))
    rep = t.fsck()
    assert rep["promoted"]
    assert not os.path.exists(os.path.join(path, "_clustering_manifest.json"))
    assert not os.path.isdir(path.rstrip("/") + ".clustering")
    assert _snap(t) == before


def cow_cluster_crash_mid_move(spark, path):
    """Crash halfway through the move phase: moved entries kept, the rest
    promoted from staging — no duplicates, no losses."""
    t = UpsertTable(spark, path, keys=["k"], precombine="ver", partition_by=["p"])
    t.upsert(_df(spark, B1))
    t.upsert(_df(spark, B2))
    before = _snap(t)

    real_replace = os.replace
    calls = {"n": 0}

    def flaky(src, dst):
        calls["n"] += 1
        if calls["n"] == 3:  # manifest + one partition moved, then crash
            raise InjectedCrash()
        return real_replace(src, dst)

    with mock.patch("os.replace", side_effect=flaky):
        with pytest.raises(InjectedCrash):
            t.cluster(["v"])
    rep = t.fsck()
    assert rep["promoted"]
    assert _snap(t) == before


def dedup_accept_crash_then_replay(spark, path):
    """Crash between the sink commit and accept(): the replay must pass
    every row through the probe (self-pair exclusion) and accept exactly
    once (idempotent by id)."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup_index import LSHDedupIndex
    from pyspark.sql import functions as F

    idx = LSHDedupIndex(spark, path)
    batch = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog tonight"),
            Row(doc_id=2, text="an entirely different sentence about compaction services"),
        ]
    )
    kept = batch.join(
        idx.probe(batch).filter(~F.col("is_duplicate")).select("doc_id"), "doc_id"
    )
    assert kept.count() == 2
    with mock.patch.object(LSHDedupIndex, "accept", side_effect=InjectedCrash):
        with pytest.raises(InjectedCrash):
            idx.accept(kept)
    # replay: probe again (index has no signatures yet), accept for real
    kept2 = batch.join(
        idx.probe(batch).filter(~F.col("is_duplicate")).select("doc_id"), "doc_id"
    )
    assert kept2.count() == 2
    assert idx.accept(kept2) == 2
    assert idx.accept(kept2) == 0  # second replay: no double-append
    assert idx.size() == 2


def tl_overwrite_table_before_instant(spark, path):
    # the full-table restatement claims all-or-nothing: a crash before
    # the (single) instant write must leave the OLD world fully intact —
    # never the torn middle state where batch partitions replaced but
    # stale partitions kept
    t = TimelineTable(spark, path, keys=["k"], precombine="ver", partition_by=["p"])
    t.upsert(_df(spark, B1))
    before = _snap(t)
    with mock.patch.object(TimelineTable, "_save_instant", side_effect=InjectedCrash):
        with pytest.raises(InjectedCrash):
            t.insert_overwrite_table(_df(spark, [(9, "a", 1, 90.0)]))
    assert _snap(t) == before
    rep = t.fsck()
    assert any("commit=2" in d for d in rep["dirs"])
    t.insert_overwrite_table(_df(spark, [(9, "a", 1, 90.0)]))
    assert _snap(t) == [(9, "a", 1, 90.0)]


def tl_rename_before_instant(spark, path):
    t = TimelineTable(spark, path, keys=["k"], precombine="ver", partition_by=["p"])
    t.upsert(_df(spark, B1))
    with mock.patch.object(TimelineTable, "_save_instant", side_effect=InjectedCrash):
        with pytest.raises(InjectedCrash):
            t.rename_column("v", "payload")
    # no instant -> old name still live, orphan empty delta swept by fsck
    assert "v" in t.read().columns
    rep = t.fsck()
    assert any("commit=2" in d for d in rep["dirs"])
    t.rename_column("v", "payload")
    assert {r.k: r.payload for r in t.read().collect()} == {1: 10.0, 2: 20.0}


def mv_refresh_before_cursor(spark, path):
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.mvjoin import JoinMV

    fact = TimelineTable(spark, path + "_f", keys=["k"], precombine="ver")
    dim = TimelineTable(spark, path + "_d", keys=["p"], precombine="ver")
    mv = JoinMV(spark, path, fact, dim, fk="p", dk="p", dim_cols=["v"])
    fact.upsert(_df(spark, B1).drop("v"))
    dim.upsert(spark.createDataFrame([("a", "A", 1), ("b", "B", 1)], "p string, v string, ver long"))
    mv.refresh()
    fact.upsert(_df(spark, B2).drop("v"))
    with mock.patch.object(JoinMV, "_save_cursor", side_effect=InjectedCrash):
        with pytest.raises(InjectedCrash):
            mv.refresh()
    # crashed refresh left the upsert committed but the cursor behind;
    # replaying the refresh refolds the same delta idempotently
    mv.refresh()
    got = sorted((r.k, r.p, r.ver, r.v) for r in mv.read().collect())
    assert got == [(1, "a", 1, "A"), (2, "b", 2, "B"), (3, "a", 1, "A")]
    assert mv._cursor() == (2, 1)


def cow_bloom_sidecar_saved_then_write_crash(spark, path):
    """Bloom insert fast path (r7): crash AFTER the sidecar save, BEFORE
    the data write. The sidecar now holds the batch's bits (phantoms,
    false-positive-only by monotonicity), so the streaming replay of the
    same batch probes "maybe present", takes the merge path, and
    converges without duplicates — the sidecar-first ordering contract."""
    t = UpsertTable(spark, path, keys=["k"], precombine="ver",
                    partition_by=["p"], bloom_index=True)
    t.upsert(_df(spark, B1))
    from pyspark.sql.readwriter import DataFrameWriter

    real = DataFrameWriter.parquet
    with mock.patch.object(
        DataFrameWriter, "parquet", side_effect=InjectedCrash
    ):
        with pytest.raises(InjectedCrash):
            t.upsert(_df(spark, B2))
    # consistent after crash: table still reads the pre-batch state
    assert _snap(t) == sorted(B1)
    rep = t.fsck()
    assert isinstance(rep, dict)  # nothing to reclaim; fsck is a no-op
    t.upsert(_df(spark, B2))  # the replay
    assert _snap(t) == AFTER_B2
    t.upsert(_df(spark, B2))  # replay again: still idempotent
    assert _snap(t) == AFTER_B2


def cow_merge_bysource_crash_before_write(spark, path):
    """MERGE with BY SOURCE clauses (r8): crash at the data write — the
    table must still read the pre-merge state (dynamic overwrite never
    published), and replaying the SAME merge converges to the clause
    result exactly once."""
    t = UpsertTable(spark, path, keys=["k"], precombine="ver",
                    partition_by=["p"])
    t.upsert(_df(spark, B1))
    src = _df(spark, [(2, "b", 2, 21.0), (3, "a", 1, 30.0)])

    def do_merge():
        return t.merge_into(
            src,
            matched_update={"v": "s.v", "ver": "s.ver"},
            not_matched_by_source_delete_condition="t.v < 5.0",
            not_matched_by_source_update={"v": "t.v + 100.0"},
        )

    with mock.patch.object(UpsertTable, "_write", side_effect=InjectedCrash):
        with pytest.raises(InjectedCrash):
            do_merge()
    assert _snap(t) == sorted(B1)  # nothing published
    res = do_merge()  # the replay
    assert res == {"updated": 2, "deleted": 0, "inserted": 1}
    want = sorted([(1, "a", 1, 110.0), (2, "b", 2, 21.0), (3, "a", 1, 30.0)])
    assert _snap(t) == want
    # replaying AGAIN re-fires the by-source update (MERGE is a clause
    # program, not an idempotent upsert): key 1 decays once more
    do_merge()
    assert _snap(t) == sorted([(1, "a", 1, 210.0), (2, "b", 2, 21.0), (3, "a", 1, 30.0)])



def mor_stream_replay_converges(spark, path):
    """MOR's recovery is ALSO the streaming replay contract (the shape
    run_pipeline --table_type mor now exposes): a delta lands but the
    caller dies before acking -> the checkpoint re-delivers the batch
    and a SECOND identical delta appends. The read-side max_by
    (precombine, commit seq) picks the later commit with the same
    values, so the table state converges; compaction folds the
    redundant delta away. Fault point 23."""
    t = MergeOnReadTable(
        spark, path, keys=["k"], precombine="ver", partition_by=["p"],
        policy=_never(),
    )
    t.upsert(_df(spark, B1))
    with mock.patch.object(MergeOnReadTable, "_save_meta", side_effect=InjectedCrash):
        with pytest.raises(InjectedCrash):
            t.upsert(_df(spark, B2))
    t.upsert(_df(spark, B2))  # checkpoint replay of the same batch
    assert _snap(t) == AFTER_B2
    t.compact()
    assert _snap(t) == AFTER_B2  # the redundant delta folds away


def _nbcc_tbl(spark, path):
    t = MergeOnReadTable(spark, path, keys=["k"], precombine="ver",
                         partition_by=["p"], policy=_never())
    t.nbcc_upsert(_df(spark, B1), writer="seed")
    return t


def nbcc_crash_after_claim(spark, path):
    """Two concurrent NBCC writers, A dies right after claiming its
    slot (inflight marker only, no data). B — overlapping keys — must
    commit with ZERO aborts; fsck frees A's slot; A's re-delivered
    batch lands; no key lost or duplicated."""
    t = _nbcc_tbl(spark, path)
    dead = t._nbcc_claim("A")              # A crashes here
    t.nbcc_upsert(_df(spark, B2), writer="B")  # B sails past: no abort
    assert _snap(t) == AFTER_B2            # A's claim invisible
    t.fsck()
    assert not t._has_inflight(dead)
    t.nbcc_upsert(_df(spark, [(4, "b", 1, 40.0)]), writer="A")  # replay
    assert _snap(t) == AFTER_B2 + [(4, "b", 1, 40.0)]


def nbcc_crash_after_write_before_publish(spark, path):
    """A dies after appending its delta but before the completed
    marker: data on disk, invisible. B commits meanwhile (zero aborts);
    fsck rolls A's partial commit back; replay converges — the
    re-delivered rows appear exactly once."""
    t = _nbcc_tbl(spark, path)
    a_batch = _df(spark, [(3, "a", 2, 31.0), (4, "b", 1, 40.0)])
    seq = t.nbcc_begin(writer="A")
    t._nbcc_write(seq, a_batch)            # A crashes here (no publish)
    t.nbcc_upsert(_df(spark, B2), writer="B")
    assert _snap(t) == AFTER_B2            # A's unpublished rows unseen
    rep = t.fsck()
    assert any(f"commit={seq}" in d for d in rep["dirs"])
    t.nbcc_upsert(a_batch, writer="A")     # checkpoint re-delivery
    assert _snap(t) == sorted(
        [(1, "a", 1, 10.0), (2, "b", 2, 21.0), (3, "a", 2, 31.0),
         (4, "b", 1, 40.0)]
    )


def nbcc_crash_after_publish_before_meta(spark, path):
    """A dies between its completed marker and the metadata merge: the
    commit is ALREADY durable (completion marker is the commit point).
    B's publish must neither abort nor clobber A's commit; fsck keeps
    the published slot; A's replay (new slot, same rows) precombines
    away — zero duplicates."""
    t = _nbcc_tbl(spark, path)
    a_batch = _df(spark, [(3, "a", 2, 31.0)])
    with mock.patch.object(MergeOnReadTable, "_save_meta", side_effect=InjectedCrash):
        with pytest.raises(InjectedCrash):
            t.nbcc_upsert(a_batch, writer="A")
    t.nbcc_upsert(_df(spark, B2), writer="B")  # no abort, meta heals
    want = sorted([(1, "a", 1, 10.0), (2, "b", 2, 21.0), (3, "a", 2, 31.0)])
    assert _snap(t) == want                # A's commit visible
    rep = t.fsck()
    assert not rep["dirs"]                 # nothing to sweep: all live
    t.nbcc_upsert(a_batch, writer="A")     # replay: folds away
    assert _snap(t) == want


def nbcc_interleaved_publish_with_crashed_claim_between(spark, path):
    """Ordering stress: A claims s1, B claims s2 and PUBLISHES first,
    A crashes unpublished. next_seq must never advance past A's dead
    claim (exposing it); B's higher commit stays visible through its
    marker; fsck + replay finish the story."""
    t = _nbcc_tbl(spark, path)
    s1 = t.nbcc_begin(writer="A")
    s2 = t.nbcc_begin(writer="B")
    assert s2 == s1 + 1
    t.nbcc_publish(s2, _df(spark, B2), writer="B")
    assert t._meta()["next_seq"] <= s1     # dead claim caps the prefix
    assert _snap(t) == AFTER_B2            # B visible via marker anyway
    t.fsck()
    t.nbcc_upsert(_df(spark, [(5, "a", 1, 50.0)]), writer="A")
    assert _snap(t) == AFTER_B2 + [(5, "a", 1, 50.0)]


def cow_fidx_snapshot_crash_then_replay(spark, path):
    """Crash BETWEEN the data write and the functional/secondary-index
    snapshot splice (r13 compacted sidecars): the data holds the new
    rows but the snapshots are stale. Replaying the same batch (the
    streaming contract) re-splices the touched partitions' entries from
    a re-read of the files, and indexed reads are exact again. The
    snapshot write itself is tmp + os.replace — a crash can leave it
    stale, never torn."""
    t = UpsertTable(
        spark, path, keys=["k"], precombine="ver", partition_by=["p"],
        functional_indexes={"vint": "CAST(v AS INT)"},
        secondary_index_columns=["v"],
    )
    t.upsert(_df(spark, B1))
    with mock.patch.object(
        UpsertTable, "_sidecar_write_snapshot", side_effect=InjectedCrash
    ):
        with pytest.raises(InjectedCrash):
            t.upsert(_df(spark, B2))
    # stale-index window: data already merged, index may lag — but a
    # probe never errors (full predicate still applies to candidates)
    t.upsert(_df(spark, B2))  # checkpoint replay of the same batch
    assert _snap(t) == AFTER_B2
    # indexed reads exact after replay: value 21 only exists post-B2
    got = sorted((r.k, r.v) for r in t.read_for_expr("vint", value=21).collect())
    assert got == [(2, 21.0)]
    got = sorted((r.k, r.v) for r in t.read_for({"v": 21.0}).collect())
    assert got == [(2, 21.0)]
    got = sorted(r.k for r in t.read(where="CAST(v AS INT) = 30").collect())
    assert got == [3]


def cow_delete_partition_sidecar_splice_crash(spark, path):
    """delete_partition removes the data dir, then crashes before the
    sidecar splice: the stale snapshot rows point at a vanished
    partition — the lookup's stale-entry guard drops them, and retrying
    the delete (idempotent) cleans the snapshot."""
    t = UpsertTable(
        spark, path, keys=["k"], precombine="ver", partition_by=["p"],
        functional_indexes={"vint": "CAST(v AS INT)"},
    )
    t.upsert(_df(spark, B1))
    with mock.patch.object(
        UpsertTable, "_sidecar_write_snapshot", side_effect=InjectedCrash
    ):
        with pytest.raises(InjectedCrash):
            t.delete_partition(("a",))
    # data dir gone, snapshot stale: the guard keeps results exact
    assert t._fidx_candidates("vint", 10, 10) == []
    t.delete_partition(("a",))  # retry converges
    assert t._fidx_candidates("vint", 10, 10) == []
    assert sorted(r.k for r in t.read_for_expr("vint", value=20).collect()) == [2]


def mor_fidx_absorb_crash_then_replay(spark, path):
    """MOR expression-index absorb runs SIDECAR-FIRST (delta written,
    absorb, THEN publish — the bloom ordering): a crash at the absorb
    leaves an UNPUBLISHED commit plus possibly-absorbed stale values —
    probes stay exact at every instant (stale candidates are a
    superset; an unindexed published commit would instead be MISSED).
    fsck sweeps the claim, replay lands the batch, probes exact."""
    t = MergeOnReadTable(
        spark, path, keys=["k"], precombine="ver", partition_by=["p"],
        policy=_never(), functional_indexes={"vint": "CAST(v AS INT)"},
    )
    t.upsert(_df(spark, B1))
    with mock.patch.object(
        MergeOnReadTable, "_fidx_absorb", side_effect=InjectedCrash
    ):
        with pytest.raises(InjectedCrash):
            t.upsert(_df(spark, B2))
    # commit unpublished -> invisible; probes exact RIGHT NOW
    assert _snap(t) == sorted(B1)
    got = sorted(r.k for r in t.read_for_expr("vint", value=10).collect())
    assert got == [1]
    assert t.read_for_expr("vint", value=21).count() == 0
    t.fsck()  # sweeps the crashed claim
    t.upsert(_df(spark, B2))  # checkpoint replay of the same batch
    assert _snap(t) == AFTER_B2
    got = sorted((r.k, r.v) for r in t.read_for_expr("vint", value=21).collect())
    assert got == [(2, 21.0)]
    got = sorted(r.k for r in t.read_for_expr("vint", value=30).collect())
    assert got == [3]


FAULT_POINTS = [
    tl_upsert_before_instant,
    tl_compact_before_instant,
    tl_delete_partition_before_instant,
    tl_savepoint_before_rename,
    tl_clean_after_horizon_before_deletes,
    mor_bootstrap_before_meta,
    mor_upsert_before_meta,
    mor_upsert_before_publish,
    mor_compact_before_meta,
    nbcc_crash_after_claim,
    nbcc_crash_after_write_before_publish,
    nbcc_crash_after_publish_before_meta,
    nbcc_interleaved_publish_with_crashed_claim_between,
    mor_restore_before_aside_rename,
    mor_restore_mid_swap,
    mor_restore_swapped_before_meta,
    mor_restore_forward_from_staging,
    cow_upsert_replay_converges,
    mor_stream_replay_converges,
    cow_cluster_crash_before_manifest,
    cow_cluster_crash_mid_delete,
    cow_cluster_crash_mid_move,
    cow_bloom_sidecar_saved_then_write_crash,
    cow_fidx_snapshot_crash_then_replay,
    cow_delete_partition_sidecar_splice_crash,
    mor_fidx_absorb_crash_then_replay,
    cow_merge_bysource_crash_before_write,
    dedup_accept_crash_then_replay,
    mv_refresh_before_cursor,
    tl_rename_before_instant,
    tl_overwrite_table_before_instant,
]


@pytest.mark.parametrize("fault", FAULT_POINTS, ids=lambda f: f.__name__)
def test_crash_recovery(spark, tmp_path, fault):
    fault(spark, str(tmp_path / "tbl"))
