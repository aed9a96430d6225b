"""Non-blocking concurrency control (operators/mor.py nbcc_upsert —
Hudi 1.0 NBCC on MERGE_ON_READ): concurrent writers to the SAME keys,
neither aborts; instant-state markers give per-commit visibility (a
higher seq can publish before a lower one), the read-side precombine
resolves key overlaps at merge time, and table services respect
unpublished claims."""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.mor import CompactionPolicy, MergeOnReadTable

SCHEMA = "k long, ts long, v string"


def _tbl(spark, path, **kw):
    kw.setdefault("policy", CompactionPolicy(max_delta_commits=10_000))
    return MergeOnReadTable(
        spark, str(path), keys=["k"], precombine="ts", **kw,
    )


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _state(t):
    return sorted((r.k, r.ts, r.v) for r in t.read().collect())


def test_two_writers_same_keys_no_abort(spark, tmp_path):
    """Both writers touch key 1; both commits land; latest event time
    wins — no CommitConflict anywhere."""
    t = _tbl(spark, tmp_path / "t")
    t.nbcc_upsert(_df(spark, [(1, 10, "a0"), (2, 10, "a0")]), writer="A")
    t.nbcc_upsert(_df(spark, [(1, 20, "b0"), (3, 15, "b0")]), writer="B")
    assert _state(t) == [(1, 20, "b0"), (2, 10, "a0"), (3, 15, "b0")]


def test_out_of_order_completion_visibility(spark, tmp_path):
    """A claims the lower slot but B publishes first: readers see B's
    commit while A is in flight, then both once A publishes."""
    t = _tbl(spark, tmp_path / "t")
    t.nbcc_upsert(_df(spark, [(1, 10, "base")]), writer="A")

    a_batch = _df(spark, [(2, 10, "a")])
    b_batch = _df(spark, [(3, 10, "b")])
    a_seq = t._nbcc_claim("A")
    b_seq = t._nbcc_claim("B")
    assert b_seq == a_seq + 1
    t._nbcc_write(b_seq, b_batch)
    t._nbcc_complete(b_seq, b_batch, "B")
    # A claimed but unpublished: invisible; B published above: visible
    assert _state(t) == [(1, 10, "base"), (3, 10, "b")]
    assert t.latest_commit() == b_seq
    t._nbcc_write(a_seq, a_batch)
    t._nbcc_complete(a_seq, a_batch, "A")
    assert _state(t) == [(1, 10, "base"), (2, 10, "a"), (3, 10, "b")]
    # once the gap publishes, the single-writer line catches up
    assert t._meta()["next_seq"] == b_seq + 1


def test_event_time_wins_over_completion_order(spark, tmp_path):
    """The OLDER event publishes LAST — completion order must not matter;
    precombine (event time) picks the winner."""
    t = _tbl(spark, tmp_path / "t")
    t.nbcc_upsert(_df(spark, [(1, 10, "base")]), writer="A")
    fresh, stale = _df(spark, [(1, 30, "fresh")]), _df(spark, [(1, 20, "stale")])
    s_stale = t._nbcc_claim("S")
    s_fresh = t._nbcc_claim("F")
    t._nbcc_write(s_fresh, fresh)
    t._nbcc_complete(s_fresh, fresh, "F")
    t._nbcc_write(s_stale, stale)
    t._nbcc_complete(s_stale, stale, "S")  # stale completes LAST
    assert _state(t) == [(1, 30, "fresh")]


def test_crashed_claim_stays_invisible_and_fsck_rolls_back(spark, tmp_path):
    t = _tbl(spark, tmp_path / "t")
    t.nbcc_upsert(_df(spark, [(1, 10, "base")]), writer="A")
    dead = t._nbcc_claim("dead")
    t._nbcc_write(dead, _df(spark, [(9, 99, "ghost")]))  # crash before publish
    done = t.nbcc_upsert(_df(spark, [(2, 10, "b")]), writer="B")
    assert done == dead + 1
    assert _state(t) == [(1, 10, "base"), (2, 10, "b")]  # ghost invisible
    swept = t.fsck()
    assert any(f"commit={dead}" in d for d in swept["dirs"])
    assert not t._has_inflight(dead)
    assert _state(t) == [(1, 10, "base"), (2, 10, "b")]


def test_compact_never_folds_past_unpublished_claim(spark, tmp_path):
    t = _tbl(spark, tmp_path / "t")
    t.nbcc_upsert(_df(spark, [(1, 10, "base")]), writer="A")
    slow = t._nbcc_claim("slow")
    after = t.nbcc_upsert(_df(spark, [(2, 10, "b")]), writer="B")
    assert after > slow
    t.compact()
    # the published commit ABOVE the claim must still be pending
    assert t._compacted_through() < slow
    assert after in t.pending_commits()
    # slow writer finally publishes — nothing was stranded
    slow_batch = _df(spark, [(3, 10, "slow")])
    t._nbcc_write(slow, slow_batch)
    t._nbcc_complete(slow, slow_batch, "slow")
    assert _state(t) == [(1, 10, "base"), (2, 10, "b"), (3, 10, "slow")]
    t.compact()
    assert t._compacted_through() == after
    assert _state(t) == [(1, 10, "base"), (2, 10, "b"), (3, 10, "slow")]


def test_threaded_writer_pool(spark, tmp_path):
    """8 writers x 4 batches race through claim/write/publish; every
    commit lands exactly once, seqs are unique, state is complete."""
    t = _tbl(spark, tmp_path / "t")
    t.nbcc_upsert(_df(spark, [(0, 0, "boot")]), writer="boot")

    def work(w):
        seqs = []
        for b in range(4):
            k = 1000 * (w + 1) + b  # disjoint from the boot row's key 0
            seqs.append(
                t.nbcc_upsert(_df(spark, [(k, 10, f"w{w}b{b}")]), writer=f"w{w}")
            )
        return seqs

    with ThreadPoolExecutor(max_workers=8) as ex:
        all_seqs = [s for seqs in ex.map(work, range(8)) for s in seqs]
    assert len(all_seqs) == 32 and len(set(all_seqs)) == 32
    got = _state(t)
    assert len(got) == 33  # boot + 32 writer rows
    dels = [e for e in t.timeline() if e["action"] == "deltacommit"]
    assert len(dels) == 33
    # time travel across the merged history still works
    assert t.read(as_of=t.latest_commit()).count() == 33


def test_time_travel_and_incremental_over_nbcc_commits(spark, tmp_path):
    t = _tbl(spark, tmp_path / "t")
    t.nbcc_upsert(_df(spark, [(1, 10, "v1")]), writer="A")
    s2 = t.nbcc_upsert(_df(spark, [(1, 20, "v2"), (2, 10, "n")]), writer="B")
    t.nbcc_upsert(_df(spark, [(1, 30, "v3")]), writer="A")
    assert sorted(
        (r.k, r.v) for r in t.read(as_of=s2).collect()
    ) == [(1, "v2"), (2, "n")]
    inc = t.read_incremental(begin=s2)
    assert sorted((r.k, r.v) for r in inc.collect()) == [(1, "v3")]


def test_clean_removes_markers_with_dirs(spark, tmp_path):
    t = _tbl(spark, tmp_path / "t")
    t.nbcc_upsert(_df(spark, [(1, 10, "a")]), writer="A")
    s = t.nbcc_upsert(_df(spark, [(2, 10, "b")]), writer="B")
    t.compact()
    t.clean(through=s)
    assert not t._has_done(s)
    assert not os.path.isdir(os.path.join(t._log, f"commit={s}"))
    assert _state(t) == [(1, 10, "a"), (2, 10, "b")]


def test_plain_upsert_interops_after_nbcc(spark, tmp_path):
    """Sequential mixing: a single-writer upsert skips published NBCC
    slots, and REFUSES an unpublished claim (it cannot distinguish a
    live writer from a crashed one — silently reusing the slot would
    let the two overwrite each other). fsck rolls the crashed claim
    back, after which the plain writer proceeds — and (r12) acquires
    the freed slot through the same O_EXCL inflight-marker claim as an
    NBCC writer, so its commit leaves the published marker pair
    (inflight + completed) rather than a marker-free directory. That
    claim-then-write order is what closes the old TOCTOU where a
    concurrent nbcc_claim could win the slot between upsert's
    _has_inflight probe and its parquet write."""
    import pytest

    t = _tbl(spark, tmp_path / "t")
    t.nbcc_upsert(_df(spark, [(1, 10, "a")]), writer="A")
    dead = t._nbcc_claim("dead")  # crashed claim below
    s = t.nbcc_upsert(_df(spark, [(2, 10, "b")]), writer="B")
    assert s > dead
    with pytest.raises(RuntimeError, match="unpublished NBCC claim"):
        t.upsert(_df(spark, [(3, 10, "c")]))
    t.fsck()  # offline rollback of the crashed claim
    t.upsert(_df(spark, [(3, 10, "c")]))  # now reuses the freed slot
    assert _state(t) == [(1, 10, "a"), (2, 10, "b"), (3, 10, "c")]
    assert t._meta()["next_seq"] == dead + 1
    # the reused slot is PUBLISHED: claim marker + completed marker
    # (an inflight-only slot would read as a live/crashed claim)
    assert t._has_inflight(dead) and t._has_done(dead)
    assert dead not in t._inflight_claims()
    assert t.latest_commit() == s


def _stage_batch(spark, tmp_path, src, name, rows, mtime):
    import glob
    import shutil

    stage = str(tmp_path / f"stage_{name}")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    dst = os.path.join(src, f"{name}.parquet")
    shutil.move(part, dst)
    os.utime(dst, (mtime, mtime))


def test_two_streaming_pipelines_one_table(spark, tmp_path):
    """Multi-stream ingestion (streaming/pipeline.py writer_id): two
    StreamingUpsertPipelines with separate sources and checkpoints feed
    ONE MergeOnReadTable through nbcc_upsert — interleaved micro-batches
    touching the SAME key never abort, and a full checkpoint replay of
    one stream leaves read-state unchanged (keyed precombine collapses
    the re-delivered rows)."""
    import shutil

    from pyspark.sql import types as T

    from aws_glue_streaming_etl_with_apache_hudi_spark.streaming.pipeline import StreamingUpsertPipeline

    src_a, src_b = str(tmp_path / "src_a"), str(tmp_path / "src_b")
    os.makedirs(src_a)
    os.makedirs(src_b)
    schema = T.StructType.fromDDL(SCHEMA)
    t = _tbl(spark, tmp_path / "t")

    def pipe(src, ckpt, writer):
        return StreamingUpsertPipeline(
            spark, source_dir=src, schema=schema, table=t,
            checkpoint=str(tmp_path / ckpt), trigger="1 seconds",
            writer_id=writer,
        )

    # interleave: A batch 1, B batch 1 (same key 1!), A batch 2
    _stage_batch(spark, tmp_path, src_a, "a1",
                 [(1, 10, "a1"), (2, 10, "a1")], 1_700_000_000)
    pa = pipe(src_a, "ckpt_a", "A")
    pa.run_available()
    _stage_batch(spark, tmp_path, src_b, "b1",
                 [(1, 20, "b1"), (3, 10, "b1")], 1_700_000_001)
    pb = pipe(src_b, "ckpt_b", "B")
    pb.run_available()
    _stage_batch(spark, tmp_path, src_a, "a2",
                 [(4, 10, "a2")], 1_700_000_002)
    pa.run_available()

    want = [(1, 20, "b1"), (2, 10, "a1"), (3, 10, "b1"), (4, 10, "a2")]
    assert _state(t) == want
    writers = {e.get("writer") for e in t.timeline() if e["action"] == "deltacommit"}
    assert {"A", "B"} <= writers

    # replay stream B from scratch: fresh checkpoint re-delivers b1 into
    # a NEW commit slot; keyed precombine keeps state identical
    shutil.rmtree(str(tmp_path / "ckpt_b"))
    pipe(src_b, "ckpt_b", "B").run_available()
    assert _state(t) == want
    # and the replayed delta folds away at compaction
    t.compact()
    assert _state(t) == want
