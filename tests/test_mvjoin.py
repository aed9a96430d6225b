"""Incremental join-MV maintenance (operators/mvjoin.py): the view must
be observationally identical to recomputing fact ⋈ dim from the latest
snapshots after every refresh, while each refresh touches only deltas."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.mvjoin import JoinMV
from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import TimelineTable


def _facts(spark, rows):  # (id, fk, amt, ver)
    return spark.createDataFrame(
        [Row(id=i, fk=k, amt=a, ver=v) for (i, k, a, v) in rows]
    )


def _dims(spark, rows):  # (dk, seg, dver)
    return spark.createDataFrame(
        [Row(dk=k, seg=s, dver=v) for (k, s, v) in rows]
    )


@pytest.fixture
def mv(spark, tmp_path):
    fact = TimelineTable(spark, str(tmp_path / "fact"), keys=["id"], precombine="ver")
    dim = TimelineTable(spark, str(tmp_path / "dim"), keys=["dk"], precombine="dver")
    return JoinMV(
        spark, str(tmp_path / "mv"), fact, dim, fk="fk", dk="dk", dim_cols=["seg"]
    )


def _recomputed(mv):
    f_ = mv.fact.read().alias("f")
    d_ = mv.dim.read().alias("d")
    return sorted(
        (r.id, r.fk, r.amt, r.ver, r.seg)
        for r in f_.join(d_, F.col("f.fk") == F.col("d.dk"))
        .select("f.id", "f.fk", "f.amt", "f.ver", "d.seg")
        .collect()
    )


def _view(mv):
    return sorted((r.id, r.fk, r.amt, r.ver, r.seg) for r in mv.read().collect())


def test_join_mv_tracks_recomputation(mv, spark):
    mv.fact.upsert(_facts(spark, [(1, 10, 5.0, 1), (2, 20, 7.0, 1)]))
    mv.dim.upsert(_dims(spark, [(10, "a", 1), (20, "b", 1)]))
    mv.refresh()
    assert _view(mv) == _recomputed(mv)

    # cycle 2: fact append + update, dim update — both legs exercised
    mv.fact.upsert(_facts(spark, [(3, 10, 9.0, 1), (2, 20, 7.5, 2)]))
    mv.dim.upsert(_dims(spark, [(10, "a2", 2)]))
    mv.refresh()
    assert _view(mv) == _recomputed(mv)
    # the dim update propagated to BOTH fact rows on fk=10
    segs = {r.id: r.seg for r in mv.read().collect()}
    assert segs[1] == "a2" and segs[3] == "a2" and segs[2] == "b"


def test_join_mv_fact_fk_move(mv, spark):
    mv.fact.upsert(_facts(spark, [(1, 10, 5.0, 1)]))
    mv.dim.upsert(_dims(spark, [(10, "a", 1), (20, "b", 1)]))
    mv.refresh()
    # the fact row moves to another dim partner: its view row is REPLACED
    mv.fact.upsert(_facts(spark, [(1, 20, 5.0, 2)]))
    mv.refresh()
    assert _view(mv) == _recomputed(mv) == [(1, 20, 5.0, 2, "b")]


def test_join_mv_new_dim_key_matches_waiting_fact(mv, spark):
    # inner join: a fact without a dim partner is absent until the dim
    # key arrives; the dim-delta leg then back-fills it
    mv.fact.upsert(_facts(spark, [(1, 99, 5.0, 1)]))
    mv.dim.upsert(_dims(spark, [(10, "a", 1)]))
    mv.refresh()
    assert _view(mv) == []
    mv.dim.upsert(_dims(spark, [(99, "late", 1)]))
    mv.refresh()
    assert _view(mv) == _recomputed(mv) == [(1, 99, 5.0, 1, "late")]


def test_join_mv_noop_refresh_and_cursor(mv, spark):
    mv.fact.upsert(_facts(spark, [(1, 10, 5.0, 1)]))
    mv.dim.upsert(_dims(spark, [(10, "a", 1)]))
    r1 = mv.refresh()
    assert r1["upserted"]
    r2 = mv.refresh()
    assert not r2["upserted"]  # no new commits -> metadata-only no-op
    assert r2["fact_range"] == (1, 1) and r2["dim_range"] == (1, 1)
    assert _view(mv) == _recomputed(mv)


def test_join_mv_fact_delete_leaves_view(mv, spark):
    mv.fact.upsert(_facts(spark, [(1, 10, 5.0, 1), (2, 10, 6.0, 1)]))
    mv.dim.upsert(_dims(spark, [(10, "a", 1)]))
    mv.refresh()
    mv.fact.delete(_facts(spark, [(1, 10, 5.0, 2)]))
    mv.refresh()
    assert _view(mv) == _recomputed(mv) == [(2, 10, 6.0, 1, "a")]


def test_join_mv_dim_delete_removes_dependents(mv, spark):
    mv.fact.upsert(_facts(spark, [(1, 10, 5.0, 1), (2, 20, 6.0, 1)]))
    mv.dim.upsert(_dims(spark, [(10, "a", 1), (20, "b", 1)]))
    mv.refresh()
    mv.dim.delete(_dims(spark, [(10, "a", 2)]))
    mv.refresh()
    assert _view(mv) == _recomputed(mv) == [(2, 20, 6.0, 1, "b")]


def test_join_mv_dim_delete_spares_moved_fact(mv, spark):
    # the fact moves off the dying dim key in the SAME refresh window:
    # its latest state references fk=20, so the delete leg must not
    # remove its (fresh) view row
    mv.fact.upsert(_facts(spark, [(1, 10, 5.0, 1)]))
    mv.dim.upsert(_dims(spark, [(10, "a", 1), (20, "b", 1)]))
    mv.refresh()
    mv.fact.upsert(_facts(spark, [(1, 20, 5.0, 2)]))
    mv.dim.delete(_dims(spark, [(10, "a", 2)]))
    mv.refresh()
    assert _view(mv) == _recomputed(mv) == [(1, 20, 5.0, 2, "b")]


def test_join_mv_randomized_sequence_tracks_recompute(mv, spark):
    """Seeded random op soup: per cycle, a mix of fact upserts/deletes and
    dim upserts/deletes lands on the sources, then one refresh; after
    every refresh the view must equal the from-scratch join (the MV
    law). Seeded so failures replay exactly."""
    import random

    rng = random.Random(0xC0FFEE)
    fact_ver = {}
    dim_ver = {}
    dim_live = set()
    for cycle in range(3):
        # dim ops first so the fact leg can reference new keys this cycle
        for _ in range(rng.randint(1, 3)):
            dk = rng.randint(10, 14)
            if dim_live and rng.random() < 0.25:
                dk = rng.choice(sorted(dim_live))
                dim_ver[dk] = dim_ver.get(dk, 0) + 1
                mv.dim.delete(_dims(spark, [(dk, "x", dim_ver[dk])]))
                dim_live.discard(dk)
            else:
                dim_ver[dk] = dim_ver.get(dk, 0) + 1
                mv.dim.upsert(_dims(spark, [(dk, f"s{cycle}_{dk}", dim_ver[dk])]))
                dim_live.add(dk)
        for _ in range(rng.randint(1, 4)):
            fid = rng.randint(1, 8)
            fact_ver[fid] = fact_ver.get(fid, 0) + 1
            if rng.random() < 0.2:
                mv.fact.delete(_facts(spark, [(fid, 0, 0.0, fact_ver[fid])]))
            else:
                fk = rng.randint(10, 15)  # 15 never exists in dim
                mv.fact.upsert(_facts(spark, [(fid, fk, float(fid), fact_ver[fid])]))
        mv.refresh()
        assert _view(mv) == _recomputed(mv), f"diverged at cycle {cycle}"


def test_join_mv_streaming_ingest_keeps_view_fresh(spark, tmp_path):
    """End-to-end operational story: a file-source STREAM feeds the fact
    timeline table via foreachBatch, and the join view refreshes after
    every micro-batch commit — after the stream drains, the view equals
    the from-scratch join of the latest snapshots."""
    import json
    import os

    src = str(tmp_path / "in")
    os.makedirs(src)

    def _feed(name, rows):
        with open(os.path.join(src, name), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    _feed("b0.json", [
        {"id": 1, "fk": 10, "amt": 5.0, "ver": 1},
        {"id": 2, "fk": 20, "amt": 7.0, "ver": 1},
    ])
    _feed("b1.json", [
        {"id": 2, "fk": 20, "amt": 7.5, "ver": 2},
        {"id": 3, "fk": 10, "amt": 9.0, "ver": 1},
    ])

    fact = TimelineTable(spark, str(tmp_path / "fact"), keys=["id"], precombine="ver")
    dim = TimelineTable(spark, str(tmp_path / "dim"), keys=["dk"], precombine="dver")
    dim.upsert(_dims(spark, [(10, "a", 1), (20, "b", 1)]))
    mv = JoinMV(
        spark, str(tmp_path / "mv"), fact, dim, fk="fk", dk="dk", dim_cols=["seg"]
    )

    stream = spark.readStream.schema(
        "id long, fk long, amt double, ver long"
    ).option("maxFilesPerTrigger", 1).json(src)

    def _ingest(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        fact.upsert(batch_df)
        mv.refresh()  # the post-commit hook keeping the join view fresh

    q = (
        stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    assert fact.last_commit() >= 2  # one commit per micro-batch
    assert _view(mv) == _recomputed(mv) == [
        (1, 10, 5.0, 1, "a"),
        (2, 20, 7.5, 2, "b"),
        (3, 10, 9.0, 1, "a"),
    ]
