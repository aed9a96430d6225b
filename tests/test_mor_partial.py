"""Partial-update merge mode on MergeOnReadTable: sparse delta commits
fold column-wise on read, survive compaction, and stay time-travelable."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.mor import CompactionPolicy, MergeOnReadTable


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "k bigint, ver bigint, name string, score double, city string"
    )


@pytest.fixture()
def tbl(spark, tmp_path):
    return MergeOnReadTable(
        spark,
        str(tmp_path / "morp"),
        keys=["k"],
        precombine="ver",
        merge_mode="partial",
        policy=CompactionPolicy(max_delta_commits=100),  # manual compaction
    )


def test_sparse_deltas_fold_column_wise(spark, tbl):
    tbl.upsert(_df(spark, [(1, 1, "ann", 0.5, "rome"), (2, 1, "bob", 0.7, "oslo")]))
    tbl.upsert(_df(spark, [(1, 2, None, 0.9, None)]))      # score only
    tbl.upsert(_df(spark, [(1, 3, "anne", None, None),      # name only
                           (2, 2, None, None, "kyiv")]))    # city only
    state = {r.k: r for r in tbl.read().collect()}
    assert (state[1].ver, state[1].name, state[1].score, state[1].city) == (3, "anne", 0.9, "rome")
    assert (state[2].ver, state[2].name, state[2].score, state[2].city) == (2, "bob", 0.7, "kyiv")


def test_partial_survives_compaction_and_time_travel(spark, tbl):
    tbl.upsert(_df(spark, [(1, 1, "ann", 0.5, "rome")]))
    tbl.upsert(_df(spark, [(1, 2, None, 0.9, None)]))
    before = sorted(map(tuple, tbl.read().collect()))
    as_of_1 = sorted(map(tuple, tbl.read(as_of=1).collect()))

    tbl.compact()
    # snapshot unchanged by compaction; later sparse deltas still fold
    assert sorted(map(tuple, tbl.read().collect())) == before
    tbl.upsert(_df(spark, [(1, 3, None, None, "lima")]))
    row = tbl.read().collect()[0]
    assert (row.ver, row.name, row.score, row.city) == (3, "ann", 0.9, "lima")
    # time travel below the compaction point still sees the pre-merge state
    assert sorted(map(tuple, tbl.read(as_of=1).collect())) == as_of_1
    # read-optimized view = base only (post-compaction state, no delta 3)
    ro = tbl.read_optimized().collect()[0]
    assert (ro.ver, ro.city) == (2, "rome")


def test_partial_replay_is_idempotent(spark, tbl):
    tbl.upsert(_df(spark, [(1, 1, "ann", 0.5, "rome")]))
    tbl.upsert(_df(spark, [(1, 2, None, 0.9, None)]))
    before = sorted(map(tuple, tbl.read().collect()))
    # the same sparse payload re-applied as a NEW commit (replay after a
    # crash): column-wise latest non-null is unchanged
    tbl.upsert(_df(spark, [(1, 2, None, 0.9, None)]))
    assert sorted(map(tuple, tbl.read().collect())) == before


def test_mor_rejects_unknown_merge_mode(spark, tmp_path):
    with pytest.raises(ValueError, match="merge_mode"):
        MergeOnReadTable(
            spark, str(tmp_path / "bad"), keys=["k"], precombine="ver",
            merge_mode="sparse",
        )
