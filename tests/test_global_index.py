"""Global-index upsert (operators/upsert.py ``global_index=True`` —
Hudi GLOBAL_BLOOM/GLOBAL_SIMPLE): one live row per key across the whole
table; an update with a changed partition value migrates the row and the
old partition path is cleaned up. Default (non-global) behavior keeps
per-partition identity — both pinned here."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import UpsertTable


def _rows(spark, data):
    return spark.createDataFrame(
        [Row(k=k, part=p, v=v, ver=ver) for (k, p, v, ver) in data]
    )


def _mk(spark, tmp_path, global_index):
    return UpsertTable(
        spark=spark,
        path=str(tmp_path / ("g" if global_index else "ng")),
        keys=["k"],
        precombine="ver",
        partition_by=["part"],
        global_index=global_index,
    )


def test_update_migrates_partition(spark, tmp_path):
    t = _mk(spark, tmp_path, global_index=True)
    t.upsert(_rows(spark, [(1, "a", "x", 1), (2, "a", "y", 1)]))
    t.upsert(_rows(spark, [(1, "b", "x2", 2)]))  # key 1 moves a -> b

    state = {r.k: (r.part, r.v, r.ver) for r in t.read().collect()}
    assert state == {1: ("b", "x2", 2), 2: ("a", "y", 1)}


def test_stale_row_loses_even_across_partitions(spark, tmp_path):
    t = _mk(spark, tmp_path, global_index=True)
    t.upsert(_rows(spark, [(1, "a", "x", 5)]))
    t.upsert(_rows(spark, [(1, "b", "OLD", 2)]))  # older ver: no migration

    state = {r.k: (r.part, r.v, r.ver) for r in t.read().collect()}
    assert state == {1: ("a", "x", 5)}


def test_emptied_partition_directory_removed(spark, tmp_path):
    t = _mk(spark, tmp_path, global_index=True)
    t.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)]))
    assert os.path.isdir(os.path.join(t.path, "part=a"))

    t.upsert(_rows(spark, [(1, "c", "x2", 2)]))  # a's only row migrates
    assert not os.path.isdir(os.path.join(t.path, "part=a"))
    state = {r.k: r.part for r in t.read().collect()}
    assert state == {1: "c", 2: "b"}


def test_untouched_partitions_not_rewritten_by_migration(spark, tmp_path):
    t = _mk(spark, tmp_path, global_index=True)
    t.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1), (3, "c", "z", 1)]))
    before = os.path.getmtime(os.path.join(t.path, "part=c"))
    t.upsert(_rows(spark, [(1, "b", "x2", 2)]))  # touches a (old) and b (new)
    assert os.path.getmtime(os.path.join(t.path, "part=c")) == before


def test_default_index_keeps_per_partition_identity(spark, tmp_path):
    t = _mk(spark, tmp_path, global_index=False)
    t.upsert(_rows(spark, [(1, "a", "x", 1)]))
    t.upsert(_rows(spark, [(1, "b", "x2", 2)]))  # same key, new partition

    rows = {(r.k, r.part) for r in t.read().collect()}
    assert rows == {(1, "a"), (1, "b")}  # two records — no migration


@pytest.mark.parametrize("gi", [False, True])
def test_idempotent_replay(spark, tmp_path, gi):
    t = _mk(spark, tmp_path, gi)
    b1 = _rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)])
    b2 = _rows(spark, [(1, "b", "x2", 2)])
    t.upsert(b1)
    t.upsert(b2)
    snap = sorted(tuple(r) for r in t.read().collect())
    t.upsert(b2)  # checkpoint-restart replay must be a no-op
    assert sorted(tuple(r) for r in t.read().collect()) == snap
