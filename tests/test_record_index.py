"""Record-level index (operators/upsert.py record_index=True — Hudi
0.14 record_index): a hash-bucketed key -> partition-path map that
answers global-upsert home lookups from index buckets instead of a
table scan, maintained incrementally with each commit."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import UpsertTable


def _rows(spark, data):
    return spark.createDataFrame(
        [Row(k=k, part=p, v=v, ver=ver) for (k, p, v, ver) in data]
    )


@pytest.fixture
def table(spark, tmp_path):
    return UpsertTable(
        spark=spark,
        path=str(tmp_path / "rli"),
        keys=["k"],
        precombine="ver",
        partition_by=["part"],
        global_index=True,
        record_index=True,
        rli_buckets=8,
    )


def _index_state(table):
    return {r.k: r.part for r in table._rli.read().collect()}


def test_index_tracks_homes_and_migration(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)]))
    assert _index_state(table) == {1: "a", 2: "b"}

    table.upsert(_rows(spark, [(1, "c", "x2", 2)]))  # key 1 migrates a -> c
    assert _index_state(table) == {1: "c", 2: "b"}
    state = {r.k: r.part for r in table.read().collect()}
    assert state == {1: "c", 2: "b"}
    assert not os.path.isdir(os.path.join(table.path, "part=a"))


def test_lookup_uses_index_not_table_scan(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)]))
    homes = table._rli_homes(_rows(spark, [(1, "zzz", "q", 9)]))
    assert homes == [("a",)]
    # a key the table has never seen -> no homes
    assert table._rli_homes(_rows(spark, [(42, "zzz", "q", 9)])) == []


def test_delete_deindexes(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)]))
    table.delete(spark.createDataFrame([Row(k=1)]))
    assert _index_state(table) == {2: "b"}
    assert {r.k for r in table.read().collect()} == {2}


def test_delete_partition_deindexes(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "a", "y", 1), (3, "b", "z", 1)]))
    table.delete_partition(("a",))
    assert _index_state(table) == {3: "b"}


def test_index_consistent_with_table_after_many_commits(table, spark):
    table.upsert(_rows(spark, [(i, "abc"[i % 3], f"v{i}", 1) for i in range(12)]))
    table.upsert(_rows(spark, [(i, "abc"[(i + 1) % 3], f"w{i}", 2) for i in range(0, 12, 2)]))
    table.delete(spark.createDataFrame([Row(k=1), Row(k=5)]))

    truth = {r.k: r.part for r in table.read().collect()}
    assert _index_state(table) == truth


def test_read_key_point_lookup(table, spark):
    table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1), (3, "c", "z", 1)]))
    hit = table.read_key((2,))
    rows = hit.collect()
    assert [(r.k, r.part, r.v) for r in rows] == [(2, "b", "y")]
    # scan was pruned to the key's home partition
    data_files = [f for f in hit.inputFiles() if "/_rli/" not in f]
    assert data_files and all("part=b" in f for f in data_files)
    # miss -> empty result, not an error
    assert table.read_key((42,)).count() == 0


def test_record_index_requires_global(spark, tmp_path):
    with pytest.raises(ValueError):
        UpsertTable(
            spark=spark,
            path=str(tmp_path / "bad"),
            keys=["k"],
            precombine="ver",
            partition_by=["part"],
            record_index=True,
        )
