"""Delete-family write operations: unconditional DELETE and
DELETE_PARTITION / INSERT_OVERWRITE on UpsertTable, ordered tombstone
deletes + CDC delete classification on TimelineTable."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import TimelineTable
from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import UpsertTable


def _rows(spark, data):
    return spark.createDataFrame(
        [Row(k=k, part=p, v=v, ver=ver) for (k, p, v, ver) in data]
    )


def _keys(spark, data):
    return spark.createDataFrame([Row(k=k, part=p, ver=ver) for (k, p, ver) in data])


# ---------------------------------------------------------------- UpsertTable


@pytest.fixture
def cow(spark, tmp_path):
    return UpsertTable(
        spark=spark,
        path=str(tmp_path / "cow"),
        keys=["k"],
        precombine="ver",
        partition_by=["part"],
        stats_columns=["ver"],
    )


def test_delete_removes_rows_and_emptied_partition(cow, spark):
    cow.upsert(_rows(spark, [(1, "a", "x", 1), (2, "a", "y", 1), (3, "b", "z", 1)]))
    cow.delete(_keys(spark, [(3, "b", 9)]))

    assert {r.k for r in cow.read().collect()} == {1, 2}
    assert not os.path.isdir(os.path.join(cow.path, "part=b"))
    import json

    assert "b" not in json.load(open(cow._meta_path)).get("partition_stats", {})

    # partial delete keeps the partition
    cow.delete(_keys(spark, [(1, "a", 9)]))
    assert {r.k for r in cow.read().collect()} == {2}
    assert os.path.isdir(os.path.join(cow.path, "part=a"))


def test_delete_requires_partition_cols_non_global(cow, spark):
    cow.upsert(_rows(spark, [(1, "a", "x", 1)]))
    with pytest.raises(ValueError):
        cow.delete(spark.createDataFrame([Row(k=1)]))


def test_global_delete_locates_homes_by_key(spark, tmp_path):
    t = UpsertTable(
        spark=spark,
        path=str(tmp_path / "g"),
        keys=["k"],
        precombine="ver",
        partition_by=["part"],
        global_index=True,
    )
    t.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)]))
    t.delete(spark.createDataFrame([Row(k=1)]))  # no partition given
    assert {r.k for r in t.read().collect()} == {2}
    assert not os.path.isdir(os.path.join(t.path, "part=a"))


def test_delete_partition(cow, spark):
    cow.upsert(_rows(spark, [(1, "a", "x", 1), (3, "b", "z", 1)]))
    cow.delete_partition(("a",))
    assert {r.k for r in cow.read().collect()} == {3}
    import json

    assert "a" not in json.load(open(cow._meta_path)).get("partition_stats", {})


def test_insert_overwrite_replaces_only_touched(cow, spark):
    cow.upsert(_rows(spark, [(1, "a", "x", 1), (2, "a", "y", 5), (3, "b", "z", 1)]))
    # overwrite partition a: key 2 disappears even though ver 5 > 1
    cow.insert_overwrite(_rows(spark, [(9, "a", "new", 1)]))
    state = {r.k: (r.part, r.v) for r in cow.read().collect()}
    assert state == {9: ("a", "new"), 3: ("b", "z")}


# --------------------------------------------------------------- TimelineTable


@pytest.fixture
def tl(spark, tmp_path):
    return TimelineTable(
        spark=spark,
        path=str(tmp_path / "tl"),
        keys=["k"],
        precombine="ver",
        partition_by=["part"],
    )


def test_tombstone_delete_and_time_travel(tl, spark):
    tl.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)]))
    c2 = tl.delete(_keys(spark, [(1, "a", 2)]))

    assert {r.k for r in tl.read().collect()} == {2}
    assert "_deleted" not in tl.read().columns
    # the pre-delete state is still queryable
    assert {r.k for r in tl.read(as_of=c2 - 1).collect()} == {1, 2}


def test_stale_delete_loses(tl, spark):
    tl.upsert(_rows(spark, [(1, "a", "x", 5)]))
    tl.delete(_keys(spark, [(1, "a", 2)]))  # older ordering value
    assert {r.k for r in tl.read().collect()} == {1}


def test_delete_can_empty_table_and_reads_survive(tl, spark):
    tl.upsert(_rows(spark, [(1, "a", "x", 1)]))
    tl.delete(_keys(spark, [(1, "a", 9)]))
    assert tl.read().count() == 0
    assert tl.read().columns  # schema preserved


def test_cdc_emits_delete(tl, spark):
    tl.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)]))  # c1
    tl.upsert(_rows(spark, [(3, "a", "z", 1)]))                     # c2
    tl.delete(_keys(spark, [(1, "a", 2)]))                          # c3

    cdc = tl.changes(begin=1)
    kinds = {r.k: r._change_type for r in cdc.collect()}
    assert kinds == {1: "delete", 3: "insert"}

    # incremental view carries the tombstone flag for replicas
    inc = tl.incremental(begin=1)
    flags = {r.k: bool(r._deleted) if r._deleted is not None else False
             for r in inc.collect()}
    assert flags == {1: True, 3: False}


def test_read_partitions_lists_only_touched_dirs(spark, tmp_path):
    """The commit-path read (r8): basePath-scoped, O(touched) listing —
    inputFiles shows only the requested partitions; Hive-escaped values
    (quotes, colons) resolve to the directories Spark actually wrote;
    missing partitions are skipped; an all-missing request returns the
    persisted-schema empty frame without touching the table listing."""
    from pyspark.sql import Row

    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import UpsertTable

    t = UpsertTable(
        spark, str(tmp_path / "rp"), keys=["k"], precombine="ver",
        partition_by=["p"],
    )
    t.upsert(spark.createDataFrame([
        Row(k=1, p="plain", v="a", ver=1),
        Row(k=2, p="o'brien", v="b", ver=1),
        Row(k=3, p="x:y", v="c", ver=1),
        Row(k=4, p=None, v="d", ver=1),
    ]))
    got = t.read_partitions([("o'brien",), ("x:y",), (None,), ("missing",)])
    assert sorted((r.k, r.p, r.v) for r in got.collect()) == [
        (2, "o'brien", "b"), (3, "x:y", "c"), (4, None, "d"),
    ]
    files = got.inputFiles()
    assert files and all("p=plain" not in f for f in files)

    empty = t.read_partitions([("nope",)])
    assert empty.count() == 0
    # same shape as a real partition read: data columns then partition
    # columns appended
    assert [f.name for f in empty.schema.fields] == [
        f.name for f in t.read().schema.fields
    ]


def test_fsck_sweeps_crashed_write_scratch(spark, tmp_path):
    """A crashed Spark write's FileOutputCommitter scratch (_temporary,
    .spark-staging-*) under the table is reclaimed by fsck; data and
    sidecars are untouched."""
    import os

    from pyspark.sql import Row

    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import UpsertTable

    t = UpsertTable(
        spark, str(tmp_path / "scratch"), keys=["k"], precombine="ver",
        partition_by=["p"],
    )
    t.upsert(spark.createDataFrame([Row(k=1, p="a", v="x", ver=1)]))
    os.makedirs(os.path.join(t.path, "_temporary", "0"))
    os.makedirs(os.path.join(t.path, ".spark-staging-abc123"))
    rep = t.fsck()
    assert any(p.endswith("_temporary") for p in rep["removed"])
    assert any(".spark-staging" in p for p in rep["removed"])
    assert not os.path.exists(os.path.join(t.path, "_temporary"))
    assert sorted((r.k, r.v) for r in t.read().collect()) == [(1, "x")]


# ------------------------------------------- _hoodie_is_deleted on UpsertTable


def _marked(spark, data):
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        [Row(k=k, part=p, v=v, ver=ver, _hoodie_is_deleted=d)
         for (k, p, v, ver, d) in data]
    ).withColumn("_hoodie_is_deleted", F.col("_hoodie_is_deleted").cast("boolean"))


def test_cow_soft_delete_marker_mixed_batch(spark, cow):
    """Hudi's `_hoodie_is_deleted` payload field on the COW upsert path
    (the reference's own write, glue_job_script.py:50-62): marker-true
    rows delete, the rest merge, one call."""
    cow.upsert(_rows(spark, [(1, "a", "x", 1), (2, "a", "y", 1), (3, "b", "z", 1)]))
    cow.upsert(_marked(spark, [
        (1, "a", "x2", 2, False),   # update
        (2, "a", None, 2, True),    # delete
        (4, "b", "w", 1, False),    # insert
    ]))
    live = {r.k: (r.part, r.v) for r in cow.read().collect()}
    assert live == {1: ("a", "x2"), 3: ("b", "z"), 4: ("b", "w")}


def test_cow_marker_within_batch_precombine(spark, cow):
    """A stale tombstone in the SAME batch loses to a newer update of
    the key (precombine runs before verb routing), and a newer
    tombstone beats an older update."""
    cow.upsert(_rows(spark, [(1, "a", "x", 1), (2, "a", "y", 1)]))
    cow.upsert(_marked(spark, [
        (1, "a", None, 2, True), (1, "a", "new", 3, False),   # update wins
        (2, "a", "old", 2, False), (2, "a", None, 3, True),   # delete wins
    ]))
    live = {r.k: r.v for r in cow.read().collect()}
    assert live == {1: "new"}


def test_cow_marker_all_false_is_plain_upsert(spark, cow):
    cow.upsert(_marked(spark, [(1, "a", "x", 1, False), (2, "b", "y", 1, False)]))
    assert sorted(r.k for r in cow.read().collect()) == [1, 2]
    assert "_hoodie_is_deleted" not in cow.read().columns


def test_cow_marker_rejected_with_partial_merge(spark, tmp_path):
    t = UpsertTable(
        spark=spark, path=str(tmp_path / "pp"), keys=["k"], precombine="ver",
        merge_mode="partial",
    )
    with pytest.raises(ValueError, match="_hoodie_is_deleted"):
        t.upsert(_marked(spark, [(1, "a", "x", 1, True)]))
