"""Partition-level column statistics + data skipping
(operators/upsert.py stats_columns / read_skipping — the pure-Spark
analogue of Hudi's metadata-table column_stats index)."""

from __future__ import annotations

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
        path=str(tmp_path / "st"),
        keys=["k"],
        precombine="ver",
        partition_by=["part"],
        stats_columns=["v"],
    )


def test_stats_tracked_per_partition(table, spark):
    table.upsert(_rows(spark, [(1, "a", 10, 1), (2, "a", 20, 1), (3, "b", 100, 1)]))
    import json

    stats = json.load(open(table._meta_path))["partition_stats"]
    assert stats["a"]["v"] == [10, 20]
    assert stats["b"]["v"] == [100, 100]


def test_stats_refresh_only_touched_partitions(table, spark):
    table.upsert(_rows(spark, [(1, "a", 10, 1), (3, "b", 100, 1)]))
    table.upsert(_rows(spark, [(1, "a", 50, 2)]))  # touches only a
    import json

    stats = json.load(open(table._meta_path))["partition_stats"]
    assert stats["a"]["v"] == [50, 50]
    assert stats["b"]["v"] == [100, 100]  # untouched entry preserved


def test_read_skipping_prunes_partitions(table, spark):
    table.upsert(
        _rows(
            spark,
            [(1, "a", 10, 1), (2, "a", 20, 1), (3, "b", 100, 1), (4, "c", 200, 1)],
        )
    )
    df = table.read_skipping("v", lower=90, upper=150)
    files = df.inputFiles()
    assert files and all("part=b" in f for f in files)  # a and c pruned
    assert {r.k for r in df.collect()} == {3}

    # range spanning two partitions keeps both, result still row-filtered
    df2 = table.read_skipping("v", lower=15, upper=120)
    assert {r.k for r in df2.collect()} == {2, 3}

    # no bound on one side
    assert {r.k for r in table.read_skipping("v", lower=150).collect()} == {4}


def test_read_skipping_matches_full_filter(table, spark):
    table.upsert(
        _rows(spark, [(i, p, i * 7 % 50, 1) for i, p in zip(range(20), "abcd" * 5)])
    )
    full = {
        (r.k, r.v)
        for r in table.read().filter("v >= 10 AND v <= 30").collect()
    }
    skipped = {(r.k, r.v) for r in table.read_skipping("v", 10, 30).collect()}
    assert skipped == full


def test_unindexed_column_rejected(table, spark):
    table.upsert(_rows(spark, [(1, "a", 10, 1)]))
    with pytest.raises(ValueError):
        table.read_skipping("ver", 0, 1)


def test_read_skipping_partition_value_with_pipe(spark, tmp_path):
    """A string partition value CONTAINING the stat-key separator '|'
    must survive read_skipping: the key split used to mis-split it and
    the rebuilt directory never existed, silently dropping the
    partition from skipped reads (r10, the _stat_key packing edge)."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import UpsertTable

    t = UpsertTable(
        spark,
        str(tmp_path / "pipe_tbl"),
        keys=["k"],
        precombine="ver",
        partition_by=["part"],
        stats_columns=["v"],
    )
    t.upsert(
        spark.createDataFrame(
            [(1, "a|b", 10, 1), (2, "plain", 100, 1)],
            "k long, part string, v long, ver long",
        )
    )
    got = {(r.k, r.part, r.v) for r in t.read_skipping("v", lower=5, upper=50).collect()}
    assert got == {(1, "a|b", 10)}, got
