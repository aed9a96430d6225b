"""Upsert semantics (SURVEY.md §2 A8-A11): key uniqueness, precombine
max-wins, batch-wins-on-tie, idempotent replay, partition layout."""

from __future__ import annotations

import os

from pyspark.sql import Row

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import (
    UpsertTable,
    precombine_latest,
    upsert_dataframe,
)


def rows_by_key(df, key="name"):
    return {r[key]: r.asDict() for r in df.collect()}


def test_precombine_latest_keeps_max(spark):
    df = spark.createDataFrame(
        [
            Row(name="a", date="2024-01-01", v=1),
            Row(name="a", date="2024-01-03", v=2),
            Row(name="a", date="2024-01-02", v=3),
            Row(name="b", date="2024-01-01", v=4),
        ]
    )
    out = rows_by_key(precombine_latest(df, ["name"], "date"))
    assert out["a"]["v"] == 2 and out["a"]["date"] == "2024-01-03"
    assert out["b"]["v"] == 4


def test_upsert_dataframe_merge_and_tie(spark):
    stored = spark.createDataFrame(
        [Row(name="a", date="2024-01-02", v=1), Row(name="b", date="2024-01-05", v=2)]
    )
    batch = spark.createDataFrame(
        [
            Row(name="a", date="2024-01-02", v=10),  # tie on precombine: batch wins
            Row(name="b", date="2024-01-01", v=20),  # older: stored wins
            Row(name="c", date="2024-01-01", v=30),  # new key: insert
        ]
    )
    out = rows_by_key(upsert_dataframe(stored, batch, ["name"], "date"))
    assert out["a"]["v"] == 10
    assert out["b"]["v"] == 2
    assert out["c"]["v"] == 30
    assert len(out) == 3


def test_upsert_table_end_to_end(spark, tmp_path):
    path = str(tmp_path / "tbl")
    t = UpsertTable(
        spark,
        path,
        keys=["name"],
        precombine="date",
        partition_by=["year", "month", "day"],
        table_name="hudi_like",
    )
    b1 = spark.createDataFrame(
        [
            Row(name="a", date="2024-01-01", year="2024", month="01", day="01", v=1),
            Row(name="b", date="2024-01-01", year="2024", month="01", day="01", v=2),
        ]
    )
    t.upsert(b1)
    b2 = spark.createDataFrame(
        [
            Row(name="a", date="2024-01-02", year="2024", month="01", day="01", v=100),
            Row(name="c", date="2024-01-02", year="2024", month="01", day="02", v=3),
        ]
    )
    t.upsert(b2)

    out = rows_by_key(t.read())
    assert out["a"]["v"] == 100
    assert out["b"]["v"] == 2
    assert out["c"]["v"] == 3

    # Hive-style partition layout on disk (A10)
    assert os.path.isdir(os.path.join(path, "year=2024", "month=01", "day=01"))
    assert os.path.isdir(os.path.join(path, "year=2024", "month=01", "day=02"))

    # catalog sync (A11): table queryable via SQL
    assert spark.sql("SELECT count(*) AS n FROM hudi_like").collect()[0].n == 3

    # idempotent replay (A12 foundation): re-applying b2 changes nothing
    t.upsert(b2)
    out2 = rows_by_key(t.read())
    assert out2 == out


def test_upsert_untouched_partition_not_rewritten(spark, tmp_path):
    path = str(tmp_path / "tbl2")
    t = UpsertTable(spark, path, keys=["name"], precombine="date", partition_by=["day"])
    t.upsert(
        spark.createDataFrame(
            [Row(name="a", date="1", day="d1", v=1), Row(name="b", date="1", day="d2", v=2)]
        )
    )
    files_before = set(os.listdir(os.path.join(path, "day=d2")))
    t.upsert(spark.createDataFrame([Row(name="a", date="2", day="d1", v=9)]))
    files_after = set(os.listdir(os.path.join(path, "day=d2")))
    # untouched partition's files are physically unchanged (incremental COW)
    assert files_before == files_after
    out = rows_by_key(t.read())
    assert out["a"]["v"] == 9 and out["b"]["v"] == 2


def test_upsert_schema_evolution_across_commits(spark, tmp_path):
    path = str(tmp_path / "tbl3")
    t = UpsertTable(spark, path, keys=["name"], precombine="date")
    t.upsert(spark.createDataFrame([Row(name="a", date="1", v=1)]))
    # batch with an extra column and a missing column
    t.upsert(spark.createDataFrame([Row(name="b", date="1", extra="x")]))
    out = rows_by_key(t.read())
    assert out["a"]["extra"] is None
    assert out["b"]["v"] is None and out["b"]["extra"] == "x"
