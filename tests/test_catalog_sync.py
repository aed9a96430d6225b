"""Persistent catalog sync (SURVEY.md §2 A11 — glue_job_script.py:64-73).

The reference's hive-sync contract: after each commit, OTHER engines and
sessions see the table, its partitions, and the latest data. Here that
means an external catalog table visible from a fresh ``spark.newSession()``
(the external catalog lives in SharedState, temp views do not — a temp
view would fail every test in this file).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from aws_glue_streaming_etl_with_apache_hudi_spark import catalog as cat
from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import UpsertTable


def _fresh_counts(spark, name: str, where: str = "") -> int:
    """Query through a brand-new session — temp views are invisible here."""
    return spark.newSession().sql(f"SELECT count(*) c FROM {name} {where}").first()["c"]


@pytest.fixture()
def table(spark, tmp_path):
    t = UpsertTable(
        spark,
        str(tmp_path / "tbl"),
        keys=["name"],
        precombine="date",
        partition_by=["year", "month"],
        table_name="catalog_sync_tbl",
    )
    yield t
    spark.sql("DROP TABLE IF EXISTS catalog_sync_tbl")


def test_fresh_session_sees_upserts_and_partitions(spark, table):
    table.upsert(
        spark.createDataFrame(
            [
                Row(name="a", date="2024-01-01", year="2024", month="01", v=1),
                Row(name="b", date="2024-02-01", year="2024", month="02", v=2),
            ]
        )
    )
    assert _fresh_counts(spark, "catalog_sync_tbl") == 2

    # second commit: fresh session sees the NEW state (update wins + insert)
    table.upsert(
        spark.createDataFrame(
            [
                Row(name="a", date="2024-01-05", year="2024", month="01", v=100),
                Row(name="c", date="2024-03-01", year="2024", month="03", v=3),
            ]
        )
    )
    fresh = spark.newSession()
    rows = {
        r["name"]: r["v"]
        for r in fresh.sql("SELECT name, v FROM catalog_sync_tbl").collect()
    }
    assert rows == {"a": 100, "b": 2, "c": 3}
    # partitions are registered in the catalog (not just readable)
    parts = {
        r["partition"]
        for r in fresh.sql("SHOW PARTITIONS catalog_sync_tbl").collect()
    }
    assert "year=2024/month=03" in parts and "year=2024/month=01" in parts
    # partition pruning works through the catalog table
    assert _fresh_counts(spark, "catalog_sync_tbl", "WHERE month='02'") == 1


def test_fresh_session_sees_delete_partition(spark, table):
    table.upsert(
        spark.createDataFrame(
            [
                Row(name="a", date="2024-01-01", year="2024", month="01", v=1),
                Row(name="b", date="2024-02-01", year="2024", month="02", v=2),
            ]
        )
    )
    table.delete_partition(("2024", "01"))
    fresh = spark.newSession()
    assert fresh.sql("SELECT count(*) c FROM catalog_sync_tbl").first()["c"] == 1
    parts = {
        r["partition"]
        for r in fresh.sql("SHOW PARTITIONS catalog_sync_tbl").collect()
    }
    assert "year=2024/month=01" not in parts


def test_fresh_session_sees_schema_evolution(spark, table):
    table.upsert(
        spark.createDataFrame(
            [Row(name="a", date="2024-01-01", year="2024", month="01", v=1)]
        )
    )
    # additive evolution: new column arrives in a later batch (A7)
    table.upsert(
        spark.createDataFrame(
            [Row(name="b", date="2024-01-02", year="2024", month="01", v=2, extra="x")]
        )
    )
    fresh = spark.newSession()
    row = fresh.sql(
        "SELECT extra FROM catalog_sync_tbl WHERE name='b'"
    ).first()
    assert row["extra"] == "x"
    assert "extra" in fresh.table("catalog_sync_tbl").columns


def test_unpartitioned_table_sync(spark, tmp_path):
    t = UpsertTable(
        spark,
        str(tmp_path / "flat"),
        keys=["name"],
        precombine="date",
        table_name="catalog_sync_flat",
    )
    try:
        t.upsert(spark.createDataFrame([Row(name="a", date="2024-01-01", v=1)]))
        t.upsert(spark.createDataFrame([Row(name="a", date="2024-01-02", v=9)]))
        fresh = spark.newSession()
        assert fresh.sql("SELECT v FROM catalog_sync_flat").first()["v"] == 9
    finally:
        spark.sql("DROP TABLE IF EXISTS catalog_sync_flat")


def test_partition_value_escaping(spark, tmp_path):
    """Data-derived partition values with quotes/backslashes must not break
    the ALTER TABLE statements (ADVICE r2: injection via unescaped
    literals)."""
    t = UpsertTable(
        spark,
        str(tmp_path / "esc"),
        keys=["k"],
        precombine="date",
        partition_by=["name"],
        table_name="catalog_sync_esc",
    )
    try:
        t.upsert(
            spark.createDataFrame(
                [
                    Row(k=1, date="2024-01-01", name="o'brien", v=1),
                    Row(k=2, date="2024-01-01", name="plain", v=2),
                ]
            )
        )
        # second commit targets ONLY the quoted partition -> incremental
        # ALTER ADD PARTITION path runs with the quoted value
        t.upsert(
            spark.createDataFrame([Row(k=3, date="2024-01-02", name="o'brien", v=3)])
        )
        fresh = spark.newSession()
        got = fresh.sql(
            "SELECT count(*) c FROM catalog_sync_esc WHERE name = 'o\\'brien'"
        ).first()["c"]
        assert got == 2
    finally:
        spark.sql("DROP TABLE IF EXISTS catalog_sync_esc")


def test_sql_literal_escapes():
    assert cat._sql_literal("a'b") == "'a\\'b'"
    assert cat._sql_literal("a\\b") == "'a\\\\b'"
    assert cat._sql_literal(5) == "'5'"


def test_timeline_table_fresh_session_sees_latest_commit(spark, tmp_path):
    """TimelineTable hive-sync: catalog partitions point at the OWNING
    commit's snapshot dir (Hudi's sync model) — a fresh session reads
    the latest committed state, and a new commit flips only touched
    partitions' locations."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import TimelineTable

    t = TimelineTable(
        spark,
        str(tmp_path / "tl"),
        keys=["k"],
        precombine="ver",
        partition_by=["part"],
        table_name="catalog_sync_tl",
    )
    try:
        t.upsert(
            spark.createDataFrame(
                [Row(k=1, part="a", v="x", ver=1), Row(k=2, part="b", v="y", ver=1)]
            )
        )
        fresh = spark.newSession()
        assert {
            (r.k, r.v) for r in fresh.sql("SELECT k, v FROM catalog_sync_tl").collect()
        } == {(1, "x"), (2, "y")}

        # commit 2 touches ONLY part=a; a fresh session sees the new
        # state of a and the old state of b
        t.upsert(spark.createDataFrame([Row(k=1, part="a", v="x2", ver=2)]))
        fresh2 = spark.newSession()
        assert {
            (r.k, r.v) for r in fresh2.sql("SELECT k, v FROM catalog_sync_tl").collect()
        } == {(1, "x2"), (2, "y")}

        # rollback restores the catalog to commit 1
        t.rollback(1)
        fresh3 = spark.newSession()
        assert {
            (r.k, r.v) for r in fresh3.sql("SELECT k, v FROM catalog_sync_tl").collect()
        } == {(1, "x"), (2, "y")}
    finally:
        spark.sql("DROP TABLE IF EXISTS catalog_sync_tl")


def test_timeline_unpartitioned_table_sync(spark, tmp_path):
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import TimelineTable

    t = TimelineTable(
        spark,
        str(tmp_path / "tlu"),
        keys=["k"],
        precombine="ver",
        table_name="catalog_sync_tlu",
    )
    try:
        t.upsert(spark.createDataFrame([Row(k=1, v="x", ver=1)]))
        t.upsert(spark.createDataFrame([Row(k=1, v="x2", ver=2)]))
        fresh = spark.newSession()
        assert fresh.sql("SELECT v FROM catalog_sync_tlu").first()["v"] == "x2"
    finally:
        spark.sql("DROP TABLE IF EXISTS catalog_sync_tlu")


def test_mor_ro_rt_table_pair(spark, tmp_path):
    """MOR hive-sync registers Hudi's table pair: `<name>_ro` is a real
    external table over the base files (fresh sessions can scan it;
    stale until compaction), `<name>_rt`/plain name are the realtime
    merge view (session-local by nature)."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.mor import CompactionPolicy, MergeOnReadTable

    t = MergeOnReadTable(
        spark,
        str(tmp_path / "mor"),
        keys=["k"],
        precombine="ver",
        partition_by=["part"],
        table_name="catalog_sync_mor",
        policy=CompactionPolicy(max_delta_commits=None, max_log_bytes=None),
    )
    try:
        t.upsert(
            spark.createDataFrame(
                [Row(k=1, part="a", v="x", ver=1), Row(k=2, part="b", v="y", ver=1)]
            )
        )
        t.upsert(spark.createDataFrame([Row(k=1, part="a", v="x2", ver=2)]))

        fresh = spark.newSession()
        # read-optimized: base only -> still the pre-delta state
        ro = {r.k: r.v for r in fresh.sql("SELECT k, v FROM catalog_sync_mor_ro").collect()}
        assert ro == {1: "x", 2: "y"}
        # realtime view exists in the OWNING session and sees the merge
        rt = {r.k: r.v for r in spark.sql("SELECT k, v FROM catalog_sync_mor_rt").collect()}
        assert rt == {1: "x2", 2: "y"}

        t.compact()
        fresh2 = spark.newSession()
        ro2 = {r.k: r.v for r in fresh2.sql("SELECT k, v FROM catalog_sync_mor_ro").collect()}
        assert ro2 == {1: "x2", 2: "y"}
    finally:
        spark.sql("DROP TABLE IF EXISTS catalog_sync_mor_ro")
