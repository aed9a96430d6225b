"""Secondary index (operators/upsert.py, Hudi 1.0 parity): a non-key
column's value -> partition-path map, maintained with every commit and
used by read_for to prune point lookups."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import UpsertTable

SCHEMA = "k long, p string, tag string, ver long"


def _tbl(spark, path, **kw):
    return UpsertTable(
        spark, path, keys=["k"], precombine="ver", partition_by=["p"],
        secondary_index_columns=["tag"], **kw,
    )


def _rows(df):
    return sorted((r.k, r.p, r.tag, r.ver) for r in df.collect())


def test_requires_partitioning():
    with pytest.raises(ValueError, match="secondary_index_columns"):
        UpsertTable(None, "/tmp/x", keys=["k"], precombine="v",
                    secondary_index_columns=["tag"])


def test_lookup_matches_full_scan(spark, tmp_path):
    t = _tbl(spark, str(tmp_path / "t"))
    t.upsert(spark.createDataFrame(
        [(1, "a", "red", 1), (2, "a", "blue", 1),
         (3, "b", "red", 1), (4, "c", "blue", 1)], SCHEMA))
    got = _rows(t.read_for({"tag": "red"}))
    want = _rows(t.read().filter(F.col("tag") == "red"))
    assert got == want == [(1, "a", "red", 1), (3, "b", "red", 1)]


def test_lookup_prunes_to_containing_partitions(spark, tmp_path):
    t = _tbl(spark, str(tmp_path / "t"))
    t.upsert(spark.createDataFrame(
        [(1, "a", "red", 1), (2, "b", "blue", 1), (3, "c", "blue", 1)], SCHEMA))
    assert sorted(t._sidx_lookup("tag", "red")) == [("a",)]
    assert sorted(t._sidx_lookup("tag", "blue")) == [("b",), ("c",)]
    assert t._sidx_lookup("tag", "absent") == []
    assert t.read_for({"tag": "absent"}).count() == 0


def test_index_follows_commits(spark, tmp_path):
    """A later commit that retags a key must move the index entry when
    the old value drains from its partition's live rows."""
    t = _tbl(spark, str(tmp_path / "t"))
    t.upsert(spark.createDataFrame([(1, "a", "red", 1), (2, "b", "blue", 1)], SCHEMA))
    t.upsert(spark.createDataFrame([(1, "a", "green", 2)], SCHEMA))  # retag k=1
    assert t._sidx_lookup("tag", "red") == []  # no live red rows anywhere
    assert sorted(t._sidx_lookup("tag", "green")) == [("a",)]
    assert _rows(t.read_for({"tag": "green"})) == [(1, "a", "green", 2)]
    assert t.read_for({"tag": "red"}).count() == 0


def test_emptied_partition_drops_index_entries(spark, tmp_path):
    t = UpsertTable(
        spark, str(tmp_path / "t"), keys=["k"], precombine="ver",
        partition_by=["p"], global_index=True,
        secondary_index_columns=["tag"],
    )
    t.upsert(spark.createDataFrame([(1, "a", "red", 1), (2, "b", "blue", 1)], SCHEMA))
    # global-index migration: k=1 moves partition a -> c, draining a
    t.upsert(spark.createDataFrame([(1, "c", "red", 2)], SCHEMA))
    assert not os.path.isdir(str(tmp_path / "t" / "p=a"))
    assert sorted(t._sidx_lookup("tag", "red")) == [("c",)]


def test_delete_partition_drops_index_entries(spark, tmp_path):
    t = _tbl(spark, str(tmp_path / "t"))
    t.upsert(spark.createDataFrame(
        [(1, "a", "red", 1), (2, "b", "red", 1)], SCHEMA))
    t.delete_partition(("a",))
    assert sorted(t._sidx_lookup("tag", "red")) == [("b",)]


def test_backfill_on_preexisting_table(spark, tmp_path):
    plain = UpsertTable(spark, str(tmp_path / "t"), keys=["k"],
                        precombine="ver", partition_by=["p"])
    plain.upsert(spark.createDataFrame([(1, "a", "red", 1), (2, "b", "blue", 1)], SCHEMA))
    t = UpsertTable(spark, str(tmp_path / "t"), keys=["k"], precombine="ver",
                    partition_by=["p"], secondary_index_columns=["tag"])
    # index not built yet: read_for falls through to a scan, same rows
    assert _rows(t.read_for({"tag": "red"})) == [(1, "a", "red", 1)]
    t.build_secondary_index("tag")
    assert sorted(t._sidx_lookup("tag", "red")) == [("a",)]
    assert _rows(t.read_for({"tag": "red"})) == [(1, "a", "red", 1)]


def test_read_for_prefers_sidx_and_reads_only_mapped_dirs(spark, tmp_path, monkeypatch):
    t = _tbl(spark, str(tmp_path / "t"))
    t.upsert(spark.createDataFrame(
        [(1, "a", "red", 1), (2, "b", "blue", 1), (3, "c", "blue", 1)], SCHEMA))
    seen: list[list[tuple]] = []
    real = UpsertTable._read_partition_dirs

    def spy(self, parts):
        seen.append(sorted(parts))
        return real(self, parts)

    monkeypatch.setattr(UpsertTable, "_read_partition_dirs", spy)
    rows = _rows(t.read_for({"tag": "blue"}))
    assert rows == [(2, "b", "blue", 1), (3, "c", "blue", 1)]
    assert seen == [[("b",), ("c",)]]  # exactly the mapped partitions


# -- r13: compacted snapshot layout + cardinality cap ------------------------


def test_snapshot_single_file_layout(spark, tmp_path):
    """The sidecar is ONE compacted snapshot file regardless of commits
    or partition count (the r12 layout kept one file per partition dir
    and the lookup ran a distributed scan over all of them)."""
    t = _tbl(spark, str(tmp_path / "t"))
    t.upsert(spark.createDataFrame(
        [(1, "a", "red", 1), (2, "b", "blue", 1)], SCHEMA))
    t.upsert(spark.createDataFrame([(3, "c", "red", 1)], SCHEMA))
    root = t._sidx_dir("tag")
    assert sorted(f for f in os.listdir(root) if not f.startswith(".")) == [
        "snapshot.parquet"
    ]
    assert sorted(t._sidx_lookup("tag", "red")) == [("a",), ("c",)]
    assert t._sidx_lookup("tag", "green") == []


def test_cap_overflow_degrades_to_stats(spark, tmp_path):
    """A partition past fidx_max_values collapses to min/max (+ null
    marker): the lookup keeps it on range overlap (superset — read_for's
    residual restores exactness) and prunes it on disjoint probes."""
    t = _tbl(spark, str(tmp_path / "t"), fidx_max_values=2)
    t.upsert(spark.createDataFrame(
        [(1, "a", "b1", 1), (2, "a", "m1", 1), (3, "a", "m2", 1),
         (4, "a", "t9", 1), (5, "a", None, 1),
         (6, "b", "m1", 1)], SCHEMA))
    idx = spark.read.parquet(t._sidx_dir("tag"))
    a = idx.filter(F.col("p") == "a").collect()
    assert sorted(r.sval for r in a if r.sval is not None) == ["b1", "t9"]
    assert all(not r.sexact for r in a)
    assert any(r.sval is None for r in a)  # null marker row
    # probe INSIDE the collapsed range: kept (superset), result exact
    assert sorted(t._sidx_lookup("tag", "m1")) == [("a",), ("b",)]
    got = _rows(t.read_for({"tag": "m1"}))
    want = _rows(t.read().filter(F.col("tag") == "m1"))
    assert got == want == [(2, "a", "m1", 1), (6, "b", "m1", 1)]
    # probe stored-at-the-bound: exact containment via the min row
    assert _rows(t.read_for({"tag": "b1"})) == [(1, "a", "b1", 1)]
    # probe OUTSIDE [b1, t9]: pruned despite the collapse
    assert t._sidx_lookup("tag", "zz") == []
    assert _rows(t.read_for({"tag": "zz"})) == []
    # null probe: collapsed partition kept via the marker, exact result
    assert t._sidx_lookup("tag", None) == [("a",)]
    got = _rows(t.read_for({"tag": None}))
    want = _rows(t.read().filter(F.col("tag").isNull()))
    assert got == want == [(5, "a", None, 1)]


def test_null_value_and_null_partition_roundtrip(spark, tmp_path):
    """NULL indexed values and NULL partition values both survive the
    snapshot's token columns (the r12 Spark-layout behaviors, kept)."""
    t = _tbl(spark, str(tmp_path / "t"))
    t.upsert(spark.createDataFrame(
        [(1, "a", None, 1), (2, None, "red", 1)], SCHEMA))
    assert t._sidx_lookup("tag", None) == [("a",)]
    assert t._sidx_lookup("tag", "red") == [(None,)]
    got = _rows(t.read_for({"tag": "red"}))
    assert got == [(2, None, "red", 1)]


def test_legacy_hive_layout_migrates_to_snapshot(spark, tmp_path):
    """A pre-r13 per-partition sidecar (rows under the column's own
    name, no exactness flag) still answers lookups and is folded into a
    compacted snapshot by the next commit."""
    import shutil

    t = _tbl(spark, str(tmp_path / "t"))
    t.upsert(spark.createDataFrame(
        [(1, "a", "red", 1), (2, "b", "blue", 1)], SCHEMA))
    root = t._sidx_dir("tag")
    shutil.rmtree(root)
    (
        t.read().select(F.col("tag"), "p").distinct()
        .write.mode("overwrite").partitionBy("p").parquet(root)
    )
    assert "snapshot.parquet" not in os.listdir(root)
    assert sorted(t._sidx_lookup("tag", "red")) == [("a",)]
    t.upsert(spark.createDataFrame([(3, "c", "red", 1)], SCHEMA))
    assert sorted(
        f for f in os.listdir(root) if not f.startswith(".")
    ) == ["snapshot.parquet"]
    assert sorted(t._sidx_lookup("tag", "red")) == [("a",), ("c",)]
    assert sorted(t._sidx_lookup("tag", "blue")) == [("b",)]
