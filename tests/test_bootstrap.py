"""Metadata-only bootstrap (Hudi bootstrap parity): adopt an existing
parquet dataset as a TimelineTable's first instant without rewriting it,
then verify every table service works over the adopted files."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import Row

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import TimelineTable


def _rows(spark, data):
    return spark.createDataFrame(
        [Row(k=k, part=p, v=v, ver=ver) for (k, p, v, ver) in data]
    )


@pytest.fixture
def external(spark, tmp_path):
    """A pre-existing Hive-partitioned parquet dataset (not table-managed)."""
    loc = str(tmp_path / "legacy_data")
    _rows(
        spark,
        [(1, "a", "x", 1), (2, "a", "y", 1), (3, "b", "z", 1)],
    ).write.partitionBy("part").parquet(loc)
    return loc


def _table(spark, tmp_path):
    return TimelineTable(
        spark=spark,
        path=str(tmp_path / "adopted"),
        keys=["k"],
        precombine="ver",
        partition_by=["part"],
    )


def _state(t, **kw):
    return {r.k: (r.part, r.v, r.ver) for r in t.read(**kw).collect()}


def test_bootstrap_reads_in_place(spark, tmp_path, external):
    t = _table(spark, tmp_path)
    files_before = sorted(glob.glob(os.path.join(external, "**", "*.parquet"), recursive=True))
    assert t.bootstrap(external) == 1

    assert _state(t) == {1: ("a", "x", 1), 2: ("a", "y", 1), 3: ("b", "z", 1)}
    assert t.commits()[0]["operation"] == "bootstrap"
    # metadata-only: no snapshot dir was created, no byte copied
    assert not os.path.isdir(t._snapshot_dir(1))
    assert sorted(glob.glob(os.path.join(external, "**", "*.parquet"), recursive=True)) == files_before


def test_upsert_after_bootstrap_leaves_adopted_files_alone(spark, tmp_path, external):
    t = _table(spark, tmp_path)
    t.bootstrap(external)
    files_before = set(glob.glob(os.path.join(external, "**", "*.parquet"), recursive=True))

    t.upsert(_rows(spark, [(1, "a", "x2", 2), (4, "a", "w", 1)]))  # c2: part a
    assert _state(t) == {
        1: ("a", "x2", 2), 2: ("a", "y", 1), 3: ("b", "z", 1), 4: ("a", "w", 1)
    }
    # time travel to the bootstrap instant still serves the original data
    assert _state(t, as_of=1) == {1: ("a", "x", 1), 2: ("a", "y", 1), 3: ("b", "z", 1)}
    # partition b is still served from the adopted location (never rewritten)
    assert set(glob.glob(os.path.join(external, "**", "*.parquet"), recursive=True)) == files_before


def test_incremental_and_cdc_see_bootstrap_records(spark, tmp_path, external):
    t = _table(spark, tmp_path)
    t.bootstrap(external)
    t.upsert(_rows(spark, [(1, "a", "x2", 2)]))  # c2

    # a replica built from incremental(0) converges to read()
    inc_all = t.incremental(0)
    assert {r.k: (r.v, r.ver) for r in inc_all.collect()} == {
        1: ("x2", 2), 2: ("y", 1), 3: ("z", 1)
    }
    # the bootstrap instant's records carry commit id 1
    inc_boot = t.incremental(0, 1)
    assert {r.k for r in inc_boot.collect()} == {1, 2, 3}
    assert {r["_commit_id"] for r in inc_boot.collect()} == {1}
    # CDC: bootstrap rows are inserts, the upsert row an update
    ch = {r.k: r["_change_type"] for r in t.changes(1, 2).collect()}
    assert ch == {1: "update"}


def test_services_never_touch_external_location(spark, tmp_path, external):
    t = _table(spark, tmp_path)
    t.bootstrap(external)
    files_before = set(glob.glob(os.path.join(external, "**", "*.parquet"), recursive=True))
    t.upsert(_rows(spark, [(1, "a", "x2", 2)]))
    t.upsert(_rows(spark, [(3, "b", "z2", 2)]))
    t.compact()
    t.clean(keep_last=1)
    assert set(glob.glob(os.path.join(external, "**", "*.parquet"), recursive=True)) == files_before
    assert _state(t) == {1: ("a", "x2", 2), 2: ("a", "y", 1), 3: ("b", "z2", 2)}


def test_bootstrap_validation(spark, tmp_path, external):
    t = _table(spark, tmp_path)
    with pytest.raises(ValueError, match="not found"):
        t.bootstrap(str(tmp_path / "nope"))
    t.bootstrap(external)
    with pytest.raises(ValueError, match="empty table"):
        t.bootstrap(external)

    t2 = TimelineTable(
        spark=spark, path=str(tmp_path / "t2"), keys=["k"],
        precombine="missing_col", partition_by=["part"],
    )
    with pytest.raises(ValueError, match="lacks table columns"):
        t2.bootstrap(external)


def test_bootstrap_unpartitioned(spark, tmp_path):
    loc = str(tmp_path / "flat")
    spark.createDataFrame(
        [(1, "x", 1), (2, "y", 1)], "k long, v string, ver long"
    ).write.parquet(loc)
    t = TimelineTable(
        spark=spark, path=str(tmp_path / "flat_t"), keys=["k"], precombine="ver"
    )
    t.bootstrap(loc)
    assert {r.k: (r.v, r.ver) for r in t.read().collect()} == {1: ("x", 1), 2: ("y", 1)}
    t.upsert(spark.createDataFrame([(2, "y2", 2)], "k long, v string, ver long"))
    assert {r.k: r.v for r in t.read().collect()} == {1: "x", 2: "y2"}
    assert {r.k: r.v for r in t.read(as_of=1).collect()} == {1: "x", 2: "y"}
