"""read_for(conditions): the combined access-path planner (ROUND_NOTES
"combined planner" refinement) — one entry point that routes a simple
predicate to the record index, the column-stats index, partition
pruning, or a scan, with IDENTICAL results across paths."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import UpsertTable


@pytest.fixture
def table(spark, tmp_path):
    t = UpsertTable(
        spark=spark,
        path=str(tmp_path / "planner"),
        keys=["k"],
        precombine="ver",
        partition_by=["part"],
        global_index=True,
        record_index=True,
        stats_columns=["val"],
        rli_buckets=4,
    )
    t.upsert(
        spark.createDataFrame(
            [
                Row(k=k, part=("a" if k < 50 else "b"), val=k * 10, ver=1)
                for k in range(100)
            ]
        )
    )
    return t


def _data_files(df):
    return [f for f in df.inputFiles() if "/_rli/" not in f]


def test_key_equality_routes_to_record_index(table):
    hit = table.read_for({"k": 7})
    rows = hit.collect()
    assert [(r.k, r.val) for r in rows] == [(7, 70)]
    # only the home partition's files were listed, through the RLI
    assert all("part=a" in f for f in _data_files(hit))


def test_stats_range_routes_to_partition_skipping(table):
    out = table.read_for({"val": (600, 800)})
    assert sorted(r.k for r in out.collect()) == list(range(60, 81))
    # val 600-800 lives entirely in part=b: part=a pruned by column stats
    assert all("part=b" in f for f in _data_files(out))


def test_partition_equality_routes_to_partition_pruning(table):
    out = table.read_for({"part": "a"})
    assert sorted(r.k for r in out.collect()) == list(range(50))
    assert all("part=a" in f for f in _data_files(out))


def test_residual_conditions_always_applied(table):
    # key lookup with an extra range residual that EXCLUDES the row
    assert table.read_for({"k": 7, "val": (1000, None)}).count() == 0
    # stats route with a residual equality on a non-indexed column
    out = table.read_for({"val": (600, 800), "k": 61}).collect()
    assert [(r.k, r.val) for r in out] == [(61, 610)]


def test_all_paths_agree(table):
    """The planner only changes which files are listed — every route
    returns the same rows as a filtered full scan."""
    import pyspark.sql.functions as F

    for conditions, scan_filter in [
        ({"k": 7}, F.col("k") == 7),
        ({"val": (600, 800)}, F.col("val").between(600, 800)),
        ({"part": "a"}, F.col("part") == "a"),
        ({"val": 250}, F.col("val") == 250),
    ]:
        got = sorted(
            tuple(r) for r in table.read_for(conditions).select("k", "val").collect()
        )
        want = sorted(
            tuple(r)
            for r in table.read().filter(scan_filter).select("k", "val").collect()
        )
        assert got == want, conditions


def test_unknown_column_rejected(table):
    with pytest.raises(ValueError, match="unknown columns"):
        table.read_for({"nope": 1})
