"""ANSI MERGE INTO semantics over UpsertTable (Hudi's SQL merge surface):
clause conditions, delete branch, cardinality rule, identity protection."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import UpsertTable


def _rows(spark, data):
    return spark.createDataFrame(
        [Row(k=k, part=p, v=v, ver=ver) for (k, p, v, ver) in data]
    )


def _state(table):
    return sorted((r.k, r.part, r.v, r.ver) for r in table.read().collect())


@pytest.fixture
def table(spark, tmp_path):
    t = UpsertTable(
        spark=spark, path=str(tmp_path / "mtbl"), keys=["k"],
        precombine="ver", partition_by=["part"],
    )
    t.upsert(_rows(spark, [(1, "a", "x", 5), (2, "a", "y", 5), (3, "b", "z", 5)]))
    return t


def test_merge_update_delete_insert_clauses(spark, table):
    src = _rows(spark, [
        (1, "a", "x-new", 9),   # matched, fresher -> update
        (2, "a", "DROP", 9),    # matched -> delete clause
        (9, "a", "ins", 1),     # not matched -> insert
    ])
    rep = table.merge_into(
        src,
        matched_update={"v": "s.v", "ver": "s.ver"},
        matched_update_condition="s.ver > t.ver",
        matched_delete_condition="s.v = 'DROP'",
    )
    assert rep == {"updated": 1, "deleted": 1, "inserted": 1}
    assert _state(table) == [
        (1, "a", "x-new", 9), (3, "b", "z", 5), (9, "a", "ins", 1),
    ]


def test_merge_stale_source_is_noop_under_condition(spark, table):
    src = _rows(spark, [(1, "a", "stale", 1)])
    rep = table.merge_into(
        src,
        matched_update={"v": "s.v", "ver": "s.ver"},
        matched_update_condition="s.ver > t.ver",
    )
    assert rep == {"updated": 0, "deleted": 0, "inserted": 0}
    assert _state(table)[0] == (1, "a", "x", 5)  # untouched


def test_merge_update_set_star_default(spark, table):
    src = _rows(spark, [(3, "b", "z2", 8)])
    rep = table.merge_into(src)  # UPDATE SET * / INSERT *
    assert rep["updated"] == 1
    assert _state(table)[2] == (3, "b", "z2", 8)


def test_merge_not_matched_condition_filters_inserts(spark, table):
    src = _rows(spark, [(7, "a", "yes", 1), (8, "a", "no", 1)])
    rep = table.merge_into(src, not_matched_condition="s.v = 'yes'")
    assert rep["inserted"] == 1
    ks = {k for (k, *_r) in _state(table)}
    assert 7 in ks and 8 not in ks


def test_merge_cardinality_violation_raises(spark, table):
    src = _rows(spark, [(1, "a", "one", 6), (1, "a", "two", 7)])
    with pytest.raises(ValueError, match="cardinality"):
        table.merge_into(src)
    assert _state(table)[0] == (1, "a", "x", 5)  # nothing committed


def test_merge_cannot_assign_identity_columns(spark, table):
    with pytest.raises(ValueError, match="identity"):
        table.merge_into(
            _rows(spark, [(1, "a", "x", 6)]), matched_update={"part": "'b'"}
        )


def test_merge_untouched_partitions_and_rows_survive(spark, table):
    # source touches only partition a; partition b must stay byte-level
    # untouched and unmatched rows in a keep their values
    src = _rows(spark, [(1, "a", "x2", 9)])
    table.merge_into(src, matched_update={"v": "s.v", "ver": "s.ver"})
    assert _state(table) == [
        (1, "a", "x2", 9), (2, "a", "y", 5), (3, "b", "z", 5),
    ]


def test_merge_delete_can_drain_a_partition(spark, table):
    src = _rows(spark, [(3, "b", "gone", 9)])
    rep = table.merge_into(src, matched_delete_condition="true")
    assert rep["deleted"] == 1
    assert _state(table) == [(1, "a", "x", 5), (2, "a", "y", 5)]


def test_merge_into_empty_table_inserts(spark, tmp_path):
    t = UpsertTable(
        spark=spark, path=str(tmp_path / "fresh"), keys=["k"],
        precombine="ver", partition_by=["part"],
    )
    rep = t.merge_into(_rows(spark, [(1, "a", "x", 1)]))
    assert rep["inserted"] == 1
    assert _state(t) == [(1, "a", "x", 1)]


def test_merge_not_matched_by_source_clauses(spark, tmp_path):
    """SQL:2023 BY SOURCE branches: delete wins over update, conditions
    see t only, matched/inserted rows are untouched by them, and counts
    fold into updated/deleted."""
    from pyspark.sql import Row

    t = UpsertTable(
        spark, str(tmp_path / "bysrc"), keys=["k"], precombine="ver",
        partition_by=["p"],
    )
    t.upsert(spark.createDataFrame([
        Row(k=1, p="a", v=10.0, ver=1),   # stale + low     -> deleted
        Row(k=2, p="a", v=90.0, ver=1),   # stale + high    -> decayed
        Row(k=3, p="b", v=50.0, ver=1),   # matched         -> updated
        Row(k=4, p="c", v=5.0, ver=1),    # stale + low, sole row of c
    ]))
    res = t.merge_into(
        spark.createDataFrame([
            Row(k=3, p="b", v=55.0, ver=2),
            Row(k=9, p="b", v=70.0, ver=1),  # new -> inserted
        ]),
        not_matched_by_source_delete_condition="t.v < 20.0",
        not_matched_by_source_update={"v": "t.v - 10.0"},
    )
    assert res == {"updated": 2, "deleted": 2, "inserted": 1}
    got = sorted((r.k, r.p, r.v) for r in t.read().collect())
    assert got == [(2, "a", 80.0), (3, "b", 55.0), (9, "b", 70.0)]
    # partition c was drained by the by-source delete -> directory gone
    import os
    assert not os.path.isdir(str(tmp_path / "bysrc" / "p=c"))


def test_merge_by_source_update_condition_and_validation(spark, tmp_path):
    from pyspark.sql import Row

    t = UpsertTable(
        spark, str(tmp_path / "bysrc2"), keys=["k"], precombine="ver",
    )
    t.upsert(spark.createDataFrame([
        Row(k=1, v=10.0, ver=1), Row(k=2, v=90.0, ver=1),
    ]))
    # gated by-source update: only high-value stale rows decay
    res = t.merge_into(
        spark.createDataFrame([Row(k=3, v=1.0, ver=1)]),
        not_matched_by_source_update={"v": "t.v - 10.0"},
        not_matched_by_source_update_condition="t.v >= 50.0",
    )
    assert res == {"updated": 1, "deleted": 0, "inserted": 1}
    got = sorted((r.k, r.v) for r in t.read().collect())
    assert got == [(1, 10.0), (2, 80.0), (3, 1.0)]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="needs not_matched_by_source_update"):
        t.merge_into(
            spark.createDataFrame([Row(k=3, v=1.0, ver=1)]),
            not_matched_by_source_update_condition="t.v >= 50.0",
        )
    with _pytest.raises(ValueError, match="identity columns"):
        t.merge_into(
            spark.createDataFrame([Row(k=3, v=1.0, ver=1)]),
            not_matched_by_source_update={"k": "t.k + 100"},
        )


def test_merge_by_source_global_index_rli(spark, tmp_path):
    """BY SOURCE delete must de-index keys the source never names."""
    from pyspark.sql import Row

    t = UpsertTable(
        spark, str(tmp_path / "bysrc3"), keys=["k"], precombine="ver",
        partition_by=["p"], global_index=True, record_index=True,
    )
    t.upsert(spark.createDataFrame([
        Row(k=1, p="a", v=1.0, ver=1), Row(k=2, p="b", v=2.0, ver=1),
    ]))
    res = t.merge_into(
        spark.createDataFrame([Row(k=1, p="a", v=9.0, ver=2)]),
        not_matched_by_source_delete_condition="t.v < 100.0",
    )
    assert res == {"updated": 1, "deleted": 1, "inserted": 0}
    assert sorted((r.k, r.v) for r in t.read().collect()) == [(1, 9.0)]
    assert t.read_key((2,)).collect() == []   # de-indexed
    assert len(t.read_key((1,)).collect()) == 1
