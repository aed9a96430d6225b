"""Expression index on the merge-on-read table (operators/mor.py,
Hudi 1.0 parity — metadata-table expression index over a MOR table):
delta commits absorb the batch's values (superset between compactions),
compaction rebuilds folded partitions exactly, restore invalidates.
Exactness contract: read_for_expr == the same filter over read()."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.mor import CompactionPolicy, MergeOnReadTable

SCHEMA = "k long, day string, hr int, ver long"


def _never():
    return CompactionPolicy(max_delta_commits=None, max_log_bytes=None)


def _tbl(spark, path, **kw):
    kw.setdefault("functional_indexes", {"hx": "hr * 10"})
    kw.setdefault("policy", _never())
    return MergeOnReadTable(
        spark, path, keys=["k"], precombine="ver", partition_by=["day"], **kw,
    )


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _keys(df):
    return sorted(r.k for r in df.collect())


def _assert_exact(t, lo, hi):
    got = _keys(t.read_for_expr("hx", between=(lo, hi)))
    want = _keys(t.read().filter(F.expr("hr * 10").between(lo, hi)))
    assert got == want, (lo, hi, got, want)
    return got


def test_requires_partitioning(spark):
    with pytest.raises(ValueError, match="functional_indexes"):
        MergeOnReadTable(spark, "/tmp/x", keys=["k"], precombine="v",
                         functional_indexes={"h": "hr"})


def test_bootstrap_and_delta_absorb(spark, tmp_path):
    t = _tbl(spark, str(tmp_path / "t"))
    t.upsert(_mk(spark, [(1, "d1", 2, 1), (2, "d2", 5, 1)]))
    assert _assert_exact(t, 20, 20) == [1]
    assert _assert_exact(t, 50, 50) == [2]
    assert _assert_exact(t, 90, 90) == []
    # delta commit with a NEW value and a NEW partition
    t.upsert(_mk(spark, [(3, "d1", 7, 1), (4, "d3", 9, 1)]))
    assert _assert_exact(t, 70, 70) == [3]
    assert _assert_exact(t, 90, 90) == [4]
    # candidates prune: value 50 lives only in d2
    assert sorted(t._fidx_candidates("hx", 50, 50)) == [("d2",)]


def test_pruned_probe_lists_only_candidate_base_dirs(spark, tmp_path):
    t = _tbl(spark, str(tmp_path / "t"))
    t.upsert(_mk(spark, [(1, "d1", 2, 1), (2, "d2", 5, 1), (3, "d3", 8, 1)]))
    files = t.read_for_expr("hx", value=50).inputFiles()
    base_files = [f for f in files if "/base/" in f]
    assert base_files and all("day=d2" in f for f in base_files)


def test_superset_until_compaction_then_exact(spark, tmp_path):
    """A re-keyed value lingers as a stale candidate (absorb only
    grows) — results stay exact via the residual; compaction drains."""
    t = _tbl(spark, str(tmp_path / "t"))
    t.upsert(_mk(spark, [(1, "d1", 2, 1), (2, "d2", 5, 1)]))
    t.upsert(_mk(spark, [(1, "d1", 9, 2)]))  # k=1 moves from 20 to 90
    # stale candidate d1 for value 20 is allowed; the RESULT is exact
    assert _assert_exact(t, 20, 20) == []
    assert _assert_exact(t, 90, 90) == [1]
    t.compact()
    assert t._fidx_candidates("hx", 20, 20) == []  # drained exactly
    assert sorted(t._fidx_candidates("hx", 90, 90)) == [("d1",)]
    assert _assert_exact(t, 90, 90) == [1]


def test_tombstone_delta_exact_and_compact_drains(spark, tmp_path):
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import HOODIE_DELETE_MARKER

    t = _tbl(spark, str(tmp_path / "t"))
    t.upsert(_mk(spark, [(1, "d1", 2, 1), (2, "d1", 7, 1), (3, "d2", 5, 1)]))
    tomb = _mk(spark, [(1, "d1", 2, 2)]).withColumn(
        HOODIE_DELETE_MARKER, F.lit(True)
    )
    t.upsert(tomb)
    assert _assert_exact(t, 20, 20) == []       # exact despite stale entry
    assert _assert_exact(t, 70, 70) == [2]
    t.compact()
    assert t._fidx_candidates("hx", 20, 20) == []
    assert _assert_exact(t, 70, 70) == [2]


def test_cap_overflow_collapses(spark, tmp_path):
    t = _tbl(spark, str(tmp_path / "t"), fidx_max_values=2)
    t.upsert(_mk(spark, [(1, "d1", 2, 1), (2, "d1", 5, 1)]))
    t.upsert(_mk(spark, [(3, "d1", 8, 1), (4, "d2", 20, 1)]))  # d1 over cap
    import pyarrow.parquet as pq

    snap = pq.read_table(
        os.path.join(t._fidx_dir("hx"), "snapshot.parquet")
    ).to_pydict()
    d1_rows = [
        (v, e) for v, e, d in zip(snap["fval"], snap["fexact"], snap["day"])
        if d == "d1"
    ]
    assert sorted(v for v, _ in d1_rows) == [20, 80]
    assert all(not e for _, e in d1_rows)
    # inside collapsed range: kept + exact; outside: pruned
    assert _assert_exact(t, 50, 50) == [2]
    assert _assert_exact(t, 30, 30) == []
    assert ("d1",) in t._fidx_candidates("hx", 30, 30)  # superset kept
    assert t._fidx_candidates("hx", 90, 199) == []


def test_nbcc_publishes_absorb(spark, tmp_path):
    t = _tbl(spark, str(tmp_path / "t"))
    t.nbcc_upsert(_mk(spark, [(1, "d1", 2, 1)]), writer="w1")
    t.nbcc_upsert(_mk(spark, [(2, "d2", 5, 1)]), writer="w2")
    t.nbcc_upsert(_mk(spark, [(3, "d1", 7, 1)]), writer="w1")
    assert _assert_exact(t, 20, 20) == [1]
    assert _assert_exact(t, 50, 50) == [2]
    assert _assert_exact(t, 70, 70) == [3]
    assert sorted(t._fidx_candidates("hx", 50, 50)) == [("d2",)]


def test_restore_invalidates_until_rebuild(spark, tmp_path):
    t = _tbl(spark, str(tmp_path / "t"))
    t.upsert(_mk(spark, [(1, "d1", 2, 1)]))
    sp = t.savepoint()
    t.upsert(_mk(spark, [(2, "d2", 5, 1)]))
    t.restore(sp)
    # invalidated: candidates fall back (None), probe still EXACT
    assert t._fidx_candidates("hx", 50, 50) is None
    assert _assert_exact(t, 50, 50) == []
    assert _assert_exact(t, 20, 20) == [1]
    # a compaction heals the index (full rebuild clears the marker)
    t.upsert(_mk(spark, [(3, "d3", 9, 1)]))
    t.compact()
    assert not os.path.isfile(t._fidx_invalid_path("hx"))
    assert sorted(t._fidx_candidates("hx", 90, 90)) == [("d3",)]
    assert _assert_exact(t, 90, 90) == [3]


def test_unanalyzable_batch_invalidates_not_loses(spark, tmp_path):
    """A batch the index expression cannot analyze against (column not
    present pre-evolution) must invalidate the index, never silently
    skip the batch — skipping would lose its rows from every probe."""
    t = MergeOnReadTable(
        spark, str(tmp_path / "t"), keys=["k"], precombine="ver",
        partition_by=["day"], policy=_never(),
        functional_indexes={"nx": "new_col + 1"},
    )
    # bootstrap lacks new_col entirely -> absorb fails -> invalid
    t.upsert(spark.createDataFrame([(1, "d1", 1)], "k long, day string, ver long"))
    assert os.path.isfile(t._fidx_invalid_path("nx"))
    assert t._fidx_candidates("nx", 0, 100) is None
    # evolved batch brings the column; probe is exact via full scan
    t.upsert(spark.createDataFrame(
        [(2, "d2", 1, 41)], "k long, day string, ver long, new_col int"))
    got = _keys(t.read_for_expr("nx", value=42))
    want = _keys(t.read().filter(F.expr("new_col + 1") == 42))
    assert got == want == [2]
    # compaction heals: index rebuilt over the evolved merged view
    t.compact()
    assert not os.path.isfile(t._fidx_invalid_path("nx"))
    assert sorted(t._fidx_candidates("nx", 42, 42)) == [("d2",)]


def test_empty_candidates_returns_schema_frame(spark, tmp_path):
    t = _tbl(spark, str(tmp_path / "t"))
    t.upsert(_mk(spark, [(1, "d1", 2, 1)]))
    out = t.read_for_expr("hx", value=999)
    assert out.count() == 0
    assert set(out.columns) == {"k", "day", "hr", "ver"}


def test_backfill_build(spark, tmp_path):
    t = MergeOnReadTable(
        spark, str(tmp_path / "t"), keys=["k"], precombine="ver",
        partition_by=["day"], policy=_never(),
    )
    t.upsert(_mk(spark, [(1, "d1", 2, 1), (2, "d2", 5, 1)]))
    t.build_functional_index("hx", "hr * 10")
    assert sorted(t._fidx_candidates("hx", 50, 50)) == [("d2",)]
    assert _keys(t.read_for_expr("hx", value=50)) == [2]


def test_probe_argument_validation(spark, tmp_path):
    t = _tbl(spark, str(tmp_path / "t"))
    t.upsert(_mk(spark, [(1, "d1", 2, 1)]))
    with pytest.raises(ValueError, match="not a functional index"):
        t.read_for_expr("nope", value=1)
    with pytest.raises(ValueError, match="exactly one"):
        t.read_for_expr("hx")


def test_declarative_read_where(spark, tmp_path):
    """Plain read(where=...) auto-prunes through the MOR index — the
    same declarative contract as the COW table — and is always exact,
    including the OR/backslash/chained-comparison guard rails."""
    t = _tbl(spark, str(tmp_path / "t"))
    t.upsert(_mk(spark, [(1, "d1", 2, 1), (2, "d2", 5, 1)]))
    t.upsert(_mk(spark, [(3, "d3", 7, 1)]))
    for pred in (
        "hr * 10 = 50",
        "hr * 10 BETWEEN 50 AND 70 AND k >= 0",
        "hr * 10 = 50 OR true",          # OR disables pruning, stays exact
        "hr * 10 = 50 = TRUE",           # chained comparison: no bound
    ):
        got = _keys(t.read(where=pred))
        want = _keys(t.read().filter(F.expr(pred)))
        assert got == want, pred
    assert _keys(t.read(where="hr * 10 = 999")) == []
    # bounds matched and pruning engaged for the plain equality
    assert t._index_bounds("hr * 10 = 50") == ("hx", 50, 50)
    # historical read bypasses the latest-state index but filters
    got = _keys(t.read(as_of=1, where="hr * 10 = 50"))
    assert got == [2]


def test_concurrent_nbcc_absorb_no_lost_splices(spark, tmp_path):
    """Two NBCC writers publishing concurrently must not lose each
    other's index splices (the read-modify-write serializes on the
    sidecar lock). Every writer's values are probeable afterwards."""
    import threading

    t = _tbl(spark, str(tmp_path / "t"))
    t.upsert(_mk(spark, [(1, "d0", 1, 1)]))  # bootstrap
    errs = []

    def writer(wid, rows):
        try:
            tw = _tbl(spark, str(tmp_path / "t"))
            tw.nbcc_upsert(_mk(spark, rows), writer=wid)
        except Exception as e:  # pragma: no cover - surfaced below
            errs.append((wid, e))

    th = [
        threading.Thread(
            target=writer, args=(f"w{i}", [(10 + i, f"d{i}", 2 + i, 1)])
        )
        for i in range(1, 5)
    ]
    for x in th:
        x.start()
    for x in th:
        x.join()
    assert not errs, errs
    for i in range(1, 5):
        assert _assert_exact(t, (2 + i) * 10, (2 + i) * 10) == [10 + i]
        assert sorted(t._fidx_candidates("hx", (2 + i) * 10, (2 + i) * 10)) == [
            (f"d{i}",)
        ]
