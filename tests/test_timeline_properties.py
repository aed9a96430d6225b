"""Property-based invariants of the commit timeline (hypothesis):
time travel to instant N must equal folding the first N batches through
the plain upsert algebra — the law that makes snapshots, rollback, and
incremental reads mutually consistent. Plus the MOR incremental window."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import TimelineTable
from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import upsert_dataframe

event = st.tuples(
    st.integers(min_value=0, max_value=3),  # key
    st.sampled_from(["a", "b"]),  # partition
    st.integers(min_value=0, max_value=20),  # precombine
)


@given(
    events=st.lists(event, min_size=1, max_size=12),
    cuts=st.lists(st.integers(min_value=0, max_value=12), max_size=2),
)
@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
def test_time_travel_equals_batch_fold(spark, tmp_path_factory, events, cuts):
    rows = [(k, p, v, i) for i, (k, p, v) in enumerate(events)]
    cols = ["k", "part", "ver", "row_id"]
    bounds = sorted({min(c, len(rows)) for c in cuts} | {len(rows)})
    batches, prev = [], 0
    for b in bounds:
        if b > prev:
            batches.append(rows[prev:b])
            prev = b
    if not batches:
        batches = [rows]

    table = TimelineTable(
        spark=spark,
        path=str(tmp_path_factory.mktemp("tlprop") / "t"),
        keys=["k"],
        precombine="ver",
        partition_by=["part"],
    )
    folded = None
    for i, batch_rows in enumerate(batches, start=1):
        batch = spark.createDataFrame([Row(**dict(zip(cols, r))) for r in batch_rows])
        table.upsert(batch)
        folded = upsert_dataframe(folded, batch, ["part", "k"], "ver")
        got = sorted(
            (r.k, r.part, r.ver, r.row_id)
            for r in table.read(as_of=i).collect()
        )
        want = sorted(
            (r.k, r.part, r.ver, r.row_id) for r in folded.collect()
        )
        assert got == want, f"as_of={i}"


def test_mor_incremental_window(spark, tmp_path):
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.mor import CompactionPolicy, MergeOnReadTable

    import pytest

    t = MergeOnReadTable(
        spark=spark,
        path=str(tmp_path / "mor"),
        keys=["k"],
        precombine="ver",
        policy=CompactionPolicy(max_delta_commits=100),
    )
    t.upsert(spark.createDataFrame([Row(k=1, v="x", ver=1)]))  # commit 1 (bootstrap)
    t.upsert(spark.createDataFrame([Row(k=1, v="x2", ver=2)]))  # commit 2
    t.upsert(spark.createDataFrame([Row(k=2, v="y", ver=1)]))  # commit 3

    assert t.pending_commits() == [2, 3]
    inc = {r.k: (r.v, r._commit_id) for r in t.read_incremental().collect()}
    assert inc == {1: ("x2", 2), 2: ("y", 3)}
    inc2 = {r.k for r in t.read_incremental(begin=2).collect()}
    assert inc2 == {2}

    # commits SURVIVE compaction (retained timeline): the same pull works
    t.compact()
    inc3 = {r.k: (r.v, r._commit_id) for r in t.read_incremental().collect()}
    assert inc3 == inc
    # clean is what removes history — then the window really is gone
    t.clean(through=3)
    with pytest.raises(ValueError):
        t.read_incremental()


@given(
    events=st.lists(event, min_size=1, max_size=10),
    compact_after=st.sets(st.integers(min_value=1, max_value=5), max_size=2),
)
@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
def test_mor_time_travel_equals_batch_fold(
    spark, tmp_path_factory, events, compact_after
):
    """MOR law: read(as_of=N) == folding batches 1..N through the plain
    upsert algebra, REGARDLESS of where compactions land in the sequence
    (compaction timing must be unobservable to any historical read)."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.mor import CompactionPolicy, MergeOnReadTable

    rows = [(k, p, v, i) for i, (k, p, v) in enumerate(events)]
    cols = ["k", "part", "ver", "row_id"]
    # batches of 2
    batches = [rows[i : i + 2] for i in range(0, len(rows), 2)]

    table = MergeOnReadTable(
        spark=spark,
        path=str(tmp_path_factory.mktemp("morprop") / "t"),
        keys=["k"],
        precombine="ver",
        partition_by=["part"],
        policy=CompactionPolicy(max_delta_commits=100),
    )
    folds = []  # folds[i] = model state after batch i+1
    folded = None
    for i, batch_rows in enumerate(batches, start=1):
        batch = spark.createDataFrame([Row(**dict(zip(cols, r))) for r in batch_rows])
        table.upsert(batch)
        folded = upsert_dataframe(folded, batch, ["part", "k"], "ver")
        folds.append(sorted((r.k, r.part, r.ver, r.row_id) for r in folded.collect()))
        if i in compact_after:
            table.compact()
    # verify EVERY instant after the full sequence (compactions included)
    for i, want in enumerate(folds, start=1):
        got = sorted(
            (r.k, r.part, r.ver, r.row_id) for r in table.read(as_of=i).collect()
        )
        assert got == want, f"as_of={i} (compactions at {sorted(compact_after)})"
