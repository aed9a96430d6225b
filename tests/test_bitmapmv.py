"""Laws for incremental bitmap-distinct state (operators/bitmapmv.py).

The whole-registry oracle gate already value-hash-checks the
bitmap_distinct_mv_merge query; this file pins the operator contract
that justifies it at scale — above all that the REFRESH path never
rescans the base fact table.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.bitmapmv import (
    bitmap_mv_build,
    bitmap_mv_count,
    bitmap_mv_merge,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "g string, v long")


def test_merge_equals_rebuild(spark):
    """Folding a delta into stored state must equal building state from
    base UNION delta — associativity of the bitmap OR — including
    overlapping values, delta-only groups, and bucket-boundary values
    (bitmap buckets span 32768 bits)."""
    base = _mk(spark, [("a", 1), ("a", 2), ("b", 5), ("a", 32767), ("a", 32768)])
    delta = _mk(
        spark, [("a", 2), ("a", 99), ("b", 5), ("c", 7), ("a", 65536), ("c", -3)]
    )
    merged = bitmap_mv_merge(bitmap_mv_build(base, ["g"], "v"), delta, ["g"], "v")
    rebuilt = bitmap_mv_build(base.unionByName(delta), ["g"], "v")
    got = sorted(map(tuple, bitmap_mv_count(merged, ["g"]).collect()))
    want = sorted(map(tuple, bitmap_mv_count(rebuilt, ["g"]).collect()))
    assert got == want
    truth = sorted(
        map(tuple, base.unionByName(delta).groupBy("g")
            .agg(F.countDistinct("v").cast("long").alias("n_distinct")).collect())
    )
    assert got == truth


def test_refresh_never_rescans_base(spark):
    """THE contract: the refresh's executed plan scans the MV parquet
    and the on-disk delta — and NOT the base fact table, even though
    all three live on disk and the facts would be the 'obvious' source
    to recount from. This is what turns COUNT(DISTINCT) maintenance
    from O(table) to O(delta)."""
    with tempfile.TemporaryDirectory(prefix="bitmap_mv_test_") as tmp:
        base_path = os.path.join(tmp, "facts")
        mv_path = os.path.join(tmp, "state")
        delta_path = os.path.join(tmp, "delta")
        _mk(spark, [("a", i) for i in range(100)] + [("b", i) for i in range(50)]) \
            .write.parquet(base_path)
        facts = spark.read.parquet(base_path)
        bitmap_mv_build(facts, ["g"], "v").write.parquet(mv_path)
        _mk(spark, [("a", 1000), ("b", 3), ("c", 1)]).write.parquet(delta_path)

        refreshed = bitmap_mv_count(
            bitmap_mv_merge(
                spark.read.parquet(mv_path),
                spark.read.parquet(delta_path),
                ["g"], "v",
            ),
            ["g"],
        )
        plan = refreshed._jdf.queryExecution().executedPlan().toString()
        assert "state" in plan and "delta" in plan  # both inputs scanned...
        assert "facts" not in plan  # ...the base facts are NOT
        got = {r.g: r.n_distinct for r in refreshed.collect()}
        assert got == {"a": 101, "b": 50, "c": 1}


def test_query_refresh_scans_events_exactly_once(spark):
    """Query-level pin for bitmap_distinct_mv_merge
    (queries/relational3.py): the RETURNED plan may scan the events
    fixture exactly once — the delta leg. The base history enters only
    through the persisted MV parquet (its build ran eagerly, outside
    this plan); a regression that re-derives either count from base
    events would show up as a second events scan here."""
    import re

    from aws_glue_streaming_etl_with_apache_hudi_spark.queries import QUERIES

    df = QUERIES["bitmap_distinct_mv_merge"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_events_scans = len(re.findall(r"events\.parquet", plan))
    assert n_events_scans == 1, f"expected 1 events scan, saw {n_events_scans}"
    assert "spark_graft_bitmapmv_" in plan  # the persisted MV is the other source


def test_untouched_state_passes_through(spark):
    """A delta touching one group must leave other groups' counts
    unchanged (their state rows ride through bitmap_or_agg unmerged)."""
    base = _mk(spark, [("a", 1), ("b", 2), ("b", 3)])
    state = bitmap_mv_build(base, ["g"], "v")
    merged = bitmap_mv_merge(state, _mk(spark, [("a", 9)]), ["g"], "v")
    got = {r.g: r.n_distinct for r in bitmap_mv_count(merged, ["g"]).collect()}
    assert got == {"a": 2, "b": 2}


def test_streamed_foreachbatch_refresh_and_replay_idempotence(spark, tmp_path):
    """BitmapMVStore in the production streaming loop: three micro-batch
    files flow through StreamingUpsertPipeline, each folding into the
    store from the post_commit hook AFTER the upsert commits. Final
    counts must equal COUNT(DISTINCT) over everything streamed — and
    re-folding the last batch (the crash-replay window between data
    commit and pointer swap) must change NOTHING: the bitmap OR is
    idempotent, which is what makes the hook exactly-once-in-effect."""
    import os

    from pyspark.sql import Row

    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.bitmapmv import BitmapMVStore
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import UpsertTable
    from aws_glue_streaming_etl_with_apache_hudi_spark.streaming.pipeline import StreamingUpsertPipeline

    import glob
    import shutil

    src = str(tmp_path / "src")
    os.makedirs(src)
    batches = [
        [Row(k=1, g="a", v=10, ver=1), Row(k=2, g="a", v=11, ver=1)],
        [Row(k=3, g="b", v=10, ver=1), Row(k=1, g="a", v=10, ver=2)],  # v=10 repeats
        [Row(k=4, g="a", v=12, ver=1), Row(k=5, g="b", v=99, ver=1)],
    ]
    for i, rows in enumerate(batches):
        stage = str(tmp_path / f"stage_{i}")
        spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(src, f"batch_{i}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    table = UpsertTable(
        spark, str(tmp_path / "tbl"), keys=["k"], precombine="ver"
    )
    store = BitmapMVStore(
        spark, str(tmp_path / "mv"), group_cols=["g"], value_col="v"
    )
    pipe = StreamingUpsertPipeline(
        spark,
        source_dir=src,
        schema=spark.createDataFrame(batches[0]).schema,
        table=table,
        checkpoint=str(tmp_path / "ckpt"),
        trigger="1 seconds",
        post_commit=lambda batch: store.fold(batch),
    )
    pipe.run_available()
    assert len(pipe.batches_seen) >= 1
    got = {r.g: r.n_distinct for r in store.counts().collect()}
    # distinct v per g over ALL streamed rows: a={10,11,12}, b={10,99}
    assert got == {"a": 3, "b": 2}

    # crash-replay window: re-fold the final batch verbatim
    v_before = store.version()
    store.fold(spark.createDataFrame(batches[2]))
    assert store.version() == v_before + 1  # a new version was written...
    got2 = {r.g: r.n_distinct for r in store.counts().collect()}
    assert got2 == got  # ...but the counts are bit-for-bit unchanged


def test_store_corrupt_pointer_fails_loudly(spark, tmp_path):
    """A pointer file that EXISTS but does not parse is corruption, not
    absence: fold()/counts() must refuse rather than silently bootstrap
    from the next delta alone (which would serve exact-looking but
    too-small counts)."""
    import pytest

    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.bitmapmv import BitmapMVStore

    store = BitmapMVStore(spark, str(tmp_path / "mv"), ["g"], "v")
    store.fold(_mk(spark, [("a", 1), ("a", 2)]))
    assert {r.g: r.n_distinct for r in store.counts().collect()} == {"a": 2}
    with open(store._pointer, "w") as f:
        f.write("")  # truncation / garbled write
    with pytest.raises(RuntimeError, match="corrupt bitmap MV pointer"):
        store.fold(_mk(spark, [("a", 3)]))
    with pytest.raises(RuntimeError, match="corrupt bitmap MV pointer"):
        store.counts()
