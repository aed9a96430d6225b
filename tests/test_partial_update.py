"""Partial-update merge (operators/upsert.py partial_merge +
UpsertTable(merge_mode="partial")): Hudi PartialUpdateAvroPayload
semantics — a null in an incoming column means "no change", not "set to
null". The payload shape of CDC streams and sparse attribute feeds.

Reference anchor: the upsert key/precombine machinery this generalizes is
glue_job_script.py:50-62 (default overwrite payload)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import UpsertTable, partial_merge


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "k bigint, ver bigint, name string, score double, city string"
    )


def test_partial_merge_column_wise_latest_non_null(spark):
    stored = _df(spark, [(1, 1, "ann", 0.5, "rome"), (2, 1, "bob", 0.7, "oslo")])
    batch = _df(
        spark,
        [
            (1, 2, None, 0.9, None),   # only score changed
            (2, 2, "bobby", None, None),  # only name changed
            (3, 2, "cat", None, "lima"),  # new key with sparse columns
        ],
    )
    out = {r.k: r for r in partial_merge(stored, batch, ["k"], "ver").collect()}
    assert out[1].name == "ann" and out[1].score == 0.9 and out[1].city == "rome"
    assert out[2].name == "bobby" and out[2].score == 0.7 and out[2].city == "oslo"
    assert out[3].name == "cat" and out[3].score is None and out[3].city == "lima"
    # merged precombine is the overall latest even where columns came
    # from older rows
    assert all(out[k].ver == 2 for k in (1, 2, 3))


def test_partial_merge_within_batch_chain(spark):
    """Multiple versions of one key in a single batch fold column-wise:
    pairwise newer-non-null-overrides == latest non-null per column."""
    batch = _df(
        spark,
        [
            (1, 1, "ann", 0.1, "rome"),
            (1, 2, None, 0.2, None),
            (1, 3, "anne", None, None),
        ],
    )
    row = partial_merge(None, batch, ["k"], "ver").collect()[0]
    assert (row.ver, row.name, row.score, row.city) == (3, "anne", 0.2, "rome")


def test_partial_merge_ties_batch_over_stored_then_greatest(spark):
    stored = _df(spark, [(1, 5, "old", 0.1, "rome")])
    batch = _df(spark, [(1, 5, "new", None, None)])
    row = partial_merge(stored, batch, ["k"], "ver").collect()[0]
    assert row.name == "new" and row.score == 0.1  # tie -> batch wins


def test_partial_merge_is_partitioning_invariant(spark):
    rows = [
        (1, 1, "a", 0.1, None),
        (1, 2, None, None, "x"),
        (1, 3, "b", None, None),
        (2, 1, None, 0.5, "y"),
        (2, 2, "c", None, None),
    ]
    base = _df(spark, rows)
    ref = sorted(map(tuple, partial_merge(None, base, ["k"], "ver").collect()))
    for n in (1, 3, 16):
        got = sorted(
            map(tuple, partial_merge(None, base.repartition(n), ["k"], "ver").collect())
        )
        assert got == ref


def test_partial_table_upsert_lifecycle(spark, tmp_path):
    t = UpsertTable(
        spark,
        str(tmp_path / "ptbl"),
        keys=["k"],
        precombine="ver",
        merge_mode="partial",
    )
    t.upsert(_df(spark, [(1, 1, "ann", 0.5, "rome"), (2, 1, "bob", 0.7, "oslo")]))
    t.upsert(_df(spark, [(1, 2, None, 0.9, None)]))
    state = {r.k: r for r in t.read().collect()}
    assert state[1].name == "ann" and state[1].score == 0.9
    assert state[2].name == "bob" and state[2].score == 0.7

    # idempotence: replaying the same batch changes nothing
    before = sorted(map(tuple, t.read().collect()))
    t.upsert(_df(spark, [(1, 2, None, 0.9, None)]))
    assert sorted(map(tuple, t.read().collect())) == before

    # an overwrite-mode table on the same inputs nulls the untouched cols
    o = UpsertTable(spark, str(tmp_path / "otbl"), keys=["k"], precombine="ver")
    o.upsert(_df(spark, [(1, 1, "ann", 0.5, "rome")]))
    o.upsert(_df(spark, [(1, 2, None, 0.9, None)]))
    row = o.read().collect()[0]
    assert row.name is None and row.city is None  # the contrast partial avoids


def test_partial_table_schema_evolution_missing_column_means_no_change(spark, tmp_path):
    t = UpsertTable(
        spark,
        str(tmp_path / "ev"),
        keys=["k"],
        precombine="ver",
        merge_mode="partial",
    )
    t.upsert(_df(spark, [(1, 1, "ann", 0.5, "rome")]))
    # batch lacks name/score/city entirely -> all preserved
    t.upsert(spark.createDataFrame([Row(k=1, ver=2)], "k bigint, ver bigint"))
    row = t.read().collect()[0]
    assert (row.ver, row.name, row.score, row.city) == (2, "ann", 0.5, "rome")


def test_partial_merge_plan_is_single_aggregate(spark):
    """One hash aggregation, no join, no window sort — the scale contract."""
    stored = _df(spark, [(1, 1, "a", 0.1, "x")])
    batch = _df(spark, [(1, 2, None, 0.2, None)])
    plan = (
        partial_merge(stored, batch, ["k"], "ver")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # struct-typed max_by ordering compiles to SortAggregate (struct keys
    # aren't hash-aggregable) — what matters is: aggregation with a
    # map-side partial stage, ONE exchange, and no join / window sort
    assert "Aggregate" in plan and "partial_max_by" in plan
    assert plan.count("Exchange") == 1
    assert "Join" not in plan and "Window" not in plan


def test_unknown_merge_mode_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="merge_mode"):
        UpsertTable(
            spark, str(tmp_path / "bad"), keys=["k"], precombine="ver",
            merge_mode="upsert",
        )


# ---------------------------------------------------------------- property

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _model_partial_merge(rows):
    """Pure-Python reference: column-wise latest non-null per key under
    (ver, src, value) ordering — the declared partial_merge semantics."""
    out = {}
    for k, ver, src, name, score in rows:
        cur = out.setdefault(k, {"ver": None})
        cur["ver"] = max(v for v in (cur["ver"], ver) if v is not None) if cur["ver"] is not None else ver
        for col, val in (("name", name), ("score", score)):
            if val is None:
                continue
            prev = cur.get(col)  # (ver, src, value)
            cand = (ver, src, val)
            if prev is None or cand > prev:
                cur[col] = cand
    return {
        k: (
            c["ver"],
            c.get("name", (None, None, None))[2],
            c.get("score", (None, None, None))[2],
        )
        for k, c in out.items()
    }


@st.composite
def _merge_case(draw):
    def rows(src):
        return draw(
            st.lists(
                st.tuples(
                    st.integers(0, 3),                          # key
                    st.integers(0, 5),                          # ver
                    st.just(src),
                    st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
                    st.one_of(st.none(), st.sampled_from([1.0, 2.5, 9.75])),
                ),
                min_size=0,
                max_size=10,
            )
        )
    return rows(0), rows(1)


@given(case=_merge_case())
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_partial_merge_matches_reference_model(spark, case):
    stored_rows, batch_rows = case
    if not batch_rows:
        return  # merge needs a batch; stored-only is covered elsewhere
    schema = "k bigint, ver bigint, name string, score double"
    stored = (
        spark.createDataFrame([(k, v, n, s) for (k, v, _, n, s) in stored_rows], schema)
        if stored_rows
        else None
    )
    batch = spark.createDataFrame(
        [(k, v, n, s) for (k, v, _, n, s) in batch_rows], schema
    )
    got = {
        r.k: (r.ver, r.name, r.score)
        for r in partial_merge(stored, batch, ["k"], "ver").collect()
    }
    want = _model_partial_merge(list(stored_rows) + list(batch_rows))
    assert got == want


# -- delete_where / retention (colocated: same UpsertTable service area) --


def test_delete_where_touches_only_matching_partitions(spark, tmp_path):
    import os

    t = UpsertTable(
        spark, str(tmp_path / "dw"), keys=["k"], precombine="ver",
        partition_by=["d"],
    )
    t.upsert(
        spark.createDataFrame(
            [(1, 1, "d1", 5.0), (2, 1, "d1", 50.0),
             (3, 1, "d2", 5.0), (4, 1, "d3", 99.0)],
            "k bigint, ver bigint, d string, v double",
        )
    )
    # fingerprint the untouched partition's files before the delete
    d3_files = {
        f: os.path.getmtime(os.path.join(t.path, "d=d3", f))
        for f in os.listdir(os.path.join(t.path, "d=d3"))
        if f.endswith(".parquet")
    }
    assert t.delete_where(F.col("v") < 10.0) == 2
    state = {r.k for r in t.read().collect()}
    assert state == {2, 4}
    # d2 drained entirely -> removed; d3 untouched byte-for-byte
    assert not os.path.isdir(os.path.join(t.path, "d=d2"))
    after = {
        f: os.path.getmtime(os.path.join(t.path, "d=d3", f))
        for f in os.listdir(os.path.join(t.path, "d=d3"))
        if f.endswith(".parquet")
    }
    assert after == d3_files, "untouched partition was rewritten"
    # no matches -> no-op
    assert t.delete_where(F.col("v") > 1000.0) == 0


def test_apply_retention_drops_expired_rows(spark, tmp_path):
    from datetime import datetime

    t = UpsertTable(
        spark, str(tmp_path / "ttl"), keys=["k"], precombine="ts",
        partition_by=["day"],
    )
    rows = [
        (1, datetime(2024, 1, 1, 5), "2024-01-01", 1.0),
        (2, datetime(2024, 1, 2, 5), "2024-01-02", 2.0),
        (3, datetime(2024, 1, 3, 5), "2024-01-03", 3.0),
        (4, datetime(2024, 1, 3, 23), "2024-01-03", 4.0),
    ]
    t.upsert(
        spark.createDataFrame(
            rows, "k bigint, ts timestamp, day string, v double"
        )
    )
    n = t.apply_retention("ts", datetime(2024, 1, 3, 12))
    assert n == 3
    assert {r.k for r in t.read().collect()} == {4}
    # expired whole-day partitions are gone from disk
    import os

    assert not os.path.isdir(os.path.join(t.path, "day=2024-01-01"))
    assert not os.path.isdir(os.path.join(t.path, "day=2024-01-02"))
    assert os.path.isdir(os.path.join(t.path, "day=2024-01-03"))
