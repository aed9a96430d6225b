"""Binned range join (operators/rangejoin.py): result equivalence with the
naive theta join, left semantics, equi-key composition, and the no-nested-
loop plan gate — the scale contract that motivates the operator."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.rangejoin import binned_range_join

BASE = dt.datetime(2024, 1, 1)


def _intervals(spark, rows):
    return spark.createDataFrame(
        [(i, BASE + dt.timedelta(minutes=s), BASE + dt.timedelta(minutes=e)) for i, s, e in rows],
        "iid long, start timestamp, end timestamp",
    )


def _points(spark, rows):
    return spark.createDataFrame(
        [(i, BASE + dt.timedelta(minutes=m)) for i, m in rows],
        "pid long, p_ts timestamp",
    )


def test_matches_naive_theta_join_randomized(spark):
    rng = random.Random(7)
    ivals = [(i, s := rng.randrange(0, 5000), s + rng.randrange(1, 240)) for i in range(120)]
    pts = [(i, rng.randrange(0, 5300)) for i in range(400)]
    intervals, points = _intervals(spark, ivals), _points(spark, pts)

    got = binned_range_join(
        intervals, points, "start", "end", "p_ts", bin_width_seconds=3600
    ).select("iid", "pid")
    naive = intervals.join(
        points, (F.col("p_ts") >= F.col("start")) & (F.col("p_ts") < F.col("end"))
    ).select("iid", "pid")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))
    # boundary semantics: start inclusive, end exclusive
    one_i = _intervals(spark, [(1, 10, 20)])
    one_p = _points(spark, [(1, 10), (2, 20)])
    hit = binned_range_join(one_i, one_p, "start", "end", "p_ts", 600).collect()
    assert [r["pid"] for r in hit] == [1]


def test_left_semantics_and_interval_id(spark):
    intervals = _intervals(spark, [(1, 0, 60), (2, 1000, 1060)])
    points = _points(spark, [(10, 30)])
    out = binned_range_join(
        intervals, points, "start", "end", "p_ts", 3600,
        how="left", interval_id=["iid"],
    )
    rows = {r["iid"]: r["pid"] for r in out.collect()}
    assert rows == {1: 10, 2: None}
    with pytest.raises(ValueError, match="interval_id"):
        binned_range_join(
            intervals, points, "start", "end", "p_ts", 3600, how="left"
        )


def test_equi_keys_compose_with_range(spark):
    intervals = spark.createDataFrame(
        [("u1", BASE, BASE + dt.timedelta(hours=1)),
         ("u2", BASE, BASE + dt.timedelta(hours=1))],
        "uid string, start timestamp, end timestamp",
    )
    points = spark.createDataFrame(
        [("u1", BASE + dt.timedelta(minutes=30)),
         ("u2", BASE + dt.timedelta(minutes=90))],
        "uid string, p_ts timestamp",
    )
    out = binned_range_join(
        intervals, points, "start", "end", "p_ts", 3600, equi_keys=["uid"]
    )
    assert [r["uid"] for r in out.collect()] == ["u1"]


def test_ambiguous_columns_rejected(spark):
    intervals = _intervals(spark, [(1, 0, 60)])
    points = _points(spark, [(1, 30)]).withColumnRenamed("pid", "iid")
    with pytest.raises(ValueError, match="ambiguous"):
        binned_range_join(intervals, points, "start", "end", "p_ts", 3600)


def test_plan_has_no_nested_loop(spark):
    intervals = _intervals(spark, [(1, 0, 60)])
    points = _points(spark, [(1, 30)])
    for how, iid in (("inner", None), ("left", ["iid"])):
        plan = (
            binned_range_join(
                intervals, points, "start", "end", "p_ts", 3600,
                how=how, interval_id=iid,
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
