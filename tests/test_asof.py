"""Generic as-of join operator (operators/asof.py): pandas merge_asof
parity in both directions, tolerance nulling, tie-break rule."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 10, "e1"), (1, 25, "e2"), (2, 5, "e3"), (2, 40, "e4"), (3, 7, "e5")],
        ["k", "lt", "ev"],
    ).withColumn("lt", F.timestamp_seconds("lt"))
    right = spark.createDataFrame(
        [(1, 8, 100), (1, 20, 101), (2, 6, 200), (2, 39, 201), (4, 1, 300)],
        ["k", "rt", "val"],
    ).withColumn("rt", F.timestamp_seconds("rt"))
    return left, right


def _pandas_asof(left, right, direction, tolerance=None):
    lp = left.toPandas().sort_values("lt").reset_index(drop=True)
    rp = right.toPandas().sort_values("rt").reset_index(drop=True)
    return pd.merge_asof(
        lp, rp, left_on="lt", right_on="rt", by="k",
        direction=direction, tolerance=tolerance,
    )


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_matches_pandas_merge_asof(spark, direction):
    left, right = _frames(spark)
    got = {
        (r.k, r.ev): (r.val, r.rt)
        for r in asof_join(
            left, right, ["k"], "lt", "rt", ["val"], direction=direction
        ).collect()
    }
    want = _pandas_asof(left, right, direction)
    for _, row in want.iterrows():
        val = None if pd.isna(row["val"]) else int(row["val"])
        assert got[(row["k"], row["ev"])][0] == val, (direction, row["ev"])
    assert len(got) == left.count()  # every left row survives


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_tolerance_nulls_far_matches(spark, direction):
    left, right = _frames(spark)
    got = {
        (r.k, r.ev): r.val
        for r in asof_join(
            left, right, ["k"], "lt", "rt", ["val"],
            direction=direction, tolerance="INTERVAL 3 SECONDS",
        ).collect()
    }
    want = _pandas_asof(left, right, direction, tolerance=pd.Timedelta(seconds=3))
    for _, row in want.iterrows():
        val = None if pd.isna(row["val"]) else int(row["val"])
        assert got[(row["k"], row["ev"])] == val, (direction, row["ev"])


def test_tie_break_rule(spark):
    """Equal right timestamps: backward takes the LAST in tie order,
    forward the FIRST — the documented deterministic rule."""
    left = spark.createDataFrame([(1, 10, "e")], ["k", "lt", "ev"]).withColumn(
        "lt", F.timestamp_seconds("lt")
    )
    right = spark.createDataFrame(
        [(1, 10, 1), (1, 10, 2), (1, 10, 3)], ["k", "rt", "val"]
    ).withColumn("rt", F.timestamp_seconds("rt"))
    back = asof_join(
        left, right, ["k"], "lt", "rt", ["val"],
        direction="backward", tie_breakers=["val"],
    ).collect()[0]
    fwd = asof_join(
        left, right, ["k"], "lt", "rt", ["val"],
        direction="forward", tie_breakers=["val"],
    ).collect()[0]
    assert back.val == 3 and fwd.val == 1


def test_rejects_colliding_columns_and_bad_direction(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError, match="backward|forward"):
        asof_join(left, right, ["k"], "lt", "rt", ["val"], direction="nearest")
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            left.withColumnRenamed("ev", "val"), right, ["k"], "lt", "rt", ["val"]
        )


def test_single_shuffle_no_join_explosion(spark):
    """The plan must be the union-carry-forward shape: no Join operator at
    all, one hash exchange on the key for the window."""
    left, right = _frames(spark)
    plan = (
        asof_join(left, right, ["k"], "lt", "rt", ["val"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------- property

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@st.composite
def _asof_case(draw):
    # unique (k, t) pairs on the right so pandas' input-order tie rule
    # cannot diverge from our explicit tie_breakers
    lefts = draw(st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50)),
                          min_size=1, max_size=12))
    rights = draw(st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50)),
                           min_size=0, max_size=12, unique=True))
    direction = draw(st.sampled_from(["backward", "forward"]))
    return lefts, rights, direction


@given(case=_asof_case())
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_asof_matches_pandas_on_random_frames(spark, case):
    lefts, rights, direction = case
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)], ["k", "lt", "lid"]
    ).withColumn("lt", F.timestamp_seconds("lt"))
    right = spark.createDataFrame(
        [(k, t, k * 1000 + t) for (k, t) in rights], ["k", "rt", "val"]
    ).withColumn("rt", F.timestamp_seconds("rt")) if rights else spark.createDataFrame(
        [], "k bigint, rt timestamp, val bigint"
    )
    got = {
        r.lid: r.val
        for r in asof_join(
            left, right, ["k"], "lt", "rt", ["val"], direction=direction
        ).collect()
    }
    lp = left.toPandas().sort_values("lt", kind="stable").reset_index(drop=True)
    rp = right.toPandas().sort_values("rt", kind="stable").reset_index(drop=True)
    want = pd.merge_asof(lp, rp, left_on="lt", right_on="rt", by="k",
                         direction=direction)
    for _, row in want.iterrows():
        val = None if pd.isna(row["val"]) else int(row["val"])
        assert got[row["lid"]] == val, (direction, row["lid"])


def test_null_value_in_nearest_row_stays_null(spark):
    """Code-review regression: the nearest right row's NULL value must
    surface as NULL — per-column ignorenulls carry would resurrect the
    stale value from an older row (and with tolerance, an out-of-window
    stale value could even survive the nulling)."""
    left = spark.createDataFrame([(1, 10, "e")], ["k", "lt", "ev"]).withColumn(
        "lt", F.timestamp_seconds("lt")
    )
    right = spark.createDataFrame(
        [(1, 5, 100), (1, 8, None)], ["k", "rt", "val"]
    ).withColumn("rt", F.timestamp_seconds("rt"))
    r = asof_join(left, right, ["k"], "lt", "rt", ["val"]).collect()[0]
    assert r.val is None  # nearest row (rt=8) carries its own null
    assert r.rt is not None and r.rt.second == 8
    # tolerance 3s: nearest row in-window, still null; stale val must NOT leak
    r2 = asof_join(
        left, right, ["k"], "lt", "rt", ["val"], tolerance="INTERVAL 3 SECONDS"
    ).collect()[0]
    assert r2.val is None and r2.rt is not None


def test_reserved_column_names_rejected(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError, match="reserved"):
        asof_join(left.withColumnRenamed("ev", "_t"), right, ["k"], "lt", "rt", ["val"])
